"""Empty-input robustness: every operator family must degrade to empty
(or well-defined scalar) output, never crash -- at 100 TB a partition
or date-slice being empty is routine, not exceptional."""

from __future__ import annotations

import pytest

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.tables import TABLES, load
from tests.conftest import SF_SMOKE

registry.load_all_queries()

# one representative per family whose pipeline shape differs
REPRESENTATIVE = [
    "q1_pricing_summary",        # filter+agg+sort
    "q_join_star_revenue",       # multi-join
    "q_window_topk_per_group",   # window
    "q_dedup_minhash_lsh",       # signature + LSH join
    "q_dedup_components",        # iterative graph loop
    "q_ann_bruteforce_topk",     # broadcast cross join
    "q_asof_join",               # union + window
    "q_stream_session",          # session windows
    "q_multimodal_features",     # mapInPandas
    "q_text_langid",             # explode + broadcast join + argmax
    # round-3 curation families
    "q_sample_weighted_mix",     # agg -> broadcast rates -> cond agg
    "q_decontaminate_ngram",     # gram explode + broadcast semi-ish join
    "q_quality_repetition",      # explode + two-level agg + window
    "q_kmeans_update",           # broadcast NLJ + posexplode + agg
    "q_bm25_search",             # scalar-stats crossJoin + heap top-N
    "q_pack_sequences",          # shard window cumsum
    "q_pack_greedy",             # per-shard applyInPandas recurrence
    "q_entity_resolution",       # blocked pairs -> CC -> golden record
    # round-5 families
    "q_cdc_apply",               # key shuffle + rank window
    "q_decontaminate_bloom",     # position explode + broadcast bit table
    "q_zorder_layout",           # integer fold + bucket agg
    "q_quality_classifier",      # HOF fold scorer
    "q_bpe_pair_counts",         # vocab collapse + pair explode + heap
    "q_label_propagation",       # unrolled LPA rounds (checkpoint loop)
    "q_embedding_quantize",      # per-vector HOF quantization
    "q_time_weighted_avg",       # lead window + exact integer agg
    "q_multimodal_audio_energy", # two chained mapInPandas stages
    "q_profile_columns",         # multi-distinct expand (3-row output)
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        if t == "events":
            # events must carry the RAW layout (nanos-as-long ts): the
            # loader rebuilds the timestamp from it
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
        else:
            schema = load(spark, SF_SMOKE, t).schema
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = registry.QUERIES[name](spark, empty_sf_dir)
    rows = df.collect()
    # global aggregates legitimately emit one row over empty input;
    # everything else must emit zero rows; the column profile is the
    # one fixed-cardinality output (one row per PROFILED COLUMN, with
    # zero counts, regardless of table size)
    limit = 3 if name == "q_profile_columns" else 1
    assert len(rows) <= limit

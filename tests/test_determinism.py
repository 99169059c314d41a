"""Partition-count invariance: results must be identical under
different parallelism (the driver runs its own session config; any
shuffle-partition-dependent value would flake the t2 hash)."""

from __future__ import annotations

import pytest

from discogs_xml_to_parquet_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle_utils import _normalize

registry.load_all_queries()

# the queries whose shapes could plausibly leak partitioning: float
# aggregation order, collect_set order, LSH pair generation, window ties
RISKY = [
    "q1_pricing_summary",
    "q_join_star_revenue",
    "q_nested_collect",
    "q_dedup_minhash_lsh",
    "q_dedup_embedding_cosine",
    "q_window_running",
    "q_asof_join",
    "q_stream_session",
]


@pytest.mark.parametrize("name", RISKY)
def test_partition_count_invariant(spark, name):
    fn = registry.QUERIES[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        df_a = fn(spark, SF_ORACLE)
        a = _normalize([tuple(r) for r in df_a.collect()], df_a.columns)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        df_b = fn(spark, SF_ORACLE)
        b = _normalize([tuple(r) for r in df_b.collect()], df_b.columns)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: result depends on shuffle partition count"


def test_simhash_banded_full_recall_vs_all_pairs(spark):
    """Pigeonhole guarantee: at Hamming distance <= 3, a 4-band split of
    the 64-bit fingerprint must find EVERY pair the all-pairs theta join
    finds (banding trades compute, never recall, at this distance)."""
    from discogs_xml_to_parquet_spark import registry
    from discogs_xml_to_parquet_spark.operators import dedup as D
    from pyspark.sql import functions as F
    from discogs_xml_to_parquet_spark.tables import load
    from tests.conftest import SF_ORACLE

    banded = {
        (r.id1, r.id2)
        for r in registry.QUERIES["q_dedup_simhash_banded"](spark, SF_ORACLE).collect()
    }
    sums = (
        load(spark, SF_ORACLE, "documents")
        .select("doc_id", D.simhash64_bit_sums(F.col("text")).alias("s"))
        .repartition("doc_id")
    )
    sigs = sums.select(
        "doc_id", D.simhash64_bands_from_sums(F.col("s")).alias("bands")
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r.id1, r.id2)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            D.band_hamming(F.col("a.bands"), F.col("b.bands")).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute
    assert len(banded) > 0


def test_blocked_fuzzy_full_recall_when_uncapped(spark):
    """At sf0.001 every blocking band's bucket (150 rows) is under the
    DF cap, so the blocked matcher must reproduce the all-pairs
    levenshtein result exactly -- blocking trades recall only through
    the explicit cap, never silently."""
    from discogs_xml_to_parquet_spark import registry
    from pyspark.sql import functions as F
    from discogs_xml_to_parquet_spark.tables import load
    from tests.conftest import SF_ORACLE

    blocked = {
        (r.id1, r.id2, r.edit_dist)
        for r in registry.QUERIES["q_fuzzy_blocked"](spark, SF_ORACLE).collect()
    }
    c = load(spark, SF_ORACLE, "customer").select("c_custkey", "c_name")
    a, b = c.alias("a"), c.alias("b")
    brute = {
        (r.id1, r.id2, r.edit_dist)
        for r in a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("id1"),
            F.col("b.c_custkey").alias("id2"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
        .collect()
    }
    assert blocked == brute
    assert len(blocked) > 0


def test_blocked_fuzzy_recall_on_length_changing_pairs(spark):
    """The r3 verdict's gap: indel pairs whose lengths differ by 1-2
    must be recalled by the length-changing pass. Synthetic fixture of
    insert/delete/mixed edits at varied positions INCLUDING the last 3
    characters -- a trailing append/delete shifts every suffix band, so
    only the pass-2 prefix lane (r4 ADVICE fix) can recall it. Edits
    never touch both the first and last band at once (the documented
    residual of positional blocking); blocked must equal all-pairs."""
    from pyspark.sql import functions as F
    from discogs_xml_to_parquet_spark.queries.matching import blocked_pairs_df

    base = [
        "Customer#000000017",
        "Customer#000000940",
        "Aldebaran Trading Co",
        "Zanzibar Shipping Ltd",
    ]
    variants = []
    for i, name in enumerate(base):
        variants.append((100 * i, name))
        variants.append((100 * i + 1, name[:5] + name[6:]))          # del, mid-left
        variants.append((100 * i + 2, name[:10] + "X" + name[10:]))  # ins, middle
        variants.append((100 * i + 3, name[:4] + name[6:]))          # del x2
        variants.append((100 * i + 4, name[:8] + "QQ" + name[8:]))   # ins x2
        # indel + substitution: delete mid, substitute a later char
        variants.append((100 * i + 5, (name[:5] + name[6:])[:12] + "Z"
                         + (name[:5] + name[6:])[13:]))
        # trailing edits (r4 ADVICE): the most common real-world case
        variants.append((100 * i + 6, name + "X"))                   # append
        variants.append((100 * i + 7, name[:-1]))                    # del last
        variants.append((100 * i + 8, name[:-3] + name[-2:]))        # del in last 3
        variants.append((100 * i + 9, name + "XY"))                  # append x2
    c = spark.createDataFrame(variants, "c_custkey INT, c_name STRING")
    blocked = {
        (r.id1, r.id2, r.edit_dist)
        for r in blocked_pairs_df(c).collect()
    }
    a, b = c.alias("a"), c.alias("b")
    brute = {
        (r.id1, r.id2, r.edit_dist)
        for r in a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("id1"),
            F.col("b.c_custkey").alias("id2"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 2)
        .collect()
    }
    length_changing = {
        (i1, i2) for i1, i2, _ in brute
    } & {
        (r.id1, r.id2)
        for r in a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("id1"),
            F.col("b.c_custkey").alias("id2"),
        )
        .filter(F.length(F.col("a.c_name")) != F.length(F.col("b.c_name")))
        .collect()
    }
    assert len(length_changing) >= 8, "fixture must exercise the indel lane"
    assert blocked == brute

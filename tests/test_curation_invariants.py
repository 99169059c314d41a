"""Structural invariants of the round-3 curation operators -- the
properties the oracle's value-hash can't state directly (exact cover,
contiguity, conservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_ORACLE

registry.load_all_queries()


def test_shuffle_is_exact_permutation(spark):
    """Deterministic shuffle must be a permutation: every doc exactly
    once, shard in [0, 16), positions contiguous 1..n per shard."""
    docs = load(spark, SF_ORACLE, "documents")
    out = registry.QUERIES["q_shuffle_deterministic"](spark, SF_ORACLE)
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    rng = out.agg(F.min("shard"), F.max("shard")).first()
    assert rng[0] >= 0 and rng[1] <= 15
    per_shard = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("pos").alias("maxpos"),
        F.min("pos").alias("minpos"),
    )
    bad = per_shard.filter(
        (F.col("maxpos") != F.col("cnt")) | (F.col("minpos") != 1)
    ).count()
    assert bad == 0


def test_packing_conserves_docs_and_tokens(spark):
    """The packing manifest must conserve the corpus: total docs and
    total tokens across all (shard, seq) cells equal the source."""
    docs = load(spark, SF_ORACLE, "documents")
    src = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("tok"),
    ).first()
    out = registry.QUERIES["q_pack_sequences"](spark, SF_ORACLE)
    got = out.agg(F.sum("n_docs"), F.sum("sum_tokens")).first()
    assert got[0] == src["n"]
    assert got[1] == src["tok"]


def test_greedy_pack_conserves_and_bounds(spark):
    """The boundary-preserving packer (r14): conservation (every doc
    and token in exactly one bin), the capacity contract (a bin over
    CAPACITY tokens can only be a singleton oversize document -- no
    multi-doc bin may overflow), the greedy tightness property (no
    bin except the last of its shard could have accepted the FIRST
    doc of the next bin -- otherwise the scan wasn't greedy), and
    non-degeneracy (some bin actually holds >1 doc)."""
    from discogs_xml_to_parquet_spark.queries.packing import CAPACITY

    docs = load(spark, SF_ORACLE, "documents")
    src = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("tok"),
    ).first()
    out = registry.QUERIES["q_pack_greedy"](spark, SF_ORACLE)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == src["n"]
    assert sum(r["sum_tokens"] for r in rows) == src["tok"]
    overfull_multi = [
        r for r in rows
        if r["sum_tokens"] > CAPACITY and r["n_docs"] > 1
    ]
    assert not overfull_multi, overfull_multi
    assert any(r["n_docs"] > 1 for r in rows)
    # bin ids are contiguous 0..max per shard
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["bin_id"])
    for shard, ids in by_shard.items():
        assert sorted(ids) == list(range(len(ids))), shard


def test_gopher_keep_iff_no_reasons(spark):
    """keep must be exactly 'no rule fired' -- and both sides of the
    filter must be non-empty at the test SF (vacuity guard)."""
    out = registry.QUERIES["q_quality_gopher_filter"](spark, SF_ORACLE)
    assert out.filter(
        F.col("keep") != (F.col("drop_reasons") == "")
    ).count() == 0
    assert out.filter("keep").count() > 0
    assert out.filter(~F.col("keep")).count() > 0


def test_entity_resolution_conserves_customers(spark):
    """Multi-record entities plus implied singletons must cover the
    customer table exactly once (entities are disjoint by construction
    of connected components)."""
    n_customers = load(spark, SF_ORACLE, "customer").count()
    out = registry.QUERIES["q_entity_resolution"](spark, SF_ORACLE)
    agg = out.agg(
        F.sum("n_records").alias("merged"), F.count(F.lit(1)).alias("ents")
    ).first()
    merged = agg["merged"] or 0
    n_entities = agg["ents"]
    # every merged record is one customer; the rest are singletons
    assert merged <= n_customers
    assert n_entities <= merged // 2 if merged else n_entities == 0
    # canonical id is a member (min) -> entity_id must be a real custkey
    keys = load(spark, SF_ORACLE, "customer").select("c_custkey")
    orphans = out.join(
        keys, out["entity_id"] == keys["c_custkey"], "left_anti"
    ).count()
    assert orphans == 0


def test_kmeans_update_shape(spark):
    """The Lloyd update must emit exactly one cell per (cluster, dim)
    for every non-empty cluster, dims 0..63."""
    out = registry.QUERIES["q_kmeans_update"](spark, SF_ORACLE)
    rows = out.collect()
    clusters = {r["cluster_id"] for r in rows}
    assert clusters  # at least one non-empty cluster
    for c in clusters:
        dims = sorted(r["dim"] for r in rows if r["cluster_id"] == c)
        assert dims == list(range(64))


def test_keep_filter_equals_metrics_filter(spark):
    """gopher_keep_filter's cross-multiplied bind-once predicate must
    select exactly the docs that GOPHER_KEEP_PRED / gopher_keep_col
    select over the divided metrics (floor(x/b)<=k iff x<(k+1)b)."""
    from discogs_xml_to_parquet_spark.queries.quality import (
        gopher_keep_col,
        gopher_keep_filter,
        gopher_metrics,
    )

    d = load(spark, SF_ORACLE, "documents")
    via_filter = {
        r["doc_id"] for r in gopher_keep_filter(d).select("doc_id").collect()
    }
    via_metrics = {
        r["doc_id"]
        for r in gopher_metrics(d)
        .filter(gopher_keep_col())
        .select("doc_id")
        .collect()
    }
    assert via_filter == via_metrics
    assert via_filter  # non-vacuous


def test_bloom_decontam_never_misses_exact_hits(spark):
    """Bloom membership admits false POSITIVES only: every doc the
    exact n-gram check flags must also be flagged by the bloom lane,
    and each flagged doc's bloom gram count must be >= its exact
    count. (The reverse containment is where the bounded FP rate
    lives -- deliberately unasserted.)"""
    exact = registry.QUERIES["q_decontaminate_ngram"](spark, SF_ORACLE)
    bloom = registry.QUERIES["q_decontaminate_bloom"](spark, SF_ORACLE)
    e = {r["doc_id"]: r["n_shared_grams"] for r in exact.collect()}
    b = {r["doc_id"]: r["n_flagged_grams"] for r in bloom.collect()}
    assert e, "exact decontamination found nothing -- vacuous fixture"
    missing = set(e) - set(b)
    assert not missing, f"bloom missed exact hits: {sorted(missing)}"
    under = {d for d, n in e.items() if b[d] < n}
    assert not under, f"bloom under-counted flagged grams: {sorted(under)}"


def test_train_test_split_proportions_and_totality(spark):
    """The three splits must partition the corpus (counts sum to the
    table count) at ~80/10/10: md5 is uniform enough that each split's
    share stays within 5 points of its target on 500+ docs."""
    d = load(spark, SF_ORACLE, "documents")
    total = d.count()
    rows = {
        r["split"]: r["n_docs"]
        for r in registry.QUERIES["q_train_test_split"](
            spark, SF_ORACLE
        ).collect()
    }
    assert sum(rows.values()) == total
    for split, target in (("train", 0.80), ("valid", 0.10), ("test", 0.10)):
        share = rows.get(split, 0) / total
        assert abs(share - target) < 0.05, (split, share)


def test_cdc_apply_drops_deleted_keys_and_conserves_the_rest(spark):
    """Compaction must emit exactly the keys whose LATEST op is not a
    delete, once each; per-key op depth must sum to the changelog
    length."""
    ev = load(spark, SF_ORACLE, "events")
    state = registry.QUERIES["q_cdc_apply"](spark, SF_ORACLE)
    rows = state.collect()
    assert len(rows) == len({r["user_id"] for r in rows})  # one per key
    assert all(r["last_op"] != "error" for r in rows)
    # depth conservation: n_ops of surviving keys + ops of deleted keys
    # == total changelog length
    per_key = {
        r["user_id"]: r["cnt"]
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert r["n_ops"] == per_key[r["user_id"]]

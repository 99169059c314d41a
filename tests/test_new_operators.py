"""Invariant tests for the round-5 operators, beyond the oracle
compare: each pins a semantic property the DuckDB mirror could share a
bug with (the oracle proves Spark==DuckDB; these prove both equal the
DEFINITION)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE

registry.load_all_queries()


def test_chunks_cover_and_tile_tokens(spark):
    """Chunking definition: per doc, chunk_no is dense from 0, every
    chunk has 1..16 tokens, only the LAST chunk may be short of the
    stride, and total coverage (sum of per-chunk tokens minus the
    overlaps) reconstructs the doc's token count."""
    rows = (
        registry.QUERIES["q_chunk_documents"](spark, SF_SMOKE)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_no").alias("max_no"),
            F.sum("n_chunk_tokens").alias("sum_tok"),
            F.min("n_chunk_tokens").alias("min_tok"),
            F.max("n_chunk_tokens").alias("max_tok"),
        )
        .collect()
    )
    d = load(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split("text", r"\s+"), lambda t: t != "")
        ).alias("n_tok"),
    )
    n_tok = {r["doc_id"]: r["n_tok"] for r in d.collect()}
    assert rows
    for r in rows:
        n = n_tok[r["doc_id"]]
        assert r["max_no"] == r["n_chunks"] - 1  # dense numbering
        assert 1 <= r["min_tok"] and r["max_tok"] <= 16
        # starts at 0, 12, 24, ...: k full strides + a last chunk of
        # n - 12*(k-1) tokens capped at 16 -> sum identity:
        starts = list(range(0, n, 12))
        expect_sum = sum(min(16, n - s) for s in starts)
        assert r["n_chunks"] == len(starts)
        assert r["sum_tok"] == expect_sum


def test_sessionize_matches_bruteforce(spark):
    """Session assignment equals a per-user Python sweep over the
    sorted event times (gap > 30 min starts a new session)."""
    out = {
        (r["user_id"], r["session_no"]): r["n_events"]
        for r in registry.QUERIES["q_sessionize_events"](
            spark, SF_SMOKE
        ).collect()
    }
    ev = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    expect: dict[tuple, int] = {}
    for uid, rows in by_user.items():
        rows.sort()
        sess, prev = 0, None
        for ts, _eid in rows:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sess += 1
            expect[(uid, sess)] = expect.get((uid, sess), 0) + 1
            prev = ts
    assert out == expect


def test_pagerank_conserves_mass(spark):
    """Fixed-point PageRank invariants on the full rank vector (not
    the top-K projection): every rank positive, and total mass within
    the floor-leak bound of SCALE (each of the N nodes loses < 1 unit
    per integer division; 3 divisions deep per iteration)."""
    from discogs_xml_to_parquet_spark.queries.graph_iter import (
        _ITERS,
        _SCALE,
    )

    li = load(spark, SF_SMOKE, "lineitem")
    o_node = F.col("l_orderkey") * 2
    p_node = F.col("l_partkey") * 2 + 1
    edges = (
        li.select(o_node.alias("src"), p_node.alias("dst"))
        .union(li.select(p_node.alias("src"), o_node.alias("dst")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    nn = outdeg.agg(F.count(F.lit(1)).alias("n"))
    ranks = outdeg.crossJoin(F.broadcast(nn)).selectExpr(
        "src AS node", f"CAST({_SCALE} div n AS BIGINT) AS r"
    )
    ewd = edges.join(
        outdeg.withColumnRenamed("src", "node"),
        edges["src"] == F.col("node"),
    ).select("src", "dst", "odeg")
    for _ in range(_ITERS):
        contrib = (
            ewd.join(ranks, ewd["src"] == ranks["node"])
            .selectExpr("dst", "r div odeg AS part")
            .groupBy("dst")
            .agg(F.sum("part").alias("s"))
        )
        ranks = (
            outdeg.crossJoin(F.broadcast(nn))
            .join(contrib, outdeg["src"] == contrib["dst"], "left")
            .selectExpr(
                "src AS node",
                f"CAST((15 * ({_SCALE} div n)) div 100"
                " + (85 * COALESCE(s, 0)) div 100 AS BIGINT) AS r",
            )
        )
    agg = ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r").alias("total"),
        F.min("r").alias("mn"),
    ).collect()[0]
    assert agg["mn"] > 0
    # per iteration each node floors ~3 times (contrib, damp, teleport)
    leak_bound = 4 * _ITERS * agg["n"]
    assert _SCALE - leak_bound <= agg["total"] <= _SCALE
    # and the registered query's top-K is a projection of this vector
    top = registry.QUERIES["q_pagerank_bipartite"](spark, SF_SMOKE).collect()
    full = {r["node"]: r["r"] for r in ranks.collect()}
    for row in top:
        tag, num = row["node"][0], int(row["node"][1:])
        key = num * 2 if tag == "o" else num * 2 + 1
        assert full[key] == row["rank_scaled"]


def test_scd2_row_cardinality_and_currency(spark):
    """SCD2 definition: exactly one is_current row per key; updated
    keys (custkey % 10 == 3) carry exactly one closed-out row whose
    valid_to equals the new row's valid_from; untouched keys carry
    exactly one row total."""
    out = registry.QUERIES["q_scd2_merge"](spark, SF_SMOKE)
    per_key = (
        out.groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("is_current").cast("int")).alias("n_current"),
        )
        .collect()
    )
    for r in per_key:
        assert r["n_current"] == 1
        assert r["n_rows"] == (2 if r["c_custkey"] % 10 == 3 else 1)
    closed = out.filter(~F.col("is_current")).collect()
    fresh = {
        r["c_custkey"]: r
        for r in out.filter(
            F.col("is_current") & (F.col("c_custkey") % 10 == 3)
        ).collect()
    }
    assert closed and len(closed) == len(fresh)
    for r in closed:
        assert r["valid_to"] == fresh[r["c_custkey"]]["valid_from"]


def test_stats_moments_match_numpy(spark):
    """The fixed-point moment statistics agree with numpy's float64
    population formulas to ~1e-9 relative (the 0.01-unit quantization
    of the inputs is exact, so the only divergence is double
    rounding in the final arithmetic)."""
    out = {
        r["l_returnflag"]: r
        for r in registry.QUERIES["q_stats_moments"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_quantity"], r["l_extendedprice"])
        )
    for flag, pairs in groups.items():
        q = np.array([p[0] for p in pairs])
        p = np.array([p[1] for p in pairs])
        got = out[flag]
        assert got["n_rows"] == len(pairs)
        np.testing.assert_allclose(
            got["corr_qty_price"], np.corrcoef(q, p)[0, 1], rtol=1e-9
        )
        np.testing.assert_allclose(
            got["covar_pop_qty_price"], np.cov(q, p, bias=True)[0, 1],
            rtol=1e-9,
        )
        np.testing.assert_allclose(
            got["stddev_pop_price"], p.std(), rtol=1e-9
        )
        m = p.mean()
        skew = ((p - m) ** 3).mean() / (((p - m) ** 2).mean()) ** 1.5
        np.testing.assert_allclose(got["skew_price"], skew, rtol=1e-8)


def test_bpe_encode_merge_semantics(spark):
    """The encoding algorithm's two load-bearing edge cases, pinned
    engine-side (the oracle pins cross-engine equality; this pins the
    SEMANTICS): overlapping pairs resolve leftmost-first
    (aaa + (a,a) -> [aa, a]), and multi-level merges chain in rank
    order (order -> one symbol through 4 merges)."""
    from pyspark.sql import functions as F

    from discogs_xml_to_parquet_spark.queries.tokenize import _enc_sql

    df = spark.createDataFrame(
        [("aaa",), ("order",), ("spark",), ("zzz",)], ["word"])
    got = {
        r["word"]: r["enc"]
        for r in df.withColumn("enc", F.expr(_enc_sql("word"))).collect()
    }
    assert got["zzz"] == ",zz,z,"      # leftmost, non-overlapping
    assert got["order"] == ",order,"   # 4-merge chain fires fully
    assert got["spark"] == ",spark,"
    assert got["aaa"] == ",a,a,a,"     # no merge applies -> untouched


def test_blocked_sampling_contract(spark):
    """Block sampling vs block purging (r13): on a corpus dense enough
    that buckets cross the cap, purging collapses to zero pairs while
    sampling still recovers true pairs; every sampled pair is a true
    <=2-edit pair; and sampled output is a SUPERSET of purged output
    on any corpus (under-cap buckets keep every member)."""
    from pyspark.sql import functions as F

    from discogs_xml_to_parquet_spark.queries.matching import (
        blocked_pairs_df,
    )

    # 120 dense names -> with cap=5 every digit band is over-cap
    dense = spark.createDataFrame(
        [(i, "Customer#%09d" % i) for i in range(120)],
        ["c_custkey", "c_name"],
    )
    purged = blocked_pairs_df(dense, keep_cap=5).count()
    sampled_rows = blocked_pairs_df(dense, keep_cap=5, sampled=True)
    sampled = sampled_rows.count()
    assert purged == 0          # the measured sf10 cliff, in miniature
    assert sampled > 0          # graceful degradation recovers pairs
    # soundness: every recovered pair is a true <=2-edit pair
    assert sampled_rows.filter(F.col("edit_dist") > 2).count() == 0

    # superset on a mixed corpus at the production cap: under-cap
    # buckets keep all members, so purged pairs all survive sampling
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    p = {(r["id1"], r["id2"])
         for r in blocked_pairs_df(c).select("id1", "id2").collect()}
    s = {(r["id1"], r["id2"])
         for r in blocked_pairs_df(c, sampled=True)
         .select("id1", "id2").collect()}
    assert p and p <= s

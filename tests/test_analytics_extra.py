"""Invariant tests for analytics_extra: brute-force recomputation of
each definition in plain Python at sf0.001 (the oracle proves
Spark==DuckDB; these prove both equal the definition)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark import registry
from discogs_xml_to_parquet_spark.tables import load
from tests.conftest import SF_SMOKE

registry.load_all_queries()


def _edges(spark):
    rows = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in rows:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        capped = sorted(parts)[:8]
        for i, u in enumerate(capped):
            for v in capped[i + 1 :]:
                edges.add((u, v))
    return edges


def test_triangle_count_bruteforce(spark):
    """Degree-oriented count equals the a<b<c enumeration."""
    edges = _edges(spark)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    tri = sum(
        1
        for (u, v) in edges
        for w in adj[v]
        if w in adj[u]
    )
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    row = registry.QUERIES["q_triangle_count"](spark, SF_SMOKE).collect()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert tri > 0  # non-vacuous


def test_pareto_frontier_dominance(spark):
    """No frontier cell is dominated; every non-frontier cell is."""
    cells = {}
    for r in load(spark, SF_SMOKE, "part").select(
        "p_retailprice", "p_size"
    ).collect():
        key = (r["p_retailprice"], r["p_size"])
        cells[key] = cells.get(key, 0) + 1

    def dominated(c):
        return any(
            d[0] <= c[0] and d[1] >= c[1] and d != c for d in cells
        )

    expect = {c: n for c, n in cells.items() if not dominated(c)}
    out = registry.QUERIES["q_pareto_frontier"](spark, SF_SMOKE).collect()
    got = {(r["price"], r["size"]): r["n_parts"] for r in out}
    assert got == expect
    assert 0 < len(got) < len(cells)


def test_equidepth_histogram_definition(spark):
    """Buckets tile the value domain in order, tie-groups stay whole,
    and per-bucket counts match the disc-boundary rule."""
    prices = [
        r["l_extendedprice"]
        for r in load(spark, SF_SMOKE, "lineitem")
        .select("l_extendedprice")
        .collect()
    ]
    n = len(prices)
    counts = defaultdict(int)
    for p in prices:
        counts[p] += 1
    expect = defaultdict(lambda: [0, 0, None, None])  # rows, distinct, mn, mx
    c = 0
    for p in sorted(counts):
        c += counts[p]
        b = 1 + sum(1 for k in range(1, 10) if (k * n + 9) // 10 < c)
        e = expect[b]
        e[0] += counts[p]
        e[1] += 1
        e[2] = p if e[2] is None else min(e[2], p)
        e[3] = p if e[3] is None else max(e[3], p)
    out = registry.QUERIES["q_histogram_equidepth"](spark, SF_SMOKE).collect()
    got = {
        r["bucket"]: [r["n_rows"], r["n_distinct"], r["min_price"], r["max_price"]]
        for r in out
    }
    assert got == {b: list(v) for b, v in expect.items()}
    assert len(got) == 10
    # equi-depth: every bucket within one tie-group's mass of n/10
    assert max(v[0] for v in got.values()) >= n // 10


def test_session_window_builtin_matches_sweep(spark):
    """Native session_window sessions equal the per-user gap sweep
    (gap >= 30 min splits), with window = [min_ts, max_ts + 30 min)."""
    ev = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    expect = set()
    for uid, rows in by_user.items():
        rows.sort()
        sess = []
        for ts, eid in rows:
            if sess and (ts - sess[-1][0]).total_seconds() < 1800:
                sess.append((ts, eid))
            else:
                if sess:
                    expect.add(_summ(uid, sess))
                sess = [(ts, eid)]
        expect.add(_summ(uid, sess))
    out = registry.QUERIES["q_session_window_builtin"](spark, SF_SMOKE).collect()
    got = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            r["first_event_id"],
        )
        for r in out
    }
    assert got == expect


def _summ(uid, sess):
    from datetime import timedelta

    return (
        uid,
        sess[0][0],
        sess[-1][0] + timedelta(minutes=30),
        len(sess),
        min(e for _, e in sess),
    )

"""split_top_level_ctes (r13): the 100x verification lane executes
big oracles CTE-by-CTE as temp tables (DuckDB's planner re-inlines the
3-round PageRank chain into a >50 GB spill at 120M edges; the same
stages materialized stepwise run in ~30 s). The splitter must parse
only the TOP paren level and the materialized execution must be
result-identical to the monolithic one."""

from __future__ import annotations

from discogs_xml_to_parquet_spark import registry
from tests.conftest import SF_SMOKE
from tests.oracle_utils import duckdb_conn, split_top_level_ctes

registry.load_all_queries()


def _both_ways(sql: str):
    con = duckdb_conn(SF_SMOKE)
    mono = con.execute(sql).fetchall()
    con.close()
    parts, final = split_top_level_ctes(sql)
    con = duckdb_conn(SF_SMOKE)
    for name, body in parts:
        con.execute(f"CREATE TEMP TABLE {name} AS {body}")
    step = con.execute(final).fetchall()
    con.close()
    return mono, step, parts


def test_pagerank_oracle_splits_and_matches():
    mono, step, parts = _both_ways(
        registry.ORACLES["q_pagerank_bipartite"])
    assert [n for n, _ in parts][:4] == ["edges", "outdeg", "nn", "r0"]
    assert len(parts) == 4 + 2 * 3  # prep + (c_k, r_k) per round
    assert mono == step and len(mono) > 0


def test_nested_paren_oracle_splits_and_matches():
    """q_stats_mad's oracle nests subqueries (windows inside derived
    tables) -- the depth scan must not split inside them."""
    mono, step, parts = _both_ways(registry.ORACLES["q_stats_mad"])
    assert len(parts) >= 2
    assert mono == step and len(mono) > 0

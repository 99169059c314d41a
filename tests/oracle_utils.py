"""Local mirror of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares row count, column names, and cell values
order-insensitively (columns sorted by name, rows sorted by their
normalized string form) -- a stricter local stand-in for the driver's
value-hash so that CORRECTNESS_r{N} results are predictable.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb

from discogs_xml_to_parquet_spark.tables import TABLES

# Driver-exact normalization (VERDICT r1 item 2): the round-1 mirror
# coerced Decimal->float and rounded floats to 6 significant digits, which
# masked two driver hash failures (Decimal vs double, int vs float). The
# driver compares cells exactly and type-sensitively, so the mirror must
# too: Decimal keeps its own tag+repr, floats compare by full repr, and an
# int-vs-float split is a mismatch.


def _norm_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, _decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0:
            v = 0.0
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_norm_cell(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(
    spark, sf_dir: str, query_fn, oracle: str, name: str = "?", allow_empty: bool = False
) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    cur = con.execute(oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if not allow_empty:
        # A 0-row green verifies nothing (VERDICT r1: q_string_funcs was
        # vacuously green on an empty set). Queries that may legitimately
        # be empty must opt in explicitly.
        assert len(s_rows) > 0, f"{name}: vacuous oracle check -- both sides empty"
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")

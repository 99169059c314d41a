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
import os

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
    # Oracle-side memory ceiling (r13): DuckDB's default (80% of RAM)
    # is right for the driver gate's sf0.01 tables, but the 100x
    # verification corpus (scripts/sf1_verify.py --corpus 100) runs
    # 120M-row iterative oracles in a container whose disk cannot
    # absorb a full spill -- the knob lets that lane trade spill for
    # RAM explicitly without touching the gate's defaults.
    mem = os.environ.get("SPARK_GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# --- Oracle result-type lint (VERDICT r3 item 2) ---------------------
#
# The driver hashes values fetched through Arrow, where engine types
# survive even when plain-Python fetch collapses them: DuckDB HUGEINT
# (the result type of SUM(BIGINT)) arrives as decimal128(38,0) ->
# Decimal cells, while Spark's bigint arrives as int -- identical
# values, different hash. _norm_cell above is structurally blind to
# that class (both sides fetch as Python int), so we lint at the TYPE
# level instead: DESCRIBE the oracle in DuckDB (plans without
# executing) and require every result column's DuckDB type to map
# exactly onto the Spark dtype. This would have caught the r1
# q_filter_project/q_map_funcs failures and the r3 q_sample_stratified
# failure before the driver did.

# Driver-hash type FAMILIES, calibrated against three rounds of
# CORRECTNESS evidence. Queries that are driver-GREEN with Spark int
# vs DuckDB BIGINT (q_window_rank_dense r2, q_text_stats r2,
# q_ann_lsh_probe r3) prove integer widths collapse in the hash;
# queries that FAILED with identical values (q_filter_project r1
# Decimal-vs-double, q_sample_stratified r3 HUGEINT-vs-bigint) prove a
# decimal-vs-native split does not. DuckDB JSON exports as VARCHAR in
# Arrow (q_json_struct green r2), so it lives in the string family.
# HUGEINT has NO family: it crosses Arrow as decimal128(38,0) and must
# always be cast in the oracle.
_DUCK_FAMILY = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int",
    "TINYINT": "int", "UBIGINT": "int", "UINTEGER": "int",
    "USMALLINT": "int", "UTINYINT": "int",
    "DOUBLE": "float", "FLOAT": "float", "REAL": "float",
    "VARCHAR": "str", "JSON": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "bytes",
}
_SPARK_FAMILY = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts",
    "binary": "bytes",
}


def _family(typ: str, table: dict) -> str | None:
    typ = typ.strip()
    if typ.endswith("[]"):  # DuckDB list
        inner = _family(typ[:-2], table)
        return None if inner is None else f"list<{inner}>"
    if typ.startswith("array<") and typ.endswith(">"):  # Spark array
        inner = _family(typ[len("array<"):-1], table)
        return None if inner is None else f"list<{inner}>"
    if typ.upper().startswith("DECIMAL"):
        # exact precision+scale must agree: Decimal cells hash by repr
        return "decimal" + typ[len("decimal"):].replace(" ", "").lower()
    return table.get(typ)


def lint_oracle_types(spark, sf_dir: str, query_fn, oracle: str,
                      name: str = "?") -> list[str]:
    """Return a list of per-column type-mismatch descriptions (empty =
    clean). Plans both sides without executing the full query: Spark
    analyzes the DataFrame for its schema; DuckDB DESCRIBEs the
    oracle."""
    s_dtypes = dict(query_fn(spark, sf_dir).dtypes)
    con = duckdb_conn(sf_dir)
    try:
        d_rows = con.execute(f"DESCRIBE {oracle}").fetchall()
    finally:
        con.close()
    problems = []
    for col, duck_type, *_ in d_rows:
        spark_type = s_dtypes.get(col)
        if spark_type is None:
            continue  # column-name mismatch is compare()'s job
        d_fam = _family(duck_type, _DUCK_FAMILY)
        s_fam = _family(spark_type, _SPARK_FAMILY)
        if d_fam is None:
            problems.append(
                f"{name}.{col}: DuckDB {duck_type} has no driver-safe "
                f"hash family (spark={spark_type}) -- CAST it in the "
                f"oracle"
            )
        elif s_fam is None:
            problems.append(
                f"{name}.{col}: Spark {spark_type} has no driver-safe "
                f"hash family (duckdb={duck_type})"
            )
        elif d_fam != s_fam:
            problems.append(
                f"{name}.{col}: hash-family mismatch DuckDB "
                f"{duck_type} ({d_fam}) vs Spark {spark_type} ({s_fam})"
            )
    return problems


def split_top_level_ctes(sql: str) -> tuple[list[tuple[str, str]], str]:
    """`WITH a AS (...), b AS (...) SELECT ...` -> ([(name, body)...],
    final_select), by paren-depth scan of the TOP level only (nested
    WITHs stay inside their body). Used by the 100x verification lane
    to execute each CTE as a temp table: DuckDB's planner re-inlines a
    deep multi-reference CTE chain (the 3-round PageRank oracle) into
    a plan that spills >50 GB at 120M edges, while the same stages
    materialized stepwise run in ~30 s. Only safe for oracles whose
    string literals contain no parens -- the callers opt in per query."""
    s = sql.strip()
    assert s[:4].upper() == "WITH", "oracle does not start with WITH"
    i = 4
    ctes: list[tuple[str, str]] = []
    while True:
        while s[i] in " \n\t,":
            i += 1
        j = i
        while s[j] not in " \n\t":
            j += 1
        cte_name = s[i:j]
        k = s.index("(", j)
        depth, m = 0, k
        while True:
            if s[m] == "(":
                depth += 1
            elif s[m] == ")":
                depth -= 1
                if depth == 0:
                    break
            m += 1
        ctes.append((cte_name, s[k + 1:m]))
        m += 1
        while s[m] in " \n\t":
            m += 1
        if s[m] == ",":
            i = m + 1
        else:
            return ctes, s[m:]


def compare(
    spark, sf_dir: str, query_fn, oracle: str, name: str = "?",
    allow_empty: bool = False, materialize_ctes: bool = False,
) -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    if materialize_ctes:
        parts, final = split_top_level_ctes(oracle)
        for cte_name, body in parts:
            con.execute(f"CREATE TEMP TABLE {cte_name} AS {body}")
        cur = con.execute(final)
    else:
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

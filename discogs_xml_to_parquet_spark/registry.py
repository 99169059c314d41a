"""Named-query registry: the driver contract surface.

Every implemented operator registers a named query callable
(spark, sf_dir) -> DataFrame and, where SQL-expressible, a DuckDB oracle
SQL string computing the same result on the same parquet tables.

Determinism rules (the driver hash-compares values order-insensitively
but cell-exactly):

- Alias every computed column identically in Spark and SQL.
- Never output raw floating aggregates of doubles: sum/avg of doubles is
  order-dependent across engines. Instead round each addend to a scaled
  64-bit integer, floor(x * 1e6 + 0.5) (correctly-rounded IEEE ops,
  engine-independent), aggregate exactly (decimal(38,0) accumulator /
  DuckDB HUGEINT -- no overflow at scale), and unscale the final value
  to double -- bit-identical in both engines regardless of aggregation
  order. Use functions/exact.py dsum/davg and their documented mirrors.
- Never output raw timestamps; format to 'yyyy-MM-dd[ HH:mm:ss]' strings.
- Break all ordering ties with a unique key before any limit/rank.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; `oracle` is DuckDB SQL over the view names
    region nation customer supplier part orders lineitem events documents
    embeddings. Omit oracle only for genuinely non-SQL-expressible ops
    (the driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    """Import every query module so registration side effects run."""
    from discogs_xml_to_parquet_spark import queries as _q  # noqa: F401


# ---------------------------------------------------------------------------
# Driver-window rotation policy as code (VERDICT r6 item 6).
#
# The round driver checks the FIRST `size` registered queries (import
# order in queries/__init__.py). Which queries deserve those slots is a
# policy over the CORRECTNESS_r*.json artifacts: never-checked first,
# then changed-since-last-green, then oldest evidence. Until r6 that
# policy lived as hand-maintained docstring prose whose slot math
# drifted (commit 1c435de fixed one such drift); window() computes it,
# and tests/test_window.py pins that the import order agrees with it.
# ---------------------------------------------------------------------------


def _latest_green_round(
    artifacts_dir: str, max_round: int | None = None
) -> dict[str, int]:
    """query name -> most recent round with a green driver row
    (hash_match for oracle-backed queries, rows_match otherwise).
    Queries absent from every artifact are absent from the dict.
    `max_round` ignores artifacts from rounds AFTER it -- the
    derivation-pinning filter (VERDICT r8 item 1): a window derived
    from artifacts r1..rN stays reproducible after r(N+1)'s artifact
    lands."""
    import glob
    import json
    import os
    import re

    latest: dict[str, int] = {}
    for fp in glob.glob(os.path.join(artifacts_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", fp)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(fp) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = not row.get("err") and (
                row.get("hash_match")
                if row.get("hash_match") is not None
                else row.get("rows_match")
            )
            if green and rnd > latest.get(name, -1):
                latest[name] = rnd
    return latest


def _module_deps() -> dict[str, list[str]]:
    """Intra-package import edges between query modules, scanned from
    source with `ast` (ADVICE r7: the earlier regex captured only the
    first name of a multi-module `from ...queries import a, b`): if
    module A imports module B, importing A registers B's queries
    first, so a window containing A necessarily contains B."""
    import ast
    import os

    from discogs_xml_to_parquet_spark import queries as qpkg

    pkg = "discogs_xml_to_parquet_spark.queries"
    pkg_dir = os.path.dirname(qpkg.__file__)
    deps: dict[str, list[str]] = {}
    for fn in sorted(os.listdir(pkg_dir)):
        if not fn.endswith(".py") or fn == "__init__.py":
            continue
        mod = fn[:-3]
        with open(os.path.join(pkg_dir, fn)) as f:
            tree = ast.parse(f.read())
        hits: list[str] = []
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module:
                if node.module == pkg:
                    # from ...queries import a, b -> every alias is a
                    # sibling query module
                    hits += [a.name for a in node.names]
                elif node.module.startswith(pkg + "."):
                    # from ...queries.a import x -> module is `a`
                    hits.append(node.module[len(pkg) + 1:].split(".")[0])
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(pkg + "."):
                        hits.append(a.name[len(pkg) + 1:].split(".")[0])
        seen: set[str] = set()
        deps[mod] = [
            h for h in hits
            if not h.startswith("_") and h != mod
            and not (h in seen or seen.add(h))
        ]
    return deps


def window(
    size: int = 50,
    artifacts_dir: str | None = None,
    changed: frozenset[str] | set[str] = frozenset(),
    pin: tuple[str, ...] = (),
    max_round: int | None = None,
) -> list[str]:
    """Recommended driver-check order: the first `size` names are the
    round's window. Ranking is at MODULE granularity (import order is
    module-granular; a module enters the window whole, except that the
    cut may land mid-module exactly as the driver's first-`size` slice
    does), with a module's rank taken from its highest-priority member:

      0  a member has no green driver row in any artifact,
      1  a member is in `changed` (query code changed since its last
         green row -- not derivable from artifacts, so callers pass it),
      2  pinned modules (`pin`): documented policy exceptions, e.g. the
         conversion trio's max-3-rounds-unverified guarantee (VERDICT
         r5 item 6) which outranks plain evidence age,
      3  everything else, oldest latest-green round first.

    Ties preserve current registration order, which makes the import
    order a FIXED POINT of this function: if queries/__init__.py already
    agrees with the policy, window() returns exactly
    list(QUERIES)[:size] and tests/test_window.py stays green.

    `max_round` pins the derivation to the artifacts that existed when
    the order was derived (VERDICT r8 item 1: without it, the driver
    landing round N's artifact re-ranked the just-checked queries and
    turned the suite red at every judging point -- r7 and r8 both).
    tests/test_window.py passes its DERIVED_AT_ROUND constant here, so
    landing a NEWER artifact is invisible to the fixed-point test;
    re-deriving for the next round is a deliberate one-commit bump of
    that constant + the import order."""
    import os

    if artifacts_dir is None:
        artifacts_dir = os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
    latest = _latest_green_round(artifacts_dir, max_round=max_round)
    names = list(QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    mod_of = {
        n: fn.__module__.rsplit(".", 1)[-1] for n, fn in QUERIES.items()
    }
    mods: dict[str, list[str]] = {}
    for n in names:
        mods.setdefault(mod_of[n], []).append(n)

    def qkey(n: str) -> tuple[int, int, int]:
        if n not in latest:
            return (0, 0, pos[n])
        if n in changed:
            return (1, 0, pos[n])
        if mod_of[n] in pin:
            return (2, 0, pos[n])
        return (3, latest[n], pos[n])

    mkey = {m: min(qkey(n) for n in qs) for m, qs in mods.items()}
    deps = _module_deps()
    ordered_mods: list[str] = []
    emitted: set[str] = set()

    def emit(m: str) -> None:
        if m in emitted or m not in mods:
            return
        emitted.add(m)  # pre-mark: dependency cycles terminate
        for d in deps.get(m, []):
            emit(d)
        ordered_mods.append(m)

    for m in sorted(mods, key=lambda m: mkey[m]):
        emit(m)
    return [n for m in ordered_mods for n in mods[m]][:size]

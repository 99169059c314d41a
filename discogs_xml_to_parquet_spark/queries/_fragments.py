"""Shared DuckDB oracle fragments used by multiple queries.

The shared-fragment rule (round 1): any SQL mirror embedded in more
than one oracle must be built by exactly one function, or the copies
silently drift when one gets a semantics fix (the CC self-loop fix of
commit 3f4b0e0 had to touch every hand-copy that existed then).
"""

from __future__ import annotations


def cc_ctes(pairs: str = "near_dups", id1: str = "id1", id2: str = "id2",
            node_alias: str = "doc_id") -> str:
    """Recursive connected-components closure over an (id1, id2) pair
    relation: emits CTEs edges / reach / comp, where comp maps each
    paired node to the min node reachable from it. Callers label with
    LEAST(node, COALESCE(min_reach, node)). Requires WITH RECURSIVE."""
    return f"""edges AS (
  SELECT {id1} AS a, {id2} AS b FROM {pairs}
  UNION
  SELECT {id2}, {id1} FROM {pairs}
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS {node_alias}, MIN(b) AS min_reach FROM reach GROUP BY a)"""


def quality_score_expr(text_col: str = "text") -> str:
    """The heuristic quality score of operators/text.py quality_score,
    as one DuckDB expression: (unique-token ratio + capped length
    component) / 2, every float op in the same order as the Spark
    mirror so the doubles are bit-identical."""
    t = f"string_split({text_col}, ' ')"
    return (
        f"(len(list_distinct({t})) / len({t})"
        f" + least(len({t}) / 50.0, 1.0)) / 2"
    )

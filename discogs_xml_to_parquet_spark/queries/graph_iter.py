"""Iterative graph analytics as a statically-unrolled declarative
plan: PageRank over the bipartite order--part purchase graph.

Two things make this oracle-checkable where naive PageRank is not:

- FIXED-POINT INTEGER ARITHMETIC. Double-based PageRank sums
  contributions in engine-dependent order, so the last bits diverge.
  Here every rank is a 1e12-scaled BIGINT; contributions use integer
  division (Spark `div` == DuckDB `//` on positive values), damping is
  (85 * s) div 100, and sums of integers are exact in any order --
  both engines produce identical ranks, bit for bit.
- STATIC UNROLLING. The iteration count is fixed (3), so the whole
  computation is ONE DAG: Spark sees three self-similar join+agg
  stages (exchanges reused where identical), and the oracle is the
  same recurrence spelled as chained CTEs.

At 100 TB the unrolled form is exactly what a production run looks
like (rounds of join+agg over a checkpointed edge list); the fixpoint
variant with a convergence probe is operators/graph.py's CC loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from discogs_xml_to_parquet_spark.registry import query
from discogs_xml_to_parquet_spark.tables import load

_SCALE = 1_000_000_000_000  # 1e12: rank precision ~1e-12, sums < 9e18
_ITERS = 3
_TOP = 20


def _pagerank_oracle() -> str:
    # nodes are BIGINT-encoded (order -> 2k, part -> 2k+1): integer
    # join/shuffle keys are far cheaper than strings at every scale;
    # the human-readable label is reconstructed on the final top-K only
    ctes = [
        """edges AS (
  SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
  FROM lineitem
  UNION
  SELECT DISTINCT l_partkey * 2 + 1, l_orderkey * 2
  FROM lineitem
)""",
        "outdeg AS (SELECT src AS node, COUNT(*) AS odeg "
        "FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM outdeg)",
        f"r0 AS (SELECT node, CAST({_SCALE} // n AS BIGINT) AS r "
        "FROM outdeg, nn)",
    ]
    for k in range(1, _ITERS + 1):
        ctes.append(
            f"""c{k} AS (
  SELECT e.dst AS node, SUM(r.r // o.odeg) AS s
  FROM edges e
  JOIN outdeg o ON e.src = o.node
  JOIN r{k - 1} r ON e.src = r.node
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{k} AS (
  SELECT o.node,
         CAST((15 * ({_SCALE} // nn.n)) // 100
              + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
  FROM outdeg o CROSS JOIN nn
  LEFT JOIN c{k} c ON o.node = c.node
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'o' || CAST(node // 2 AS VARCHAR)
            ELSE 'p' || CAST(node // 2 AS VARCHAR) END AS node,
       r AS rank_scaled
FROM r{_ITERS}
ORDER BY rank_scaled DESC, node
LIMIT {_TOP}
"""
    )


@query("q_pagerank_bipartite", oracle=_pagerank_oracle())
def q_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) over the undirected bipartite
    order<->part graph, 1e12-fixed-point. Every node has outdeg >= 1
    (edges run both directions), so there is no dangling-mass term.
    Per iteration: one equi-join of the edge list against the rank
    vector and one sum-by-destination -- the canonical scale shape
    (never an adjacency collect, never a driver loop). The final top-K
    is a heap."""
    li = load(spark, sf_dir, "lineitem")
    o_node = F.col("l_orderkey") * 2
    p_node = F.col("l_partkey") * 2 + 1
    # materialize the deduped edge list ONCE: both outdeg and the
    # degree-annotated join below consume it, and without this boundary
    # each consumer re-runs the scan+union+distinct chain (measured
    # ~20% of the query at sf0.1). At 100 TB this is the edge-list
    # staging write every production PageRank starts from.
    edges = (
        li.select(o_node.alias("src"), p_node.alias("dst"))
        .union(li.select(p_node.alias("src"), o_node.alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("odeg"))
        .localCheckpoint()
    )
    nn = outdeg.agg(F.count(F.lit(1)).alias("n"))
    ranks = outdeg.crossJoin(F.broadcast(nn)).selectExpr(
        "src AS node", f"CAST({_SCALE} div n AS BIGINT) AS r"
    )
    # materialize degree-annotated edges too: every iteration's join
    # reads this frame (the per-round lineage would otherwise compound
    # -- the same reason the CC loop checkpoints).
    ewd = (
        edges.join(
            outdeg.withColumnRenamed("src", "node"),
            edges["src"] == F.col("node"),
        )
        .select("src", "dst", "odeg")
        .localCheckpoint()
    )
    for _ in range(_ITERS):
        contrib = (
            ewd.join(ranks, ewd["src"] == ranks["node"])
            .selectExpr("dst", "r div odeg AS part")
            .groupBy("dst")
            .agg(F.sum("part").alias("s"))
        )
        # The edge list is symmetric (both directions inserted), so
        # every node appears as a dst and contrib already covers the
        # full node set -- the oracle's rebuild-against-outdeg LEFT
        # JOIN is redundant here and dropping it removes one join per
        # round (~25% of the query; equivalence pinned by the oracle
        # and tests/test_new_operators.py). A general-graph PageRank
        # (dangling nodes / asymmetric edges) needs the outdeg rebuild.
        ranks = contrib.crossJoin(F.broadcast(nn)).selectExpr(
            "dst AS node",
            f"CAST((15 * ({_SCALE} div n)) div 100"
            " + (85 * s) div 100 AS BIGINT) AS r",
        )
    top = (
        ranks.select("node", F.col("r").alias("rank_scaled"))
        .selectExpr(
            "CASE WHEN node % 2 = 0 THEN 'o' || CAST(node div 2 AS STRING)"
            " ELSE 'p' || CAST(node div 2 AS STRING) END AS node",
            "rank_scaled",
        )
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(_TOP)
    )
    return top

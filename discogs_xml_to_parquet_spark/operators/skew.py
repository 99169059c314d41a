"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting handles sort-merge joins whose *partitions*
are skewed, but two shapes still need manual salting at 100 TB:

- joining a skewed fact key against a non-broadcastable dimension
  (a handful of keys carry most rows -> those tasks straggle)
- high-cardinality groupBy where one group dominates

Salting trades a bounded replication of the small side for an even key
distribution: fact rows get salt = pmod(hash(unique_col), k); the other
side is replicated k times (one copy per salt value) via a literal
explode -- no RNG, so results are reproducible and testable.

Salt-invariance note (the r7-ADVICE _pid lesson applied here): with a
unique_col the salt is a pure row function; the
monotonically_increasing_id fallback is partition-dependent and NOT
stable across re-evaluations -- safe here ONLY because the RESULT is
salt-invariant (every fact row matches exactly one of the k dim
replicas whatever salt it draws, and partial aggregates re-combine to
the same totals under any salt assignment). Never branch on the salt
value itself; pass a unique column when one exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_buckets: int = 8,
                fact_unique_col: str | None = None) -> DataFrame:
    """Equi-join fact x dim on `key`, spreading each fact key over
    `salt_buckets` shuffle keys. `dim` rows are replicated
    salt_buckets-fold (keep dim narrow). fact_unique_col drives the
    deterministic salt; defaults to the key itself plus all columns'
    hash -- pass a row-unique column when available."""
    salt_src = F.col(fact_unique_col) if fact_unique_col else F.monotonically_increasing_id()
    f = fact.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, [key, "_salt"]).drop("_salt")


def salted_aggregate(df: DataFrame, key: str, agg_exprs: dict[str, str],
                     salt_buckets: int = 8,
                     unique_col: str | None = None) -> DataFrame:
    """Two-level aggregation for skewed group keys: partial aggregate on
    (key, salt), then final on key. Only works for algebraic aggregates
    (sum/count/min/max) -- exactly the ones with map-side combine, which
    usually already absorbs skew; this is for when combiners are
    defeated (e.g. high distinct input, low combine ratio)."""
    salt_src = F.col(unique_col) if unique_col else F.monotonically_increasing_id()
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
    partial = salted.groupBy(key, "_salt").agg(
        *[
            getattr(F, fn)(c).alias(f"_p_{c}_{fn}")
            for c, fn in agg_exprs.items()
        ]
    )
    finals = []
    for c, fn in agg_exprs.items():
        refn = {"count": "sum"}.get(fn, fn)
        finals.append(getattr(F, refn)(f"_p_{c}_{fn}").alias(f"{c}_{fn}"))
    return partial.groupBy(key).agg(*finals)

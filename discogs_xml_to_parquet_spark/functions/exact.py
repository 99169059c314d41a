"""Cross-engine-deterministic aggregation of double columns.

Summing doubles is order-dependent; Spark's partial/final HashAggregate
and DuckDB's single-threaded scan would produce last-bit-different sums
and break the driver's value-hash compare. Fix: round each addend to a
DECIMAL(38,6) (deterministic per-row), aggregate exactly in decimal
(associative, order-free), and cast the final total back to double.
Both engines then produce bit-identical doubles in any execution order.

DuckDB oracle-side mirror of dsum(x):
    CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
and of davg(x):
    CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))

"""Cross-engine-deterministic aggregation of double columns.

Summing doubles is order-dependent; Spark's partial/final HashAggregate
and DuckDB's single-threaded scan would produce last-bit-different sums
and break the driver's value-hash compare. Fix: round each addend to a
scaled 64-bit integer, ``floor(x * 1e6 + 0.5)`` (IEEE multiply, add and
floor are correctly-rounded and engine-independent, so the per-row
integer is bit-identical in both engines), aggregate exactly, and
convert back to double at the end -- identical in any execution order.

The accumulator is DECIMAL(38,0), not BIGINT: per-row values stay on
Spark's compact-long Decimal fast path, while the 38-digit headroom
cannot overflow at any realistic scale (a BIGINT sum of 1e6-scaled
values would wrap around ~9.2e12 in unscaled units -- reachable at the
100 TB target; DuckDB's BIGINT sum widens to HUGEINT, mirroring the
headroom). Relative to round-1's per-row CAST(x AS DECIMAL(38,6)) this
is ~2-3x faster (no per-row BigDecimal construction from double) with
the same determinism guarantee; q1 went 2.5s -> 1.0s at sf0.1.

DuckDB oracle-side mirror of dsum(x):
    CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
and of davg(x):
    CAST(SUM(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
      / COUNT(*)
(the trailing divisions are left-associative double ops in both engines,
so the division order matches Spark's).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1_000_000


def scaled(col: Column | str) -> Column:
    """Per-row deterministic rounding of a double to a 1e-6-scaled
    BIGINT: floor(x * 1e6 + 0.5). Every op is correctly-rounded IEEE,
    so Spark and DuckDB produce the same integer for the same double.

    Per-row magnitude bound (ADVICE r3): Spark's floor() lands on LONG
    before the decimal(38,0) cast, so a single |x| > ~9.2e12 would wrap
    in Spark (non-ANSI) while DuckDB's CAST(floor(...) AS BIGINT)
    errors. The 38-digit headroom applies to the ACCUMULATOR only; rows
    must fit a scaled BIGINT. All monetary/metric columns here are
    |x| < 1e7, nowhere near the bound."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * float(_SCALE) + F.lit(0.5))


def unscale(col: Column) -> Column:
    """Exact integer total -> double, matching the DuckDB mirror's
    CAST(... AS DOUBLE) / 1000000 (both correctly rounded)."""
    return col.cast("double") / F.lit(float(_SCALE))


def dsum(col: Column | str) -> Column:
    return unscale(F.sum(scaled(col).cast("decimal(38,0)")))


def davg(col: Column | str) -> Column:
    return dsum(col) / F.count(F.lit(1))


def rev_sql(col: str) -> str:
    """The DuckDB oracle-side mirror of dsum(col), as ONE shared
    helper: the module-docstring snippet had been copy-pasted into
    seven query modules, so a future change to the micros-scaling
    contract would have had seven silent drift points. Generates the
    byte-identical expression the inline copies used."""
    return (f"CAST(SUM(CAST(floor({col} * {_SCALE} + 0.5) "
            f"AS BIGINT)) AS DOUBLE) / {_SCALE}")

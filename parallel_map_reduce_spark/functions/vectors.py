"""Embedding vector math, JVM-side.

Dot products / norms / cosine over `array<float>` columns are expressed
with F.zip_with + F.aggregate so the arithmetic runs inside whole-stage
codegen — no Python in the hot path. All math is done in double
(float32 inputs are exactly representable), and both Spark's aggregate()
and DuckDB's list_dot_product fold sequentially, so results are
bit-comparable after rounding.

At 100 TB the brute-force path is the verifier; the scale path is LSH
bucketing (operators/similarity.py) which reduces the candidate set
before these kernels run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

"""Vector column expressions for the embedding fixture (array<float>, 64-d).

All JVM-side (zip_with/aggregate/transform — whole-stage codegen'd); no
Python UDF in the hot path. Computation is double-precision; callers that
need oracle-stable output round to 6 decimals (float-sum association
differences across engines are ~1e-15 relative, far below the rounding
grain).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

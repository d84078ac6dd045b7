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


def dot_literal(vec: Column, q: list[float]) -> Column:
    """Dot product against a DRIVER-SIDE literal query vector as a flat
    sum of 64 element_at*const terms. Semantically identical to
    ``dot(vec, array(lits))`` (same left-assoc addition order → bit-equal),
    but codegen compiles ~5x faster: the HOF aggregate over a literal
    array emits a loop with per-element lambda frames, while this emits
    one straight-line expression."""
    from functools import reduce

    terms = [
        F.element_at(vec, i + 1) * F.lit(float(x)) for i, x in enumerate(q)
    ]
    return reduce(lambda a, b: a + b, terms)


def dot_flat(a: Column, b: Column, n_dims: int = 64) -> Column:
    """Element-wise dot of two COLUMN vectors as a straight-line
    ``n_dims``-term sum — the vec-vec twin of ``dot_literal``. Bit-equal
    to the HOF ``dot`` (same left-assoc addition order; IEEE 0.0+t1==t1),
    but avoids the per-element lambda frames that cost ~5 s of codegen
    compile per distinct plan. Requires both arrays to have >= n_dims
    elements (ANSI element_at raises otherwise)."""
    from functools import reduce

    terms = [
        F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(n_dims)
    ]
    return reduce(lambda x, y: x + y, terms)


def norm_flat(vec: Column, n_dims: int = 64) -> Column:
    """sqrt(dot_flat(vec, vec)) — bit-equal to the HOF ``norm``."""
    return F.sqrt(dot_flat(vec, vec, n_dims))


def cosine_literal(vec: Column, q: list[float]) -> Column:
    """Cosine against a literal query; the query norm folds to one
    driver-side constant."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in q)) or 1e-12
    return dot_literal(vec, q) / (norm(vec) * F.lit(qn))

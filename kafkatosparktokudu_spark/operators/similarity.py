"""Similarity search over the embeddings table (array<float>, 64-d).

- brute-force cosine top-k: the exact baseline — one scan, JVM-side
  zip_with/aggregate math, top-k via sort-limit (Spark's TakeOrdered).
- LSH-bucketed ANN: random-hyperplane signs → bucket id; candidates come
  from the query's bucket (plus optional multi-probe neighbors), so the
  scan cost drops from O(N) to O(N / 2^planes) expected. The hyperplanes
  are derived deterministically from md5 bits — no RNG state to ship to
  executors, reproducible across runs and engines.

At 100 TB the same plan holds: the bucket id becomes the table's partition
key, partition pruning turns a top-k query into a handful-of-buckets scan,
and the brute-force path stays as the exact re-ranker over candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash32
from ..functions.vectors import as_double, cosine

N_PLANES = 8


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1): derived
    from md5 of (plane, dim) — computed driver-side once, shipped as
    literals."""
    import hashlib

    h = int(hashlib.md5(f"p{plane}d{dim}".encode()).hexdigest()[:8], 16)
    return (h / float(1 << 31)) - 1.0


def plane_literals(n_dims: int = 64, n_planes: int = N_PLANES) -> list[list[float]]:
    return [
        [_plane_component(p, d) for d in range(n_dims)] for p in range(n_planes)
    ]


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p set iff dot(vec, plane_p) > 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec, F.array(*[F.lit(c) for c in plane]), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def brute_force_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, exclude_id: int | None = None
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    e = emb.select("vec_id", "label", as_double(F.col("embedding")).alias("v"))
    if exclude_id is not None:
        e = e.filter(F.col("vec_id") != exclude_id)
    return (
        e.select(
            "vec_id",
            "label",
            F.round(cosine(F.col("v"), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def lsh_buckets(emb: DataFrame, n_dims: int = 64) -> DataFrame:
    """Attach the hyperplane-sign bucket id (the ANN partition key)."""
    planes = plane_literals(n_dims)
    return emb.withColumn(
        "bucket", bucket_expr(as_double(F.col("embedding")), planes)
    )


def ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_dims: int = 64,
    multiprobe: int = 1,
    exclude_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket (+ single-bit-flip
    neighbor buckets when ``multiprobe`` ≥ 1 to recover near-boundary
    points), then exact cosine re-rank of the candidates."""
    planes = plane_literals(n_dims)
    qbucket = 0
    for p, plane in enumerate(planes):
        d = sum(x * y for x, y in zip(query_vec, plane))
        if d > 0:
            qbucket |= 1 << p
    probe = {qbucket}
    if multiprobe >= 1:
        probe |= {qbucket ^ (1 << p) for p in range(len(planes))}
    cand = lsh_buckets(emb, n_dims).filter(F.col("bucket").isin(list(probe)))
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(cosine(as_double(F.col("embedding")), q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def label_centroids(emb: DataFrame, n_dims: int = 8) -> DataFrame:
    """Per-label centroid components (first ``n_dims`` dims) via exact
    decimal mean — embedding aggregation with oracle-stable arithmetic."""
    e = emb.select(
        "label", F.posexplode(F.slice(as_double(F.col("embedding")), 1, n_dims))
    ).select("label", F.col("pos"), F.col("col").cast("decimal(18,9)").alias("val"))
    return e.groupBy("label", "pos").agg(
        (F.sum("val").cast("double") / F.count("val")).alias("centroid")
    )

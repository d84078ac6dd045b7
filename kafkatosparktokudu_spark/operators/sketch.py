"""Sketch-based approximate aggregation: count-min heavy hitters.

The reference has no sketches (its only aggregate is a per-batch record
count, ConsumerMain.scala:86-126); this is part of the training-pipeline
extension surface alongside HLL (q33) and MinHash (dd03).

Scale design: the sketch is built by Spark's JVM-side ``count_min_sketch``
aggregate — a map-side partial merge of fixed-size (depth x width) arrays, so
the shuffle is O(sketch bytes x partitions), independent of row count. At
100 TB the sketch build is one scan with no wide shuffle; only the tiny
serialized sketch (~100 KB at eps=1e-3) reaches the driver, where candidate
frequencies are probed via the same org.apache.spark.util.sketch
CountMinSketch implementation that built it (identical hashing, so estimates
are the ones a streaming consumer of the sketch would see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def count_min_sketch_bytes(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """One-pass distributed CMS build; returns the serialized sketch."""
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sketch")
    ).collect()[0]
    return bytes(row["sketch"])


def cms_estimates(spark: SparkSession, sketch: bytes, values: list) -> dict:
    """Probe the sketch for each value (driver-side, O(len(values)))."""
    jvm = spark.sparkContext._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(sketch)
    return {v: sk.estimateCount(v) for v in values}


def heavy_hitters(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    k: int = 10,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Top-k heavy hitters with CMS-estimated frequencies.

    Candidates come from an exact distributed count (deterministic
    tie-break on the value), estimates from the sketch — the pattern a
    100 TB pipeline uses when the sketch is built once and probed by many
    consumers. est_count >= true count always; est - true <= eps * N with
    probability >= confidence.
    """
    sketch = count_min_sketch_bytes(df, col, eps, confidence, seed)
    cand = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.col(col))
        .limit(k)
        .collect()
    )
    est = cms_estimates(spark, sketch, [r[col] for r in cand])
    return spark.createDataFrame(
        [(r[col], int(r["true_count"]), int(est[r[col]])) for r in cand],
        f"{col} bigint, true_count bigint, est_count bigint",
    )

"""Ranked top-n without a single-partition global window.

VERDICT r11 #2: three new queries (gr07 link prediction, gr08
personalized PageRank, tx26 BM25) stamped their ``rank`` column with
``row_number() OVER (ORDER BY ...)`` on the FULL candidate set — Spark
plans that as Exchange SinglePartition, i.e. every candidate row
(billions on a hub-skewed 100 TB graph) sorts on one task for a ≤20-row
answer. The house pattern (similarity.py brute-force kNN) is
``orderBy(...).limit(n)`` — TakeOrderedAndProject, a parallel partial
top-k on every partition followed by a k-row merge on the driver-side
collect of partial heads. This helper applies that pattern AND stamps
the 1-based rank, by running the global window only over the ≤n
surviving rows (a bounded frame — the same adjudicated-fine shape as
sketch.py's ≤depth/bin-row windows).

Determinism: callers pass a TOTAL ordering (ties broken on a unique
key), so TakeOrdered's survivors and their order match the global
window's first n rows exactly — oracle hashes are unchanged by
construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_top_n(
    df: DataFrame, order: list[Column], top_n: int, rank_col: str = "rank"
) -> DataFrame:
    """Top-``top_n`` rows of ``df`` by the total ordering ``order``, with a
    1-based ``rank_col`` stamped on the bounded survivors.

    Plan: Sort+Limit → TakeOrderedAndProject (partition-parallel partial
    top-k), then one window over ≤ ``top_n`` rows. The single-partition
    exchange that remains moves ``top_n`` rows, not the input."""
    survivors = df.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)  # bounded-ok: <=top_n rows post-limit
    return survivors.withColumn(rank_col, F.row_number().over(w))

"""gr07 hub-cap stress: measure the wedge-candidate mass a max_degree
cap removes on a hub-skewed graph — the claim behind DEPLOY's "set
max_degree to p99.9 degree" guidance, as data.

Planted graph: 600 background ring edges (degree 2) + ONE hub wired to
400 leaves. The hub alone contributes C(400,2) = 79,800 wedges — ~99%
of the total candidate mass; capping wedge centers at degree <= 16
removes exactly that mass while keeping every background wedge.

Run: python scripts/stress_linkpred.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafkatosparktokudu_spark.operators.graph import link_prediction


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ring = [(1000 + i, 1000 + (i + 1) % 600) for i in range(600)]
    hub = [(0, 1 + i) for i in range(400)]
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in ring + hub],
        "doc_a long, doc_b long",
    )

    def wedge_mass(max_degree):
        # candidate mass BEFORE the anti-join/top-k: sum over centers of
        # C(d,2) — computed from degrees, what the cap actually bounds
        adj = edges.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")).unionAll(
            edges.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
        )
        deg = adj.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        if max_degree is not None:
            deg = deg.filter(F.col("d") <= max_degree)
        return deg.agg(F.expr("sum(d * (d - 1) div 2)")).first()[0]

    for cap in (None, 16):
        t0 = time.time()
        n_out = link_prediction(edges, top_n=10**9, max_degree=cap).count()
        wall = time.time() - t0
        print(
            f"max_degree={cap}: wedge_mass={wedge_mass(cap)}, "
            f"candidate_pairs_out={n_out}, wall={wall:.2f}s"
        )


if __name__ == "__main__":
    main()

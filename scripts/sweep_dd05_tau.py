"""dd05 threshold-selection sweep (VERDICT r9 #5): measure pair-output
counts and walls of embedding_neardup_pairs at tau in {0.3, 0.6, 0.8}
on the x16 decorrelated corpus (32k vectors — the r9 scaling-study
recipe: sf0.1 embeddings replicated x16 with a per-replica dimension
rotation so near-dup structure does NOT multiply), n_cells grown ~sqrt(n)
per the knn_join discipline.

The r9 study argued the tau=0.3 quadratic blowup is in the ANSWER
(0.5% of all pairs genuinely qualify), not the plan, and that production
runs pick tau high enough that output is near-linear. This script turns
that argument into a measured row -> NOTES.md, and the recommended
production band lives in embedding_neardup_pairs' docstring.

Run: python scripts/sweep_dd05_tau.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafkatosparktokudu_spark.operators.dedup import (  # noqa: E402
    embedding_neardup_pairs,
)
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402
from kafkatosparktokudu_spark.sources.batch import load_table  # noqa: E402

REPLICAS = 16
N_CELLS = 128  # ~sqrt(32k), the r9 x16 setting


def build_x16(spark):
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    n = base.count()
    parts = []
    for r in range(REPLICAS):
        rot = F.expr(
            f"concat(slice(embedding, {r % 64 + 1}, {64 - (r % 64)}), "
            f"slice(embedding, 1, {r % 64}))"
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                rot.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.persist(), n * REPLICAS


def main() -> None:
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb, n = build_x16(spark)
    print(f"x16 corpus: {emb.count()} vectors (expected {n})")
    all_pairs = n * (n - 1) // 2
    print("tau | pairs_out | out_frac_of_all_pairs | wall_s")
    for tau in (0.3, 0.6, 0.8):
        t0 = time.time()
        cnt = embedding_neardup_pairs(
            emb, threshold=tau, n_cells=N_CELLS, nprobe=4
        ).count()
        wall = time.time() - t0
        print(f"{tau:.1f} | {cnt:9d} | {cnt / all_pairs:20.6%} | {wall:6.1f}")


if __name__ == "__main__":
    main()

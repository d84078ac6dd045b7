"""Probe-cost-vs-epoch-count stress for the incremental BM25 index
(r13): how does the warm probe wall grow as append epochs accumulate,
and what does compaction buy back?

Protocol: build the sf0.1 postings index, append N 1%-sized batches
(re-keyed docs — the append-only contract), probe (3 warm
bm25_index_topk queries, median of 3 reps) at several epoch counts,
then compact and probe again. Run on a QUIET box; walls at this SF are
small — the trend and the file counts are the signal.

Findings land in NOTES/DEPLOY (compaction cadence guidance)."""

import sys
import tempfile
import time
import shutil

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from kafkatosparktokudu_spark.operators.text import (  # noqa: E402
    append_bm25_index,
    bm25_index_topk,
    build_bm25_index,
    compact_bm25_index,
)
from kafkatosparktokudu_spark.sources.batch import load_table  # noqa: E402

N_APPENDS = 20
PROBE_AT = {1, 5, 10, 20}
TERMS = [
    ["merge", "vector", "stream"],
    ["index", "join", "window"],
    ["data", "batch", "kudu"],
]


def probe_median(spark, path):
    reps = []
    for _ in range(3):
        t = time.time()
        for ts in TERMS:
            bm25_index_topk(spark, path, ts, top_n=20).write.format(
                "noop"
            ).mode("overwrite").save()
        reps.append(time.time() - t)
    return sorted(reps)[1]


def n_files(spark, path):
    return len(spark.read.parquet(path).inputFiles())


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n = docs.count()
    batch_sz = max(1, n // 100)
    tmp = tempfile.mkdtemp(prefix="stress_idx_")
    try:
        build_bm25_index(docs, f"{tmp}/idx")
        # warmup listing + codegen
        bm25_index_topk(spark, f"{tmp}/idx", TERMS[0], top_n=20).write.format(
            "noop"
        ).mode("overwrite").save()
        print(
            f"epochs=1 probe3_median={probe_median(spark, f'{tmp}/idx'):.3f}s"
            f" files={n_files(spark, f'{tmp}/idx')}"
        )
        for i in range(1, N_APPENDS + 1):
            batch = docs.filter(F.col("doc_id") % 100 == (i - 1)).select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text"
            ).limit(batch_sz)
            append_bm25_index(batch, f"{tmp}/idx", epoch=i)
            if i in PROBE_AT:
                print(
                    f"epochs={i + 1} "
                    f"probe3_median={probe_median(spark, f'{tmp}/idx'):.3f}s"
                    f" files={n_files(spark, f'{tmp}/idx')}"
                )
        t = time.time()
        compact_bm25_index(spark, f"{tmp}/idx")
        cw = time.time() - t
        print(
            f"compacted wall={cw:.3f}s "
            f"probe3_median={probe_median(spark, f'{tmp}/idx'):.3f}s"
            f" files={n_files(spark, f'{tmp}/idx')}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Probe-cost-vs-epoch-count stress for the incremental IVF index —
the dense twin of stress_index_epochs.py (r13): how does the warm
probe wall grow as upsert epochs accumulate, what does compaction buy
back, and what does the live streaming sync cost per micro-batch?

Protocol: build the sf0.1 IVF index, upsert N 1%-sized batches
(re-keyed vec_ids — the append-only contract), probe (3 warm
ivf_index_topk queries, median of 3 reps) at several epoch counts,
then compact and probe again; finally drain the same corpus through
start_ivf_index_sync (one file per micro-batch) and report the wall.
Run on a QUIET box; walls at this SF are small — the trend and the
file counts are the signal.

Findings land in NOTES/DEPLOY (compaction cadence guidance for the
dense index)."""

import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")

from kafkatosparktokudu_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    compact_ivf_index,
    ivf_index_topk,
    upsert_ivf_index,
)
from kafkatosparktokudu_spark.sources.batch import load_table  # noqa: E402
from kafkatosparktokudu_spark.streaming.pipeline import (  # noqa: E402
    start_ivf_index_sync,
)

N_UPSERTS = 20
PROBE_AT = {1, 5, 10, 20}


def probe_median(spark, path, qvecs):
    reps = []
    for _ in range(3):
        t = time.time()
        for qv in qvecs:
            ivf_index_topk(spark, path, qv, k=10).write.format(
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
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    qvecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    tmp = tempfile.mkdtemp(prefix="stress_ivf_")
    try:
        build_ivf_index(emb, f"{tmp}/idx", n_cells=16)
        ivf_index_topk(spark, f"{tmp}/idx", qvecs[0], k=10).write.format(
            "noop"
        ).mode("overwrite").save()  # warmup listing + codegen
        print(
            f"epochs=1 probe3_median="
            f"{probe_median(spark, f'{tmp}/idx', qvecs):.3f}s"
            f" files={n_files(spark, f'{tmp}/idx')}"
        )
        for i in range(1, N_UPSERTS + 1):
            batch = emb.filter(F.col("vec_id") % 100 == (i - 1)).select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                "label",
                "embedding",
            )
            upsert_ivf_index(batch, f"{tmp}/idx", epoch=i)
            if i in PROBE_AT:
                print(
                    f"epochs={i + 1} probe3_median="
                    f"{probe_median(spark, f'{tmp}/idx', qvecs):.3f}s"
                    f" files={n_files(spark, f'{tmp}/idx')}"
                )
        t = time.time()
        compact_ivf_index(spark, f"{tmp}/idx")
        cw = time.time() - t
        print(
            f"compacted wall={cw:.3f}s probe3_median="
            f"{probe_median(spark, f'{tmp}/idx', qvecs):.3f}s"
            f" files={n_files(spark, f'{tmp}/idx')}"
        )

        # live streaming sync over the same corpus: 10 source files, one
        # micro-batch each (file 1 builds + trains, 2-10 upsert)
        src = f"{tmp}/src"
        for j in range(10):
            emb.filter(F.col("vec_id") % 10 == j).repartition(
                1
            ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t = time.time()
        q = start_ivf_index_sync(
            spark, stream, f"{tmp}/sync", f"{tmp}/ckpt", available_now=True
        )
        assert q.awaitTermination(600)
        dw = time.time() - t
        n = emb.count()
        print(
            f"stream_sync 10 batches wall={dw:.3f}s"
            f" ({n / dw:,.0f} vec/s) files={n_files(spark, f'{tmp}/sync')}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

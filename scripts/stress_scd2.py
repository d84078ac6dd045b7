"""Scale stress for the incremental SCD2 path (operators/scd2.py).

Synthesizes N_CHANGES OGG-normalized change rows over N_KEYS entities,
applies them through Scd2Store in N_BATCHES sequential micro-batches
(measuring per-batch wall), then re-derives the history in ONE shot with
ogg.history_table_changes and asserts row-for-row equality — the
correctness envelope at two orders of magnitude above the golden fixture.

The claim under test: per-batch cost tracks the TOUCHED KEYS' total
change counts (raw-log read is bucket-pruned to affected ids), so batch
walls stay flat-ish as history accumulates, rather than growing with the
total table. Run: python scripts/stress_scd2.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafkatosparktokudu_spark.catalog import default_catalog  # noqa: E402
from kafkatosparktokudu_spark.operators.ogg import history_table_changes  # noqa: E402
from kafkatosparktokudu_spark.operators.scd2 import Scd2Store  # noqa: E402
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402

N_KEYS = 10_000
N_CHANGES = 100_000
N_BATCHES = 5
N_BUCKETS = 64


def synth_changes(spark):
    """Deterministic synthetic normalized changes: md5-derived key, op,
    payload — every key gets ~N_CHANGES/N_KEYS versions."""
    return (
        spark.range(N_CHANGES)
        .select(
            F.col("id").alias("seq"),
            (F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(N_KEYS)))
            .cast("string")
            .alias("id"),
        )
        .select(
            "id",
            "seq",
            F.when(F.pmod("seq", F.lit(17)) == 0, "D").otherwise("U").alias(
                "op_type"
            ),
            F.concat(
                F.lit("2024-01-01T"),
                F.lpad((F.col("seq") / 3600).cast("int").cast("string"), 2, "0"),
                F.lit(":"),
                F.lpad(
                    (F.pmod(F.col("seq"), 3600) / 60).cast("int").cast("string"),
                    2,
                    "0",
                ),
                F.lit(":"),
                F.lpad(F.pmod("seq", F.lit(60)).cast("string"), 2, "0"),
                F.lit(".000000"),
            ).alias("current_ts"),
        )
        .withColumn(
            "current_ts_norm", F.replace("current_ts", F.lit("T"), F.lit(" "))
        )
        .withColumn(
            "after",
            F.when(
                F.col("op_type") != "D",
                F.map_from_arrays(
                    F.array(F.lit("ID"), F.lit("NAME"), F.lit("SALARY")),
                    F.array(
                        F.col("id"),
                        F.concat(F.lit("n"), F.pmod("seq", F.lit(7)).cast("string")),
                        F.concat(
                            F.pmod("seq", F.lit(5000)).cast("string"), F.lit(".25")
                        ),
                    ),
                ),
            ).otherwise(
                F.map_from_arrays(F.array(F.lit("ID")), F.array(F.col("id")))
            ),
        )
    )


def main() -> None:
    import tempfile

    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    changes = synth_changes(spark).persist()
    total = changes.count()
    tmp = tempfile.mkdtemp(prefix="scd2_stress_")
    store = Scd2Store(spark, f"{tmp}/emp", default_catalog()["emp"], N_BUCKETS)
    per = total // N_BATCHES
    walls = []
    purge_cutoff = None
    for b in range(N_BATCHES):
        lo, hi = b * per, (b + 1) * per if b < N_BATCHES - 1 else total
        batch = changes.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        t0 = time.time()
        store.apply_batch(batch)
        walls.append(round(time.time() - t0, 2))
        print(f"batch {b}: rows={hi - lo} wall={walls[-1]}s", flush=True)
        if b == 1:
            # retention purge mid-stream: compact everything closed
            # before the end of batch 1 (ts is monotone in seq here, so
            # later batches never splice across the cutoff — the purge
            # contract's supported regime)
            purge_cutoff = (
                batch.agg(F.max("current_ts_norm")).collect()[0][0]
            )
            t0 = time.time()
            n_purged = store.purge_closed_before(purge_cutoff)
            print(
                f"purge@{purge_cutoff}: removed {n_purged} raw rows "
                f"({time.time() - t0:.2f}s)",
                flush=True,
            )
    t0 = time.time()
    oneshot = history_table_changes(changes, default_catalog()["emp"])
    cols = oneshot.columns
    # (1) pure-function invariant survives the purge: hist == one-shot
    # over the COMPACTED raw log
    recon = history_table_changes(store.raw.read(), default_catalog()["emp"])
    hist = store.history().select(cols)
    mism = (
        hist.exceptAll(recon.select(cols))
        .unionAll(recon.select(cols).exceptAll(hist))
        .count()
    )
    # (2) the purge preserved everything at/after the cutoff: current
    # rows and every version with valid_to >= cutoff match the FULL-log
    # one-shot exactly (sans the uniform version renumbering)
    keepc = [c for c in cols if c != "version"]
    live_ref = oneshot.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") >= purge_cutoff)
    ).select(keepc)
    live_mism = live_ref.exceptAll(hist.select(keepc)).count()
    n_hist = hist.count()
    n_ref = oneshot.count()
    print(
        f"verify: incr_rows={n_hist} oneshot_rows={n_ref} "
        f"recon_sym_diff={mism} live_window_missing={live_mism} "
        f"({time.time() - t0:.1f}s)  walls={walls}  rate≈"
        f"{int(total / max(sum(walls), 0.01))} changes/s",
        flush=True,
    )
    assert mism == 0 and live_mism == 0
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

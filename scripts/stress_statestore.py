"""Scale stress for the plain CDC StateStore merge (operators/merge.py).

DEPLOY.md claims: "The per-batch merge only reads/rewrites touched
buckets, so batch cost tracks batch size, not table size." VERDICT r9 #3
flagged that as asserted-not-measured. This script measures it with ~1M
total change records while the table grows ~x90:

- PROBE batches: a FIXED 10k-key update set whose keys all hash into
  buckets 0..7. Between probes, GROW batches insert 90k brand-new keys
  confined to buckets 8..63, so the probe's buckets stay ~10k rows while
  the TABLE grows 10k -> 910k keys. If bucket pruning works, probe walls
  stay flat across the x91 growth; if the merge secretly rescanned the
  table, they would grow ~linearly.
- LOCALITY contrast at final size: the same 10k-update batch spread
  UNIFORMLY over the whole keyspace (touches all 64 buckets) vs the
  confined probe (8 buckets). The gap is the bucket pruning win — and
  the reason DEPLOY.md tells you to scale n_buckets with table size
  (more buckets => a batch of given key-locality touches a smaller
  table fraction, and each bucket's parquet stays in the 100MB-1GB
  band).

Run: python scripts/stress_statestore.py   (results table -> NOTES.md)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafkatosparktokudu_spark.catalog import default_catalog  # noqa: E402
from kafkatosparktokudu_spark.operators.merge import StateStore  # noqa: E402
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402

N_BUCKETS = 64
PROBE_KEYS = 10_000
GROW_KEYS = 90_000
N_PHASES = 10
PROBE_BUCKETS = 8  # probe keys confined to buckets [0, 8)


def _emp_rows(ids, salary_col):
    """(id ...) -> full emp-schema rows (types from the CDC catalog)."""
    return ids.select(
        F.col("id").cast("string").alias("id"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        salary_col.cast("double").alias("salary"),
        F.pmod(F.xxhash64("id"), F.lit(100)).cast("int").alias("dept_id"),
        (F.pmod(F.xxhash64("id"), F.lit(2)) == 0).alias("active"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("hire_ts"),
        F.lit("0").alias("delete_state"),
        F.lit("2024-01-01 00:00:00.000000").alias("time_stamp"),
    )


def _keys_in_buckets(spark, start, count, pred):
    """`count` fresh string keys from the integer range [start, ...) whose
    store bucket satisfies `pred` (same xxhash the store uses)."""
    # over-generate x3 then filter + limit: bucket assignment is uniform,
    # so 3x covers the worst case comfortably
    cand = spark.range(start, start + 3 * (count * N_BUCKETS // PROBE_BUCKETS)
                       if pred.__name__ == "lo" else start + 3 * count)
    df = cand.select(F.col("id").cast("string").alias("id")).withColumn(
        "_b", F.pmod(F.xxhash64("id"), F.lit(N_BUCKETS)).cast("int")
    )
    lo = pred(F.col("_b"))
    return df.filter(lo).limit(count).drop("_b")


def main() -> None:
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="stress_statestore_")
    cat = default_catalog()
    store = StateStore(spark, f"{tmp}/emp", ["id"], cat["emp"].full_schema,
                       N_BUCKETS)

    def lo(b):
        return b < PROBE_BUCKETS

    def hi(b):
        return b >= PROBE_BUCKETS

    lo.__name__, hi.__name__ = "lo", "hi"

    probe_keys = _keys_in_buckets(spark, 0, PROBE_KEYS, lo).persist()
    n_probe = probe_keys.count()
    assert n_probe == PROBE_KEYS, n_probe

    # phase 0: seed the probe keys
    store.upsert_batch(_emp_rows(probe_keys, F.lit(0.0)))
    total_changes = PROBE_KEYS

    next_id = 10_000_000  # grow-key id space, disjoint from probe ids
    print("phase | table_keys | probe_wall_s | grow_wall_s")
    probe_walls = []
    for phase in range(1, N_PHASES + 1):
        grow = _keys_in_buckets(spark, next_id, GROW_KEYS, hi).persist()
        n_grow = grow.count()
        assert n_grow == GROW_KEYS, n_grow
        next_id += 3 * GROW_KEYS
        t0 = time.time()
        store.upsert_batch(_emp_rows(grow, F.lit(1.0)))
        grow_wall = time.time() - t0
        grow.unpersist()
        total_changes += GROW_KEYS

        t0 = time.time()
        store.upsert_batch(_emp_rows(probe_keys, F.lit(float(phase))))
        probe_wall = time.time() - t0
        total_changes += PROBE_KEYS
        probe_walls.append(probe_wall)
        table_keys = PROBE_KEYS + phase * GROW_KEYS
        print(f"{phase:5d} | {table_keys:10d} | {probe_wall:12.2f} |"
              f" {grow_wall:11.2f}")

    # locality contrast at final size: 10k updates SPREAD over the whole
    # keyspace (touches all 64 buckets -> reads ~the whole table)
    spread = (
        store.read()
        .select("id")
        .withColumn("_h", F.pmod(F.xxhash64("id"), F.lit(91)))
        .filter(F.col("_h") == 0)
        .limit(PROBE_KEYS)
        .drop("_h")
        .persist()
    )
    n_spread = spread.count()
    t0 = time.time()
    store.upsert_batch(_emp_rows(spread, F.lit(99.0)))
    spread_wall = time.time() - t0
    total_changes += n_spread

    # correctness: final probe salaries == last phase, table count exact
    final = store.read()
    n_keys = final.count()
    bad = (
        final.join(probe_keys, "id", "left_semi")
        .filter(F.col("salary") != float(N_PHASES))
        .count()
    )
    print(f"\ntotal_changes={total_changes} table_keys={n_keys} "
          f"probe_salary_mismatches={bad}")
    print(f"confined 10k-update wall (8/64 buckets, final size): "
          f"{probe_walls[-1]:.2f}s")
    print(f"spread   {n_spread}-update wall (64/64 buckets, final size): "
          f"{spread_wall:.2f}s")
    print(f"probe walls phase1->N: {[round(w, 2) for w in probe_walls]}")
    assert bad == 0
    assert n_keys == PROBE_KEYS + N_PHASES * GROW_KEYS


if __name__ == "__main__":
    main()

"""Measure StateStore.rebucket: the online bucket-count migration
(VERDICT r10 #2). The ×91 stress (stress_statestore.py) proved batch
cost tracks TOUCHED BUCKETS — so a store that outgrew its bucket count
overpays every batch until its geometry is fixed. This script measures
the fix working:

- seed a 640k-key emp store at n_buckets=8 (each bucket ~80k rows);
- PROBE: a 10k-key update whose keys all satisfy ``hash % 64 < 8`` —
  at 8 buckets those keys spread over ALL 8 buckets (mod-8 of a value
  in [0,8) is itself), so the merge reads ~the whole table;
- ``rebucket(64)`` (one full-table staged rewrite + atomic swap —
  migration wall reported);
- the SAME probe now touches 8 of 64 buckets, reading ~1/8 of the
  table: the post-rebucket probe wall IS the geometry win;
- equivalence asserted throughout (row count, probe salaries, point
  lookups after migration).

Run: python scripts/stress_rebucket.py   (results table -> NOTES.md)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafkatosparktokudu_spark.catalog import default_catalog  # noqa: E402
from kafkatosparktokudu_spark.operators.merge import StateStore  # noqa: E402
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402

N_TABLE = 640_000
N_PROBE = 10_000
N_OLD, N_NEW = 8, 64
PROBE_REPS = 3


def _emp_rows(ids, salary_col):
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


def main() -> None:
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="stress_rebucket_")
    cat = default_catalog()
    store = StateStore(spark, f"{tmp}/emp", ["id"], cat["emp"].full_schema, N_OLD)

    base = spark.range(N_TABLE).select(F.col("id").cast("string").alias("id"))
    store.upsert_batch(_emp_rows(base, F.lit(0.0)))

    # probe keys: confined to 8 of 64 NEW buckets (=> all 8 OLD buckets)
    probe = (
        spark.range(N_TABLE)
        .select(F.col("id").cast("string").alias("id"))
        .filter(F.pmod(F.xxhash64("id"), F.lit(N_NEW)) < 8)
        .limit(N_PROBE)
        .persist()
    )
    assert probe.count() == N_PROBE

    def probe_walls(tag: str, salary: float) -> list[float]:
        walls = []
        for rep in range(PROBE_REPS):
            t0 = time.time()
            store.upsert_batch(_emp_rows(probe, F.lit(salary + rep)))
            walls.append(round(time.time() - t0, 2))
        print(f"probe 10k-update walls @ {tag}: {walls}")
        return walls

    pre = probe_walls(f"n_buckets={N_OLD} (keys hit 8/8 buckets)", 1.0)

    t0 = time.time()
    store.rebucket(N_NEW)
    mig = time.time() - t0
    print(f"rebucket {N_OLD}->{N_NEW} migration wall: {mig:.2f}s "
          f"({N_TABLE} rows rewritten once)")

    post = probe_walls(f"n_buckets={N_NEW} (keys hit 8/64 buckets)", 100.0)

    # equivalence + point reads at the new geometry
    assert store.n_buckets == N_NEW
    n = store.read().count()
    assert n == N_TABLE, n
    got = {r["id"]: r["salary"] for r in store.lookup(
        [r["id"] for r in probe.limit(5).collect()]
    ).collect()}
    assert len(got) == 5 and all(v == 100.0 + PROBE_REPS - 1 for v in got.values()), got
    untouched = store.lookup(
        [r["id"] for r in base.join(probe, "id", "left_anti").limit(3).collect()]
    ).collect()
    assert len(untouched) == 3 and all(r["salary"] == 0.0 for r in untouched)
    print(f"equivalence OK: {n} rows, probe+untouched point lookups exact")
    print(f"median probe wall: pre={sorted(pre)[1]:.2f}s "
          f"post={sorted(post)[1]:.2f}s (geometry win)")


if __name__ == "__main__":
    main()

"""Measure the bucketed gate-store layout (VERDICT r11 #5): per-epoch
gate I/O must track the BATCH, not the accepted history, in the
trickle-ingest regime (small batches against a large history).

- seed a ~24k-doc accepted history (4 prefix-decorrelated sf0.1 epochs,
  the bench recipe) into BOTH layouts: FLAT (plain parquet, the st04
  bench default) and BUCKETED (bands by band-hash bucket, payload by id
  bucket, n_buckets=512);
- PROBE: a 100-doc trickle batch (mix of novel docs and near-dups of
  stored ones), gate wall measured over PROBE_REPS reps per layout —
  each rep uses fresh doc ids so the store is never polluted by the
  probe itself (appends go to a throwaway copy? no: appends are part of
  the gate; each rep appends ~100 docs to a 24k store, a <0.5% drift);
- report: median gate wall flat vs bucketed, plus the pruning counters
  (band buckets touched of 512, payload id-buckets read of 512).

Flags equivalence between the layouts is asserted on the first rep.

Run: python scripts/stress_ingest_gate.py   (results table -> NOTES.md)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafkatosparktokudu_spark.operators.dedup import (  # noqa: E402
    incremental_neardup_ingest,
)
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402
from kafkatosparktokudu_spark.sources.batch import load_table  # noqa: E402

N_BUCKETS = 512
PROBE_DOCS = 100
PROBE_REPS = 3
SEED_EPOCHS = 4
SF_DIR = "/root/testdata/sf0.1"


def _epoch_batch(docs, epoch: int):
    """The bench decorrelation recipe: every token re-prefixed per epoch,
    so each epoch is accepted ~whole and the history GROWS."""
    return docs.select(
        (F.col("doc_id") + epoch * 10_000_000).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split("text", " "), lambda t: F.concat(F.lit(f"e{epoch}x"), t)
            ),
            " ",
        ).alias("text"),
    )


def _probe_batch(docs, rep: int):
    """100 docs: half novel (rep-prefixed), half near-dups of epoch-0
    stored docs (one token appended)."""
    novel = (
        docs.limit(PROBE_DOCS // 2)
        .select(
            (F.col("doc_id") + (100 + rep) * 10_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(F.lit(f"p{rep}x"), t),
                ),
                " ",
            ).alias("text"),
        )
    )
    dups = (
        docs.limit(PROBE_DOCS)
        .filter(F.col("doc_id") % 2 == 0)
        .limit(PROBE_DOCS // 2)
        .select(
            (F.col("doc_id") + (200 + rep) * 10_000_000).alias("doc_id"),
            F.concat(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(F.lit("e0x"), t),
                    ),
                    " ",
                ),
                F.lit(" trailingtoken"),
            ).alias("text"),
        )
    )
    return novel.unionByName(dups)


def main() -> None:
    spark = get_spark(app_name="stress-ingest-gate")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stress_gate_")
    flat, buck = f"{tmp}/flat", f"{tmp}/buck"

    t0 = time.time()
    for e in range(SEED_EPOCHS):
        b = _epoch_batch(docs, e)
        incremental_neardup_ingest(b, flat)
        incremental_neardup_ingest(
            b, buck, bucketed_n=N_BUCKETS if e == 0 else None
        )
    n_hist = spark.read.parquet(f"{buck}/payload").count()
    print(f"seeded history: {n_hist} accepted docs, {time.time()-t0:.1f}s")

    walls = {"flat": [], "bucketed": []}
    for rep in range(PROBE_REPS):
        probe = _probe_batch(docs, rep).persist()
        probe.count()
        t0 = time.time()
        ff = {
            r["doc_id"]: (r["is_dup"], r["matched_id"])
            for r in incremental_neardup_ingest(probe, flat).collect()
        }
        walls["flat"].append(time.time() - t0)
        t0 = time.time()
        fb = {
            r["doc_id"]: (r["is_dup"], r["matched_id"])
            for r in incremental_neardup_ingest(probe, buck).collect()
        }
        walls["bucketed"].append(time.time() - t0)
        probe.unpersist()
        if rep == 0:
            assert fb == ff, "layout equivalence violated"
            n_dup = sum(1 for v in fb.values() if v[0])
            print(f"rep0 flags equal across layouts ({n_dup} dups of "
                  f"{len(fb)} probed)")

    # pruning counters for one probe batch (driver-side, from the layout)
    from kafkatosparktokudu_spark.operators.dedup import (
        _band_bucket,
        _bands_from_hashed,
        _explode_bands,
        hashed_shingles,
    )

    pb = _probe_batch(docs, 0)
    en = _explode_bands(
        _bands_from_hashed(hashed_shingles(pb, "doc_id"), "doc_id"), "doc_id"
    ).withColumn("bucket", _band_bucket(F.col("h"), N_BUCKETS))
    touched = sorted(
        r["bucket"] for r in en.select("bucket").distinct().collect()
    )
    print(f"band buckets touched by a {PROBE_DOCS}-doc probe: "
          f"{len(touched)}/{N_BUCKETS}")

    # BYTES the two layouts must read for this probe (what dominates on a
    # remote FS at real history sizes, where the wall above is job- and
    # file-count-bound instead):
    import os

    def du(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )

    flat_bytes = du(flat)  # flat probe explodes the WHOLE store
    buck_band_bytes = sum(
        du(f"{buck}/bands/bucket={b}")
        for b in touched
        if os.path.isdir(f"{buck}/bands/bucket={b}")
    )
    # payload read is bounded by candidate id-buckets; upper-bound it with
    # the dup half of the probe (50 candidates -> <=50 id-buckets)
    n_idb = min(PROBE_DOCS // 2, N_BUCKETS)
    payload_total = du(f"{buck}/payload")
    buck_payload_bytes = payload_total * n_idb // N_BUCKETS
    print(f"bytes: flat reads {flat_bytes/1e6:.1f} MB/probe; bucketed reads "
          f"~{buck_band_bytes/1e6:.1f} MB bands (touched buckets) + "
          f"~{buck_payload_bytes/1e6:.2f} MB payload (<= {n_idb} id-buckets "
          f"of {payload_total/1e6:.1f} MB)")
    for k, v in walls.items():
        v = sorted(round(x, 2) for x in v)
        print(f"{k:9s} gate walls {v}  median {v[len(v)//2]}")


if __name__ == "__main__":
    main()

"""Phase-level profile of the st04 ingest-epoch machinery (VERDICT r13
#3): replicates ingest_shards_epoch + the flat-store gate body with a
wall-clock mark after every Spark ACTION, so the per-epoch cost
decomposes into gate / CC / deal / bookkeeping jobs. Triage only — the
operators themselves stay the source of truth.

    python scripts/profile_ingest_epoch.py --sf sf0.1 --reps 2
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window, functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from kafkatosparktokudu_spark.functions.hashing import md5_hash32
    from kafkatosparktokudu_spark.functions.localframe import local_frame
    from kafkatosparktokudu_spark.operators.dedup import (
        _bands_from_hashed,
        _explode_bands,
        duplicate_clusters,
        hashed_shingles,
        neardup_pairs_jaccard,
    )
    from kafkatosparktokudu_spark.operators.text import (
        quality_classifier_scores,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.session import get_spark
    from kafkatosparktokudu_spark.streaming.fsio import (
        dir_has_files,
        latest_epoch_before,
    )

    sf_dir = f"/root/testdata/{args.sf}"
    spark = get_spark(app_name="profile_ingest_epoch")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + (hi - lo) // 2

    def run_epoch(batch_df, epoch_id, store_dir, out_dir, marks,
                  threshold=0.2, n_shards=8, n_bands=10, id_col="doc_id"):
        t = [time.time()]

        def mark(label):
            now = time.time()
            marks.append((f"e{epoch_id} {label}", round(now - t[0], 3)))
            t[0] = now

        batch = batch_df.select("doc_id", "text")
        hs_new = hashed_shingles(batch, id_col).persist()
        hs_new.count()
        mark("gate: shingle+md5 pass (hs count)")
        pairs = neardup_pairs_jaccard(batch, threshold, id_col, hs_df=hs_new)
        clusters = duplicate_clusters(pairs)
        mark("gate: in-batch LSH verify + CC (count+collect)")
        in_dup = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(
            F.col(id_col), F.col("cluster_id").alias("matched_in")
        )
        keepers = hs_new.join(in_dup.select(id_col), id_col, "left_anti")
        bands_new = _bands_from_hashed(keepers, id_col)
        store_exists = dir_has_files(spark, store_dir, suffix=".parquet")
        if store_exists:
            old = spark.read.parquet(f"{store_dir}/*.parquet")
            cand = (
                _explode_bands(bands_new.alias("n"), id_col)
                .withColumnRenamed(id_col, "new_id")
                .join(
                    _explode_bands(old, id_col).withColumnRenamed(
                        id_col, "old_id"),
                    ["band_idx", "h"],
                )
                .select("new_id", "old_id")
                .distinct()
            )
            jac = F.size(F.array_intersect("hs_n", "hs_o")).cast(
                "double") / F.size(F.array_union("hs_n", "hs_o"))
            old_matches = (
                cand.join(keepers.select(F.col(id_col).alias("new_id"),
                                         F.col("hs").alias("hs_n")), "new_id")
                .join(old.select(F.col(id_col).alias("old_id"),
                                 F.col("hs").alias("hs_o")), "old_id")
                .filter(jac >= threshold)
                .groupBy("new_id")
                .agg(F.min("old_id").alias("matched_old"))
            )
        else:
            old_matches = spark.createDataFrame(
                [], "new_id bigint, matched_old bigint")
        mark("gate: store probe frame built (lazy)")
        flags = (
            hs_new.select(id_col)
            .join(in_dup, id_col, "left")
            .join(old_matches.withColumnRenamed("new_id", id_col),
                  id_col, "left")
            .select(
                F.col(id_col),
                (F.col("matched_in").isNotNull()
                 | F.col("matched_old").isNotNull()).alias("is_dup"),
                F.coalesce("matched_in", "matched_old").alias("matched_id"),
            )
            .localCheckpoint()
        )
        mark("gate: flags localCheckpoint (incl store probe)")
        accepted_sig = bands_new.join(
            keepers.select(id_col, "hs"), id_col
        ).join(flags.filter(F.col("is_dup")).select(id_col),
               id_col, "left_anti")
        accepted_sig.write.mode("append").parquet(store_dir)
        hs_new.unpersist()
        mark("gate: store append")
        # --- ingest_shards_epoch remainder -------------------------------
        flags2 = flags.withColumn(
            "is_dup",
            F.when(F.col("matched_id") == F.col("doc_id"),
                   F.lit(False)).otherwise(F.col("is_dup")),
        ).withColumn(
            "matched_id",
            F.when(F.col("matched_id") == F.col("doc_id"),
                   F.lit(None)).otherwise(F.col("matched_id")),
        )
        flags2.write.mode("overwrite").parquet(
            f"{out_dir}/flags/epoch={epoch_id}")
        mark("deal: flags write")
        accepted = batch_df.join(
            spark.read.parquet(f"{out_dir}/flags/epoch={epoch_id}")
            .filter(~F.col("is_dup")).select("doc_id"),
            "doc_id",
        )
        banded = quality_classifier_scores(accepted).select(
            "doc_id",
            F.least(F.lit(n_bands - 1),
                    F.floor(F.col("p_keep") * n_bands).cast("int"))
            .cast("int").alias("band"),
            md5_hash32(F.col("doc_id").cast("string")).alias("_h"),
        )
        cdir = f"{out_dir}/counters"
        prior_epoch = latest_epoch_before(spark, cdir, epoch_id)
        base = {}
        if prior_epoch is not None:
            base = {r["band"]: r["n"] for r in spark.read.parquet(
                f"{cdir}/epoch={prior_epoch}").collect()}
        off_df = local_frame(
            spark, [(b, base.get(b, 0)) for b in range(n_bands)],
            "band int, _offset bigint")
        w = Window.partitionBy("band").orderBy("_h", "doc_id")
        assign = (
            banded.join(F.broadcast(off_df), "band")
            .withColumn("_rank0", (F.row_number().over(w)
                                   + F.col("_offset") - 1).cast("bigint"))
            .select(
                "doc_id", "band",
                F.expr(f"CAST(_rank0 % {int(n_shards)} AS INT)").alias(
                    "shard_id"),
                F.expr(f"CAST(_rank0 div {int(n_shards)} AS BIGINT)").alias(
                    "pos_in_shard"),
            )
        )
        assign.write.mode("overwrite").parquet(
            f"{out_dir}/shards/epoch={epoch_id}")
        mark("deal: quality+rank+shards write")
        new_cnt = {r["band"]: r["n"] for r in spark.read.parquet(
            f"{out_dir}/shards/epoch={epoch_id}")
            .groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .collect()}
        mark("deal: counter collect")
        local_frame(
            spark,
            [(b, base.get(b, 0) + new_cnt.get(b, 0)) for b in range(n_bands)],
            "band int, n bigint",
        ).repartition(1).write.mode("overwrite").parquet(
            f"{cdir}/epoch={epoch_id}")
        mark("deal: counters write")

    for rep in range(args.reps):
        tmp = tempfile.mkdtemp(prefix="prof_ingest_")
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        marks: list[tuple[str, float]] = []
        try:
            t_all = time.time()
            run_epoch(docs.filter(F.col("doc_id") < cut), 0,
                      f"{tmp}/sigs", f"{tmp}/out", marks)
            run_epoch(docs.filter(F.col("doc_id") >= cut), 1,
                      f"{tmp}/sigs", f"{tmp}/out", marks)
            total = time.time() - t_all
            print(f"rep{rep}: total {total:.3f}s")
            for label, sec in marks:
                print(f"   {sec:7.3f}s  {label}")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Keyed upsert state store: insert-or-update by primary key on plain parquet.

Re-expresses the reference's Kudu upsert sink (S18: ``newUpsert`` +
``session.apply`` per record, /root/reference/.../KuduManager.scala:70-73,114)
as a set-oriented MERGE inside ``foreachBatch``. Semantics preserved
(SURVEY.md §2.1 "semantics worth preserving"):

1. upsert = insert-or-update by PK; replays converge (idempotent)
2. delete is logical (delete_state='1', payload untouched)
3. partial update: absent/null payload keys leave prior values
4. at-least-once delivery absorbed by upsert idempotence

Scale design (the reason this isn't a read-all/overwrite-all loop):

- State is **hash-bucketed on the key** (``_bucket = pmod(xxhash64(key), N)``)
  and stored as a partitioned parquet layout. A micro-batch only reads and
  rewrites the buckets its keys hash into — partition pruning on read,
  stage-and-rename per touched bucket on write. At 100 TB with N=8192, a
  50k-record batch touches at most 50k buckets' worth of data, not the table.
- The merge itself joins the (small, rate-capped) folded batch against only
  the affected buckets — both sides are bounded by maxOffsetsPerTrigger,
  so the join never shuffles the full table.
- On a lakehouse table format (Delta/Iceberg — jars not in this image) this
  whole class collapses into ``MERGE INTO``; the public API here is shaped
  so that swap is a drop-in.

Crash safety: the bucket-directory swap is atomic per partition, not
across partitions; recovery relies on checkpoint replay + upsert idempotence
(exactly the reference's model: offsets persisted after writes,
ConsumerMain.scala:128-151, duplicates absorbed by upsert).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET = "_bucket"


def merge_upserts(
    state: DataFrame, batch: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Pure merge: one row per key, column-wise ``coalesce(new, old)``.

    ``batch`` must already be folded to one row per key (fold_table_changes).
    Column set of both sides must match. Partial updates ride on coalesce:
    a folded column is null iff no record in the batch set it.
    """
    value_cols = [c for c in state.columns if c not in key_cols]
    b = batch.select(
        *[F.col(c).alias(f"_b_{c}") for c in batch.columns]
    )
    cond = [state[k].eqNullSafe(b[f"_b_{k}"]) for k in key_cols]
    joined = state.join(b, cond, "full_outer")
    out_cols = [
        F.coalesce(b[f"_b_{k}"], state[k]).alias(k) for k in key_cols
    ] + [
        F.coalesce(b[f"_b_{c}"], state[c]).alias(c) for c in value_cols
    ]
    return joined.select(*out_cols)


class StateStore:
    """Bucketed-parquet keyed table with MERGE-style upsert batches."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        schema: T.StructType,
        n_buckets: int = 64,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.schema = schema
        self.n_buckets = n_buckets

    # -- helpers ------------------------------------------------------------
    def _bucket_col(self) -> F.Column:
        key = F.concat_ws("\x1f", *[F.col(k) for k in self.key_cols])
        return F.pmod(F.xxhash64(key), F.lit(self.n_buckets)).cast("int")

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            e.startswith(f"{_BUCKET}=") for e in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        """Current state (without the bucket column)."""
        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        return (
            self.spark.read.schema(
                T.StructType(
                    list(self.schema.fields)
                    + [T.StructField(_BUCKET, T.IntegerType(), True)]
                )
            )
            .option("basePath", self.path)
            .parquet(self.path)
            .drop(_BUCKET)
        )

    # -- the merge ----------------------------------------------------------
    def upsert_batch(self, batch: DataFrame) -> None:
        """MERGE the (already folded, typed) batch into the store.

        Reads only the buckets the batch touches, merges, writes the merged
        buckets to a staging dir in ONE job, then swaps each touched bucket
        directory into place — the same stage-and-rename protocol dynamic
        partition overwrite uses internally, minus the extra materialization
        pass a self-overwrite would force (we read the old files while
        writing the staging copy, so no checkpoint is needed). Atomicity is
        per partition, matching the reference's non-transactional writes;
        recovery = checkpoint replay + upsert idempotence.
        """
        batch = batch.select([F.col(f.name) for f in self.schema.fields]).withColumn(
            _BUCKET, self._bucket_col()
        )
        if not self.exists():
            (
                batch.repartition(_BUCKET)
                .write.mode("overwrite")
                .partitionBy(_BUCKET)
                .parquet(self.path)
            )
            return
        # Cache the folded batch: it is read twice (affected-bucket scan
        # + the merge itself) and folding is the expensive part.
        batch = batch.persist()
        affected = [r[0] for r in batch.select(_BUCKET).distinct().collect()]
        base = T.StructType(
            list(self.schema.fields)
            + [T.StructField(_BUCKET, T.IntegerType(), True)]
        )
        state = (
            self.spark.read.schema(base)
            .option("basePath", self.path)
            .parquet(self.path)
            .filter(F.col(_BUCKET).isin(affected))  # partition pruning
        )
        merged = merge_upserts(
            state.drop(_BUCKET), batch.drop(_BUCKET), self.key_cols
        ).withColumn(_BUCKET, self._bucket_col())
        # Repartition on the bucket so the staging write emits one file per
        # touched bucket, then swap directories. On HDFS/object storage the
        # os-level moves become FileSystem.rename calls.
        staging = f"{self.path}.__staging__"
        shutil.rmtree(staging, ignore_errors=True)
        (
            merged.repartition(_BUCKET)
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(staging)
        )
        batch.unpersist()
        for b in affected:
            src = os.path.join(staging, f"{_BUCKET}={b}")
            dst = os.path.join(self.path, f"{_BUCKET}={b}")
            if os.path.isdir(src):
                shutil.rmtree(dst, ignore_errors=True)
                os.rename(src, dst)
        shutil.rmtree(staging, ignore_errors=True)

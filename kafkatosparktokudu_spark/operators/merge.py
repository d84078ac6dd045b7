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
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BUCKET = "_bucket"
# geometry metadata, persisted IN the store dir: underscore-prefixed files
# are invisible to Spark's file index (like _SUCCESS), so the parquet
# reads never see it. Without this a store rebucketed to N'=128 reopened
# by code still passing n_buckets=64 would prune point lookups with the
# WRONG hash modulus and silently miss rows.
_META = "_STORE_META.json"
# commit marker for the rebucket swap: written LAST into a fully-staged
# copy; its presence means "the staged geometry is the committed truth".
_REBUCKET_COMMIT = "_REBUCKET_COMMIT"


def merge_upserts(
    state: DataFrame, batch: DataFrame, key_cols: list[str],
    replace_rows: bool = False,
) -> DataFrame:
    """Pure merge: one row per key, column-wise ``coalesce(new, old)``.

    ``batch`` must already be folded to one row per key (fold_table_changes).
    Column set of both sides must match. Partial updates ride on coalesce:
    a folded column is null iff no record in the batch set it.

    ``replace_rows=True`` switches to whole-row semantics: a key present in
    the batch takes the batch row VERBATIM, nulls included — what a
    recomputed aggregate view needs (a re-aggregated min of NULL must
    overwrite the stale extreme, not coalesce with it).

    CONTRACT: key columns are primary keys and must be non-null on both
    sides (the CDC path guarantees this — is_valid drops null-ID records
    and the catalog declares keys non-nullable). Plain ``==`` instead of
    eqNullSafe matters for the plan: a null-safe join hashes on
    ``(coalesce(k,''), isnull(k))``, which can NOT reuse the fold's
    groupBy(key) exchange, so the batch side would be shuffled twice.
    """
    value_cols = [c for c in state.columns if c not in key_cols]
    b = batch.select(
        *[F.col(c).alias(f"_b_{c}") for c in batch.columns]
    )
    cond = [state[k] == b[f"_b_{k}"] for k in key_cols]
    joined = state.join(b, cond, "full_outer")
    in_batch = b[f"_b_{key_cols[0]}"].isNotNull()
    out_cols = [
        F.coalesce(b[f"_b_{k}"], state[k]).alias(k) for k in key_cols
    ] + [
        (
            F.when(in_batch, b[f"_b_{c}"]).otherwise(state[c])
            if replace_rows
            else F.coalesce(b[f"_b_{c}"], state[c])
        ).alias(c)
        for c in value_cols
    ]
    return joined.select(*out_cols)


class StateStore:
    """Bucketed-parquet keyed table with MERGE-style upsert batches.

    Schema evolution: reopening a store with a WIDER schema (upstream DDL
    added a nullable column) just works — the explicit-schema parquet read
    returns null for the new column on pre-evolution bucket files, and the
    coalesce merge fills values in as batches arrive; reopening NARROWER
    projects the surviving columns. No rewrite, no migration job — pinned
    by test_statestore_schema_evolution_across_restart."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        schema: T.StructType,
        n_buckets: int = 64,
        bucket_cols: list[str] | None = None,
    ) -> None:
        """``bucket_cols``: hash-bucket on a PREFIX of the key instead of
        the whole key (must be a prefix so every full key still lands in
        exactly one bucket) — lets a composite-keyed store, e.g. a
        per-entity change log keyed (id, seq), prune reads by the leading
        column alone ("all of this id's rows")."""
        # LOCAL-FILESYSTEM-ONLY, enforced: the bucket swap / snapshot /
        # purge protocols use os.rename + hardlinks, so a remote URI
        # (hdfs://, s3a://, even file://) would make exists() always-False
        # — st06's enrich_epoch would silently join an EMPTY dimension side
        # while writes kept landing (ADVICE r10). Fail fast instead; the
        # lakehouse swap-in for remote stores is MERGE INTO (module
        # docstring / DEPLOY.md).
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", path):
            raise ValueError(
                f"StateStore is local-filesystem-only (got URI {path!r}); "
                "use a plain local path, or a Delta/Iceberg MERGE INTO "
                "sink for remote storage (see DEPLOY.md)"
            )
        self.spark = spark
        self.path = path
        self.key_cols = key_cols
        self.schema = schema
        self.n_buckets = n_buckets
        if bucket_cols is not None and key_cols[: len(bucket_cols)] != bucket_cols:
            raise ValueError(
                f"bucket_cols {bucket_cols} must be a prefix of key_cols {key_cols}"
            )
        self.bucket_cols = bucket_cols or key_cols
        # heal a crashed rebucket swap BEFORE anything reads or writes,
        # then adopt the persisted geometry: the on-disk _STORE_META wins
        # over the constructor argument so call sites need no change when
        # an operator rebuckets a live store (VERDICT r10 #2).
        self._recover_rebucket()
        meta = self._read_meta()
        if meta is not None and "n_buckets" in meta:
            self.n_buckets = int(meta["n_buckets"])

    # -- helpers ------------------------------------------------------------
    def _bucket_col(self, n_buckets: int | None = None) -> F.Column:
        key = F.concat_ws("\x1f", *[F.col(k) for k in self.bucket_cols])
        n = self.n_buckets if n_buckets is None else n_buckets
        return F.pmod(F.xxhash64(key), F.lit(n)).cast("int")

    def _read_meta(self) -> dict | None:
        import json

        try:
            with open(os.path.join(self.path, _META), encoding="utf-8") as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _write_meta(self, dir_path: str | None = None, n_buckets: int | None = None) -> None:
        import json

        target = dir_path or self.path
        if not os.path.isdir(target):
            return
        tmp = os.path.join(target, _META + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(
                {"n_buckets": n_buckets if n_buckets is not None else self.n_buckets},
                fh,
            )
        os.replace(tmp, os.path.join(target, _META))

    def _recover_rebucket(self) -> None:
        """Finish or roll back a rebucket swap interrupted by a crash.

        The swap protocol (``rebucket``) has exactly four crash windows;
        each leaves an unambiguous layout, so recovery is decision-free:

        - staging WITHOUT the commit marker → the staged write never
          finished: delete staging, the live store is untouched;
        - staging WITH the marker (live dir present or already renamed
          away) → the new geometry is committed: complete the swap;
        - leftover ``.__rebucket_old__`` next to a live store → the swap
          finished but cleanup didn't: delete it;
        - a stray commit marker inside the live store → final tidy-up.
        """
        old = self.path + ".__rebucket_old__"
        import glob

        for stg in glob.glob(glob.escape(self.path) + ".__rebucket_*__"):
            if stg == old:
                continue
            if os.path.isfile(os.path.join(stg, _REBUCKET_COMMIT)):
                # committed: the staged copy IS the store now
                if os.path.isdir(self.path):
                    shutil.rmtree(self.path)
                os.rename(stg, self.path)
            else:
                shutil.rmtree(stg, ignore_errors=True)
        if os.path.isdir(old):
            if os.path.isdir(self.path):
                shutil.rmtree(old, ignore_errors=True)
            else:  # unreachable under the protocol order, but heal anyway
                os.rename(old, self.path)
        marker = os.path.join(self.path, _REBUCKET_COMMIT)
        if os.path.isfile(marker):
            os.remove(marker)

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            e.startswith(f"{_BUCKET}=") for e in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        """Current state (without the bucket column)."""
        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        return self._read_with_bucket().drop(_BUCKET)

    def _read_with_bucket(self) -> DataFrame:
        return (
            self.spark.read.schema(
                T.StructType(
                    list(self.schema.fields)
                    + [T.StructField(_BUCKET, T.IntegerType(), True)]
                )
            )
            .option("basePath", self.path)
            .parquet(self.path)
        )

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        """State rows of the given buckets only (partition-pruned scan,
        bucket column dropped) — the shared read recipe of the merge path
        and the rollup pre/post snapshots."""
        if not buckets or not self.exists():
            return self.spark.createDataFrame([], self.schema)
        return (
            self._read_with_bucket()
            .filter(F.col(_BUCKET).isin(buckets))
            .drop(_BUCKET)
        )

    def lookup(self, keys: list[tuple] | list) -> DataFrame:
        """Point lookup by primary key — the Kudu read pattern the
        reference's consumers use downstream (openTable + key scan).
        Computes the keys' buckets driver-side with the same hash the
        writer used, scans ONLY those bucket directories (partition
        pruning at file-listing time), then filters to the exact keys.
        Cost is O(|keys| buckets) regardless of table size — the
        point-read property a keyed store owes its users.

        ``keys``: list of key tuples (or scalars for single-column keys),
        in the key columns' declared types."""
        import pyspark.sql.functions as _F

        if not self.exists():
            return self.spark.createDataFrame([], self.schema)
        norm_keys = [
            k if isinstance(k, tuple) else (k,) for k in keys
        ]
        if not norm_keys:
            return self.spark.createDataFrame([], self.schema)
        key_schema = T.StructType(
            [
                next(f for f in self.schema.fields if f.name == kc)
                for kc in self.key_cols
            ]
        )
        from ..functions.localframe import local_frame

        kdf = local_frame(self.spark, norm_keys, key_schema)
        buckets = [
            r["b"]
            for r in kdf.select(self._bucket_col().alias("b")).distinct().collect()
        ]
        return self.read_buckets(buckets).join(
            _F.broadcast(kdf), self.key_cols, "left_semi"
        )

    # -- the merge ----------------------------------------------------------
    def upsert_batch(self, batch: DataFrame, replace_rows: bool = False) -> None:
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
            self._write_meta()  # pin the geometry at creation
            return
        # Cache the folded batch: it is read twice (affected-bucket scan
        # + the merge itself) and folding is the expensive part.
        batch = batch.persist()
        affected = [r[0] for r in batch.select(_BUCKET).distinct().collect()]
        state = self.read_buckets(affected)  # partition-pruned scan
        merged = merge_upserts(
            state, batch.drop(_BUCKET), self.key_cols, replace_rows=replace_rows
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


    def snapshot(self):
        """Context manager yielding a snapshot-isolated view of the store.

        ``read()`` lists bucket directories lazily at job time, so a
        concurrent ``upsert_batch`` swapping buckets mid-query can serve
        some buckets pre-merge and others post-merge — or fail outright
        on a vanished file (the swap deletes replaced files by path). A
        reporting query running WHILE the stream merges wants one
        consistent version.

        Implementation: hardlink the current file set into a temp sibling
        directory (no data copy; the links keep the bytes alive after the
        swap unlinks the originals) and read from there; the links are
        dropped on exit. On object stores with native versioning
        (S3/GCS), pin object versions instead — this is the plain-FS
        equivalent.

            with store.snapshot() as df:
                df.groupBy(...).agg(...)
        """
        import contextlib
        import uuid

        @contextlib.contextmanager
        def _snap():
            if not self.exists():
                yield self.spark.createDataFrame([], self.schema)
                return
            snap_dir = f"{self.path}.__snap_{uuid.uuid4().hex[:8]}__"
            os.makedirs(snap_dir)
            try:
                n = 0
                for entry in sorted(os.listdir(self.path)):
                    if not entry.startswith(f"{_BUCKET}="):
                        continue
                    d = os.path.join(self.path, entry)
                    for f in os.listdir(d):
                        if not f.endswith(".parquet"):
                            continue
                        src = os.path.join(d, f)
                        dst = os.path.join(snap_dir, f"{n:06d}.parquet")
                        try:
                            os.link(src, dst)
                        except OSError:  # cross-device / FS without links
                            shutil.copy2(src, dst)
                        n += 1
                if n == 0:
                    yield self.spark.createDataFrame([], self.schema)
                else:
                    yield self.spark.read.schema(self.schema).parquet(snap_dir)
            finally:
                shutil.rmtree(snap_dir, ignore_errors=True)

        return _snap()

    def rewrite_buckets(self, buckets: list[int], content: DataFrame) -> None:
        """Replace the given buckets' contents WHOLESALE with ``content``
        (the caller supplies exactly those buckets' intended rows — this
        is the delete-capable primitive upsert can't be: rows absent from
        ``content`` are gone after the swap). Same staged-write +
        per-bucket directory rename protocol as the merge path; a bucket
        with no surviving rows is removed outright. Cost tracks the
        rewritten buckets, never the table.

        Crash contract — atomic PER BUCKET, not across buckets: the final
        swap is a loop of rmtree+rename, so a crash mid-loop leaves some
        buckets rewritten and the rest at their prior contents, with no
        marker distinguishing the two. Callers must therefore be
        idempotent-by-re-run — ``content`` must be recomputable from the
        (possibly half-swapped) store such that re-running the whole
        operation converges (``purge_closed_before`` documents exactly
        this property: a close-date predicate is true of both old and new
        bucket states). Do NOT build on this primitive if a half-applied
        rewrite would be unrecoverable; that caller needs a commit-marker
        protocol (write all staged buckets, fsync a manifest, then swap)
        this local-FS store deliberately keeps out of scope."""
        if not buckets:
            return
        df = content.select(
            [F.col(f.name) for f in self.schema.fields]
        ).withColumn(_BUCKET, self._bucket_col())
        staging = f"{self.path}.__rewrite_staging__"
        shutil.rmtree(staging, ignore_errors=True)
        (
            df.repartition(_BUCKET)
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(staging)
        )
        # Guard against silent loss: a content row hashing OUTSIDE the
        # bucket list would be written to staging and then deleted with
        # the staging dir. The staged directory listing is the cheap,
        # job-free place to catch that caller bug as an error.
        staged = {
            int(e.split("=", 1)[1])
            for e in os.listdir(staging)
            if e.startswith(f"{_BUCKET}=")
        }
        extra = staged - set(buckets)
        if extra:
            shutil.rmtree(staging, ignore_errors=True)
            raise ValueError(
                f"rewrite_buckets: content contains rows for buckets "
                f"{sorted(extra)} not in the rewrite list {sorted(buckets)} "
                "— refusing to drop them"
            )
        for b in buckets:
            src = os.path.join(staging, f"{_BUCKET}={b}")
            dst = os.path.join(self.path, f"{_BUCKET}={b}")
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                os.rename(src, dst)
        shutil.rmtree(staging, ignore_errors=True)

    def rebucket(self, n_new: int) -> None:
        """Online bucket-count migration (VERDICT r10 #2 — the last 100 TB
        maintenance op): rewrite the WHOLE table once at the new hash
        geometry, then swap it in atomically. DEPLOY.md tells operators to
        scale n_buckets with table size (the ×91 stress measured why:
        probe cost tracks touched buckets, so a store that outgrew its
        bucket count serves every batch from a few giant files); before
        this, changing n_buckets meant an undocumented by-hand rewrite.

        Protocol (single-writer, like every other mutation here):

        1. stage the full table re-hashed to ``n_new`` buckets at
           ``{path}.__rebucket_{n_new}__`` — ONE distributed job, the only
           full-table pass; readers keep using the live store throughout;
        2. write the staged ``_STORE_META`` (n_new), then the
           ``_REBUCKET_COMMIT`` marker LAST — the commit point;
        3. swap: rename live → ``.__rebucket_old__``, staging → live,
           drop the marker, delete old.

        A crash anywhere replays through ``_recover_rebucket`` (runs at
        every handle construction): before the marker the operation
        vanishes, after it the swap completes — never a half-geometry
        store. Point lookups from a handle opened mid-recovery see either
        the old or the new geometry, both correct, because the hash
        modulus always travels WITH the directory via ``_STORE_META``
        (the constructor's n_buckets is just the initial default).

        Cost: one full-table read+write — O(table), unavoidable for a
        modulus change, but bounded, restartable, and done ONCE per
        capacity step (vs every batch overpaying on a wrong geometry).
        """
        if n_new < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_new}")
        self._recover_rebucket()
        if n_new == self.n_buckets:
            return
        if not self.exists():
            self.n_buckets = n_new
            self._write_meta()  # no-op if the dir doesn't exist yet
            return
        staging = f"{self.path}.__rebucket_{n_new}__"
        shutil.rmtree(staging, ignore_errors=True)
        (
            self.read()
            .withColumn(_BUCKET, self._bucket_col(n_buckets=n_new))
            .repartition(_BUCKET)
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(staging)
        )
        self._write_meta(dir_path=staging, n_buckets=n_new)
        # commit point: marker lands only after the staged copy + meta are
        # fully on disk (os-level create after the write job returned)
        with open(os.path.join(staging, _REBUCKET_COMMIT), "w", encoding="utf-8") as fh:
            fh.write(f"{self.n_buckets}->{n_new}\n")
        old = self.path + ".__rebucket_old__"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.path, old)
        os.rename(staging, self.path)
        os.remove(os.path.join(self.path, _REBUCKET_COMMIT))
        shutil.rmtree(old, ignore_errors=True)
        self.n_buckets = n_new

    # -- housekeeping -------------------------------------------------------
    def purge_soft_deleted(
        self,
        older_than: str,
        delete_col: str = "delete_state",
        ts_col: str = "time_stamp",
    ) -> int:
        """Retention pass: physically remove soft-deleted rows whose audit
        timestamp is older than ``older_than`` (the delete-scan job Kudu
        operators schedule; logical deletes stay queryable until then —
        reference semantics keep D rows with delete_state='1' forever).

        Only buckets CONTAINING purgeable rows are rewritten (one pruned
        probe for the bucket set, then the same staged per-bucket swap the
        merge uses); a bucket left empty is removed outright. Returns the
        number of rows purged. At 100 TB the cost tracks the purgeable
        buckets, not the table — and because every bucket is one file,
        the rewrite is a bounded, restartable job (idempotent: re-running
        purges nothing the second time)."""
        if not self.exists():
            return 0
        purgeable = (F.col(delete_col) == "1") & (F.col(ts_col) < older_than)
        probe = (
            self._read_with_bucket()
            .filter(purgeable)
            .groupBy(_BUCKET)
            .count()
            .collect()
        )
        if not probe:
            return 0
        affected = [r[_BUCKET] for r in probe]
        n_purged = sum(r["count"] for r in probe)
        kept = (
            self._read_with_bucket()
            .filter(F.col(_BUCKET).isin(affected))
            .filter(~purgeable)
        )
        staging = f"{self.path}.__purge_staging__"
        shutil.rmtree(staging, ignore_errors=True)
        (
            kept.repartition(_BUCKET)
            .write.mode("overwrite")
            .partitionBy(_BUCKET)
            .parquet(staging)
        )
        for b in affected:
            src = os.path.join(staging, f"{_BUCKET}={b}")
            dst = os.path.join(self.path, f"{_BUCKET}={b}")
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):
                os.rename(src, dst)
            # else: the bucket held only purgeable rows — it stays gone
        shutil.rmtree(staging, ignore_errors=True)
        return int(n_purged)


_TABLE = "_table"

# names safe to round-trip through a Spark partition directory unescaped
_SAFE_NAME = re.compile(r"^[A-Za-z0-9_.\-]+$")


def _schemas_compatible(stores: list[StateStore]) -> bool:
    """unionByName requires any column name shared across tables to carry
    one type. Real catalogs can violate that (emp.id int vs audit.id
    string), so the combined write guards and falls back to per-table."""
    seen: dict[str, T.DataType] = {}
    for s in stores:
        for f in s.schema.fields:
            if f.name in seen and seen[f.name] != f.dataType:
                return False
            seen[f.name] = f.dataType
    return True


def upsert_many(
    spark: SparkSession,
    merges: list[tuple[StateStore, DataFrame]],
    affected: dict[str, list[int]] | None = None,
) -> None:
    """MERGE several tables' batches in at most TWO Spark jobs total,
    instead of two jobs per table.

    The per-table ``upsert_batch`` costs one job to materialize the fold
    (persist + affected-bucket collect) and one to write the merged
    buckets; with T tables that is 2T jobs whose fixed scheduling cost
    dominates a rate-capped micro-batch on a big cluster. Here:

    1. the affected (table → buckets) set is either supplied by the caller
       (``affected`` — cdc.sync_batch derives it from the pre-fold keys,
       one cheap distinct, overlapped with its stats job) or computed by
       tagging + unioning + persisting all batches (one job);
    2. each table's batch full-outer-merges against its bucket-pruned
       state, the merged outputs are unioned by name, and ONE staged write
       partitioned by (_table, _bucket) lands everything — when
       ``affected`` was supplied, the folds, merges and write all fuse
       into this single job; the bucket directories are then swapped per
       table exactly like upsert_batch.

    CALLER CONTRACT for ``affected``: it must be a superset of the buckets
    each batch actually touches (under-approximation would replace an
    unread state bucket with batch-only rows and lose history — pinned by
    test_upsert_many_affected_matches_bucket_col).

    The staged files carry the union-by-name schema (absent columns are
    null-RLE, ~free in parquet); reads stay correct because StateStore.read
    prunes to each table's declared schema. If two tables declare the same
    column name with different types the union is ill-typed, so we fall
    back to per-table upserts (same semantics, more jobs).
    """
    merges = [(s, b) for s, b in merges if b is not None]
    if not merges:
        return
    # Fall back to per-table upserts when the combined write can't be
    # trusted: conflicting column types break the unionByName; a table
    # name Spark would percent-escape in a partition path (space, ':',
    # '%', …) would break the literal f"_table={name}" directory lookup in
    # the swap loop — the batch would be written to staging and then
    # silently discarded; and two stores from DIFFERENT parent dirs with
    # the SAME basename would collide on the _table= tag and cross-merge
    # each other's rows (VERDICT r4 #5 / ADVICE — unreachable from cdc.py's
    # single warehouse dir, but the public function allows it).
    basenames = [os.path.basename(s.path.rstrip("/")) for s, _ in merges]
    if (
        not _schemas_compatible([s for s, _ in merges])
        or not all(_SAFE_NAME.match(n) for n in basenames)
        or len(set(basenames)) != len(basenames)
    ):
        for store, batch in merges:
            store.upsert_batch(batch)
        return

    union = None
    if affected is None:
        tagged = []
        for store, batch in merges:
            tagged.append(
                batch.select([F.col(f.name) for f in store.schema.fields])
                .withColumn(_BUCKET, store._bucket_col())
                .withColumn(_TABLE, F.lit(os.path.basename(store.path)))
            )
        union = tagged[0]
        for t in tagged[1:]:
            union = union.unionByName(t, allowMissingColumns=True)
        union = union.persist()
    try:
        if union is not None:
            affected = {}
            for r in union.select(_TABLE, _BUCKET).distinct().collect():
                affected.setdefault(r[_TABLE], []).append(r[_BUCKET])

        merged_parts = []
        for store, batch in merges:
            name = os.path.basename(store.path)
            if not affected.get(name):
                continue  # no rows for this table in the batch (S5 per table)
            if union is not None:
                part = union.filter(F.col(_TABLE) == name).select(
                    [F.col(f.name) for f in store.schema.fields]
                )
            else:
                part = batch.select(
                    [F.col(f.name) for f in store.schema.fields]
                )
            if store.exists():
                state = store.read_buckets(affected[name])
                part = merge_upserts(state, part, store.key_cols)
            merged_parts.append(
                part.withColumn(_BUCKET, store._bucket_col()).withColumn(
                    _TABLE, F.lit(name)
                )
            )
        if not merged_parts:
            return
        out = merged_parts[0]
        for p in merged_parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)

        staging_root = os.path.dirname(merges[0][0].path.rstrip("/"))
        staging = os.path.join(staging_root, "__staging_many__")
        shutil.rmtree(staging, ignore_errors=True)
        (
            out.repartition(F.col(_TABLE), F.col(_BUCKET))
            .write.mode("overwrite")
            .partitionBy(_TABLE, _BUCKET)
            .parquet(staging)
        )
    finally:
        if union is not None:
            union.unpersist()
    for store, _ in merges:
        name = os.path.basename(store.path)
        src_tab = os.path.join(staging, f"{_TABLE}={name}")
        if not os.path.isdir(src_tab):
            continue
        os.makedirs(store.path, exist_ok=True)
        for entry in os.listdir(src_tab):
            if not entry.startswith(f"{_BUCKET}="):
                continue
            dst = os.path.join(store.path, entry)
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(os.path.join(src_tab, entry), dst)
        if store._read_meta() is None:
            store._write_meta()  # first write of this table: pin geometry
    shutil.rmtree(staging, ignore_errors=True)


def propagate_deletes(
    forget: DataFrame,
    direct: dict[str, tuple[DataFrame, str]],
    cascade: dict[str, tuple[DataFrame, str, str, str]] | None = None,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Compliance delete propagation (px23) — the right-to-be-forgotten
    sweep every data platform eventually runs: given a one-column
    ``forget`` frame of keys to erase, anti-join every ``direct`` table
    (name → (df, key_col)) against it, and CASCADE through foreign keys
    (child name → (child_df, child_fk, parent_name, parent_pk)): a
    child row dies when its FK points at a parent row being deleted —
    the lineitem-of-a-forgotten-customer's-order shape. The reference's
    delete is per-record logical (delete_state='1',
    KuduManager.scala:78-84); this is the BATCH physical sweep that a
    retention/compliance job layers on top.

    Returns ``(scrubbed, audit)``: the scrubbed frames (callers write
    them back through the StateStore / partitioned-write discipline so
    only affected buckets rewrite), and a one-row-per-table audit
    (table_name, n_before, n_deleted, n_retained) — the evidence a
    compliance run must produce.

    Scale: the forget list is a bounded request list — broadcast it;
    the cascaded parent-PK set can be arbitrarily large, so those
    anti-joins stay shuffle-planned (AQE picks broadcast when it fits).
    Every table is scanned twice (audit count + scrub) — at 100 TB run
    the audit off the scrub's write metrics instead."""
    fcol = forget.columns[0]
    fkeys = F.broadcast(forget.select(F.col(fcol).alias("_forget_k")).distinct())

    scrubbed: dict[str, DataFrame] = {}
    audits: list[DataFrame] = []

    def _audit(name: str, df: DataFrame, doomed_keys: DataFrame, key: str) -> None:
        hit = df.join(doomed_keys, F.col(key) == F.col(doomed_keys.columns[0]), "left_semi")
        n_before = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_before"))
        n_del = hit.agg(F.count(F.lit(1)).cast("bigint").alias("n_deleted"))
        audits.append(
            n_before.crossJoin(n_del).select(
                F.lit(name).alias("table_name"),
                "n_before",
                "n_deleted",
                (F.col("n_before") - F.col("n_deleted"))
                .cast("bigint")
                .alias("n_retained"),
            )
        )

    for name, (df, key) in direct.items():
        _audit(name, df, fkeys, key)
        scrubbed[name] = df.join(
            fkeys, F.col(key) == F.col("_forget_k"), "left_anti"
        )

    for name, (df, fk, parent_name, parent_pk) in (cascade or {}).items():
        pdf, pkey = direct[parent_name]
        doomed = (
            pdf.join(fkeys, F.col(pkey) == F.col("_forget_k"), "left_semi")
            .select(F.col(parent_pk).alias("_doomed_pk"))
            .distinct()
        )
        _audit(name, df, doomed, fk)
        scrubbed[name] = df.join(
            doomed, F.col(fk) == F.col("_doomed_pk"), "left_anti"
        )

    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionAll(a)
    return scrubbed, audit.orderBy("table_name")

"""Partitioned parquet output sink for analytic results.

The write-side twin of the scan-side pruning the queries rely on: laying
results out as ``path/col=value/`` directories means a downstream reader's
filter on the partition column never touches non-matching files
(PartitionFilters at the scan — asserted in tests/test_sinks.py).

File sizing: repartitioning by the partition columns before partitionBy
gives exactly one file per partition value per write (each shuffle
partition holds whole partition values). For very large single partitions,
``files_per_partition`` > 1 re-splits them by adding a uniform salt so no
single output file becomes a multi-GB straggler — the two knobs that
matter at 100 TB (too many small files vs. unsplittable huge ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(*cols, bits: int = 16):
    """Z-order (Morton) key over integer-castable columns: interleave the
    top ``bits`` bits of each column's value so rows close in EVERY
    dimension land close in the sort order. Sorting a file (or table) by
    this key tightens per-row-group min/max ranges on ALL participating
    columns at once, so parquet row-group skipping prunes multi-dimensional
    predicates — the layout trick Delta/Iceberg expose as OPTIMIZE ZORDER,
    built here from pure Catalyst bit arithmetic (shiftleft/shiftright/
    bitwise or), no UDF.

    Columns are first rank-normalized by the caller if their domains are
    skewed; here we take the low ``bits`` bits of the bigint cast, which is
    right for dense ids and epoch-derived values.

    ``bits`` is clamped to ``63 // len(cols)`` so the highest interleaved bit
    position (bits*n - 1) stays below the int64 sign bit: JVM shiftleft wraps
    the shift amount mod 64, so an unclamped 4-column x 16-bit key would
    silently fold high bits onto low positions and destroy the clustering.
    """
    key = F.lit(0).cast("bigint")
    n = len(cols)
    bits = min(bits, 63 // n)
    if n == 2 and bits == 16:
        # hot path: the magic-number bit spread in operators/layout.py is
        # bit-identical to this loop for two 16-bit dims (pinned by
        # test_zorder_key_paths_agree) and compiles to ~10 codegen ops
        # instead of 32 per-bit terms
        from ..operators.layout import zorder_key as _zkey2

        a, b = (
            (F.col(c) if isinstance(c, str) else c).cast("bigint")
            .bitwiseAND(F.lit(0xFFFF))
            for c in cols
        )
        return _zkey2(a, b)
    for dim, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for b in range(bits):
            src_bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(src_bit, b * n + dim).cast("bigint")
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    mode: str = "overwrite",
    bits: int = 16,
    options: dict | None = None,
) -> None:
    """Write parquet clustered by a Z-order key: range-repartition then
    sortWithinPartitions on the key, so both file-level and row-group-level
    min/max stats are tight in every z-ordered dimension."""
    # Rescale every dimension to the full [0, 2^bits) range first (one tiny
    # min/max agg): without this, the dimension with the widest raw domain
    # owns all the key's top bits and the curve degenerates into a plain
    # sort on that column — ranks/ranges, not raw values, must interleave.
    stats = df.agg(
        *[F.min(F.col(c).cast("bigint")).alias(f"{c}_min") for c in zorder_cols],
        *[F.max(F.col(c).cast("bigint")).alias(f"{c}_max") for c in zorder_cols],
    ).collect()[0]
    bits = min(bits, 63 // len(zorder_cols))  # same clamp as zorder_key
    top = (1 << bits) - 1
    scaled = []
    for c in zorder_cols:
        lo, hi = stats[f"{c}_min"], stats[f"{c}_max"]
        span = max(hi - lo, 1)
        scaled.append(
            ((F.col(c).cast("bigint") - F.lit(lo)) * top / F.lit(span))
            .cast("bigint")
        )
    key = zorder_key(*scaled, bits=bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(
            int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")), "__zkey"
        )
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .options(**(options or {}))
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        split = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_partition)
        )
        # explicit partition count: AQE would otherwise coalesce the salted
        # shuffle back together and undo the split
        n_values = df.select(*partition_cols).distinct().count()
        out = df.repartition(max(n_values, 1) * files_per_partition, *cols, split)
    else:
        out = df.repartition(*cols)
    (
        out.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table hash-bucketed (and sorted) on its join key, so every
    future equi-join or aggregation on that key runs WITHOUT an Exchange:
    Spark records the bucketing in the catalog and matching scans arrive
    pre-partitioned (and pre-sorted, eliding the sort of a sort-merge
    join). This is the 100 TB answer for a fact table joined repeatedly on
    one key — pay the shuffle once at write time, never again; two tables
    bucketed the same way co-locate and join shuffle-free
    (test_bucketed_join_has_no_exchange plan-asserts both properties).

    Uses ``saveAsTable`` because bucket metadata lives in the session
    catalog — path-based parquet has nowhere to record it. ``path`` makes
    the table external (data at that location, metadata in the catalog)."""
    w = (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)

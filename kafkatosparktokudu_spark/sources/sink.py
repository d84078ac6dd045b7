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

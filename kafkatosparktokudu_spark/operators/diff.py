"""Snapshot diff — row-level change classification between two versions
of a keyed table (the audit/reconciliation pass of a CDC warehouse: what
did this sync/backfill actually change?).

Complements the reference's forward-only upsert pipeline
(KuduManager.scala:71-95 applies changes but can never report them):
``snapshot_diff`` recovers the change set from any two materialized
states — e.g. a StateStore snapshot before and after a batch, or a table
vs its backfilled rebuild.

Scale shape: ONE full-outer sort-merge join on the key (the minimum any
diff must pay); column comparison is a codegen'd null-safe expression
per column, no Python. Pre-bucketed snapshots (sources/sink.py::
write_bucketed) co-locate and drop the Exchange entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every key as added / removed / changed / unchanged.

    Returns ``keys + (change_type, diff_cols)`` where ``diff_cols`` is
    the sorted array of compared columns whose values differ (null-safe:
    NULL vs NULL is equal, NULL vs value differs). ``compare_cols``
    defaults to the non-key columns present in BOTH snapshots; a column
    present in only one snapshot is ignored rather than reported, so
    schema evolution between snapshots doesn't flood the diff.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("snapshot_diff needs at least one key column")
    cols = (
        list(compare_cols)
        if compare_cols is not None
        else [c for c in new.columns if c not in keys and c in old.columns]
    )
    missing = [c for c in cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare_cols absent from a snapshot: {missing}")
    o = old.select(
        *keys,
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")
    diff_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                        F.lit(c),
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diff_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        change.alias("change_type"),
        F.when(change == "changed", diff_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("diff_cols"),
    )

"""Incremental aggregate-view maintenance over CDC state — the "ETL to
dashboard" layer the reference's users build by hand downstream of Kudu
(full re-aggregation per refresh). Here the rollup is maintained by DELTAS:

    delta(group) = contrib(post-merge rows of the batch's keys)
                 − contrib(pre-merge rows of the batch's keys)
    rollup(group) += delta(group)

so refresh cost tracks the micro-batch, never the table. Handles the three
classic subtleties of incremental view maintenance:

- a key MOVING groups (dept change) — its old group gets a negative
  contribution from the pre-merge row, the new group a positive one;
- soft deletes — ``delete_state='1'`` rows contribute nothing, so a delete
  subtracts the row's prior contribution and adds nothing back;
- resurrection / partial updates — the post-merge row carries the full
  coalesced current values, so contributions are always whole-row.

Only invertible aggregates (count, sum — and anything derived from them:
avg, ratios) can be maintained this way; min/max need re-aggregation of the
touched groups. Sums accumulate in DECIMAL so incremental and from-scratch
aggregation agree bit-for-bit (float addition is not associative; decimal
addition is) — the ``cdc_dept_rollup`` query hash-checks exactly that
equivalence against a from-scratch DuckDB fold.

Scale shape: contributions are two hash aggs over the batch's keyed rows
(already in memory from the merge's own read), the delta is group-keyed
(tiny), and the rollup update is one StateStore upsert over the touched
groups' buckets.

CRASH-SAFETY CAVEAT (weaker than the base merge): the base-table MERGE is
idempotent under checkpoint replay, but the rollup delta is NOT — if the
process dies after the base merge and before the rollup write, the replayed
batch sees pre == post and contributes a zero delta, so that batch's rollup
contribution is lost. The base tables stay correct; recover the view by
re-deriving it from the base table (one groupBy — the same query the
``cdc_dept_rollup`` oracle runs). A transactional sink (Delta/Iceberg
MERGE with txn ids) would close this gap; on plain parquet, periodic
re-derivation is the honest answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import DELETE_STATE
from .merge import StateStore

# Exact accumulation type for the maintained sum (DECIMAL addition is
# associative, so incremental == from-scratch regardless of batch split).
_SUM_DEC = "decimal(22,2)"


def rollup_schema(group_field: T.StructField) -> T.StructType:
    """Schema of the maintained view: (group, n_alive, sum_dec)."""
    return T.StructType(
        [
            group_field,
            T.StructField("n_alive", T.LongType(), True),
            T.StructField("sum_dec", T.DecimalType(22, 2), True),
        ]
    )


def _contrib(rows: DataFrame, group_col: str, sum_col: str, sign: int) -> DataFrame:
    """Signed (count, sum) contribution of alive rows, per group.

    The sum is coalesced to 0: a group whose only rows carry a null
    ``sum_col`` must contribute d_sum=0, not NULL — a NULL delta would
    propagate through maintain_rollup's addition and clobber the group's
    accumulated sum."""
    alive = rows.filter(
        (F.col(DELETE_STATE).isNull() | (F.col(DELETE_STATE) != "1"))
        & F.col(group_col).isNotNull()
    )
    return alive.groupBy(group_col).agg(
        (F.lit(sign) * F.count(F.lit(1))).alias("d_n"),
        (
            F.lit(sign)
            * F.coalesce(
                F.sum(F.col(sum_col).cast(_SUM_DEC)), F.lit(0).cast(_SUM_DEC)
            )
        )
        .cast(_SUM_DEC)
        .alias("d_sum"),
    )


def rollup_delta(
    pre: DataFrame, post: DataFrame, group_col: str, sum_col: str
) -> DataFrame:
    """Per-group (d_n, d_sum) between the batch keys' pre- and post-merge
    state rows. ``pre``/``post`` must contain exactly the rows of the
    batch's keys (the merge path already materializes both)."""
    d = _contrib(post, group_col, sum_col, +1).unionByName(
        _contrib(pre, group_col, sum_col, -1)
    )
    return d.groupBy(group_col).agg(
        F.sum("d_n").alias("d_n"),
        F.sum("d_sum").cast(_SUM_DEC).alias("d_sum"),
    )


def maintain_rollup(
    spark: SparkSession,
    rollup: StateStore,
    delta: DataFrame,
    group_col: str,
) -> None:
    """Apply a delta to the maintained view: rollup[group] += delta.

    Only the groups present in the delta are read and rewritten (upsert's
    bucket pruning); groups untouched by the batch never move. Zero-alive
    groups keep their row (n_alive=0) as an audit trail — readers filter
    ``n_alive > 0`` for the live view.
    """
    cur = rollup.read().select(
        F.col(group_col),
        F.col("n_alive").alias("_cur_n"),
        F.col("sum_dec").alias("_cur_sum"),
    )
    updated = delta.join(cur, group_col, "left").select(
        F.col(group_col),
        (F.coalesce(F.col("_cur_n"), F.lit(0)) + F.col("d_n")).alias("n_alive"),
        (
            F.coalesce(F.col("_cur_sum"), F.lit(0).cast(_SUM_DEC))
            + F.col("d_sum")
        )
        .cast(_SUM_DEC)
        .alias("sum_dec"),
    )
    rollup.upsert_batch(updated)


def sync_with_rollup(
    spark: SparkSession,
    state: StateStore,
    typed_batch: DataFrame,
    rollup: StateStore,
    group_col: str,
    sum_col: str,
) -> None:
    """One micro-batch: MERGE the (folded, typed) batch into ``state`` and
    maintain the rollup view in the same pass. The pre/post reads join on
    the batch's keys — the same affected-bucket data the merge itself
    touches."""
    keys = typed_batch.select(state.key_cols).distinct()
    # localCheckpoint PINS the pre-merge rows: the merge below rewrites the
    # state files in place, so a lazy `pre` would silently re-read the
    # post-merge data when the delta finally evaluates.
    pre = state.read().join(keys, state.key_cols).localCheckpoint()
    state.upsert_batch(typed_batch)
    post = state.read().join(keys, state.key_cols)
    delta = rollup_delta(pre, post, group_col, sum_col)
    maintain_rollup(spark, rollup, delta, group_col)

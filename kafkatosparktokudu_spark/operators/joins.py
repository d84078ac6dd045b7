"""Join operators Spark lacks as built-ins: as-of join and broadcast range join.

The reference has no relational joins at all (SURVEY.md §2.2 — its per-record
Kudu ``openTable`` + upsert is a point lookup, /root/reference/.../
KuduManager.scala:70-73); these fill the standard-category gap with
scale-first formulations.

As-of join strategy (the part that matters at 100 TB): the naive plan —
``left ⋈ right ON key AND r.ts <= l.ts`` then argmax per left row — explodes
to O(|matches|) intermediate rows before reducing. Instead we UNION the two
sides, sort once within each key partition by (ts, side), and carry the most
recent right payload forward with ``last(ignorenulls=True)``. Cost: ONE
shuffle on the key, no pair explosion, and Tungsten's in-memory sort per
partition — the same shape Flink's interval joins and kdb's ``aj`` use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_SIDE = "_asof_side"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest ``ts_col``
    <= the left row's ``ts_col`` (``direction="backward"``, the default) or
    the smallest ``ts_col`` >= it (``direction="forward"``) within the same
    ``on`` keys (ASOF LEFT JOIN; ties at equal ts match in both directions).

    ``right`` must be unique per (*on, ts_col) — pre-fold duplicates with
    ``max_by`` so the match is deterministic. Unmatched left rows keep nulls.
    ``tolerance``: optional max lookback/lookahead interval (e.g.
    ``F.expr("INTERVAL 1 HOUR")``); matches outside it are nulled,
    mirroring pandas ``merge_asof(tolerance=...)``.

    Plan shape (both directions): union + ONE window pass — never a pair
    join, so no O(left×right) blowup per key at scale.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c) for c in right_value_cols]
    )
    # side ordering makes equal-ts right rows land INSIDE the frame:
    # backward scans (-∞, current] so right sorts before left; forward
    # scans [current, +∞) so right sorts after left.
    r_side, l_side = (0, 1) if backward else (1, 0)
    r = right.select(
        *on,
        F.col(ts_col),
        F.lit(r_side).alias(_SIDE),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in on and c != ts_col],
    )
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(l_side).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[c for c in left.columns if c not in on and c != ts_col],
    )
    if backward:
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(ts_col), F.col(_SIDE))
            .rowsBetween(W.unboundedPreceding, 0)
        )
        pick = F.last(_PAYLOAD, ignorenulls=True)
    else:
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(ts_col), F.col(_SIDE))
            .rowsBetween(0, W.unboundedFollowing)
        )
        pick = F.first(_PAYLOAD, ignorenulls=True)
    matched = l.unionByName(r).withColumn(_PAYLOAD, pick.over(w))
    out = matched.filter(F.col(_SIDE) == l_side)
    if tolerance is not None:
        in_range = (
            F.col(f"{_PAYLOAD}._ts") >= F.col(ts_col) - tolerance
            if backward
            else F.col(f"{_PAYLOAD}._ts") <= F.col(ts_col) + tolerance
        )
        out = out.withColumn(_PAYLOAD, F.when(in_range, F.col(_PAYLOAD)))
    return out.select(
        *on,
        ts_col,
        *[c for c in left.columns if c not in on and c != ts_col],
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_value_cols: list[str],
    tolerance_us: int,
) -> DataFrame:
    """pandas ``merge_asof(direction="nearest", tolerance=...)`` parity:
    for each left row, the right row (same ``on`` keys, unique per
    (*on, ts)) with the smallest |Δts|, at most ``tolerance_us``
    microseconds away; equidistant candidates break BACKWARD.

    Plan shape: one union + ONE key-partitioned sort carrying BOTH the
    backward candidate (``last ignorenulls`` over RANGE(-∞, 0]) and the
    forward candidate (``first ignorenulls`` over RANGE[0, +∞)) — range
    frames on epoch microseconds make equal-ts rows frame members in
    both directions regardless of intra-tie sort order, and the right
    side's (*on, ts) uniqueness makes each pick deterministic. No pair
    join, no O(matches) blowup; same single-shuffle cost as the
    one-direction ``asof_join``.
    """
    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c) for c in right_value_cols]
    )
    r = right.select(
        *on,
        F.col(ts_col),
        payload.alias(_PAYLOAD),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in on and c != ts_col
        ],
    )
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[c for c in left.columns if c not in on and c != ts_col],
    )
    # session TZ is pinned UTC by the loader, so the NTZ->TS cast
    # matches DuckDB epoch_us on naive timestamps
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = W.partitionBy(*on).orderBy(epoch)
    back = F.last(_PAYLOAD, ignorenulls=True).over(
        base.rangeBetween(W.unboundedPreceding, 0)
    )
    fwd = F.first(_PAYLOAD, ignorenulls=True).over(
        base.rangeBetween(0, W.unboundedFollowing)
    )
    cand = (
        l.unionByName(r)
        .withColumn("_bk", back)
        .withColumn("_fw", fwd)
        # left rows are the ones that carried no payload of their own
        .filter(F.col(_PAYLOAD).isNull())
    )
    bk_gap = epoch - F.unix_micros(F.col("_bk._ts").cast("timestamp"))
    fw_gap = F.unix_micros(F.col("_fw._ts").cast("timestamp")) - epoch
    bk_ok = F.col("_bk").isNotNull() & (bk_gap <= F.lit(tolerance_us))
    fw_ok = F.col("_fw").isNotNull() & (fw_gap <= F.lit(tolerance_us))
    pick = (
        F.when(bk_ok & (~fw_ok | (bk_gap <= fw_gap)), F.col("_bk"))
        .when(fw_ok, F.col("_fw"))
    )
    out = cand.withColumn(_PAYLOAD, pick)
    return out.select(
        *on,
        ts_col,
        *[c for c in left.columns if c not in on and c != ts_col],
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_value_cols],
        F.when(
            F.col(_PAYLOAD).isNotNull(),
            F.abs(
                F.unix_micros(F.col(f"{_PAYLOAD}._ts").cast("timestamp"))
                - epoch
            ),
        ).alias("asof_gap_us"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi join with key salting for skewed left keys.

    A hot key (one value carrying a large share of the left side) pins a
    sort-merge join to one straggler task. Salting splits it: the left side
    gets a per-row salt in [0, n_salts) (hash of the whole row, so it is
    deterministic and spreads a hot key's rows evenly); the right side is
    replicated once per salt via ``explode(sequence(...))``; joining on
    (keys + salt) fans the hot key across n_salts tasks. Result is
    row-identical to the unsalted join (tested). Right-side cost: n_salts×
    replication — use for dimension-sized right sides; for two big skewed
    sides prefer AQE skew-join (on in session defaults), which splits at
    runtime without replication.

    Only left-preserving join types are allowed: the right side is
    replicated n_salts times, so 'right'/'full' would emit each unmatched
    right row once per salt — silently wrong results, hence the hard error.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}, "
            f"got {how!r}: the replicated right side would duplicate unmatched "
            "right rows under 'right'/'full' semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("_salt", salt.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, on + ["_salt"], how).drop("_salt")


def broadcast_range_join(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Theta join of a fact column into [lo, hi) bands.

    The band table is small by construction (it's a config), so broadcast
    nested-loop is the right physical plan at any fact size — each task
    scans its fact partition once against the in-memory band list; no
    shuffle at all. With a large range table the scalable rewrite is binning
    both sides to equi-join keys; not needed for band semantics.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(ranges), cond, "left")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Blocked interval-OVERLAP join: every (left, right) row pair whose
    CLOSED time intervals intersect (l.start <= r.end AND r.start <=
    l.end). Output columns are the inputs' columns prefixed ``l_`` /
    ``r_`` — callers add their own pair predicates (e.g. ``l_user_id <
    r_user_id``) on top.

    Scale shape — the standard interval-blocking recipe: each interval
    explodes into its coarse time chunks (floor(start/chunk) ..
    floor(end/chunk)); candidates join on the chunk id (ONE equi-shuffle
    keyed on time chunk — never an unbounded theta join), the exact
    interval test runs as a join residual, and pairs spanning several
    chunks dedup with one distinct. Cost is O(total chunks + true pairs);
    pick ``chunk_seconds`` near the median interval length (chunks/row →
    ~1-2). Second-truncated chunk ids cannot lose candidates: any shared
    instant's chunk lies inside both rows' truncated chunk ranges. Hot
    chunks (everyone active at 9am) are the skew case — AQE's skew-join
    split handles moderate skew; salt the chunk id beyond that.

    Input contract (both enforced/documented, not assumed):

    - Rows with a NULL start or end explode into no chunks and are
      silently absent from the output (an interval with an unknown
      endpoint has no defined overlap); filter-and-handle them upstream
      if they matter.
    - Rows with end < start are DROPPED (filtered before the explode —
      a descending ``sequence`` would otherwise still emit chunks for a
      nonsensical interval); validate upstream if they indicate a bug.
    - Inputs must be duplicate-free ROWS: the cross-chunk dedup is a
      ``distinct`` over all output columns, so two byte-identical input
      rows collapse to one pair. Carry a unique key column if genuine
      duplicates are meaningful.
    """

    def chunked(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.filter(
            F.col(start_col) <= F.col(end_col)
        ).select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        )
        s, e = f"{prefix}{start_col}", f"{prefix}{end_col}"
        return renamed.withColumn(
            f"{prefix}chunk",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / chunk_seconds),
                    F.floor(F.unix_timestamp(F.col(e)) / chunk_seconds),
                )
            ),
        )

    a = chunked(left, "l_")
    b = chunked(right, "r_")
    cond = (
        (F.col("l_chunk") == F.col("r_chunk"))
        & (F.col(f"l_{start_col}") <= F.col(f"r_{end_col}"))
        & (F.col(f"r_{start_col}") <= F.col(f"l_{end_col}"))
    )
    return (
        a.join(b, cond)
        .drop("l_chunk", "r_chunk")
        .distinct()
    )

"""Unit semantics for operators.joins: as-of join and broadcast range join."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafkatosparktokudu_spark.operators.joins import asof_join, broadcast_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l1"),
            (1, _ts("2024-01-01 12:00:00"), "l2"),
            (1, _ts("2024-01-01 09:00:00"), "l0"),  # before any right row
            (2, _ts("2024-01-01 10:30:00"), "l3"),
            (3, _ts("2024-01-01 10:00:00"), "l4"),  # key absent on right
        ],
        "k int, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (2, _ts("2024-01-01 10:30:00"), 30.0),  # tie with left ts
        ],
        "k int, ts timestamp, rval double",
    )
    return left, right


def test_asof_basic_and_ties(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], ts_col="ts", right_value_cols=["rval"])
    got = {r["lval"]: r["rval"] for r in out.collect()}
    assert got == {
        "l0": None,  # no right row at or before 09:00
        "l1": 10.0,  # 09:30 is latest <= 10:00
        "l2": 20.0,  # 11:00 is latest <= 12:00
        "l3": 30.0,  # equal timestamps match (>= semantics)
        "l4": None,  # key 3 never on right
    }
    assert out.count() == left.count()  # left-join cardinality preserved


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        ts_col="ts",
        right_value_cols=["rval"],
        tolerance=F.expr("INTERVAL 45 MINUTES"),
    )
    got = {r["lval"]: r["rval"] for r in out.collect()}
    # l1: match at 09:30 within 45min of 10:00 → kept
    # l2: match at 11:00 is 60min before 12:00 → nulled by tolerance
    assert got["l1"] == 10.0
    assert got["l2"] is None
    assert got["l3"] == 30.0  # zero lag always within tolerance


def test_asof_plan_single_shuffle(spark):
    """The scale contract: one Exchange for the union+window, no join node."""
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], ts_col="ts", right_value_cols=["rval"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no pair-explosion join anywhere
    assert plan.count("Exchange hashpartitioning") == 1


def test_broadcast_range_join_boundaries(spark):
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 49.99), (3, 50.0), (4, 150.0), (5, -1.0)],
        "id int, value double",
    )
    tiers = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e9, "high")],
        "lo double, hi double, tier string",
    )
    out = broadcast_range_join(fact, tiers, "value")
    got = {r["id"]: r["tier"] for r in out.collect()}
    # [lo, hi): 50.0 belongs to mid, 150.0 to high, -1 matches nothing (left join)
    assert got == {1: "low", 2: "low", 3: "mid", 4: "high", 5: None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_aqe_skew_join_splits_hot_key(spark):
    """AQE skew-join (on in session defaults) splits a hot key's partition
    at runtime: a 70%-of-rows key joined sort-merge (broadcast disabled)
    must show skew=true in the final adaptive plan, with correct results —
    the no-replication complement to salted_join for big×big skew."""
    prev = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        ]
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        n = 400_000
        left = spark.range(n).select(
            F.when(F.col("id") % 10 < 7, 0)
            .otherwise(F.pmod(F.col("id"), F.lit(100)))
            .cast("long")
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.upper(F.md5(F.col("id").cast("string"))).alias("dim")
        )
        joined = left.join(right, "k", "inner")
        # collect() executes THIS DataFrame's queryExecution, so the
        # adaptive plan below is the final (post-reoptimization) one
        rows = joined.collect()
        assert len(rows) == n  # every left row matches exactly one dim
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_interval_overlap_join_planted(spark):
    """Closed-interval semantics: boundary touch counts, disjoint does
    not; a pair spanning many chunks appears exactly once (chunk-dedup);
    multi-hour intervals still match."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.operators.joins import interval_overlap_join

    def ts(s):
        return f"2024-01-01 {s}"

    left = spark.createDataFrame(
        [
            (1, ts("00:00:00"), ts("05:00:00")),  # 5h: spans 6 chunks
            (2, ts("10:00:00"), ts("10:30:00")),
            (3, ts("20:00:00"), ts("20:10:00")),
        ],
        "lid int, a string, b string",
    ).select("lid", F.col("a").cast("timestamp").alias("s"), F.col("b").cast("timestamp").alias("e"))
    right = spark.createDataFrame(
        [
            (10, ts("01:00:00"), ts("09:59:59")),  # overlaps 1 (within), NOT 2
            (20, ts("10:30:00"), ts("11:00:00")),  # touches 2's end exactly
            (30, ts("20:10:01"), ts("21:00:00")),  # 1s after 3 ends: disjoint
        ],
        "rid int, a string, b string",
    ).select("rid", F.col("a").cast("timestamp").alias("s"), F.col("b").cast("timestamp").alias("e"))
    got = {
        (r["l_lid"], r["r_rid"])
        for r in interval_overlap_join(left, right, "s", "e", 3600).collect()
    }
    assert got == {(1, 10), (2, 20)}
    # each pair exactly once despite the 5h interval hitting many chunks
    rows = interval_overlap_join(left, right, "s", "e", 3600).collect()
    assert len(rows) == 2


# --- asof_join_nearest (pandas merge_asof direction="nearest" parity) ---


def _nearest_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "n1"),  # back 30m vs fwd 60m → back
            (1, _ts("2024-01-01 10:50:00"), "n2"),  # back 80m vs fwd 10m → fwd
            (1, _ts("2024-01-01 09:00:00"), "n3"),  # only fwd (30m)
            (2, _ts("2024-01-01 10:30:00"), "n4"),  # equidistant 30m → backward
            (3, _ts("2024-01-01 10:00:00"), "n5"),  # key absent on right
            (4, _ts("2024-01-01 10:00:00"), "n6"),  # equal-ts right row → gap 0
        ],
        "k int, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (2, _ts("2024-01-01 10:00:00"), 30.0),
            (2, _ts("2024-01-01 11:00:00"), 40.0),
            (4, _ts("2024-01-01 10:00:00"), 50.0),
        ],
        "k int, ts timestamp, rval double",
    )
    return left, right


def test_asof_nearest_directions_and_ties(spark):
    from kafkatosparktokudu_spark.operators.joins import asof_join_nearest

    left, right = _nearest_frames(spark)
    out = asof_join_nearest(
        left, right, on=["k"], ts_col="ts", right_value_cols=["rval"],
        tolerance_us=24 * 3600 * 1_000_000,
    )
    got = {r["lval"]: (r["rval"], r["asof_gap_us"]) for r in out.collect()}
    assert got == {
        "n1": (10.0, 30 * 60 * 1_000_000),
        "n2": (20.0, 10 * 60 * 1_000_000),
        "n3": (10.0, 30 * 60 * 1_000_000),
        "n4": (30.0, 30 * 60 * 1_000_000),  # equidistant → BACKWARD
        "n5": (None, None),
        "n6": (50.0, 0),
    }
    assert out.count() == left.count()


def test_asof_nearest_tolerance(spark):
    from kafkatosparktokudu_spark.operators.joins import asof_join_nearest

    left, right = _nearest_frames(spark)
    out = asof_join_nearest(
        left, right, on=["k"], ts_col="ts", right_value_cols=["rval"],
        tolerance_us=15 * 60 * 1_000_000,  # 15 minutes
    )
    got = {r["lval"]: r["rval"] for r in out.collect()}
    # n1's best candidate is 30m away → nulled; n2's fwd 10m survives
    assert got["n1"] is None
    assert got["n2"] == 20.0
    assert got["n4"] is None
    assert got["n6"] == 50.0


def test_asof_nearest_plan_single_shuffle(spark):
    from kafkatosparktokudu_spark.operators.joins import asof_join_nearest

    left, right = _nearest_frames(spark)
    out = asof_join_nearest(
        left, right, on=["k"], ts_col="ts", right_value_cols=["rval"],
        tolerance_us=3_600_000_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # both directions from ONE union+window pass
    assert plan.count("Exchange hashpartitioning") == 1

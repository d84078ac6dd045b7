"""Streaming smoke tests (SURVEY.md §5.3): file-source Structured Streaming
through the same sync path as batch; checkpoint stop/resume; event-time
window parity with the batch query surface."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kafkatosparktokudu_spark.catalog import default_catalog
from kafkatosparktokudu_spark.cdc import apply_changes, read_fixture
from kafkatosparktokudu_spark.config import PipelineConfig
from kafkatosparktokudu_spark.operators.merge import StateStore
from kafkatosparktokudu_spark.sources.batch import load_table
from kafkatosparktokudu_spark.streaming.pipeline import (
    file_source,
    start_cdc_sync,
    stream_dedup,
    windowed_rollup,
)
from kafkatosparktokudu_spark.streaming.replay import (
    offsets_csv_to_starting_json,
    read_checkpoint_offsets,
)

FIXTURE = Path("/root/repo/fixtures/ogg_changes.jsonl")


def _cfg(tmp_path: Path) -> PipelineConfig:
    return PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        metrics_dir=str(tmp_path / "metrics"),
    )


def _emp_state(spark, cfg):
    cat = default_catalog()
    store = StateStore(spark, f"{cfg.warehouse_dir}/emp", ["id"], cat["emp"].full_schema, 64)
    return {
        r["id"]: (r["name"], r["salary"], r["delete_state"])
        for r in store.read().collect()
    }


def test_stream_cdc_equals_batch(spark, tmp_path):
    """availableNow drain of the fixture through foreachBatch == one-shot
    batch replay."""
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "part-000.jsonl")
    cfg = _cfg(tmp_path)
    q = start_cdc_sync(spark, file_source(spark, str(src)), cfg, available_now=True)
    q.awaitTermination(120)
    got = _emp_state(spark, cfg)
    want_df = apply_changes(spark, read_fixture(spark))["emp"]
    want = {
        r["id"]: (r["name"], r["salary"], r["delete_state"])
        for r in want_df.collect()
    }
    assert got == want
    # metrics log written (LoggerManager parity)
    logs = list(Path(cfg.metrics_dir).glob("tbLog*.log"))
    assert logs and "rate:" in logs[0].read_text()


def test_stream_checkpoint_resume_no_loss_no_dup(spark, tmp_path):
    """Stop after half the input, append the rest, restart on the same
    checkpoint: final state identical to a single run (no loss, no dupes)."""
    lines = FIXTURE.read_text().splitlines()
    mid = len(lines) // 2
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(lines[:mid]) + "\n")
    cfg = _cfg(tmp_path)

    q = start_cdc_sync(spark, file_source(spark, str(src)), cfg, available_now=True)
    q.awaitTermination(120)
    partial = _emp_state(spark, cfg)

    (src / "b.jsonl").write_text("\n".join(lines[mid:]) + "\n")
    q = start_cdc_sync(spark, file_source(spark, str(src)), cfg, available_now=True)
    q.awaitTermination(120)
    resumed = _emp_state(spark, cfg)
    assert partial != resumed  # second half actually processed

    # checkpoint recorded offsets and is inspectable
    ck = read_checkpoint_offsets(cfg.checkpoint_dir)
    assert ck and ck["batch"] >= 1

    # oracle: per-batch python replay (cross-batch order is ARRIVAL order —
    # the reference's blind-upsert semantics — so a stale-ts record arriving
    # in a later batch legitimately overwrites; LWW holds only within a batch)
    from .test_cdc import _typed, python_replay

    py_state, _ = python_replay([lines[:mid], lines[mid:]])
    want = {
        pk: (row.get("name"), float(row["salary"]) if row.get("salary") else None,
             row["delete_state"])
        for pk, row in py_state["emp"].items()
    }
    assert resumed == want


def test_windowed_rollup_stream_equals_batch(spark, tmp_path):
    """Event-time tumbling window over a stream == the same agg in batch."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # batch side
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_rollup(events).collect()
    }
    # streaming side: feed the same rows through a parquet file stream
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_rollup(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_rollup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("win_rollup").collect()
    }
    assert got == want


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    doubled = events.union(events)
    src = str(tmp_path / "dup_src")
    doubled.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        stream_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.table("dedup_out").count()
    assert n == events.count()


def test_stream_dedup_state_carries_across_micro_batches(spark, tmp_path):
    """The st09 construction, instrumented: the SAME rows arrive twice in
    two files with maxFilesPerTrigger=1, so the second copy lands a LATER
    micro-batch and must be dropped by dedup state (the watermark spans
    the fixture — nothing is late-dropped). Pins both the ≥2-batch drain
    (availableNow honors maxFilesPerTrigger) and the exact output."""
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "xb_src")
    events.coalesce(1).write.parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup(stream, watermark="60 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("xb_dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    fed = [p for p in q.recentProgress if p.numInputRows > 0]
    assert len(fed) >= 2, "second file must arrive in its own micro-batch"
    got = {tuple(r) for r in spark.table("xb_dedup_out").collect()}
    want = {tuple(r) for r in events.collect()}
    assert got == want


def test_offsets_csv_translation():
    csv = "tt,0,39,39\ntt,1,30,30\ntt,2,40,40\ntt,3,107,107\ntt,4,95,95\n"
    assert (
        offsets_csv_to_starting_json(csv)
        == '{"tt": {"0": 39, "1": 30, "2": 40, "3": 107, "4": 95}}'
    )


def test_sliding_rollup_stream_equals_batch(spark, tmp_path):
    """Sliding windows (1h / 30min slide): stream complete-mode == batch."""
    from kafkatosparktokudu_spark.streaming.pipeline import sliding_rollup

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    want = {
        (r["win_start"], r["win_end"], r["event_type"]): (r["n"], r["sum_value"])
        for r in sliding_rollup(events).collect()
    }
    src = str(tmp_path / "slide_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sliding_rollup(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["win_end"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("slide_out").collect()
    }
    assert got == want
    # every event is in exactly window/slide = 2 windows
    assert sum(n for n, _ in got.values()) == 2 * events.count()


def test_session_rollup_stream_equals_batch(spark, tmp_path):
    """Session windows (30min gap): stream == batch session_window agg, and
    both agree with the window-function sessionization (q17) on counts."""
    from kafkatosparktokudu_spark.streaming.pipeline import session_rollup

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    want = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in session_rollup(events).collect()
    }
    src = str(tmp_path / "sess_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        session_rollup(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in spark.table("sess_out").collect()
    }
    assert got == want
    # cross-check against the batch window-function sessionization (q17)
    from kafkatosparktokudu_spark.plans.queries import q17_sessionize

    q17 = q17_sessionize(spark, "/root/testdata/sf0.001")
    q17_sessions = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in q17.collect()
    }
    assert {k: v[1] for k, v in got.items()} == q17_sessions


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode tumbling window across two checkpointed runs: a record
    older than the committed watermark is discarded, a fresh record lands."""
    from kafkatosparktokudu_spark.streaming.pipeline import windowed_rollup

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")

    def run(name):
        # parquet sink: append-mode + checkpoint-recoverable (memory isn't)
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            windowed_rollup(stream, window="1 hour", watermark="1 hour")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            ((r["hour"], r["event_type"]), (r["n"], r["sum_value"]))
            for r in spark.read.parquet(out).collect()
        ]

    def line(eid, ts, val):
        return (
            f'{{"event_id": {eid}, "ts": "{ts}", "user_id": 1, '
            f'"event_type": "click", "value": {val}}}'
        )

    # run 1: events 10:00-13:00 → watermark commits at 13:00 - 1h = 12:00;
    # append emits windows ending <= 12:00
    (src / "a.jsonl").write_text(
        "\n".join(
            [
                line(1, "2024-01-01 10:15:00", 1.0),
                line(2, "2024-01-01 10:45:00", 2.0),
                line(3, "2024-01-01 11:30:00", 4.0),
                line(4, "2024-01-01 13:00:00", 8.0),
            ]
        )
        + "\n"
    )
    import datetime as dt

    first = dict(run("late_run1"))
    h10 = (dt.datetime(2024, 1, 1, 10, 0), "click")
    assert first[h10] == (2, 3.0)

    # run 2 on the same checkpoint: one record at 10:50 (behind the 12:00
    # watermark → dropped) + one at 15:00 (advances watermark → the 13:00
    # window closes and emits WITHOUT the late record's window changing)
    (src / "b.jsonl").write_text(
        "\n".join(
            [
                line(5, "2024-01-01 10:50:00", 100.0),  # LATE → discarded
                line(6, "2024-01-01 15:00:00", 16.0),
            ]
        )
        + "\n"
    )
    second = run("late_run2")  # cumulative file-sink contents (run1 + run2)
    h10_rows = [v for k, v in second if k == h10]
    # exactly the run-1 emission — the late record neither re-emitted the
    # window nor changed it
    assert h10_rows == [(2, 3.0)]
    h13 = (dt.datetime(2024, 1, 1, 13, 0), "click")
    assert [v for k, v in second if k == h13] == [(1, 8.0)]


def test_stateful_running_totals_across_restarts(spark, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across two
    checkpointed availableNow runs and match the batch aggregate."""
    import pytest as _pytest

    from kafkatosparktokudu_spark.streaming.pipeline import user_running_totals

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "state_src"
    src.mkdir()
    ckpt = str(tmp_path / "state_ckpt")
    out = str(tmp_path / "state_out")
    half_a.write.parquet(str(src / "a"))

    def run(name):
        stream = spark.readStream.schema(events.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            user_running_totals(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # cumulative sink: the row with the max running count per user is
        # that user's latest state (totals only grow)
        latest = (
            spark.read.parquet(out)
            .groupBy("user_id")
            .agg(F.max(F.struct("n_events", "sum_value")).alias("m"))
        )
        return {
            r["user_id"]: (r["m"]["n_events"], r["m"]["sum_value"])
            for r in latest.collect()
        }

    run("state_run1")
    half_b.write.parquet(str(src / "b"))
    final = run("state_run2")

    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(want)
    for uid, (n, s) in want.items():
        fn, fs = final[uid]
        assert fn == n
        assert fs == _pytest.approx(s, rel=1e-9)


def test_tws_running_totals_across_restarts(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 stateful API, RocksDB-backed):
    per-user totals accumulate across two checkpointed availableNow runs and
    match both the batch aggregate and the applyInPandasWithState twin.

    Skipped when protobuf is absent: the TWS state-server protocol imports
    google.protobuf in the Python driver worker (not in this image)."""
    import pytest as _pytest

    _pytest.importorskip(
        "google.protobuf", reason="transformWithState state protocol needs protobuf"
    )

    from kafkatosparktokudu_spark.streaming.pipeline import user_running_totals_tws

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "tws_src"
    src.mkdir()
    ckpt = str(tmp_path / "tws_ckpt")
    out = str(tmp_path / "tws_out")
    half_a.write.parquet(str(src / "a"))

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:

        def run():
            stream = spark.readStream.schema(events.schema).option(
                "recursiveFileLookup", "true"
            ).parquet(str(src))
            q = (
                user_running_totals_tws(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            latest = (
                spark.read.parquet(out)
                .groupBy("user_id")
                .agg(F.max(F.struct("n_events", "sum_value")).alias("m"))
            )
            return {
                r["user_id"]: (r["m"]["n_events"], r["m"]["sum_value"])
                for r in latest.collect()
            }

        run()
        half_b.write.parquet(str(src / "b"))
        final = run()
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )

    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(want)
    for uid, (n, s) in want.items():
        fn, fs = final[uid]
        assert fn == n
        assert fs == _pytest.approx(s, rel=1e-9)


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream interval join (clicks ⋈ purchases within 1h lookback)
    == the identical join run in batch."""
    from kafkatosparktokudu_spark.streaming.pipeline import stream_interval_join

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks_b = events.filter(F.col("event_type") == "click")
    purch_b = events.filter(F.col("event_type") == "purchase")
    want = {
        (r["click_id"], r["purchase_id"])
        for r in stream_interval_join(clicks_b, purch_b).collect()
    }
    assert want, "fixture must produce at least one interval match"

    src = str(tmp_path / "ij_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    clicks_s = stream.filter(F.col("event_type") == "click")
    purch_s = stream.filter(F.col("event_type") == "purchase")
    q = (
        stream_interval_join(clicks_s, purch_s)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.table("ij_out").collect()
    }
    assert got == want


def test_stream_static_enrich(spark, tmp_path):
    """Stream-static join: every streamed order row picks up its customer's
    segment from the static dim; no watermark/state required."""
    from kafkatosparktokudu_spark.streaming.pipeline import stream_static_enrich

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").limit(200)
    cust = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    src = str(tmp_path / "se_src")
    orders.write.parquet(src)
    stream = spark.readStream.schema(orders.schema).parquet(src)
    q = (
        stream_static_enrich(stream, cust, "o_custkey")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("se_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("se_out")
    assert out.count() == orders.count()  # left join keeps cardinality
    n_hit = out.filter(F.col("c_mktsegment").isNotNull()).count()
    want_hit = orders.join(cust, "o_custkey", "left_semi").count()
    assert n_hit == want_hit > 0


def test_stream_interval_left_outer_join(spark, tmp_path):
    """left_outer interval join: matched pairs equal the batch twin; clicks
    the final watermark has PROVEN unmatched are emitted with null purchase
    columns (outer rows emit on state eviction — clicks younger than the
    watermark stay pending by design, so the assertion is bounded by it)."""
    import datetime as dt

    from kafkatosparktokudu_spark.streaming.pipeline import stream_interval_join

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks_b = events.filter(F.col("event_type") == "click")
    purch_b = events.filter(F.col("event_type") == "purchase")
    batch = stream_interval_join(clicks_b, purch_b, how="left_outer").collect()
    want_matched = {
        (r["click_id"], r["purchase_id"]) for r in batch if r["purchase_id"] is not None
    }
    want_null = {r["click_id"]: r["click_ts"] for r in batch if r["purchase_id"] is None}
    assert want_matched and want_null, "fixture must have both outcomes"

    src = str(tmp_path / "loj_src")
    ckpt = str(tmp_path / "loj_ckpt")
    out = str(tmp_path / "loj_out")
    # ONE source file ⇒ one ingest batch: availableNow processes multiple
    # files in multiple batches, and a click file ingested after a
    # newer-purchase file would be dropped as LATE DATA once the watermark
    # advanced past it (legitimate streaming semantics, but it would make
    # this equivalence test arrival-order-dependent).
    events.coalesce(1).write.parquet(src)

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream_interval_join(
                stream.filter(F.col("event_type") == "click"),
                stream.filter(F.col("event_type") == "purchase"),
                how="left_outer",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    run1 = drain()
    got_matched = {
        (r["click_id"], r["purchase_id"]) for r in run1 if r["purchase_id"] is not None
    }
    assert got_matched == want_matched

    # Outer nulls emit on state EVICTION, gated by the GLOBAL watermark =
    # min of BOTH inputs' watermarks — so the newest clicks stay pending
    # until the CLICK side also sees later data (a purchase-only sentinel
    # would advance only one side and the last click would never emit).
    # Sentinels on both sides push the global watermark past every real
    # click's eviction threshold; the second drain (same checkpoint) must
    # then have emitted EXACTLY the unmatched clicks.
    max_ts = events.agg(F.max(F.col("ts").cast("timestamp"))).head()[0]
    one = events.limit(1)
    sentinels = one.select(
        F.lit(10**9).alias("event_id"),
        F.lit(max_ts + dt.timedelta(days=2)).alias("ts"),
        F.lit(-1).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).unionByName(
        one.select(
            F.lit(10**9 + 1).alias("event_id"),
            F.lit(max_ts + dt.timedelta(days=2)).alias("ts"),
            F.lit(-2).alias("user_id"),
            F.lit("purchase").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    sentinels.coalesce(1).write.mode("append").parquet(src)
    run2 = drain()  # file sink accumulates; checkpoint resumes state
    got_null = {
        r["click_id"]
        for r in run2
        if r["purchase_id"] is None and r["click_id"] < 10**9
    }
    assert got_null == set(want_null)


def test_stream_dedup_with_rocksdb_state_store(spark, tmp_path):
    """The same stateful dedup runs on the RocksDB state-store provider —
    the 100 TB configuration (state spills to local disk instead of
    executor heap; incremental checkpointing). Result must equal the
    default-provider run exactly: provider choice is storage, not
    semantics."""
    from kafkatosparktokudu_spark.streaming.pipeline import stream_dedup
    from kafkatosparktokudu_spark.sources.batch import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    doubled = events.union(events)
    src = str(tmp_path / "rdb_src")
    doubled.write.parquet(src)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream_dedup(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("rdb_dedup_out")
            .option("checkpointLocation", str(tmp_path / "rdb_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("rdb_dedup_out").count() == events.count()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_cdc_rollup_view_via_epoch_path(spark, tmp_path):
    """rollups= through the REAL streaming wrapper: foreachBatch passes
    its epoch id into sync_batch, so the view takes the exactly-once
    write-ahead path — after the drain it must equal a from-scratch
    aggregation of the merged base table, and no pending-delta files may
    remain (every epoch fully committed + cleaned)."""
    import os

    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.catalog import default_catalog
    from kafkatosparktokudu_spark.cdc import RollupSpec
    from kafkatosparktokudu_spark.operators.merge import StateStore

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "part-000.jsonl")
    cfg = _cfg(tmp_path)
    spec = RollupSpec(table="emp", group_col="dept_id", sum_col="salary")
    q = start_cdc_sync(
        spark, file_source(spark, str(src)), cfg, available_now=True,
        rollups=[spec],
    )
    q.awaitTermination(120)
    view = {
        r["dept_id"]: (r["n_alive"], float(r["sum_dec"]))
        for r in spec.store(spark, cfg.warehouse_dir, 16)
        .read()
        .filter(F.col("n_alive") > 0)
        .collect()
    }
    cat = default_catalog()
    base = StateStore(
        spark, f"{cfg.warehouse_dir}/emp", ["id"], cat["emp"].full_schema, 16
    )
    direct = {
        r["dept_id"]: (r["n"], float(r["s"]))
        for r in base.read()
        .filter((F.col("delete_state") != "1") & F.col("dept_id").isNotNull())
        .groupBy("dept_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("salary").cast("decimal(22,2)")).alias("s"),
        )
        .collect()
    }
    assert view == direct and view
    pending = [
        p for p in os.listdir(cfg.warehouse_dir)
        if p.endswith("__pending")
        for _ in os.listdir(os.path.join(cfg.warehouse_dir, p))
    ]
    assert pending == [], pending


def test_stream_dedup_ingest_matches_batch_and_replay_converges(spark, tmp_path):
    """The streaming near-dup gate must (1) produce the same flags as the
    sequential batch API when the stream delivers the same two batches,
    and (2) converge under epoch replay: re-running a delivered batch
    appends nothing to the signature store and yields identical flags
    after the self-match normalization."""
    import os

    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.operators.dedup import (
        incremental_neardup_ingest,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.pipeline import start_dedup_ingest

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cut = lo + (hi - lo) // 2
    src = tmp_path / "docs_src"
    src.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1), ordered by id
    docs.filter(F.col("doc_id") < cut).coalesce(1).write.parquet(
        str(src / "b0")
    )
    docs.filter(F.col("doc_id") >= cut).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    store = str(tmp_path / "sig_store")
    flags_dir = str(tmp_path / "flags")
    q = start_dedup_ingest(
        spark, stream, store, str(tmp_path / "ckpt"), flags_dir,
        available_now=True,
    )
    q.awaitTermination(180)
    streamed = {
        r["doc_id"]: (r["is_dup"], r["matched_id"])
        for r in spark.read.parquet(flags_dir).collect()
    }
    # sequential batch-API reference on a fresh store
    ref_store = str(tmp_path / "ref_store")
    ref = {}
    for half in (
        docs.filter(F.col("doc_id") < cut),
        docs.filter(F.col("doc_id") >= cut),
    ):
        for r in incremental_neardup_ingest(half, ref_store).collect():
            ref[r["doc_id"]] = (r["is_dup"], r["matched_id"])
    assert streamed == ref and streamed

    # (2) replay batch 1: store must not grow, normalized flags identical
    stored_before = {
        r["doc_id"] for r in spark.read.parquet(store).collect()
    }
    replay = incremental_neardup_ingest(
        docs.filter(F.col("doc_id") >= cut), store
    )
    replay_norm = {
        r["doc_id"]: (
            r["is_dup"] and r["matched_id"] != r["doc_id"],
            None if r["matched_id"] == r["doc_id"] else r["matched_id"],
        )
        for r in replay.collect()
    }
    stored_after = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert stored_after == stored_before
    want = {k: v for k, v in ref.items() if k >= cut}
    assert replay_norm == want


def test_stream_cdc_processing_time_trigger(spark, tmp_path):
    """The reference's default cadence (S4: processing-time micro-batches)
    through the same wiring: start with a short trigger interval, wait for
    the first non-empty batch via on_batch, stop, and check state landed.
    availableNow covers drain semantics; this covers the live-trigger
    branch of start_cdc_sync."""
    import threading

    from kafkatosparktokudu_spark.config import PipelineConfig

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "part-000.jsonl")
    cfg = PipelineConfig(
        warehouse_dir=str(tmp_path / "wh"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        metrics_dir=str(tmp_path / "metrics"),
        trigger_interval="1 seconds",
    )
    done = threading.Event()
    seen = []

    def on_batch(epoch_id, metrics):
        seen.append((epoch_id, metrics.total))
        done.set()

    q = start_cdc_sync(
        spark, file_source(spark, str(src)), cfg, on_batch=on_batch
    )
    try:
        assert done.wait(timeout=120), "no batch arrived under the trigger"
    finally:
        q.stop()
        q.awaitTermination(60)
    assert seen and seen[0][1] > 0
    got = _emp_state(spark, cfg)
    want_df = apply_changes(spark, read_fixture(spark))["emp"]
    want = {
        r["id"]: (r["name"], r["salary"], r["delete_state"])
        for r in want_df.collect()
    }
    assert got == want


def test_progress_listener_writes_engine_metrics(spark, tmp_path):
    """attach_progress_logger must capture the engine's own per-batch
    progress (numInputRows etc.) for a drained query — the cluster
    metrics channel next to the reference-parity text log."""
    import json
    import os
    import time as _time

    from kafkatosparktokudu_spark.streaming.metrics import (
        attach_progress_logger,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "plog_src")
    events.write.parquet(src)
    out = str(tmp_path / "plog")
    listener = attach_progress_logger(spark, out)
    try:
        q = (
            spark.readStream.schema(events.schema)
            .parquet(src)
            .groupBy("event_type")
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("plog_q")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async; poll briefly
        deadline = _time.time() + 30
        path = os.path.join(out, "progress-plog_q.jsonl")
        while _time.time() < deadline and not os.path.isfile(path):
            _time.sleep(0.5)
        assert os.path.isfile(path), os.listdir(out)
        lines = [json.loads(l) for l in open(path) if l.strip()]
        assert any(p.get("numInputRows", 0) > 0 for p in lines), lines
    finally:
        spark.streams.removeListener(listener)


def test_stream_scd2_sync_matches_oneshot(spark, tmp_path):
    """SCD2 history maintained through the streaming wrapper, drained in
    TWO availableNow runs over a split fixture (second run resumes from
    the checkpoint), equals the one-shot history operator — including the
    fixture's planted late-arriving record in the second half."""
    from kafkatosparktokudu_spark.plans.queries import QUERIES
    from kafkatosparktokudu_spark.streaming.pipeline import start_scd2_sync

    lines = FIXTURE.read_text().splitlines()
    mid = len(lines) // 2
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(lines[:mid]) + "\n")
    store_dir = str(tmp_path / "scd2")
    ckpt = str(tmp_path / "ckpt")

    q = start_scd2_sync(
        spark, file_source(spark, str(src)), "emp", store_dir, ckpt,
        available_now=True,
    )
    q.awaitTermination(120)
    (src / "b.jsonl").write_text("\n".join(lines[mid:]) + "\n")
    q = start_scd2_sync(
        spark, file_source(spark, str(src)), "emp", store_dir, ckpt,
        available_now=True,
    )
    q.awaitTermination(120)

    from kafkatosparktokudu_spark.catalog import default_catalog
    from kafkatosparktokudu_spark.operators.scd2 import Scd2Store

    store = Scd2Store(spark, store_dir, default_catalog()["emp"])
    ref_df = QUERIES["cdc_emp_history"](spark, "/root/testdata/sf0.001")
    cols = [f.name for f in ref_df.schema.fields]
    got = sorted(map(tuple, store.history().select(*cols).collect()), key=repr)
    want = sorted(map(tuple, ref_df.collect()), key=repr)
    assert got == want and len(got) > 0


def test_stream_quality_monitor_reports_planted_violations(spark, tmp_path):
    """Per-epoch constraint reports: the clean first file passes, the
    second file's planted null/orphan rows are counted, and a replayed
    drain (same checkpoint, no new input) adds no new epochs."""
    import json

    from kafkatosparktokudu_spark.operators.quality_checks import (
        ForeignKey,
        NotNull,
    )
    from kafkatosparktokudu_spark.streaming.pipeline import start_quality_monitor

    src = tmp_path / "in"
    src.mkdir()
    clean = [{"id": i, "name": f"n{i}", "ref": 1} for i in range(5)]
    (src / "a.jsonl").write_text("\n".join(json.dumps(r) for r in clean) + "\n")
    parent = spark.createDataFrame([(1,), (2,)], "pid int")
    schema = "id bigint, name string, ref bigint"
    stream = (
        spark.readStream.schema(schema).json(str(src))
    )
    checks = [
        NotNull("stream", "name"),
        ForeignKey("stream", "ref", "parent", "pid"),
    ]
    rep = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")
    q = start_quality_monitor(
        spark, stream, checks, rep, ckpt,
        static_tables={"parent": parent}, available_now=True,
    )
    q.awaitTermination(120)

    dirty = [
        {"id": 10, "name": None, "ref": 1},
        {"id": 11, "name": "x", "ref": 99},   # orphan
        {"id": 12, "name": "y", "ref": None},  # null FK: NOT an orphan
    ]
    (src / "b.jsonl").write_text("\n".join(json.dumps(r) for r in dirty) + "\n")
    q = start_quality_monitor(
        spark, stream, checks, rep, ckpt,
        static_tables={"parent": parent}, available_now=True,
    )
    q.awaitTermination(120)

    reports = spark.read.parquet(rep)
    epochs = sorted(r["epoch"] for r in reports.select("epoch").distinct().collect())
    assert len(epochs) == 2
    by = {
        (r["epoch"], r["check_id"]): r for r in reports.collect()
    }
    e0, e1 = epochs
    assert by[(e0, "not_null:stream.name")]["passed"]
    assert by[(e0, "fk:stream.ref->parent.pid")]["passed"]
    assert by[(e1, "not_null:stream.name")]["n_violations"] == 1
    fk = by[(e1, "fk:stream.ref->parent.pid")]
    assert fk["n_violations"] == 1 and not fk["passed"]
    # replay with no new input: no new epochs
    q = start_quality_monitor(
        spark, stream, checks, rep, ckpt,
        static_tables={"parent": parent}, available_now=True,
    )
    q.awaitTermination(120)
    again = sorted(
        r["epoch"]
        for r in spark.read.parquet(rep).select("epoch").distinct().collect()
    )
    assert again == epochs


def test_stream_interval_full_outer_join(spark, tmp_path):
    """full_outer interval join: matched pairs equal the batch twin, and
    after both-side sentinels advance the global watermark, BOTH
    unmatched clicks (null purchase cols) and unmatched purchases (null
    click cols) have emitted; user_id is non-null on every row (coalesced
    across sides)."""
    import datetime as dt

    from kafkatosparktokudu_spark.streaming.pipeline import stream_interval_join

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks_b = events.filter(F.col("event_type") == "click")
    purch_b = events.filter(F.col("event_type") == "purchase")
    batch = stream_interval_join(clicks_b, purch_b, how="full_outer").collect()
    want_matched = {
        (r["click_id"], r["purchase_id"])
        for r in batch
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    want_click_null = {r["click_id"] for r in batch if r["purchase_id"] is None}
    want_purch_null = {r["purchase_id"] for r in batch if r["click_id"] is None}
    assert want_matched and want_click_null and want_purch_null
    assert all(r["user_id"] is not None for r in batch)

    src = str(tmp_path / "foj_src")
    ckpt = str(tmp_path / "foj_ckpt")
    out = str(tmp_path / "foj_out")
    events.coalesce(1).write.parquet(src)

    def drain():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream_interval_join(
                stream.filter(F.col("event_type") == "click"),
                stream.filter(F.col("event_type") == "purchase"),
                how="full_outer",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    run1 = drain()
    got_matched = {
        (r["click_id"], r["purchase_id"])
        for r in run1
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    assert got_matched == want_matched

    max_ts = events.agg(F.max(F.col("ts").cast("timestamp"))).head()[0]
    one = events.limit(1)
    sentinels = one.select(
        F.lit(10**9).alias("event_id"),
        F.lit(max_ts + dt.timedelta(days=2)).alias("ts"),
        F.lit(-1).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).unionByName(
        one.select(
            F.lit(10**9 + 1).alias("event_id"),
            F.lit(max_ts + dt.timedelta(days=2)).alias("ts"),
            F.lit(-2).alias("user_id"),
            F.lit("purchase").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    sentinels.coalesce(1).write.mode("append").parquet(src)
    run2 = drain()
    real = [r for r in run2 if (r["click_id"] or 0) < 10**9 and (r["purchase_id"] or 0) < 10**9]
    got_click_null = {r["click_id"] for r in real if r["purchase_id"] is None}
    got_purch_null = {r["purchase_id"] for r in real if r["click_id"] is None}
    assert got_click_null == want_click_null
    assert got_purch_null == want_purch_null
    assert all(r["user_id"] is not None for r in real)


def test_webdataset_stream_source_incremental_shards(spark, tmp_path):
    """Streaming WebDataset source: a first availableNow run ingests the
    existing shards; a shard landing later is picked up by a SECOND run
    on the SAME checkpoint with no re-read of the old ones (count-offset
    exactly-once over immutable archives)."""
    import io
    import tarfile

    from kafkatosparktokudu_spark.sources.webdataset import WebDatasetSource

    src = tmp_path / "wds_stream"
    src.mkdir()

    def write_shard(i, ids):
        with tarfile.open(
            str(src / f"shard-{i:05d}.tar"), "w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for d in ids:
                payload = f"payload-{d}".encode()
                info = tarfile.TarInfo(name=f"{d}.bin")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))

    write_shard(0, [1, 2])
    write_shard(1, [3])
    try:
        spark.dataSource.register(WebDatasetSource)
    except Exception:
        pass
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("webdataset")
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out).collect()
    assert sorted(r["doc_id"] for r in first) == [1, 2, 3]

    write_shard(2, [4, 5])
    run_once()
    second = spark.read.parquet(out).collect()
    assert sorted(r["doc_id"] for r in second) == [1, 2, 3, 4, 5]
    by_id = {r["doc_id"]: r for r in second}
    assert bytes(by_id[4]["payload"]) == b"payload-4"
    assert by_id[5]["shard_id"] == 2 and by_id[5]["member_idx"] == 1


def test_observed_metrics_ride_the_action(spark, tmp_path):
    """Observation metrics equal a separate aggregation's numbers but are
    collected by the SAME job as the consuming action (no second scan),
    batch and streaming."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.metrics import observed

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    df, obs = observed(
        events,
        "batch_stats",
        n_rows=F.count(F.lit(1)),
        n_users=F.approx_count_distinct("user_id"),  # distinct aggs are
        # disallowed inside CollectMetrics; the sketch form is the
        # supported shape (and what a metrics channel wants anyway)
        max_value=F.max("value"),
    )
    df.write.format("noop").mode("overwrite").save()
    want = events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct("user_id").alias("n_users"),
        F.max("value").alias("max_value"),
    ).collect()[0]
    got = obs.get
    assert got["n_rows"] == want["n_rows"]
    assert got["n_users"] == want["n_users"]
    assert got["max_value"] == want["max_value"]

    # streaming: observe() metrics surface in progress events
    src = str(tmp_path / "obs_src")
    events.limit(200).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        stream.observe("stream_stats", F.count(F.lit(1)).alias("n_rows"))
        .writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p.get("observedMetrics")]
    assert progresses, "no observedMetrics in any progress event"
    total = sum(
        p["observedMetrics"]["stream_stats"]["n_rows"] for p in progresses
    )
    assert total == 200


def test_full_warehouse_concurrent_streams(spark, tmp_path):
    """The full reference-replacement deployment shape: THREE streaming
    queries over ONE source directory at once — latest-state sync with a
    maintained rollup view, SCD2 history sync, and the dedup-style
    parse path all share the session and the input files with separate
    checkpoints. After a concurrent drain, every sink equals its batch
    twin: no cross-talk, no lost or doubled records."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.catalog import default_catalog
    from kafkatosparktokudu_spark.cdc import RollupSpec, apply_changes, read_fixture
    from kafkatosparktokudu_spark.operators.merge import StateStore
    from kafkatosparktokudu_spark.operators.scd2 import Scd2Store
    from kafkatosparktokudu_spark.plans.queries import QUERIES
    from kafkatosparktokudu_spark.streaming.pipeline import start_scd2_sync

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "part-000.jsonl")
    cfg = _cfg(tmp_path)
    spec = RollupSpec(table="emp", group_col="dept_id", sum_col="salary")
    store_dir = str(tmp_path / "scd2")

    q1 = start_cdc_sync(
        spark, file_source(spark, str(src)), cfg, available_now=True,
        rollups=[spec],
    )
    q2 = start_scd2_sync(
        spark, file_source(spark, str(src)), "emp", store_dir,
        str(tmp_path / "ckpt_scd2"), available_now=True,
    )
    q1.awaitTermination(180)
    q2.awaitTermination(180)

    # state == batch fold
    got_state = _emp_state(spark, cfg)
    want_state = {
        r["id"]: (r["name"], r["salary"], r["delete_state"])
        for r in apply_changes(spark, read_fixture(spark))["emp"].collect()
    }
    assert got_state == want_state

    # rollup view == from-scratch aggregation of the merged base
    cat = default_catalog()
    base = StateStore(
        spark, f"{cfg.warehouse_dir}/emp", ["id"], cat["emp"].full_schema, 16
    )
    direct = {
        r["dept_id"]: r["n"]
        for r in base.read()
        .filter((F.col("delete_state") != "1") & F.col("dept_id").isNotNull())
        .groupBy("dept_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    view = {
        r["dept_id"]: r["n_alive"]
        for r in spec.store(spark, cfg.warehouse_dir, 16)
        .read()
        .filter(F.col("n_alive") > 0)
        .collect()
    }
    assert view == direct

    # SCD2 history == one-shot derivation
    store = Scd2Store(spark, store_dir, cat["emp"])
    ref_df = QUERIES["cdc_emp_history"](spark, "/root/testdata/sf0.001")
    cols = [f.name for f in ref_df.schema.fields]
    got = sorted(map(tuple, store.history().select(*cols).collect()), key=repr)
    want = sorted(map(tuple, ref_df.collect()), key=repr)
    assert got == want and len(got) > 0


def test_webdataset_stream_out_of_order_shard_landing(spark, tmp_path):
    """The review-found count-offset trap: shard-00005 lands and is
    consumed FIRST; shard-00001 (lexicographically earlier) lands later.
    The filename-set offset must still pick it up — nothing skipped,
    nothing doubled."""
    import io
    import tarfile

    from kafkatosparktokudu_spark.sources.webdataset import WebDatasetSource

    src = tmp_path / "wds_ooo"
    src.mkdir()

    def write_shard(i, ids):
        with tarfile.open(
            str(src / f"shard-{i:05d}.tar"), "w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for d in ids:
                payload = f"p{d}".encode()
                info = tarfile.TarInfo(name=f"{d}.bin")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))

    write_shard(5, [50, 51])  # higher-numbered shard finishes first
    try:
        spark.dataSource.register(WebDatasetSource)
    except Exception:
        pass
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("webdataset")
            .option("path", str(src))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [50, 51]

    write_shard(1, [10])  # the straggler lands AFTER shard 5 was consumed
    run_once()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [10, 50, 51]


def test_stream_topk_per_key_across_restarts(spark, tmp_path):
    """Streaming top-k leaderboard: after two checkpointed availableNow
    runs over split halves, each key's LAST emitted top-3 equals the
    batch top-3 over all events (value desc, event_id tie-break)."""
    from kafkatosparktokudu_spark.streaming.pipeline import stream_topk_per_key

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = tmp_path / "topk_src"
    src.mkdir()
    ckpt = str(tmp_path / "topk_ckpt")
    out = str(tmp_path / "topk_out")
    events.filter(F.col("event_id") % 2 == 0).write.parquet(str(src / "a"))

    def run():
        stream = spark.readStream.schema(events.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            stream_topk_per_key(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    events.filter(F.col("event_id") % 2 == 1).write.parquet(str(src / "b"))
    run()

    # last emission per key: the rows from the final batch that touched
    # the key; reconstruct per-key latest = max batch — use the fact that
    # re-emissions only improve (value-desc prefix), so take per (key,
    # rank) the best value seen
    emitted = spark.read.parquet(out)
    best = {
        (r["event_type"], r["rank"]): (r["value"], r["event_id"])
        for r in emitted.groupBy("event_type", "rank")
        .agg(F.max(F.struct(F.col("value"), (-F.col("event_id")).alias("nid"))).alias("m"))
        .select(
            "event_type", "rank", F.col("m.value").alias("value"),
            (-F.col("m.nid")).cast("bigint").alias("event_id"),
        )
        .collect()
    }
    rows = events.select("event_type", "value", "event_id").collect()
    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r["event_type"], []).append(
            (float(r["value"]), r["event_id"])
        )
    for key, vals in per_key.items():
        vals.sort(key=lambda t: (-t[0], t[1]))
        for rank, (v, i) in enumerate(vals[:3], 1):
            bv, bi = best[(key, rank)]
            assert (bv, bi) == (v, i), (key, rank, (bv, bi), (v, i))


def test_stream_zscore_matches_batch_across_restart(spark, tmp_path):
    """Streaming z-score monitor == batch rolling_zscore_anomalies when
    arrival order respects event time: two checkpointed availableNow runs
    over a TIME-split corpus (first half of days, then the rest) must
    emit exactly the batch operator's anomaly set, values bit-equal."""
    from kafkatosparktokudu_spark.operators.quality_checks import (
        rolling_zscore_anomalies,
    )
    from kafkatosparktokudu_spark.streaming.pipeline import stream_zscore_anomalies

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    cut = "2024-01-16"
    src = tmp_path / "zs_src"
    src.mkdir()
    ckpt = str(tmp_path / "zs_ckpt")
    out = str(tmp_path / "zs_out")
    events.filter(F.col("ts") < cut).write.parquet(str(src / "a"))

    def run():
        stream = spark.readStream.schema(events.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            stream_zscore_anomalies(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    events.filter(F.col("ts") >= cut).write.parquet(str(src / "b"))
    run()

    got = sorted(
        (r["event_id"], r["user_id"], r["value"], r["n_window"], r["zscore"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["event_id"], r["user_id"], r["value"], r["n_window"], r["zscore"])
        for r in rolling_zscore_anomalies(events).collect()
    )
    assert got == want


def test_stream_funnel_matches_batch_across_restart(spark, tmp_path):
    """Streaming funnel == the batch q80 strict-order funnel per user:
    two checkpointed availableNow runs over a time-split corpus must
    emit exactly the batch (user, stage, ts) advancement set."""
    from kafkatosparktokudu_spark.streaming.pipeline import stream_funnel

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    cut = "2024-01-16"
    src = tmp_path / "fn_src"
    src.mkdir()
    ckpt = str(tmp_path / "fn_ckpt")
    out = str(tmp_path / "fn_out")
    events.filter(F.col("ts") < cut).write.parquet(str(src / "a"))

    def run():
        stream = spark.readStream.schema(events.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            stream_funnel(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    events.filter(F.col("ts") >= cut).write.parquet(str(src / "b"))
    run()

    got = sorted(
        (r["user_id"], r["stage"], r["ts"])
        for r in spark.read.parquet(out).collect()
    )

    e = events.select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    want = sorted(
        [(r["user_id"], 1, r["t1"]) for r in s1.collect()]
        + [(r["user_id"], 2, r["t2"]) for r in s2.collect()]
        + [(r["user_id"], 3, r["t3"]) for r in s3.collect()]
    )
    assert got == want
    assert len(got) == 45  # all 15 sf0.001 users complete all 3 stages


def test_stream_sessionize_matches_batch_closed_sessions_across_restart(
    spark, tmp_path
):
    """Streaming sessionizer == batch q17 (lag + running sum, 30-min
    gap) on every CLOSED session: two checkpointed availableNow runs
    over a time-split corpus — including sessions that straddle the
    split — must emit exactly the batch session set minus each user's
    final (still-open) session, timestamps microsecond-exact."""
    from pyspark.sql import Window

    from kafkatosparktokudu_spark.streaming.pipeline import stream_sessionize

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    cut = "2024-01-16"
    src = tmp_path / "ss_src"
    src.mkdir()
    ckpt = str(tmp_path / "ss_ckpt")
    out = str(tmp_path / "ss_out")
    events.filter(F.col("ts") < cut).write.parquet(str(src / "a"))

    def run():
        stream = spark.readStream.schema(events.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            stream_sessionize(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    events.filter(F.col("ts") >= cut).write.parquet(str(src / "b"))
    run()

    got = sorted(
        (r["user_id"], r["session_idx"], r["n_events"],
         r["session_start"], r["session_end"])
        for r in spark.read.parquet(out).collect()
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    batch = (
        events.withColumn("session_idx", F.sum(new_session).over(w))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    last = batch.groupBy("user_id").agg(
        F.max("session_idx").alias("last_idx")
    )
    want = sorted(
        (r["user_id"], r["session_idx"], r["n_events"],
         r["session_start"], r["session_end"])
        for r in batch.join(last, "user_id")
        .filter(F.col("session_idx") < F.col("last_idx"))
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_decimal_cents_matches_spark_decimal_cast(spark):
    """decimal_cents must replicate Spark's double→DECIMAL(12,2) rounding
    (HALF_UP) exactly — including the binary-half-cent ties where Python's
    built-in round() (half-even) diverges (the round-8 parity bug)."""
    from kafkatosparktokudu_spark.streaming.pipeline import decimal_cents

    vals = [
        0.125, -0.125, 0.375, -0.375, 2.675, 1.005, 100.115, 0.005,
        -0.005, 0.0, 12.34, -9999.995, 0.015625, 7.125, -7.375,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    want = {
        r["v"]: r["c"]
        for r in df.select(
            "v",
            (F.col("v").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("c"),
        ).collect()
    }
    got = {v: decimal_cents(v) for v in vals}
    assert got == want
    # and the half-even builtin demonstrably disagrees on a tie
    assert decimal_cents(0.125) == 13 != int(round(0.125 * 100))


def test_stream_zscore_halfcent_values_match_batch(spark, tmp_path):
    """End-to-end parity on a corpus built ENTIRELY of binary-representable
    half-cent values (x.xx5 ties) — the class the old round()-based cents
    conversion silently broke."""
    import datetime as dt

    from kafkatosparktokudu_spark.operators.quality_checks import (
        rolling_zscore_anomalies,
    )
    from kafkatosparktokudu_spark.streaming.pipeline import stream_zscore_anomalies

    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(40):
        # steady stream of ±0.125-ish ties with a few 8.375 spikes
        v = 8.375 if i % 13 == 12 else (0.125 if i % 2 == 0 else 0.375)
        rows.append((i, 7, base + dt.timedelta(minutes=i), v))
    events = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    src = tmp_path / "hc_src"
    src.mkdir()
    events.write.parquet(str(src / "a"))
    stream = spark.readStream.schema(events.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    out = str(tmp_path / "hc_out")
    q = (
        stream_zscore_anomalies(stream, threshold=2.0)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "hc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_id"], r["user_id"], r["value"], r["n_window"], r["zscore"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["event_id"], r["user_id"], r["value"], r["n_window"], r["zscore"])
        for r in rolling_zscore_anomalies(events, threshold=2.0).collect()
    )
    assert got == want and len(want) >= 2


def test_stream_ohlc_matches_batch_finalized_windows_across_restart(
    spark, tmp_path
):
    """Streaming OHLC == batch q95 on every FINALIZED window: two
    checkpointed availableNow runs over a time-split corpus; each emitted
    (event_type, hour) row must be bit-equal to the batch candle, and the
    emitted window set must cover everything strictly before the final
    watermark (max event time − 30 min) and nothing after it."""
    from kafkatosparktokudu_spark.plans.queries import QUERIES
    from kafkatosparktokudu_spark.streaming.pipeline import stream_ohlc

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    cut = "2024-01-16"
    src = tmp_path / "oh_src"
    src.mkdir()
    ckpt = str(tmp_path / "oh_ckpt")
    out = str(tmp_path / "oh_out")
    events.filter(F.col("ts") < cut).write.parquet(str(src / "a"))

    def run():
        stream = spark.readStream.schema(events.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            stream_ohlc(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    events.filter(F.col("ts") >= cut).write.parquet(str(src / "b"))
    run()

    key = lambda r: (r["event_type"], r["bucket_ts"])
    got = {key(r): tuple(r) for r in spark.read.parquet(out).collect()}
    batch = {
        key(r): tuple(r)
        for r in QUERIES["st03_ohlc_windows"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got, "no windows finalized"
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch[k])  # bit-equal candles
    import datetime as dt

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - dt.timedelta(minutes=30)
    must = {k for k, v in batch.items() if k[1] + dt.timedelta(hours=1) < wm}
    may = {k for k, v in batch.items() if k[1] + dt.timedelta(hours=1) <= wm}
    assert must <= set(got) <= may, (
        sorted(must - set(got))[:3],
        sorted(set(got) - may)[:3],
    )


def test_stream_zscore_overflow_fallback_matches_batch(spark, tmp_path):
    """Values around $1.5M make len·max_cents² exceed the vectorized
    fold's int64 headroom — the guard must route through the exact scalar
    fold and still match the batch operator bit-for-bit (the corpus stays
    inside batch's own DECIMAL(12,2)/(18,4) headroom)."""
    import datetime as dt

    from kafkatosparktokudu_spark.operators.quality_checks import (
        rolling_zscore_anomalies,
    )
    from kafkatosparktokudu_spark.streaming.pipeline import stream_zscore_anomalies

    base = dt.datetime(2024, 4, 1)
    rows = []
    for i in range(210):
        v = 1_500_000.0 + (i % 7) * 1000.0 + (40000.0 if i % 31 == 30 else 0.0)
        rows.append((i, 3, base + dt.timedelta(minutes=i), v))
    events = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    src = tmp_path / "of_src"
    src.mkdir()
    events.write.parquet(str(src / "a"))
    stream = spark.readStream.schema(events.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    out = str(tmp_path / "of_out")
    q = (
        stream_zscore_anomalies(stream, threshold=2.5)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "of_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r) for r in rolling_zscore_anomalies(events, threshold=2.5).collect()
    )
    assert got == want and len(want) >= 3


def test_stream_zscore_small_batch_huge_values_matches_batch(spark, tmp_path):
    """A SHORT batch of huge values: len*m^2 fits int64 (the old guard
    passed) but the windowed terms n*s2 / s1*s1 reach window^2*m^2 and
    would silently wrap np.int64 — the guard must also bound the window
    terms and fall back to the exact scalar fold. 30 events near $2M (the
    wrap region the 210-row/$1.5M test sat just under, while staying
    inside the batch operator's DECIMAL(18,4) window-s2 headroom:
    20 * (2.1e6)^2 < 1e14)."""
    import datetime as dt

    from kafkatosparktokudu_spark.operators.quality_checks import (
        rolling_zscore_anomalies,
    )
    from kafkatosparktokudu_spark.streaming.pipeline import stream_zscore_anomalies

    base = dt.datetime(2024, 4, 2)
    rows = []
    for i in range(30):
        v = 2_000_000.0 + (i % 5) * 2500.0 + (60000.0 if i in (17, 26) else 0.0)
        rows.append((i, 9, base + dt.timedelta(minutes=i), v))
    events = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    # the wrap is real: window sums s1 ~ 20*2e8 cents -> s1^2 > int64 max,
    # while the cumsum bound len*m^2 (the OLD guard) still passes
    m = 207_000_000  # max |cents|
    assert 20 * 20 * m * m >= (1 << 63) > 30 * m * m
    src = tmp_path / "hv_src"
    src.mkdir()
    events.write.parquet(str(src / "a"))
    stream = spark.readStream.schema(events.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    out = str(tmp_path / "hv_out")
    q = (
        stream_zscore_anomalies(stream, threshold=2.0)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "hv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        tuple(r) for r in rolling_zscore_anomalies(events, threshold=2.0).collect()
    )
    assert got == want and len(want) >= 1


def test_stream_ingest_shards_restart_matches_batch(spark, tmp_path):
    """st04 live pipeline (gate -> score -> stratified deal) across a
    checkpoint RESTART: three files arrive as three epochs with a stop
    after the second; the final assignment must equal the batch twin
    (ingest_shards_epoch replayed sequentially on a fresh store) row for
    row INCLUDING epoch ids, and the global per-(shard, band) balance
    must be exact (counts differ by <= 1 across shards)."""
    import os

    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.pipeline import (
        ingest_shards_epoch,
        read_shard_assignment,
        start_ingest_shard_pipeline,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "n_chars"
    )
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    thirds = [
        docs.filter(F.col("doc_id") < c1),
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)),
        docs.filter(F.col("doc_id") >= c2),
    ]
    src = tmp_path / "docs_src"
    src.mkdir()
    for i, part in enumerate(thirds[:2]):
        part.coalesce(1).write.parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    store = str(tmp_path / "sig_store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_ingest_shard_pipeline(
        spark, stream, store, ckpt, out, available_now=True
    )
    q.awaitTermination(240)
    # restart: third file arrives, same checkpoint
    thirds[2].coalesce(1).write.parquet(str(src / "b2"))
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q2 = start_ingest_shard_pipeline(
        spark, stream2, store, ckpt, out, available_now=True
    )
    q2.awaitTermination(240)
    got = {
        (r["doc_id"], r["band"], r["shard_id"], r["pos_in_shard"], r["epoch"])
        for r in read_shard_assignment(spark, out).collect()
    }
    assert got, "stream produced no assignment"

    # batch twin: same thirds replayed sequentially on a fresh store
    ref_store = str(tmp_path / "ref_store")
    ref_out = str(tmp_path / "ref_out")
    for i, part in enumerate(thirds):
        ingest_shards_epoch(part, i, ref_store, ref_out)
    want = {
        (r["doc_id"], r["band"], r["shard_id"], r["pos_in_shard"], r["epoch"])
        for r in read_shard_assignment(spark, ref_out).collect()
    }
    assert got == want

    # exact stratified balance over the whole accepted history
    counts: dict[tuple[int, int], int] = {}
    by_band: dict[int, list[int]] = {}
    for _, band, shard, pos, _e in got:
        counts[(band, shard)] = counts.get((band, shard), 0) + 1
        by_band.setdefault(band, []).append(pos * 8 + shard)
    for band, ranks in by_band.items():
        assert sorted(ranks) == list(range(len(ranks)))  # dense round-robin
        per_shard = [counts.get((band, s), 0) for s in range(8)]
        assert max(per_shard) - min(per_shard) <= 1, (band, per_shard)


def test_stream_hll_monitor_restart_and_replay_idempotent(spark, tmp_path):
    """st05 live pipeline: registers fold by bucket-wise max across
    epochs and a checkpoint restart; the final estimate equals the BATCH
    sketch of everything seen (merge associativity), and re-folding an
    already-delivered batch leaves the store bit-identical (exactly-once
    with no epoch stamps)."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.operators.sketch import hll_expr_estimate
    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.pipeline import (
        hll_monitor_epoch,
        read_hll_estimate,
        start_hll_monitor,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey"
    )
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    thirds = [
        orders.filter(F.col("o_orderkey") < c1),
        orders.filter((F.col("o_orderkey") >= c1) & (F.col("o_orderkey") < c2)),
        orders.filter(F.col("o_orderkey") >= c2),
    ]
    src = tmp_path / "orders_src"
    src.mkdir()
    for i, part in enumerate(thirds[:2]):
        part.coalesce(1).write.parquet(str(src / f"b{i}"))
    store = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")

    def _stream():
        return (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )

    q = start_hll_monitor(spark, _stream(), "o_custkey", store, ckpt,
                          available_now=True)
    q.awaitTermination(180)
    est2 = read_hll_estimate(spark, store).collect()[0]
    batch2 = hll_expr_estimate(
        thirds[0].unionByName(thirds[1]), "o_custkey"
    ).collect()[0]
    assert est2["hll_estimate"] == batch2["hll_estimate"]

    # replay idempotence: re-fold an already-delivered epoch directly —
    # the replayed epoch reads its PREDECESSOR snapshot and rewrites its
    # own, so the whole snapshot store is bit-identical
    before = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    hll_monitor_epoch(thirds[1], "o_custkey", store, epoch_id=1)
    after = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert before == after

    # crash-safety (ADVICE r9): a writer dying MID-WRITE of its own
    # epoch snapshot must not lose accumulated history — simulate the
    # worst crash window (epoch=1's directory half-gone) and replay
    import shutil as _sh

    _sh.rmtree(f"{store}/epoch=1")
    hll_monitor_epoch(thirds[1], "o_custkey", store, epoch_id=1)
    recovered = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert recovered == before

    # restart with the third file on the same checkpoint
    thirds[2].coalesce(1).write.parquet(str(src / "b2"))
    q2 = start_hll_monitor(spark, _stream(), "o_custkey", store, ckpt,
                           available_now=True)
    q2.awaitTermination(180)
    est3 = read_hll_estimate(spark, store).collect()[0]
    full = hll_expr_estimate(orders, "o_custkey").collect()[0]
    assert est3["hll_estimate"] == full["hll_estimate"]
    assert est3["m"] == 4096


def test_ingest_shards_all_dup_epoch_continues_numbering(spark, tmp_path):
    """st04 epoch body with an epoch that is ENTIRELY duplicates of the
    accepted history: zero accepted docs, the epoch still writes its
    (empty) assignment + carried-forward counters, and a later epoch
    continues the per-band round-robin exactly where epoch 0 left off."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.streaming.pipeline import (
        ingest_shards_epoch,
        read_shard_assignment,
    )

    def mk(ids, text_of):
        return spark.createDataFrame(
            [(i, text_of(i), len(text_of(i))) for i in ids],
            "doc_id bigint, text string, n_chars bigint",
        )

    base_text = lambda i: f"unique document body number {i} " + " ".join(
        f"w{i}x{j}" for j in range(10)
    )
    e0 = mk(range(0, 8), base_text)
    # epoch 1: byte-identical texts under NEW ids -> all near-dups of the store
    e1 = mk(range(100, 108), lambda i: base_text(i - 100))
    e2 = mk(range(200, 206), lambda i: f"fresh content {i} " + " ".join(
        f"z{i}y{j}" for j in range(10)
    ))
    store, out = str(tmp_path / "sigs"), str(tmp_path / "out")
    for ep, df in enumerate((e0, e1, e2)):
        ingest_shards_epoch(df, ep, store, out)
    rows = read_shard_assignment(spark, out).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == {0, 2}          # epoch 1 accepted nothing
    assert len(by_epoch[0]) == 8 and len(by_epoch[2]) == 6
    # numbering continues: within each band, global ranks (pos*8+shard)
    # are dense from 0 across epochs 0 and 2
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], []).append(
            r["pos_in_shard"] * 8 + r["shard_id"]
        )
    for band, ranks in by_band.items():
        assert sorted(ranks) == list(range(len(ranks))), (band, ranks)
    # and the dup epoch's flags point every doc at its stored twin
    flags = {
        r["doc_id"]: (r["is_dup"], r["matched_id"])
        for r in spark.read.parquet(f"{out}/flags/epoch=1").collect()
    }
    assert all(is_dup and m == i - 100 for i, (is_dup, m) in flags.items())


def test_fsio_text_roundtrip_and_direct_file_delete(spark, tmp_path):
    """streaming/fsio.py r13 helpers: control-file text round-trips
    through the Hadoop FileSystem API (absence -> None, overwrite is
    atomic rename-into-place, unicode survives, multi-line content
    preserved), and delete_direct_files removes only root-level files
    of the given suffix — subdirectories (a bucketed layout's partition
    dirs) untouched."""
    from kafkatosparktokudu_spark.streaming.fsio import (
        delete_direct_files,
        read_text,
        write_text_atomic,
    )

    uri = str(tmp_path / "store" / "_META.json")
    assert read_text(spark, uri) is None
    write_text_atomic(spark, uri, '{"n": 1}')
    assert read_text(spark, uri) == '{"n": 1}'
    write_text_atomic(spark, uri, 'line1\nliné2')  # overwrite + unicode
    assert read_text(spark, uri) == 'line1\nliné2'
    root = str(tmp_path / "store")
    spark.range(2).write.mode("overwrite").parquet(f"{root}/sub")
    (tmp_path / "store" / "a.parquet").write_bytes(b"x")
    (tmp_path / "store" / "b.parquet").write_bytes(b"y")
    assert delete_direct_files(spark, root, suffix=".parquet") == 2
    assert not [f for f in (tmp_path / "store").iterdir()
                if f.name.endswith(".parquet") and f.is_file()]
    # subdir parquet (the bucketed layout) survives
    assert spark.read.parquet(f"{root}/sub").count() == 2
    # meta survives too (wrong suffix)
    assert read_text(spark, uri) == 'line1\nliné2'
    assert delete_direct_files(spark, str(tmp_path / "absent")) == 0


def test_fsio_epoch_listing_and_retention(spark, tmp_path):
    """streaming/fsio.py: epoch discovery goes through the Hadoop
    FileSystem API (works for any URI scheme Spark can write, closing
    the r9 os.listdir-on-remote-store advice) and retention keeps the
    newest K snapshots — always including the predecessor a replayed
    epoch reads."""
    import pytest

    from kafkatosparktokudu_spark.streaming.fsio import (
        latest_epoch_before,
        list_epochs,
        prune_epochs,
    )

    base = str(tmp_path / "snaps")
    assert list_epochs(spark, base) == []
    assert latest_epoch_before(spark, base, 5) is None
    one = spark.range(3)
    for e in (0, 1, 2, 5):
        one.write.parquet(f"{base}/epoch={e}")
    # a stray non-epoch dir must be ignored, not crash the listing
    (tmp_path / "snaps" / "epoch=notanint").mkdir()
    (tmp_path / "snaps" / "_misc").mkdir()
    assert list_epochs(spark, base) == [0, 1, 2, 5]
    assert latest_epoch_before(spark, base, 5) == 2
    assert latest_epoch_before(spark, base, 9) == 5
    assert latest_epoch_before(spark, base, 0) is None
    with pytest.raises(ValueError):
        prune_epochs(spark, base, keep_latest=1)
    assert prune_epochs(spark, base, keep_latest=2) == [0, 1]
    assert list_epochs(spark, base) == [2, 5]
    assert prune_epochs(spark, base, keep_latest=2) == []


def test_stream_static_enrichment_sees_dim_updates(spark, tmp_path):
    """st06 live pipeline (streaming/pipeline.py::
    start_state_enriched_stream): a dimension UPSERT between triggers is
    visible to the next trigger — each micro-batch joins the StateStore's
    CURRENT contents (per-epoch store re-read; a plan-time-pinned static
    parquet side would both miss the update and break on the store's
    bucket-swap rewrite). Also pins epoch-replay determinism: re-running
    an epoch body against unchanged dims rewrites identical output."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.merge import StateStore
    from kafkatosparktokudu_spark.streaming.pipeline import (
        enrich_epoch,
        start_state_enriched_stream,
    )

    dim_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("grade", T.IntegerType(), True),
        ]
    )
    store = StateStore(spark, str(tmp_path / "dims"), ["user_id"], dim_schema, 8)
    users = spark.range(20).select(F.col("id").alias("user_id"))
    store.upsert_batch(
        users.select("user_id", (F.col("user_id") % 5).cast("int").alias("grade"))
    )

    src = tmp_path / "events_src"
    src.mkdir()
    ev_schema = "event_id bigint, user_id bigint"
    b0 = spark.range(40).select(
        F.col("id").alias("event_id"), (F.col("id") % 20).alias("user_id")
    )
    b0.coalesce(1).write.parquet(str(src / "b0"))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def _stream():
        return (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )

    q = start_state_enriched_stream(
        spark, _stream(), store, ckpt, out, "user_id", available_now=True
    )
    q.awaitTermination(120)

    # dim update BETWEEN triggers, then the second file on the same ckpt
    store.upsert_batch(
        users.filter(F.col("user_id") % 2 == 0).select(
            "user_id", (F.col("user_id") % 5 + 100).cast("int").alias("grade")
        )
    )
    b1 = spark.range(40, 80).select(
        F.col("id").alias("event_id"), (F.col("id") % 20).alias("user_id")
    )
    b1.coalesce(1).write.parquet(str(src / "b1"))
    q2 = start_state_enriched_stream(
        spark, _stream(), store, ckpt, out, "user_id", available_now=True
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 80
    first = {r["event_id"]: r["grade"] for r in got.filter("event_id < 40").collect()}
    second = {r["event_id"]: r["grade"] for r in got.filter("event_id >= 40").collect()}
    for eid, g in first.items():
        assert g == (eid % 20) % 5, (eid, g)         # v1 dims
    for eid, g in second.items():
        u = eid % 20
        want = u % 5 + 100 if u % 2 == 0 else u % 5  # v2 dims
        assert g == want, (eid, g)

    # replay determinism: rerun the SECOND epoch's body directly (dims
    # unchanged since) — output bit-identical
    epochs = sorted(
        int(d.name.split("=")[1])
        for d in (tmp_path / "out").iterdir()
        if d.name.startswith("epoch=")
    )
    last = epochs[-1]
    before = sorted(tuple(r) for r in spark.read.parquet(f"{out}/epoch={last}").collect())
    enrich_epoch(b1, last, store, out, "user_id")
    after = sorted(tuple(r) for r in spark.read.parquet(f"{out}/epoch={last}").collect())
    assert before == after


def test_hll_estimate_skips_incomplete_epoch(spark, tmp_path):
    """ADVICE r10: a monitor read racing a crash-interrupted epoch write
    must not consume the partial snapshot. read_hll_estimate picks the
    newest epoch WITH a _SUCCESS marker; with none complete it raises
    instead of understating."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.streaming.pipeline import (
        hll_monitor_epoch,
        read_hll_estimate,
    )

    store = str(tmp_path / "regs")
    small = spark.range(100).select(F.col("id").alias("k"))
    big = spark.range(5000).select(F.col("id").alias("k"))
    hll_monitor_epoch(small, "k", store, epoch_id=0)
    est0 = read_hll_estimate(spark, store).collect()[0]["hll_estimate"]
    hll_monitor_epoch(big, "k", store, epoch_id=1)
    est1 = read_hll_estimate(spark, store).collect()[0]["hll_estimate"]
    assert est1 > est0
    # crash window: epoch=1 written but its _SUCCESS never landed — the
    # monitor must fall back to epoch=0's estimate, not fail or understate
    os.remove(f"{store}/epoch=1/_SUCCESS")
    assert read_hll_estimate(spark, store).collect()[0]["hll_estimate"] == est0
    # no complete snapshot at all -> explicit error
    os.remove(f"{store}/epoch=0/_SUCCESS")
    with pytest.raises(ValueError, match="no complete"):
        read_hll_estimate(spark, store)
    # the engine's replay of epoch 1 overwrites the partial dir and heals
    hll_monitor_epoch(big, "k", store, epoch_id=1)
    assert read_hll_estimate(spark, store).collect()[0]["hll_estimate"] == est1


def test_fsio_scheme_qualified_uris(spark, tmp_path):
    """VERDICT r10 #7: the fsio helpers must work with SCHEME-QUALIFIED
    URIs, not just bare paths — exercised end-to-end over ``file://`` (the
    one remote-shaped scheme the sandbox can serve: it resolves through
    the same Hadoop FileSystem.get(uri) dispatch hdfs:///s3a:// would).
    os.listdir-style code would treat these URIs as literal relative
    paths and silently see nothing."""
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.streaming.fsio import (
        dir_has_files,
        epoch_is_complete,
        latest_epoch_before,
        list_epochs,
        prune_epochs,
    )
    from kafkatosparktokudu_spark.streaming.pipeline import (
        hll_monitor_epoch,
        read_hll_estimate,
    )

    base_uri = f"file://{tmp_path}/snaps"
    assert list_epochs(spark, base_uri) == []
    assert not dir_has_files(spark, f"file://{tmp_path}/nowhere")
    one = spark.range(3)
    for e in (0, 1, 4):
        one.write.parquet(f"{base_uri}/epoch={e}")
    assert list_epochs(spark, base_uri) == [0, 1, 4]
    assert latest_epoch_before(spark, base_uri, 4) == 1
    assert epoch_is_complete(spark, base_uri, 4)
    assert not epoch_is_complete(spark, base_uri, 3)
    assert dir_has_files(spark, f"{base_uri}/epoch=0", suffix=".parquet")
    assert not dir_has_files(spark, base_uri, suffix=".parquet")  # dirs only
    assert prune_epochs(spark, base_uri, keep_latest=2) == [0]
    assert list_epochs(spark, base_uri) == [1, 4]
    # and a full store consumer over the URI: the st05 monitor read
    hll_store = f"file://{tmp_path}/regs"
    hll_monitor_epoch(
        spark.range(500).select(F.col("id").alias("k")), "k", hll_store, epoch_id=0
    )
    assert read_hll_estimate(spark, hll_store).collect()[0]["hll_estimate"] > 0


def test_stream_histogram_monitor_restart_and_crash(spark, tmp_path):
    """st07 live pipeline: per-epoch cumulative histogram snapshots
    sum-merge across epochs and a checkpoint restart; the final quantile
    read equals the batch rule over everything seen; a replayed epoch
    rewrites a bit-identical snapshot (counts are NOT merge-idempotent —
    the per-epoch overwrite discipline is what makes replay exactly-once);
    and a crash mid-write of the newest snapshot neither corrupts monitor
    reads (_SUCCESS discipline) nor loses accumulated history."""
    import os
    import shutil as _sh

    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.pipeline import (
        histogram_monitor_epoch,
        read_quantile_estimate,
        start_histogram_monitor,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    thirds = [
        orders.filter(F.col("o_orderkey") < c1),
        orders.filter((F.col("o_orderkey") >= c1) & (F.col("o_orderkey") < c2)),
        orders.filter(F.col("o_orderkey") >= c2),
    ]
    src = tmp_path / "orders_src"
    src.mkdir()
    for i, part in enumerate(thirds[:2]):
        part.coalesce(1).write.parquet(str(src / f"b{i}"))
    store, ckpt = str(tmp_path / "regs"), str(tmp_path / "ckpt")
    W_CENTS = 100_000

    def _stream():
        return (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )

    def batch_quantiles(df):
        # the st07 oracle rule in plain Python over collected cents
        cents = sorted(
            int(r[0]) for r in df.select(
                F.expr("CAST(o_totalprice * 100 AS BIGINT)")
            ).collect()
        )
        total, out = len(cents), {}
        for label, p, q in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
            # smallest bucket whose cumulative count reaches ceil(total*p/q)
            rank = (total * p + q - 1) // q
            out[label] = cents[rank - 1] // W_CENTS
        return out

    q = start_histogram_monitor(
        spark, _stream(), "o_totalprice", store, ckpt, W_CENTS,
        available_now=True,
    )
    q.awaitTermination(180)
    got2 = {
        r["q_label"]: r["bucket"]
        for r in read_quantile_estimate(spark, store, W_CENTS).collect()
    }
    assert got2 == batch_quantiles(thirds[0].unionByName(thirds[1]))

    # replay idempotence: counts would double under naive re-folding —
    # the per-epoch snapshot overwrite makes the store bit-identical
    before = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    histogram_monitor_epoch(thirds[1], "o_totalprice", store, W_CENTS, epoch_id=1)
    after = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert before == after

    # crash window: newest snapshot half-written (no _SUCCESS) — monitor
    # reads fall back to the previous complete epoch; replay heals
    est_before = got2
    os.remove(f"{store}/epoch=1/_SUCCESS")
    fallback = {
        r["q_label"]: r["bucket"]
        for r in read_quantile_estimate(spark, store, W_CENTS).collect()
    }
    assert fallback == batch_quantiles(thirds[0])
    histogram_monitor_epoch(thirds[1], "o_totalprice", store, W_CENTS, epoch_id=1)
    healed = {
        r["q_label"]: r["bucket"]
        for r in read_quantile_estimate(spark, store, W_CENTS).collect()
    }
    assert healed == est_before
    # worst crash: the whole newest epoch dir gone mid-write — history
    # lives in the predecessor snapshot, replay reproduces it exactly
    _sh.rmtree(f"{store}/epoch=1")
    histogram_monitor_epoch(thirds[1], "o_totalprice", store, W_CENTS, epoch_id=1)
    assert sorted(tuple(r) for r in spark.read.parquet(store).collect()) == before

    # restart on the same checkpoint with the third file
    thirds[2].coalesce(1).write.parquet(str(src / "b2"))
    q2 = start_histogram_monitor(
        spark, _stream(), "o_totalprice", store, ckpt, W_CENTS,
        available_now=True,
    )
    q2.awaitTermination(180)
    got3 = {
        r["q_label"]: r["bucket"]
        for r in read_quantile_estimate(spark, store, W_CENTS).collect()
    }
    assert got3 == batch_quantiles(orders)


def test_enrich_epoch_bucket_pruning_equivalence(spark, tmp_path):
    """r11: enrich_epoch prunes the dimension scan to the buckets the
    batch's keys hash into (left/inner on the store's bucket key). The
    pruned join must equal the full-dimension join bit-for-bit —
    including left-join null rows for keys absent from the store — and
    full_outer must NOT prune (it needs the unmatched dim rows)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.merge import StateStore
    from kafkatosparktokudu_spark.streaming.pipeline import enrich_epoch

    dim_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("grade", T.IntegerType(), True),
        ]
    )
    store = StateStore(spark, str(tmp_path / "dims"), ["user_id"], dim_schema, 64)
    store.upsert_batch(
        spark.range(500).select(
            F.col("id").alias("user_id"),
            (F.col("id") % 7).cast("int").alias("grade"),
        )
    )
    # batch touches 3 known users + one key ABSENT from the store
    batch = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 12), (4, 9999)], "event_id bigint, user_id bigint"
    )
    out = str(tmp_path / "out")
    enrich_epoch(batch, 0, store, out, "user_id")
    got = sorted(tuple(r) for r in spark.read.parquet(f"{out}/epoch=0").collect())
    want = sorted(
        tuple(r) for r in batch.join(store.read(), "user_id", "left").collect()
    )
    assert got == want
    assert {r[0] for r in got} == {10, 11, 12, 9999} or {r[1] for r in got} == {10, 11, 12, 9999}
    # the absent key survived as a null-grade row (pruning didn't eat it)
    nulls = [t for t in got if t[-1] is None]
    assert len(nulls) == 1

    # full_outer falls back to the full dim read: every stored user
    # appears even though the batch only touched 4 keys
    enrich_epoch(batch, 1, store, out, "user_id", how="full_outer")
    fo = spark.read.parquet(f"{out}/epoch=1")
    assert fo.select("user_id").distinct().count() == 501  # 500 dims + 9999


def test_stream_bm25_index_sync_restart_parity(spark, tmp_path):
    """start_bm25_index_sync (r13): the index maintained across a STOP +
    RESTART (file 1 drained, query stopped, file 2 drained on the same
    checkpoint) must serve the one-shot build's ranking bit-for-bit —
    the append epoch-commit contract carried through Structured
    Streaming's epoch-id replay machinery."""
    import pyspark.sql.functions as F

    from kafkatosparktokudu_spark.operators.text import (
        bm25_index_topk,
        build_bm25_index,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.pipeline import (
        start_bm25_index_sync,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    docs.filter(F.col("doc_id") < 250).repartition(1).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_bm25_index_sync(spark, stream, idx, ckpt, available_now=True)
    assert q.awaitTermination(300)

    # second file lands AFTER the first drain; same checkpoint resumes
    docs.filter(F.col("doc_id") >= 250).repartition(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = start_bm25_index_sync(spark, stream2, idx, ckpt, available_now=True)
    assert q2.awaitTermination(300)

    oneshot = str(tmp_path / "oneshot")
    build_bm25_index(docs, oneshot)
    terms = ["merge", "vector", "stream"]
    got = [
        tuple(r) for r in bm25_index_topk(spark, idx, terms, 20).collect()
    ]
    want = [
        tuple(r)
        for r in bm25_index_topk(spark, oneshot, terms, 20).collect()
    ]
    assert got == want and len(got) == 20


def test_stream_ivf_index_sync_restart_parity(spark, tmp_path):
    """start_ivf_index_sync (r13): the IVF index maintained across a
    STOP + RESTART (file 1 drained — builds the index and trains the
    centroids, query stopped, file 2 drained on the same checkpoint —
    upserts into the frozen geometry) must serve brute-force cosine
    top-k bit-for-bit under a full-probe read: committed epochs cover
    exactly the drained corpus and cell assignment only chooses files,
    never values."""
    import pyspark.sql.functions as F

    from kafkatosparktokudu_spark.functions.vectors import (
        as_double,
        cosine_literal,
    )
    from kafkatosparktokudu_spark.operators.similarity import (
        _read_ivf_meta,
        brute_force_topk,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.pipeline import (
        start_ivf_index_sync,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    emb.filter(F.col("vec_id") % 2 == 0).repartition(1).write.parquet(src)

    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_ivf_index_sync(spark, stream, idx, ckpt, available_now=True)
    assert q.awaitTermination(300)

    # second file lands AFTER the first drain; same checkpoint resumes
    emb.filter(F.col("vec_id") % 2 == 1).repartition(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = start_ivf_index_sync(spark, stream2, idx, ckpt, available_now=True)
    assert q2.awaitTermination(300)

    meta = _read_ivf_meta(spark, idx)
    # two drains, two committed epochs (0 = the build, N>0 = the upsert)
    assert len(meta["committed_epochs"]) == 2
    got = [
        tuple(r)
        for r in spark.read.parquet(idx)
        .filter(F.col("epoch").isin(meta["committed_epochs"]))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "label",
            F.round(
                cosine_literal(as_double(F.col("embedding")), qv), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
        .collect()
    ]
    want = [
        tuple(r) for r in brute_force_topk(emb, qv, k=10, exclude_id=0).collect()
    ]
    assert got == want and len(got) == 10


def test_ivf_build_folded_epoch_binding(spark, tmp_path):
    """The building micro-batch's epoch id is bound into the sidecar's
    folded-epoch memory (the BM25 twin's r13 crash-window fix, applied
    to build_ivf_index): when the building batch had epoch_id > 0 and
    the driver died between the sidecar commit and the checkpoint
    commit, the REPLAYED batch must no-op instead of re-inserting every
    vector as a fresh append epoch."""
    import pyspark.sql.functions as F

    from kafkatosparktokudu_spark.operators.similarity import (
        _read_ivf_meta,
        build_ivf_index,
        upsert_ivf_index,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 200
    )
    idx = str(tmp_path / "idx")
    # the building batch ran under streaming epoch id 3
    build_ivf_index(emb, idx, n_cells=4, folded_epochs=(3,))
    m = _read_ivf_meta(spark, idx)
    assert m["folded_epochs"] == [3]
    n_before = spark.read.parquet(idx).count()
    # crash replay: the same batch re-arrives as an upsert under id 3
    upsert_ivf_index(emb, idx, epoch=3)
    m2 = _read_ivf_meta(spark, idx)
    assert m2["committed_epochs"] == [0]  # no new epoch committed
    assert spark.read.parquet(idx).count() == n_before

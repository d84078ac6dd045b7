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


def test_offsets_csv_translation():
    csv = "tt,0,39,39\ntt,1,30,30\ntt,2,40,40\ntt,3,107,107\ntt,4,95,95\n"
    assert (
        offsets_csv_to_starting_json(csv)
        == '{"tt": {"0": 39, "1": 30, "2": 40, "3": 107, "4": 95}}'
    )

"""Partitioned sink: layout, round-trip, and scan-side partition pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkatosparktokudu_spark.sources.batch import load_table
from kafkatosparktokudu_spark.sources.sink import write_partitioned


def test_write_partitioned_layout_and_pruning(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_type")
    write_partitioned(events, out, ["event_type"])

    # hive-style layout, one file per partition value
    dirs = sorted(d for d in os.listdir(out) if d.startswith("event_type="))
    assert len(dirs) == 5
    for d in dirs:
        files = [f for f in os.listdir(f"{out}/{d}") if f.endswith(".parquet")]
        assert len(files) == 1

    # round-trip
    back = spark.read.parquet(out)
    assert back.count() == events.count()

    # a filter on the partition column prunes at the scan: PartitionFilters
    # is populated and only one partition's rows are read
    q = back.filter(F.col("event_type") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert q.count() == events.filter("event_type = 'click'").count()


def test_write_partitioned_file_splitting(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_split")
    write_partitioned(events, out, ["event_type"], files_per_partition=3)
    for d in os.listdir(out):
        if not d.startswith("event_type="):
            continue
        files = [f for f in os.listdir(f"{out}/{d}") if f.endswith(".parquet")]
        assert 1 < len(files) <= 3  # hot partitions split, none explode
    back = spark.read.parquet(out)
    assert back.count() == events.count()

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


def _row_groups_matching(path, col_a, lo_a, hi_a, col_b, lo_b, hi_b):
    """Count row groups whose [min,max] stats intersect BOTH ranges —
    the row groups a stats-pruning reader must actually scan."""
    import pyarrow.parquet as pq

    n_match = n_total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fn)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                n_total += 1
                sa = g.column(idx[col_a]).statistics
                sb = g.column(idx[col_b]).statistics
                if (sa.min <= hi_a and sa.max >= lo_a
                        and sb.min <= hi_b and sb.max >= lo_b):
                    n_match += 1
    return n_match, n_total


def test_zorder_layout_tightens_two_dim_skipping(spark, tmp_path):
    """Z-order clustering vs single-column sort: sorting by user_id alone
    leaves every row group's hour range wide open, so an hour-selective
    predicate can skip nothing; the z-ordered layout keeps BOTH dimensions'
    min/max tight, so it prunes hour predicates too while still pruning
    user predicates."""
    from kafkatosparktokudu_spark.sources.sink import write_zordered

    raw = load_table(spark, "/root/testdata/sf0.01", "events")
    t0 = raw.agg(F.min(F.unix_timestamp("ts"))).collect()[0][0]
    events = raw.select(
        "user_id",
        ((F.unix_timestamp("ts") - F.lit(t0)) / 3600).cast("bigint").alias("hour_id"),
    )
    rg = {"parquet.block.size": str(32 * 1024)}  # small row groups on test data

    z_out = str(tmp_path / "z")
    write_zordered(events, z_out, ["user_id", "hour_id"], options=rg)

    s_out = str(tmp_path / "s")
    (events.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
     .write.mode("overwrite").options(**rg).parquet(s_out))

    hours = events.agg(F.max("hour_id")).collect()[0][0]
    lo_h, hi_h = 0, hours // 8  # hour-selective, user-unselective
    lo_u, hi_u = 10, 30         # user-selective, hour-unselective

    # hour-only predicate: user-sorted layout cannot skip, z-order can
    zh, zt = _row_groups_matching(z_out, "user_id", 0, 10**9,
                                  "hour_id", lo_h, hi_h)
    sh, st = _row_groups_matching(s_out, "user_id", 0, 10**9,
                                  "hour_id", lo_h, hi_h)
    assert zt > 4 and st > 4, (zt, st)
    assert sh == st  # every user-sorted row group spans all hours
    assert zh / zt < sh / st, (zh, zt, sh, st)

    # user-only predicate: z-order still prunes (less than a pure sort, by design)
    zu, _ = _row_groups_matching(z_out, "user_id", lo_u, hi_u,
                                 "hour_id", 0, 10**9)
    assert zu < zt, (zu, zt)


def test_file_format_round_trip(spark, tmp_path):
    """CSV / JSON / ORC round-trip with explicit schema: every format-
    specific writer+reader must reproduce the parquet fixture exactly
    (types included) — the multi-format scan surface of SURVEY §2.2."""
    from kafkatosparktokudu_spark.sources.batch import load_file

    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    want = sorted(map(tuple, cust.collect()))
    for fmt, opts in [
        ("csv", {"header": "true"}),
        ("json", {}),
        ("orc", {}),
    ]:
        out = str(tmp_path / fmt)
        cust.write.mode("overwrite").options(**opts).format(fmt).save(out)
        back = load_file(spark, out, fmt, schema=cust.schema, **opts)
        assert sorted(map(tuple, back.collect())) == want, fmt


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must sort-merge
    join with NO Exchange on either side (co-located join: the shuffle was
    paid once at write time) and no per-query Sort either (bucket files are
    pre-sorted). The 100 TB rationale for write_bucketed."""
    from kafkatosparktokudu_spark.sources.sink import write_bucketed

    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    try:
        write_bucketed(
            cust, "bt_cust", "c_custkey", 8, path=str(tmp_path / "bt_cust")
        )
        write_bucketed(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            "bt_orders", "c_custkey", 8, path=str(tmp_path / "bt_orders"),
        )
        j = spark.table("bt_orders").join(
            spark.table("bt_cust").select("c_custkey", "c_name"), "c_custkey"
        )
        # disable broadcast so the plan would NEED a shuffle if buckets
        # didn't line up
        with_conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            # correctness too, not just the plan
            want = orders.join(
                cust.select("c_custkey", "c_name"),
                orders.o_custkey == cust.c_custkey,
            ).count()
            assert j.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_conf)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_cust")
        spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_webdataset_source_roundtrip(spark, tmp_path):
    """write_webdataset -> WebDatasetSource read: every payload survives
    byte-for-byte, read parallelism == shard count (one InputPartition
    per tar), and member order inside a shard matches the manifest."""
    from kafkatosparktokudu_spark.operators.multimodal import (
        attach_binary,
        write_webdataset,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.sources.webdataset import WebDatasetSource

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = attach_binary(docs)
    out = str(tmp_path / "wds")
    manifest = write_webdataset(media, out, n_shards=4).collect()

    spark.dataSource.register(WebDatasetSource)
    back = spark.read.format("webdataset").option("path", out).load()
    assert back.rdd.getNumPartitions() == 4

    rows = back.collect()
    orig = {
        r["doc_id"]: bytes(r["payload"]) for r in media.select("doc_id", "payload").collect()
    }
    assert len(rows) == len(orig)
    for r in rows:
        assert bytes(r["payload"]) == orig[r["doc_id"]]
        assert r["n_bytes"] == len(orig[r["doc_id"]])
    got_order = {
        (r["shard_id"], r["member_idx"]): r["doc_id"] for r in rows
    }
    for m in manifest:
        assert got_order[(m["shard_id"], m["member_idx"])] == m["doc_id"]


def test_webdataset_batch_empty_dir_and_missing_dir(spark, tmp_path):
    """An existing directory with zero shards reads as an EMPTY typed
    frame (the StateStore.read contract); a missing directory still
    raises (config typo, not empty data)."""
    import pytest

    from kafkatosparktokudu_spark.sources.webdataset import WebDatasetSource

    try:
        spark.dataSource.register(WebDatasetSource)
    except Exception:
        pass
    empty = tmp_path / "empty_wds"
    empty.mkdir()
    df = spark.read.format("webdataset").option("path", str(empty)).load()
    assert df.count() == 0
    assert df.columns == ["doc_id", "shard_id", "member_idx", "n_bytes", "payload"]

    missing = spark.read.format("webdataset").option(
        "path", str(tmp_path / "nope")
    ).load()
    with pytest.raises(Exception, match="not a directory"):
        missing.count()


def test_rewrite_buckets_refuses_out_of_list_rows(spark, tmp_path):
    """The review-found silent-loss trap: content hashing outside the
    rewrite list must ERROR, not vanish with the staging dir."""
    import pytest
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.merge import StateStore

    schema = T.StructType([
        T.StructField("id", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ])
    store = StateStore(spark, str(tmp_path / "st"), ["id"], schema, 8)
    rows = spark.createDataFrame([(str(i), i) for i in range(40)], schema)
    store.upsert_batch(rows)
    all_buckets = sorted(
        {r["b"] for r in rows.select(store._bucket_col().alias("b")).collect()}
    )
    with pytest.raises(ValueError, match="refusing to drop"):
        store.rewrite_buckets(all_buckets[:1], rows)
    # store unchanged after the refused rewrite
    assert store.read().count() == 40
    # a correct wholesale rewrite still works
    store.rewrite_buckets(all_buckets, rows.filter("v < 10"))
    assert store.read().count() == 10

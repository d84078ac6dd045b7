"""Physical-plan regression tests: the scale properties SURVEY.md §4 claims
(pushdown, pruning, broadcast, codegen, shuffle elimination) asserted against
the executed plans so a refactor can't silently regress them."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkatosparktokudu_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q02_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    """The 2-column projection query must not scan all lineitem columns."""
    plan = _plan(spark, "q15_json_extract")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "event_type" in scan and "props" in scan
    for unused in ["event_id", "user_id", "value", "ts"]:
        assert f",{unused}#" not in scan and f"[{unused}#" not in scan


def test_dims_broadcast_in_star_join(spark):
    """nation/region (explicit hints) must broadcast; no shuffle for dims."""
    plan = _plan(spark, "q04_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan or plan.count("BroadcastHashJoin") >= 2


def test_no_forced_broadcast_on_fact_scale_tables(spark):
    """Broadcast hints are reserved for genuinely small sides (nation /
    region / filtered part / 1-row aggs). With autoBroadcastJoinThreshold=-1
    the ONLY BroadcastHashJoins left in the initial plan are forced hints, so
    the count pins exactly which sides are hinted — proving customer /
    supplier / unfiltered-part joins degrade to shuffle joins at sf100+
    instead of OOMing on a forced 15M-row broadcast."""
    expected = {
        "q21_brand_supply_stats": 0,   # unfiltered part+supplier: unhinted
        "q44_promo_revenue": 0,        # unfiltered part: unhinted
        "q45_disjunctive_join": 0,     # ON-clause cond can't prune part
        "q48_big_orders": 0,           # customer: unhinted
        "q51_top_supplier": 1,         # 1-row max-equality agg only
        "q54_market_share": 4,         # filtered part, region, nation x2
        "q55_returned_revenue": 1,     # nation only
        "q60_revenue_share": 2,        # nation, region
        "q61_global_suppliers": 0,     # customer/supplier: unhinted
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, want in expected.items():
            plan = _plan(spark, name)
            got = plan.count("BroadcastHashJoin")
            assert got == want, (
                f"{name}: {got} BroadcastHashJoin(s), want {want} "
                f"(broadcast hints must stay dims-only)"
            )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_agg_is_partial_then_final(spark):
    """Scan-agg must map-side combine (partial_ functions before the
    exchange), not shuffle raw rows."""
    plan = _plan(spark, "q02_pricing_summary")
    assert "partial_" in plan  # HashAggregate(..., functions=[partial_sum...])


def test_no_python_in_relational_paths(spark):
    """Core relational queries stay JVM-side (no Python eval nodes); Python
    appears only where it is the design (pandas_udf / mapInPandas ops)."""
    for name in [
        "q02_pricing_summary",
        "q04_revenue_by_nation",
        "q08_top_orders_per_customer",
        "q17_sessionize",
        "q22_asof_join",
        "q46_conversion_funnel",
        "q47_custdist",
        "q48_big_orders",
        "q49_small_qty_revenue",
        "q50_wealthy_inactive",
        "q51_top_supplier",
        "q52_stratified_sample",
        "q53_gapfill_hourly",
        "q54_market_share",
        "q55_returned_revenue",
        "q56_unpivot_metrics",
        "q57_rolling_7day",
        "dd03_minhash_bands",
        "ss01_knn_cosine",
        "tx02_quality_scores",
        "tx07_keyterms",
        "tx08_denylist_scrub",
        "tx09_packing_index",
    ]:
        plan = _plan(spark, name)
        assert "Python" not in plan, f"{name} fell off the JVM path"


def test_wholestage_codegen_on_hot_path(spark):
    df = QUERIES["q02_pricing_summary"](spark, SF)
    df.collect()  # AQE shows WholeStageCodegen only in the finalized plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes are the WholeStageCodegen stage markers; both the
    # scan-side partial agg and the final agg must be inside codegen
    # stages. Match by count, not stage NUMBER: the r13 width-rule
    # repartition legitimately sits between the scan and the partial
    # agg, shifting the numbering without leaving codegen.
    import re

    assert len(re.findall(r"\*\(\d+\) HashAggregate", plan)) >= 2


def test_cdc_fold_is_single_aggregation(spark):
    """The LWW fold must be ONE hash aggregation (max-over-struct), not a
    window sort: one shuffle by key, map-side partials."""
    plan = _plan(spark, "cdc_emp_state")
    assert "Window" not in plan
    assert "partial_max" in plan


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-shuffles at write time: the
    join then needs NO Exchange on either side — the co-located join layout
    for repeated fact-fact joins at scale."""
    from kafkatosparktokudu_spark.sources.batch import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ shape
    try:
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .option("path", str(tmp_path / "li_b"))
            .saveAsTable("li_bucketed")
        )
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .option("path", str(tmp_path / "ord_b"))
            .saveAsTable("ord_bucketed")
        )
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # sanity: the join actually returns rows
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime row-level filtering: a selective filter on the dimension side
    of a shuffle join makes Catalyst inject a bloom filter onto the fact
    scan (`might_contain(scalar-subquery, xxhash64(key))`), so fact rows
    that cannot join are dropped BEFORE the shuffle — at 100 TB this is the
    difference between shuffling the whole fact table and shuffling only
    the ~matching fraction. Thresholds are lowered to exercise the rewrite
    on test-sized data; results must match the unfiltered join."""
    from kafkatosparktokudu_spark.sources.batch import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        n_bloom = joined.collect()[0]["n"]
    finally:
        for k in confs:
            spark.conf.unset(k)
    n_plain = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert n_bloom == n_plain > 0


def test_contamination_benchmark_broadcasts(spark):
    """tx12: the benchmark shingle set is small by construction and must
    broadcast — a shuffle join keyed on raw shingle strings would move the
    whole exploded corpus at scale."""
    plan = _plan(spark, "tx12_contamination")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_exclusive_parts_rewrite_stays_aggregation(spark):
    """q62: the correlated NOT-EXISTS rewrite must stay two hash aggs + one
    join — no nested-loop/cartesian shape may sneak in."""
    plan = _plan(spark, "q62_exclusive_parts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for both aggs


def test_merge_join_reuses_fold_partitioning(spark, tmp_path):
    """The MERGE's full-outer join must not re-shuffle the folded batch: the
    fold's groupBy(key) exchange satisfies the join's distribution when the
    keys join with plain equality (eqNullSafe would hash on
    (coalesce(k,''), isnull(k)) and force a second exchange)."""
    from pyspark.sql import types as T

    from kafkatosparktokudu_spark.operators.merge import merge_upserts

    schema = "id string, v string"
    state = spark.createDataFrame([("1", "a")], schema)
    batch = (
        spark.createDataFrame([("1", "b"), ("2", "c")], schema)
        .groupBy("id")
        .agg(F.max("v").alias("v"))
    )
    plan = (
        merge_upserts(state, batch, ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly two exchanges: one per join input; the batch side's is the
    # fold's own groupBy exchange (a third would mean re-shuffling)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "coalesce(id" not in plan


def test_dq01_row_checks_share_one_scan_per_table(spark):
    """All of a table's row checks (not-null / range / accepted) compile
    into ONE aggregate over ONE scan — adding a column contract must not
    add a read. dq01 row-checks customer, orders, lineitem and events:
    exactly one FileScan per table in the whole report plan."""
    plan = _plan(spark, "dq01_constraint_report")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    for table in ("customer", "orders", "lineitem", "events"):
        n = sum(1 for s in scans if f"{table}.parquet" in s)
        # unique/fk checks add their own scans for orders/lineitem/customer;
        # row-check fusion is pinned by the TOTAL per-table scan budget:
        # customer: row-checks(1) + unique(1) + fk-parent(1) = 3
        # orders:   row-checks(1) + fk-child(1) + fk-parent(1) = 3
        # lineitem: row-checks(1) + unique(1) + fk-child(1) = 3
        # events:   row-checks(1) = 1
        budget = {"customer": 3, "orders": 3, "lineitem": 3, "events": 1}[table]
        assert n <= budget, f"{table}: {n} scans > {budget}\n{plan}"


def test_scd2_history_single_exchange(spark):
    """The SCD2 derivation is ONE exchange keyed on the PK — version
    numbering, interval chaining and the cumulative payload fold all share
    the same per-key sort."""
    plan = _plan(spark, "cdc_emp_history")
    n_exchange = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_exchange == 1, plan


def test_dd12_repeated_chunk_anti_join_broadcasts(spark):
    """The repeated-chunk (boilerplate) table is small by construction;
    the join that flags those chunks must broadcast it, not shuffle the
    whole chunk table. (r13: the anti join became a LeftOuter flag join
    feeding one fused per-doc agg — same broadcast requirement, fewer
    exchanges; OPTIMIZATION_r13.md §7.)"""
    plan = _plan(spark, "dd12_repeated_chunks")
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan


def test_pq_encode_is_shuffle_free(spark):
    """PQ encoding is pure per-row expression work — NO exchange anywhere:
    the property that lets it run as a map-only pass over a 100 TB table."""
    plan = _plan(spark, "ss07_pq_encode")
    assert "Exchange hashpartitioning" not in plan, plan


def test_interval_overlap_join_single_chunk_exchange(spark):
    """The blocked interval join shuffles ONCE on the chunk id (plus a
    broadcast for the smaller exploded side) — never a nested-loop theta
    join over the raw intervals."""
    plan = _plan(spark, "q73_session_overlap")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tx15_bucketing_has_no_global_window_sort(spark):
    """The head/middle/tail split must NOT be a single-partition window
    (the old ntile(3) shape): boundary tuples are broadcast scalars, so
    the final plan is a pure per-row projection — no Window, no
    Exchange SinglePartition anywhere."""
    plan = _plan(spark, "tx15_bigram_surprisal")
    assert "Window" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "ntile" not in plan, plan


def test_ss08_topk_is_partial_takeordered(spark):
    """ADC top-k must compile to TakeOrderedAndProject (per-partition
    partial top-k) — never a global row_number window over the scored
    corpus. The rank window that remains runs over the k survivors only,
    i.e. strictly above the TakeOrdered in the plan tree."""
    plan = _plan(spark, "ss08_pq_adc_topk")
    assert "TakeOrderedAndProject" in plan, plan
    lines = plan.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    tko = next(i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l)
    assert win < tko, plan  # window consumes the TakeOrdered output


def test_new_window_queries_stay_partitioned(spark):
    """Every round-6 window/analytics query must run its sorts inside a
    keyed partition — no Exchange SinglePartition anywhere (the tx15/ss08
    lesson, asserted for the whole batch)."""
    for name in [
        "q76_rolling_revenue",
        "q77_price_distribution",
        "q82_event_transitions",
        "q83_locf_gapfill",
        # q80 is excluded: its output is ONE scalar row, so the final
        # partial-count -> Exchange SinglePartition -> merge is the
        # correct plan (1 row per partition crosses it, not the data)
        "q81_retention_cohorts",
    ]:
        plan = _plan(spark, name)
        assert "Exchange SinglePartition" not in plan, (name, plan)


def test_q87_weighted_sample_is_takeordered(spark):
    """ES weighted sampling must select its top-50 via
    TakeOrderedAndProject (partial per-partition top-k), never a global
    row_number window over every scored document; the rank window runs
    on the 50 survivors above the TakeOrdered."""
    plan = _plan(spark, "q87_weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan
    lines = plan.splitlines()
    win = next(i for i, l in enumerate(lines) if "Window" in l)
    tko = next(i for i, l in enumerate(lines) if "TakeOrderedAndProject" in l)
    assert win < tko, plan


def test_q90_distributed_rank_window_stays_partitioned(spark):
    """The distributed-rank pattern's whole point: the ranking window is
    PARTITIONED by the value-range bucket and the offsets join is a
    broadcast — no Exchange SinglePartition in the final plan."""
    plan = _plan(spark, "q90_distributed_rank")
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q86_zorder_key_fuses_into_scan_stage(spark):
    """Morton key + file assignment are scalar expressions: the only
    exchanges in the layout-stats plan are the two aggregations (global
    min/max, per-file stats) — no Sort, no window."""
    plan = _plan(spark, "q86_zorder_layout")
    assert "Sort " not in plan, plan
    assert "Window" not in plan, plan


def test_q91_compaction_bins_no_global_prefix_sum(spark):
    """The global sorted prefix sum must come from range-bucketed
    PARTITIONED windows + a broadcast offset join — never a
    single-partition cumsum over the file list."""
    plan = _plan(spark, "q91_compaction_bins")
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_two_stage_offsets_coarsens_wide_ranges(spark):
    """Range-cardinality guard: a value distribution spanning far more
    distinct ranges than max_ranges must NOT blow the driver collect —
    the helper widens the bucket until the range set fits, and the
    resulting global ranks are identical to the sequential oracle."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.operators.layout import two_stage_offsets

    # 5000 distinct values, width=1 → 5000 ranges >> max_ranges=64
    rows = [(i, (i * 2654435761) % 1_000_003) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    keyed, off_df, width_used = two_stage_offsets(
        df, "v", width=1, max_ranges=64
    )
    assert width_used > 1  # coarsening kicked in
    assert off_df.count() <= 64
    w = W.partitionBy("_rng").orderBy("v", "doc_id")
    got = {
        r["doc_id"]: r["rk"]
        for r in keyed.join(F.broadcast(off_df), "_rng")
        .select(
            "doc_id", (F.row_number().over(w) + F.col("_offset")).alias("rk")
        )
        .collect()
    }
    expected = {
        doc_id: rk + 1
        for rk, (v, doc_id) in enumerate(sorted((v, d) for d, v in rows))
    }
    assert got == expected


def test_q93_single_keyed_exchange(spark):
    """Rolling z-score is ONE keyed window: exactly one hash exchange
    (the user_id partition), no join, no single-partition stage."""
    plan = _plan(spark, "q93_rolling_zscore")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Join" not in plan, plan


def test_px14_classifier_fuses_into_scan(spark):
    """The logistic gate is pure per-row expressions: zero exchanges —
    the classifier costs a projection."""
    plan = _plan(spark, "px14_quality_classifier")
    assert "Exchange" not in plan, plan


def test_sk04_driver_sees_only_registers(spark):
    """HLL: the only SinglePartition stages aggregate the REGISTER table
    (<= 2^p rows) / 1-row frames — the input-sized shuffle is the
    bucket hash agg, bounded at 4096 groups."""
    plan = _plan(spark, "sk04_hll_distinct")
    assert "Exchange hashpartitioning(bucket" in plan, plan


def test_q94_snapshot_diff_single_keyed_join_no_nested_loop(spark):
    """The snapshot diff is ONE keyed full-outer join (SortMergeJoin on
    the key) + a hash rollup — never a nested-loop/cartesian shape, and
    the per-column compare is a projection, not extra joins."""
    plan = _plan(spark, "q94_snapshot_diff")
    assert plan.count("SortMergeJoin") == 1, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sk06_kmv_sketch_uses_takeordered_kmin(spark):
    """Each side's k-minimum-values sketch must compile to
    TakeOrderedAndProject (per-partition partial top-k) — never a global
    Sort of the hashed key stream — and the k-row sketches must be
    PINNED (InMemoryTableScan) so theta/sample/stats consumers don't
    re-run the corpus scan. (Counting TakeOrdered nodes in the
    treeString would double-count InMemoryRelation build-lineage
    prints — the NOTES plan-audit trap — so assert presence + pin.)"""
    plan = _plan(spark, "sk06_kmv_overlap")
    assert "TakeOrderedAndProject" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_sk07_histogram_scan_pruned_and_state_pinned(spark):
    """sk07: the corpus scan reads ONLY the value column (ReadSchema
    pruned to l_extendedprice), the bin count is a map-side-combined
    hash agg on bin_id, and the bounded histogram state is PINNED
    (InMemoryTableScan) so the cumulative-window branch and the
    total-count branch don't each re-run the corpus scan. The only
    SinglePartition stages operate on sketch state, never on data."""
    plan = _plan(spark, "sk07_histogram_quantiles")
    assert "Exchange hashpartitioning(bin_id" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    assert "struct<l_extendedprice:double>" in plan, plan


def test_q95_ohlc_single_hash_agg_no_window(spark):
    """q95: open/close ride as struct min/max inside ONE map-side-
    combined hash aggregation — no Window node, no corpus-wide sort
    (rangepartitioning), exactly one keyed exchange."""
    plan = _plan(spark, "q95_ohlc_candles")
    assert "Window" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_min" in plan and "partial_max" in plan, plan


def test_px15_epoch_shuffle_no_global_sort(spark):
    """px15: the permutation must come from the two-stage rank — a keyed
    window per hash range plus broadcast offsets — never a global
    rangepartitioning sort or a corpus-sized single partition."""
    plan = _plan(spark, "px15_epoch_shuffle")
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange hashpartitioning(_rng" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_session_excludes_infer_filters_from_generate(spark):
    """The r13 §10 session rule: InferFiltersFromGenerate's size>0
    pre-filter gets alias-substituted with the FULL generator expression
    and pushed below the width repartition, re-running the tokenize/
    shingle/window-hash pass narrow (measured 12-15x on dd09's window
    hashing). get_spark must keep the rule excluded."""
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    assert "InferFiltersFromGenerate" in excluded


def test_no_inferred_generate_filter_duplicates_tokenize(spark):
    """Structural half of the r13 §10 fix, asserted under a session
    WITHOUT the excluded rule (a fresh optimizer run with the rule
    forced back on): duplicated_spans' outer-explode + pos-guard must
    keep the window-hash transform out of every Filter condition — the
    pathology plan had a Filter whose condition embedded
    size(CASE WHEN ... transform(sequence ... md5 ...)) below the
    repartition."""
    from kafkatosparktokudu_spark.operators.dedup import duplicated_spans
    from kafkatosparktokudu_spark.sources.batch import load_table

    # force the rule back ON for this one plan: the structural fix must
    # hold even where the session exclusion is absent (the driver's
    # correctness harness runs a plain session)
    def _walk(node):
        # generic Catalyst TreeNode walker (plans and expressions both
        # expose children(): Seq[TreeNode]) — ADVICE r13: assert on the
        # TREE, not on rendered plan lines, so a format change or an
        # unrelated transform() elsewhere can't flip the test
        stack = [node]
        while stack:
            n = stack.pop()
            yield n
            ch = n.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))

    old = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    spark.conf.set("spark.sql.optimizer.excludedRules", "")
    try:
        df = duplicated_spans(load_table(spark, SF, "documents"))
        plan = df._jdf.queryExecution().optimizedPlan()
        filters = [
            n for n in _walk(plan)
            if n.getClass().getSimpleName() == "Filter"
        ]
        assert filters, "expected at least one Filter in the plan"
        for flt in filters:
            bad = [
                e.getClass().getSimpleName()
                for e in _walk(flt.condition())
                if e.getClass().getSimpleName()
                in ("ArrayTransform", "Sequence")
            ]
            assert not bad, (
                "inferred generate filter re-embeds the window-hash "
                f"generator expression ({bad}) in: "
                + flt.condition().toString()[:200]
            )
    finally:
        spark.conf.set("spark.sql.optimizer.excludedRules", old)


def test_dq01_fk_checks_are_join_free(spark):
    """r14: the ForeignKey checks compile into the dq06-style key census
    (unionAll tags + one groupBy) — no join operator anywhere in the
    report plan, so a parent outgrowing the broadcast threshold can
    never degrade the report to a multi-pass shuffle join."""
    plan = _plan(spark, "dq01_constraint_report")
    for node in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, f"{node} in dq01 plan:\n{plan[:800]}"


def test_neardup_pairs_band_pin_is_transparent(spark):
    """r14: a caller-pinned band frame must leave the pair set
    bit-identical (the gate's reuse idiom — bands are a deterministic
    per-row function of hs, so serving them from cache cannot change
    candidates or scores)."""
    from kafkatosparktokudu_spark.operators.dedup import (
        _bands_from_hashed,
        hashed_shingles,
        neardup_pairs_jaccard,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    hs = hashed_shingles(docs).persist()
    bands = _bands_from_hashed(hs).persist()
    bands.count()
    pinned = sorted(
        map(tuple, neardup_pairs_jaccard(
            docs, 0.2, hs_df=hs, bands_df=bands).collect())
    )
    plain = sorted(
        map(tuple, neardup_pairs_jaccard(docs, 0.2).collect())
    )
    hs.unpersist(), bands.unpersist()
    assert pinned == plain and pinned, f"{len(pinned)} vs {len(plain)}"

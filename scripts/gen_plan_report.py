"""Generate PLANS.md — a physical-plan audit of the headline queries.

For each query: exchange (shuffle) count, join strategies, whole-stage
codegen span count, parquet pushed filters, and scanned-column width per
scan — the properties the plan regression tests assert, rendered as one
reviewable document. Run: python scripts/gen_plan_report.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from kafkatosparktokudu_spark.plans.queries import QUERIES  # noqa: E402
from kafkatosparktokudu_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

HEADLINE = [
    "q02_pricing_summary",
    "q04_revenue_by_nation",
    "q08_top_orders_per_customer",
    "q17_sessionize",
    "q22_asof_join",
    "q54_market_share",
    "q73_session_overlap",
    "dd03_minhash_bands",
    "dd04_neardup_pairs",
    "dd12_repeated_chunks",
    "ss01_knn_cosine",
    "ss07_pq_encode",
    "tx15_bigram_surprisal",
    "dq01_constraint_report",
    "gr02_triangle_stats",
    "px01_curation_pipeline",
    "cdc_emp_history",
    "sk02_bloom_semijoin",
    # round-6 additions
    "ss04_ivf_topk",
    "ss08_pq_adc_topk",
    "ss17_pq_trained_adc",
    "q74_rollup_revenue",
    "q76_rolling_revenue",
    "q77_price_distribution",
    "dd13_editdist_neardup",
    "tx16_token_entropy",
    "tx17_rag_chunks",
    "ss09_int8_quantize",
    "dq04_robust_outliers",
    "gr03_pagerank_fixed_point",
    # round-7 additions
    "sk04_hll_distinct",
    "sk05_hll_union_daily",
    "px13_temperature_mixture",
    "px14_quality_classifier",
    "tx18_ngram_novelty",
    "q93_rolling_zscore",
    # late round-6 additions (second session)
    "q86_zorder_layout",
    "q87_weighted_sample",
    "q88_asof_nearest",
    "q89_twap",
    "q90_distributed_rank",
    "q91_compaction_bins",
    "px12_negative_pairs",
    "dq05_skew_report",
    # round-8 additions (the rebuilt heavy similarity family + new surface)
    "dd05_embedding_neardup",
    "ss05_knn_join",
    # r13 session-3: the cross-set decontamination candidate join
    "px24_embedding_decontam",
    "ss06_kmeans_clusters",
    "tx21_zipf_stats",
    "px16_quality_aware_dedup",
    "px17_sequence_packing",
    "q96_weighted_median",
    "dq06_fk_integrity",
    "st03_ohlc_windows",
    "ss12_knn_label_vote",
    "q95_ohlc_candles",
    "px15_epoch_shuffle",
    # round-8 late additions + round-9 freshness sweep
    "ss11_mmr_rerank",
    "gr05_bfs_hops",
    "mm07_inference_batches",
    "px18_mixture_epoch_plan",
    "dd15_soft_dedup_weights",
    "px19_stratified_shards",
    "tx22_source_overlap",
    # round-9 additions
    "ss13_pq_rerank_topk",
    "px20_leakage_safe_split",
    "px21_budget_selection",
    "ss14_radius_density",
    "px22_grouped_budget",
    # round-10 additions
    "ss15_ivf_trained_topk",
    "ss16_ivfadc_topk",
    "tx24_hashed_linear_score",
    # round-11 additions
    "tx26_bm25_rank",
    "gr07_link_prediction",
    "q97_rolling_distinct",
    # round-13 additions
    "dd18_record_linkage",
]


# Every queries() key NOT plan-audited above must be listed here
# EXPLICITLY — tests/test_docs_index.py::test_plans_report_is_fresh
# goes red when a new query is in neither list, so adding a query
# forces a conscious audit-or-exclude decision (exclusions are
# variants whose plan shape is already covered by an audited twin,
# driver-loop queries with trivial result-assembly plans, or
# env-gated paths).
EXCLUDED = [
    # st04 replays the streaming epoch body over temp stores and returns a
    # collected-rows frame — the audited plans are px06's gate + px19's
    # deal (both in HEADLINE); its own returned plan is trivial assembly.
    "st04_ingest_shards",
    # tx25: single-scan translate+regexp projection — trivial plan, no
    # exchange; the mapping table is data, not plan shape.
    "tx25_unicode_sanitize",
    # dd16: returned frame is a bounded driver assembly (|divisors| rows);
    # the audited plan is dd04's candidate join + ONE aggregate, both
    # already covered by dd04's row.
    "dd16_lsh_band_plan",
    # st07: collected-register assembly (bounded by max_buckets) — the
    # audited plans are the per-epoch histogram groupBy + the windowed
    # quantile read, both trivial single-exchange shapes over <=grid rows.
    "st07_quantile_monitor",
    # st05: collected-register assembly (bounded <=2^p rows) — audited
    # plans are sk04/sk05, already in HEADLINE-adjacent coverage.
    "st05_hll_monitor",
    # st06: driver-loop epoch replay over a temp store returning a
    # collected-rows frame — the audited join shape is a plain keyed
    # equi join (q04-class); freshness is the live test's concern.
    "st06_state_enriched_events",
    # st08/st09: live streaming drains returning collected-rows frames;
    # the streaming plans (watermarked interval join / dedup state) are
    # not batch-explainable — parity + cross-batch state are the live
    # tests' concern, and the batch twin of st08's join is q22-class.
    "st08_stream_interval_join",
    "st09_stream_dedup",
    # st10/st11/st12: live applyInPandasWithState drains returning
    # collected-rows frames; batch twins are q08-class rank / q80-class
    # funnel / q17-class sessionize plans.
    "st10_stream_topk",
    "st11_stream_funnel",
    "st12_stream_sessionize",
    # st13: live drain sharing q93's oracle; q93's plan is audited.
    "st13_stream_zscore",
    # ss18: ss04's audited single-job probe plan + one pushed predicate
    # filter on the candidate scan; nothing new to audit.
    "ss18_filtered_topk",
    # tx29: collected-rows local frame (the tempdir index vanishes before
    # the driver collects); the probe plan's bucket-level PartitionFilters
    # are asserted in tests/test_extensions.py instead.
    "tx29_bm25_postings",
    # ss20: collected-rows local frame over a tempdir index; the probe
    # scan's (cell,label) PartitionFilters are the test_ann_recall
    # pruning assertion's shape.
    "ss20_filtered_index_topk",
    # ss22: collected-rows local frame over TWO tempdir indexes (the
    # postings probe is tx29's audited plan, the dense read ss20's, the
    # fusion ss21's <=100-row join — all three plan classes already
    # covered by their inline/index twins)
    "ss22_hybrid_index_rrf",
    # ss23: ss22's shape over incrementally-maintained tempdir indexes
    # (epoch partitions change the layout, not the plan classes — the
    # probe/read/fusion plans are the same three ss22 defers to)
    "ss23_incremental_index_rrf",
    # st14: live streaming drain (foreachBatch index maintenance) +
    # tx29's audited probe plan over the resulting tempdir index
    "st14_stream_index_sync",
    # st15: the dense twin — live streaming drain (foreachBatch IVF
    # maintenance) + an ss01-shaped full scan of the tempdir index
    "st15_stream_ivf_sync",
    # tx30/ss24: forget-path faces — tx29/ss20-class probe plans over
    # tempdir indexes plus one broadcast anti-join (the tombstone
    # exclusion); collected-rows frames, nothing new to audit
    "tx30_bm25_forget",
    "ss24_ivf_forget",
    # px25: px06's audited two-phase gate shape + one broadcast
    # anti-join (the revocation exclusion); collected-rows frame
    "px25_gate_revoke",
    # ss21: both fusion inputs are TakeOrdered <=50-row frames (tx26's
    # audited plan + an ss01-shaped scan); the fusion itself is a
    # <=100-row full-outer join — nothing scale-bearing to audit.
    "ss21_hybrid_rrf",
    # ss19: the same ss04/ss18 probe plan with a wider literal probe set
    # (the selectivity-scaled nprobe is computed driver-side from one
    # 1-row count aggregate); nothing new to audit.
    "ss19_filtered_scaled_topk",
    # mm08/09/10: one scan -> mapInPandas encode -> mapInPandas parse; the
    # plans are single Python-eval chains, nothing to audit beyond mm02/mm07.
    "mm08_real_codec_roundtrip",
    "mm09_audio_frame_energy",
    "mm10_image_pixel_stats",
    # mm11/mm12/mm13/mm14: same single-scan mapInPandas chain shape as
    # mm08-10.
    "mm11_resize_real",
    "mm12_byte_stats",
    "mm13_audio_decimate",
    "mm14_video_frame_sample",
    # sk08: two sk03-shaped sketch scans (map-side collapse into
    # depth*width cells) + a <=4096-row join — the audited sketch-scan
    # plan is sk01's row; nothing new to audit.
    "sk08_cms_join_size",
    # sk09: one sk03-shaped signed-sketch scan + a 4-row median —
    # same audited sketch-scan class.
    "sk09_cms_self_join_size",
    # px23: returned frame is a 3-row audit union of 1-row aggregates;
    # the scrub anti-joins are q36-class (broadcast anti) shapes, and
    # the scrubbed-frame semantics are the test's concern.
    "px23_delete_propagation",
    # dq07: a union of per-candidate groupBy + 1-row rollups — the
    # dq01 constraint-report plan class; nothing new to audit.
    "dq07_fd_profile",
    # tx27: single-scan codegen projection of array expressions (the
    # tx25 plan class); the rule battery is data, not plan shape.
    "tx27_gopher_rules",
    # dd17: dd04's banded-candidate plan over a unioned corpus with an
    # integer scoring projection — covered by dd04's audited row.
    "dd17_containment_pairs",
    # tx23 is tx24's sub-plan (explode + keyed groupBy); tx24 is audited.
    "tx23_hashed_features",
    # tx28: tx23's aggregate + one feature-keyed window + 1-row
    # broadcast — the tx26 df-window shape, already audited there.
    "tx28_hashed_tfidf",
    "cdc_dept_rollup",
    "cdc_dept_state",
    "cdc_emp_asof_enrich",
    "cdc_emp_history_incr",
    "cdc_emp_state",
    "cdc_pub_event",
    "cdc_stream_emp_state",
    # cdc_kafka_emp_state: same live-drain class through the kafka-shaped
    # Python source; the MERGE plan is the audited StateStore shape.
    "cdc_kafka_emp_state",
    "dd01_exact_dup_groups",
    "dd02_exact_dedup_survivors",
    "dd06_simhash",
    "dd07_dup_clusters",
    "dd08_char_neardup_pairs",
    "dd09_dup_spans",
    "dd10_simhash_neardup",
    "dd11_jaccard_estimate",
    "dd14_event_debounce",
    "dq02_column_profile",
    "dq03_distribution_drift",
    # dq08: two ss02-class posexplode aggs + one bounded (|labels|×dims)
    # join — both plan classes covered by ss02's exclusion rationale.
    "dq08_embedding_drift",
    "gr01_pagerank_neardup",
    "gr04_kcore",
    # gr06: iterative localCheckpoint rounds — final plan is checkpoint-
    # flattened like gr04; per-round shape pinned by the planted test.
    "gr06_label_propagation",
    # gr08: gr03's iterative checkpoint-flattened shape with a seeded
    # teleport term; per-iteration plan identical to the audited gr03.
    "gr08_personalized_pagerank",
    "mm01_binary_meta",
    "mm02_byte_features",
    "mm03_decode_resize",
    "mm04_frame_sample",
    "mm05_shard_manifest",
    "mm06_webdataset_roundtrip",
    "px02_cluster_dedup_pipeline",
    "px03_semantic_dedup_pipeline",
    "px04_pretraining_curation",
    "px05_exactsubstr_scrub",
    "px06_incremental_ingest",
    "px07_multimodal_curation",
    "px08_decontaminated_split",
    "px09_semdedup",
    "px10_rag_corpus",
    "px11_dsir_selection",
    "q01_sync_report",
    "q03_filter_project",
    "q05_order_priority",
    "q06_customer_order_coverage",
    "q07_top_customers",
    "q09_running_user_totals",
    "q10_rollup_region_nation",
    "q11_cube_events",
    "q12_setops_segments",
    "q13_distinct_users",
    "q14_scalar_functions",
    "q15_json_extract",
    "q16_balance_buckets",
    "q18_latest_event_per_user",
    "q19_hourly_event_rollup",
    "q20_pivot_returnflag",
    "q21_brand_supply_stats",
    "q23_range_join_tiers",
    "q24_value_percentiles",
    "q25_corr_stats",
    "q26_grouping_sets",
    "q27_above_nation_avg",
    "q28_hash_sample",
    "q29_segment_lists",
    "q30_date_arithmetic",
    "q31_sql_shipping_priority",
    "q32_salted_join_agg",
    "q33_approx_distinct",
    "q34_full_outer_join",
    "q35_cross_join_grid",
    "q36_not_in_semantics",
    "q37_bag_setops",
    "q38_window_frames",
    "q39_string_functions",
    "q40_array_functions",
    "q41_map_functions",
    "q42_volume_shipping",
    "q43_priority_case_agg",
    "q44_promo_revenue",
    "q45_disjunctive_join",
    "q46_conversion_funnel",
    "q47_custdist",
    "q48_big_orders",
    "q49_small_qty_revenue",
    "q50_wealthy_inactive",
    "q51_top_supplier",
    "q52_stratified_sample",
    "q53_gapfill_hourly",
    "q55_returned_revenue",
    "q56_unpivot_metrics",
    "q57_rolling_7day",
    "q58_event_transitions",
    "q59_approx_percentiles",
    "q60_revenue_share",
    "q61_global_suppliers",
    "q62_exclusive_parts",
    "q63_next_purchase_asof",
    "q64_lateral_topk",
    "q65_median_stats",
    "q66_recursive_month_spine",
    "q67_min_cost_supplier",
    "q68_forecast_revenue",
    "q69_product_profit",
    "q70_important_part_value",
    "q71_waiting_orders",
    "q72_dominant_part_suppliers",
    "q75_pivot_priority",
    "q78_customer_cohorts",
    "q79_stratified_sample",
    "q80_event_funnel",
    "q81_retention_cohorts",
    "q82_event_transitions",
    "q83_locf_gapfill",
    "q85_sampled_quantiles",
    "q92_hilbert_layout",
    "q94_snapshot_diff",
    "sk01_cms_heavy_hitters",
    "sk03_cms_expr",
    "sk06_kmv_overlap",
    "sk07_histogram_quantiles",
    "ss02_label_centroids",
    "ss03_ann_lsh_topk",
    "ss10_ivf_deploy_topk",
    "st01_sliding_rollup",
    "st02_session_rollup",
    "tx01_token_stats",
    "tx02_quality_scores",
    "tx03_lang_id",
    "tx04_fingerprints",
    "tx05_top_bigrams",
    "tx06_subword_counts",
    "tx07_keyterms",
    "tx08_denylist_scrub",
    "tx09_packing_index",
    "tx10_repetition_stats",
    "tx11_pii_scrub",
    "tx12_contamination",
    "tx13_domain_mixture",
    "tx14_token_freq",
    "tx19_bpe_merges",
    "tx20_bpe_encode",
]


def _join_label(node) -> str:
    """Label joins, distinguishing a BroadcastNestedLoopJoin whose build
    side is a 1-ROW aggregate (a scalar total/denominator broadcast —
    correct and cheap: one row against n is a map-side multiply, not a
    nested loop over two relations) from a genuine BNL. Keeps the audit
    signal clean: dq06's coverage-ppm denominators showed as BNL×21 and
    read as red flags (VERDICT r9 #7)."""
    name = node.nodeName()
    if "BroadcastNestedLoopJoin" not in name:
        return name
    kids = node.children()
    for i in range(kids.length()):
        k = kids.apply(i)
        # strip codegen boundary wrappers (InputAdapter/WholeStageCodegen)
        # and follow a ReusedExchange to the original it points at
        while True:
            if k.nodeName().startswith(("InputAdapter", "WholeStageCodegen")):
                inner = k.children()
                if inner.length() != 1:
                    break
                k = inner.apply(0)
            elif k.nodeName() == "ReusedExchange":
                k = k.child()
            else:
                break
        if not k.nodeName().startswith("BroadcastExchange"):
            continue
        sub = k.toString()
        if "HashAggregate(keys=[]" in sub or "SortAggregate(key=[]" in sub:
            return "BNL(1-row)"
    return name


def _walk(node, out):
    """Collect (label, one-line repr) over the RUNTIME operator tree —
    does NOT descend into an InMemoryTableScan's build lineage (that
    subtree prints in toString but executes only once, at cache fill)."""
    name = node.nodeName()
    out.append((_join_label(node), node.toString().splitlines()[0]))
    if name.startswith("InMemoryTableScan"):
        return
    kids = node.children()
    for i in range(kids.length()):
        _walk(kids.apply(i), out)


def audit(df) -> dict:
    nodes: list[tuple[str, str]] = []
    _walk(df._jdf.queryExecution().executedPlan(), nodes)
    joins: dict[str, int] = {}
    scans = []
    exchanges = 0
    cached = 0
    for name, line in nodes:
        if "Join" in name or name == "BNL(1-row)":
            joins[name] = joins.get(name, 0) + 1
        elif name == "Exchange" and "hashpartitioning" in line:
            exchanges += 1
        elif name.startswith("InMemoryTableScan"):
            cached += 1
        elif name.strip() in ("FileSourceScan", "Scan parquet"):
            table = "?"
            m = re.search(r"(\w+)\.parquet", line)
            if m:
                table = m.group(1)
            ncols = len(re.findall(r"#\d+", line.split("ReadSchema")[0]))
            pushed = "PushedFilters: [" in line and "PushedFilters: []" not in line
            scans.append((table, ncols, pushed))
    return {
        "exchanges": exchanges,
        "cached": cached,
        "joins": joins,
        "scans": scans,
    }


def main() -> None:
    # AQE off for the audit: AdaptiveSparkPlanExec hides the operator tree
    # from children(); the static plan is the structure under audit (AQE
    # only re-plans sizes/skew at runtime)
    spark = get_spark(
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": "false",
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        "Generated by `scripts/gen_plan_report.py` against sf0.01"
        " (structure is scale-independent; AQE re-plans sizes at runtime).",
        "Runtime operator tree only — an `InMemoryTableScan`'s build lineage",
        "executes once at cache fill and is counted as `cached`, not as",
        "repeated scans. Scans as `table(read-cols, pushed-filters?)`.",
        "",
        "| query | exchanges | cached reads | joins | scans |",
        "|---|---|---|---|---|",
    ]
    for name in HEADLINE:
        a = audit(QUERIES[name](spark, SF))
        joins = (
            ", ".join(f"{k.replace('Join', '')}×{v}" for k, v in a["joins"].items())
            or "—"
        )
        scans = (
            ", ".join(
                f"{t}({n}{', pushed' if p else ''})" for t, n, p in a["scans"]
            )
            or "—"
        )
        out.append(
            f"| {name} | {a['exchanges']} | {a['cached']} | {joins} |"
            f" {scans} |"
        )
    out += [
        "",
        "Reading guide: `BNL(1-row)` is a BroadcastNestedLoopJoin whose build",
        "side is a 1-ROW aggregate (scalar total/denominator) — a map-side",
        "multiply, not a relation×relation nested loop; genuine BNLs keep the",
        "full name. Dims broadcast (q04/q54), the as-of join has NO join",
        "node (union + one window), dd12's boilerplate anti join broadcasts,",
        "dq01 reads each checked table once for all its row checks, the SCD2",
        "derivation is a single PK exchange, sk02's bloom probe prunes before",
        "the shuffle. Asserted continuously in tests/test_plans.py.",
        "",
    ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("\n".join(out))


if __name__ == "__main__":
    main()

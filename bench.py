"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Two kinds of numbers:

- per-query wall seconds for the representative analytic / CDC / dedup /
  similarity plans (fully materialized via the noop sink so projection
  isn't optimized away);
- ``cdc_rate_rec_s``: sustained parse→normalize→fold→MERGE throughput on a
  synthetic OGG batch — comparable to the reference's implied design
  ceiling of 10,000 rec/s (BASELINE.md: 2000 rec/s/partition × 5
  partitions).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

BENCH_QUERIES = [
    "q02_pricing_summary",      # TPC-H Q1 scan-agg
    "q04_revenue_by_nation",    # 5-way star join
    "q08_top_orders_per_customer",  # window top-k
    "q15_json_extract",         # JSON path + agg
    "q17_sessionize",           # lag + running-sum sessionization
    "q19_hourly_event_rollup",  # event-time rollup
    "cdc_emp_state",            # CDC fold from raw JSON lines
    "tx02_quality_scores",      # text quality (array exprs)
    "dd03_minhash_bands",       # MinHash signatures
    "dd04_neardup_pairs",       # LSH + Jaccard verify
    "dd06_simhash",             # SimHash (explode + 32-way agg)
    "ss01_knn_cosine",          # brute-force cosine top-k
    "ss10_ivf_deploy_topk",     # IVF ANN deploy path (numpy-trained; kept from r6 so totals stay comparable — the oracle twin ss04 is no longer compile-bound after the r7 generated-SQL rebuild)
    "q22_asof_join",            # as-of join (union + single window pass)
    "q54_market_share",         # TPC-H Q8 6-table star (all dims broadcast)
    "tx07_keyterms",            # tf-idf keyterms (explode + 2 aggs + window)
    "px01_curation_pipeline",   # quality → dedup → stats, one plan
    "px02_cluster_dedup_pipeline",  # LSH pairs → connected components → stats
    # The heavy similarity family (r8): regression-tracks the generated-SQL
    # seed-scoring rebuild — these were the three slowest queries in the
    # repo (~49/39/25 s cold at sf0.1 before r8, ~13/10/2 s after).
    "dd05_embedding_neardup",   # seed-cell blocking + exact cosine verify
    "px03_semantic_dedup_pipeline",  # dd05 pairs → closure → survivors
    "ss05_knn_join",            # batch kNN join (cell-blocked candidates)
]

N_CDC_RECORDS = 200_000

# Secondary section (VERDICT r10 #5): the newest ANN / featurizer /
# multimodal paths get their OWN metric keys so regressions are
# detectable round-over-round WITHOUT perturbing the 22-query headline
# total that has been comparable since r8. Same warmup + median-of-3
# protocol as the headline loop.
SECONDARY_QUERIES = [
    "ss15_ivf_trained_topk",    # trained-centroid IVF (Lloyd's + probe + rerank)
    "ss16_ivfadc_topk",         # IVF-ADC composed (cell pruning x PQ codes)
    "tx23_hashed_features",     # dictionary-free feature hashing
    "mm11_resize_real",         # real decoded-pixel integer resize
    # r11 session-2 additions (warm walls ~0.9s / ~3.0s / ~2.5s at sf0.1)
    "tx26_bm25_rank",           # BM25 lexical retrieval (explode+window+rank)
    "gr07_link_prediction",     # wedge-join common-neighbor link prediction
    "dd17_containment_pairs",   # Broder containment over LSH candidates
    # r12 additions (regression-trackable from r13)
    "ss19_filtered_scaled_topk",  # selectivity-scaled filtered ANN
    "ss21_hybrid_rrf",            # integer-RRF hybrid retrieval
    # r13 session-3 addition (regression-trackable from r14)
    "px24_embedding_decontam",    # cross-set eval decontamination, nprobe=8
]


def _gen_cdc_batch(spark, n: int):
    """Synthetic OGG change records (I/U/D mix over 20k keys) as a raw
    JSON-line DataFrame — generated distributed, not on the driver."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.concat(
            F.lit('{"table": "SCOTT.EMP", "op_type": "'),
            F.when(F.col("id") % 10 == 9, "D")
            .when(F.col("id") % 3 == 0, "I")
            .otherwise("U"),
            F.lit('", "current_ts": "2024-01-01T'),
            F.lpad(((F.col("id") * 7) % 24).cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(((F.col("id") * 13) % 60).cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(((F.col("id") * 17) % 60).cast("string"), 2, "0"),
            F.lit('.000000", "pos": '),
            F.col("id").cast("string"),
            F.lit(', "after": {"ID": "'),
            (F.col("id") % 20000).cast("string"),
            F.lit('", "NAME": "user'),
            (F.col("id") % 997).cast("string"),
            F.lit('", "SALARY": "'),
            ((F.col("id") % 5000) + 100).cast("string"),
            F.lit('.25", "DEPT_ID": "'),
            (F.col("id") % 30).cast("string"),
            F.lit('", "ACTIVE": "1"}}'),
        ).alias("value")
    )
    return df


def _load_stamp() -> dict:
    """Machine-load snapshot recorded alongside the timings so
    round-over-round comparisons can tell environment drift from a code
    regression (r8: all 19 carried queries moved +12–53% uniformly while
    in-session walls improved — box load, not plans)."""
    stamp: dict = {"cpus_online": os.cpu_count()}
    try:
        l1, l5, l15 = os.getloadavg()
        stamp.update(
            {"load1": round(l1, 2), "load5": round(l5, 2), "load15": round(l15, 2)}
        )
    except OSError:
        pass
    try:
        with open("/proc/uptime") as f:
            stamp["uptime_s"] = round(float(f.read().split()[0]), 1)
    except OSError:
        pass
    return stamp


def _load_gate() -> dict:
    """Refuse to start while the box is hot (VERDICT r10 #1): BENCH_r10's
    +24.7% paper regression was machine load (load1=5.39 at start), which
    the protocol STAMPED but didn't act on. Gate on ``max(load1, load5)``
    (VERDICT r12: a box that just went quiet passes a load1-only gate
    while the last half-hour's contention still echoes in the page/buffer
    caches and CPU thermals — BENCH_r12 started at load1=1.58 but
    load5=3.03/load15=2.99 and every carried key drifted +5–45%). Wait,
    bounded, for the gate; if it never passes, proceed anyway with
    ``timed_out: true`` so the artifact says its numbers are suspect.

    Knobs: SPARK_GRAFT_LOAD_GATE (threshold, default 2.0; 0 disables),
    SPARK_GRAFT_LOAD_GATE_TIMEOUT_S (default 900)."""
    threshold = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
    timeout_s = float(os.environ.get("SPARK_GRAFT_LOAD_GATE_TIMEOUT_S", "900"))
    gate = {"threshold": threshold, "waited_s": 0.0, "polls": 0, "timed_out": False}
    if threshold <= 0:
        gate["disabled"] = True
        return gate
    start = time.time()
    while True:
        try:
            load1, load5, _ = os.getloadavg()
        except OSError:
            gate["unavailable"] = True
            return gate
        gate["polls"] += 1
        eff = max(load1, load5)
        if eff <= threshold:
            gate["load1_at_pass"] = round(load1, 2)
            gate["load5_at_pass"] = round(load5, 2)
            gate["waited_s"] = round(time.time() - start, 1)
            return gate
        if time.time() - start > timeout_s:
            gate["timed_out"] = True
            gate["load1_at_pass"] = round(load1, 2)
            gate["load5_at_pass"] = round(load5, 2)
            gate["waited_s"] = round(time.time() - start, 1)
            return gate
        time.sleep(15)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    gate = _load_gate()  # block BEFORE the session spins up its own load

    from kafkatosparktokudu_spark.session import get_spark
    from kafkatosparktokudu_spark.plans.queries import QUERIES

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    # Warm up JVM / codegen / parquet footer caches so the first timed query
    # measures steady-state execution, not session cold-start.
    QUERIES["q03_filter_project"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    load_start = _load_stamp()
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        # One explicit untimed warmup rep (codegen compile, parquet footer
        # cache, JIT), then median of 3 timed reps: the round-over-round
        # drift seen in earlier rounds (r1 19.9s → r2 36.6s on unchanged
        # code) was first-run compile/GC noise that best-of-2 didn't fully
        # suppress. clearCache isolates runs: a prior query's persisted
        # frames (e.g. the LSH shingle cache) must not skew the next.
        reps = []
        for rep in range(4):
            spark.catalog.clearCache()
            # pay accumulated GC debt OUTSIDE the timed window: hash-heavy
            # queries (md5 shingling) leave GBs of young garbage that would
            # otherwise stall a later query's first stage for seconds
            spark._jvm.System.gc()
            start = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            if rep > 0:  # rep 0 is the warmup
                reps.append(time.time() - start)
        results[name] = round(sorted(reps)[1], 3)
        spread[name] = [round(min(reps), 3), round(max(reps), 3)]

    # Secondary section: same protocol, separate keys (NOT in the total).
    secondary: dict[str, float] = {}
    for name in SECONDARY_QUERIES:
        fn = QUERIES[name]
        reps = []
        for rep in range(4):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            start = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            if rep > 0:
                reps.append(time.time() - start)
        secondary[name] = round(sorted(reps)[1], 3)
        spread[name] = [round(min(reps), 3), round(max(reps), 3)]

    # BM25 postings-index amortization (VERDICT r11 #4): build ONCE, then
    # 3 different probes vs the same 3 queries inline — the inverted-index
    # claim is that build+N probes beats N corpus scans for N >= 3.
    # Secondary keys (outside the comparable headline total):
    # bm25_index_build / bm25_probe3_total / bm25_inline3_total.
    from kafkatosparktokudu_spark.operators.text import (
        bm25_index_topk,
        bm25_rank,
        build_bm25_index,
    )
    from kafkatosparktokudu_spark.sources.batch import load_table as _lt

    term_sets = [
        ["merge", "vector", "stream"],
        ["index", "join", "window"],
        ["data", "batch", "kudu"],
    ]
    bm_docs = _lt(spark, sf_dir, "documents")
    bm_tmp = tempfile.mkdtemp(prefix="bench_bm25_")
    try:
        spark.catalog.clearCache()
        start = time.time()
        build_bm25_index(bm_docs, f"{bm_tmp}/idx")
        secondary["bm25_index_build"] = round(time.time() - start, 3)
        # one untimed warmup per path (house protocol) — the first probe
        # pays a one-off partition-directory listing, the first inline a
        # one-off codegen
        bm25_index_topk(
            spark, f"{bm_tmp}/idx", term_sets[0], top_n=20
        ).write.format("noop").mode("overwrite").save()
        bm25_rank(bm_docs, term_sets[0], top_n=20).write.format("noop").mode(
            "overwrite"
        ).save()
        start = time.time()
        for ts in term_sets:
            bm25_index_topk(spark, f"{bm_tmp}/idx", ts, top_n=20).write.format(
                "noop"
            ).mode("overwrite").save()
        secondary["bm25_probe3_total"] = round(time.time() - start, 3)
        start = time.time()
        for ts in term_sets:
            bm25_rank(bm_docs, ts, top_n=20).write.format("noop").mode(
                "overwrite"
            ).save()
        secondary["bm25_inline3_total"] = round(time.time() - start, 3)
    finally:
        shutil.rmtree(bm_tmp, ignore_errors=True)

    # Hybrid index-only serving (ss22 vs ss21, VERDICT r12 #5): build the
    # postings + seeded-IVF indexes once, then time 3 fused probes that
    # never touch the raw tables, against 3 inline ss21-shaped runs —
    # hybrid_index_build / hybrid_probe3_total / hybrid_inline3_total.
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.functions.topk import ranked_top_n
    from kafkatosparktokudu_spark.functions.vectors import (
        as_double,
        cosine_literal,
    )
    from kafkatosparktokudu_spark.operators.similarity import (
        build_seeded_filtered_index,
        rrf_fuse,
    )

    hy_emb = _lt(spark, sf_dir, "embeddings")
    hy_qv = [
        float(x)
        for x in hy_emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ]

    def _dense_top50(src):
        scored = src.filter(F.col("vec_id") != 0).select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine_literal(as_double(F.col("embedding")), hy_qv), 6
            ).alias("cos_sim"),
        )
        return ranked_top_n(
            scored, [F.col("cos_sim").desc(), F.col("doc_id")], 50
        )

    hy_tmp = tempfile.mkdtemp(prefix="bench_hybrid_")
    try:
        spark.catalog.clearCache()
        start = time.time()
        build_bm25_index(bm_docs, f"{hy_tmp}/lex")
        build_seeded_filtered_index(hy_emb, f"{hy_tmp}/dense", n_cells=16)
        secondary["hybrid_index_build"] = round(time.time() - start, 3)
        dense_idx = spark.read.parquet(f"{hy_tmp}/dense")
        # one untimed warmup per path (house protocol)
        rrf_fuse(
            bm25_index_topk(spark, f"{hy_tmp}/lex", term_sets[0], top_n=50),
            _dense_top50(dense_idx), top_n=20,
        ).write.format("noop").mode("overwrite").save()
        rrf_fuse(
            bm25_rank(bm_docs, term_sets[0], top_n=50),
            _dense_top50(hy_emb), top_n=20,
        ).write.format("noop").mode("overwrite").save()
        start = time.time()
        for ts in term_sets:
            rrf_fuse(
                bm25_index_topk(spark, f"{hy_tmp}/lex", ts, top_n=50),
                _dense_top50(dense_idx), top_n=20,
            ).write.format("noop").mode("overwrite").save()
        secondary["hybrid_probe3_total"] = round(time.time() - start, 3)
        start = time.time()
        for ts in term_sets:
            rrf_fuse(
                bm25_rank(bm_docs, ts, top_n=50),
                _dense_top50(hy_emb), top_n=20,
            ).write.format("noop").mode("overwrite").save()
        secondary["hybrid_inline3_total"] = round(time.time() - start, 3)
        # the PRODUCTION dense shape: approximate probe (nprobe=4 of 16
        # cells, partition-pruned) instead of the exactness-pinning full
        # probe — bench-only, no oracle claim (results are approximate)
        from kafkatosparktokudu_spark.operators.similarity import (
            seeded_probe_cells,
        )

        ap = seeded_probe_cells(
            dense_idx.select("vec_id", "embedding"), hy_qv,
            n_cells=16, nprobe=4,
        )
        start = time.time()
        for ts in term_sets:
            rrf_fuse(
                bm25_index_topk(spark, f"{hy_tmp}/lex", ts, top_n=50),
                _dense_top50(dense_idx.filter(F.col("cell").isin(ap))),
                top_n=20,
            ).write.format("noop").mode("overwrite").save()
        secondary["hybrid_probe3_approx_total"] = round(time.time() - start, 3)
    finally:
        shutil.rmtree(hy_tmp, ignore_errors=True)

    # Incremental index maintenance (r13): appending a 10% ingest batch
    # must cost ~the batch, not the corpus — keys bm25_append_batch vs
    # bm25_rebuild_full (tokenize batch + dynamic epoch overwrite vs the
    # full tokenize shuffle) and ivf_upsert_batch vs ivf_rebuild_full
    # (frozen-centroid assign vs retrain + full rewrite). Batch = 10% of
    # the corpus re-keyed past the id space (append-only contract).
    from kafkatosparktokudu_spark.operators.similarity import (
        build_ivf_index,
        upsert_ivf_index,
    )
    from kafkatosparktokudu_spark.operators.text import append_bm25_index

    inc_tmp = tempfile.mkdtemp(prefix="bench_incidx_")
    try:
        spark.catalog.clearCache()
        n_docs = bm_docs.count()
        doc_batch = bm_docs.filter(F.col("doc_id") < n_docs // 10).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
        grown_docs = bm_docs.select("doc_id", "text").unionByName(doc_batch)
        build_bm25_index(bm_docs, f"{inc_tmp}/lex")  # untimed base
        start = time.time()
        append_bm25_index(doc_batch, f"{inc_tmp}/lex", epoch=1)
        secondary["bm25_append_batch"] = round(time.time() - start, 3)
        start = time.time()
        build_bm25_index(grown_docs, f"{inc_tmp}/lex_rebuild")
        secondary["bm25_rebuild_full"] = round(time.time() - start, 3)

        n_vecs = hy_emb.count()
        vec_batch = hy_emb.filter(F.col("vec_id") < n_vecs // 10).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            "embedding",
            "label",
        )
        grown_emb = hy_emb.select("vec_id", "embedding", "label").unionByName(
            vec_batch
        )
        build_ivf_index(hy_emb, f"{inc_tmp}/ivf", n_cells=16)  # untimed
        start = time.time()
        upsert_ivf_index(vec_batch, f"{inc_tmp}/ivf", epoch=1)
        secondary["ivf_upsert_batch"] = round(time.time() - start, 3)
        start = time.time()
        build_ivf_index(grown_emb, f"{inc_tmp}/ivf_rebuild", n_cells=16)
        secondary["ivf_rebuild_full"] = round(time.time() - start, 3)
    finally:
        shutil.rmtree(inc_tmp, ignore_errors=True)

    # CDC throughput: full parse→normalize→fold→MERGE of a synthetic batch
    from kafkatosparktokudu_spark.cdc import sync_batch

    spark.catalog.clearCache()  # release analytic-query cache before CDC timing
    raw = _gen_cdc_batch(spark, N_CDC_RECORDS)
    raw.cache().count()  # materialize the generator; time the pipeline only
    # The baseline number (10k rec/s) is SUSTAINED throughput, so measure the
    # steady state: one untimed initial sync populates the warehouse (codegen
    # + write-path warmup), then each timed rep re-syncs the same batch into
    # the existing state — the real per-micro-batch MERGE cost. Median of 3,
    # same rationale as the query loop above.
    wh = tempfile.mkdtemp(prefix="bench_wh_")
    try:
        m = sync_batch(spark, raw, wh, n_buckets=16)
        reps = []
        for _ in range(5):
            # the CDC loop runs AFTER the analytic queries chewed the heap;
            # two gc passes + a short settle keep accumulated GC debt out
            # of the timed window (median-of-5 absorbs what remains — the
            # box-load envelope on this metric is the widest of the suite)
            spark._jvm.System.gc()
            time.sleep(0.3)
            spark._jvm.System.gc()
            start = time.time()
            m = sync_batch(spark, raw, wh, n_buckets=16)
            reps.append(time.time() - start)
        cdc_secs = sorted(reps)[2]
        spread["cdc_sync_200k"] = [round(min(reps), 3), round(max(reps), 3)]
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    results["cdc_sync_200k"] = round(cdc_secs, 3)
    cdc_rate = round(m.total / cdc_secs, 1)

    # kafka-shaped CDC path (VERDICT r11 #7): the SAME 200k fixture through
    # the kafkalog Python DataSource -> readStream -> foreachBatch MERGE —
    # the measured throughput baseline for the claimed one-line broker
    # swap (DEPLOY). Protocol mirrors cdc_sync_200k: one untimed drain
    # populates the warehouse (+ codegen), then each timed rep re-drains
    # the same log from offset 0 on a FRESH checkpoint into the existing
    # state — the steady-state per-backlog cost. The wall additionally
    # pays the streaming machinery + the Python source read (5 JSONL
    # partition logs through Python workers), which the file path does
    # not — that delta is exactly what this key exists to record.
    from kafkatosparktokudu_spark.config import PipelineConfig
    from kafkatosparktokudu_spark.sources.kafka_shaped import (
        append_records,
        kafka_shaped_source,
    )
    from kafkatosparktokudu_spark.streaming.pipeline import start_cdc_sync

    kdir = tempfile.mkdtemp(prefix="bench_kshaped_")
    try:
        lines = [r["value"] for r in raw.collect()]
        for p in range(5):  # 5 partitions, the reference's topic layout
            append_records(f"{kdir}/log", p, lines[p::5])
        k_reps = []
        for rep in range(4):  # rep 0 = untimed warmup
            cfg = PipelineConfig(
                warehouse_dir=f"{kdir}/wh",
                checkpoint_dir=f"{kdir}/ckpt{rep}",
                metrics_dir=f"{kdir}/metrics",
            )
            spark._jvm.System.gc()
            start = time.time()
            q = start_cdc_sync(
                spark,
                kafka_shaped_source(spark, f"{kdir}/log", group_id=f"b{rep}"),
                cfg,
                available_now=True,
            )
            q.awaitTermination(600)
            if rep > 0:
                k_reps.append(time.time() - start)
        k_secs = sorted(k_reps)[1]
        secondary["cdc_kafka_shaped_200k"] = round(k_secs, 3)
        spread["cdc_kafka_shaped_200k"] = [
            round(min(k_reps), 3), round(max(k_reps), 3),
        ]
        kafka_shaped_rate = round(N_CDC_RECORDS / k_secs, 1)
    finally:
        shutil.rmtree(kdir, ignore_errors=True)

    # LLM-ingest throughput (st04): docs/s through the full streaming epoch
    # body — near-dup GATE against the accepted history → quality score →
    # stratified shard DEAL (VERDICT r9 #8: the CDC path had a rec/s
    # number, the ingest gate did not). Epoch batches are the sf corpus
    # with every token re-prefixed per epoch (the r9 scaling-study
    # decorrelation recipe), so each epoch is accepted ~whole and the
    # accepted store GROWS — the timed epochs pay the real
    # history-screening cost, not an empty-dup shortcut.
    from pyspark.sql import functions as F

    from kafkatosparktokudu_spark.sources.batch import load_table
    from kafkatosparktokudu_spark.streaming.pipeline import ingest_shards_epoch

    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    st_tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        ing_reps = []
        for epoch in range(4):  # epoch 0 is the untimed store-seeding warmup
            batch = docs.select(
                (F.col("doc_id") + epoch * 10_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(F.lit(f"e{epoch}x"), t),
                    ),
                    " ",
                ).alias("text"),
            ).withColumn("n_chars", F.length("text"))
            spark._jvm.System.gc()
            start = time.time()
            ingest_shards_epoch(
                batch, epoch, f"{st_tmp}/sigs", f"{st_tmp}/out"
            )
            if epoch > 0:
                ing_reps.append(time.time() - start)
        ingest_secs = sorted(ing_reps)[1]
        # reported OUTSIDE `queries`/total: the headline total must stay
        # round-over-round comparable (22 queries + cdc since r8); the
        # ingest epoch is a new r10 metric with its own key + spread.
        spread["st04_ingest_epoch"] = [
            round(min(ing_reps), 3), round(max(ing_reps), 3),
        ]
        ingest_rate = round(n_docs / ingest_secs, 1)
    finally:
        shutil.rmtree(st_tmp, ignore_errors=True)

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                "cdc_rate_rec_s": cdc_rate,
                "baseline_cdc_rate_rec_s": 10000,
                "ingest_rate_docs_s": ingest_rate,
                "cdc_kafka_shaped_rate_rec_s": kafka_shaped_rate,
                "ingest_epoch_sec": round(ingest_secs, 3),
                "secondary": secondary,
                # protocol + environment stamps: per-query numbers are the
                # MEDIAN of 3 timed reps after 1 untimed warmup (CDC:
                # median of 5); queries_spread is [min, max] over the
                # timed reps — a wide spread or a hot load stamp marks the
                # round's numbers as environment-noisy, not plan changes.
                "protocol": {
                    "warmup_reps": 1,
                    "timed_reps": 3,
                    "stat": "median",
                    "cdc_timed_reps": 5,
                    "load_gate": gate,
                },
                "queries_spread": spread,
                "load_start": load_start,
                "load_end": _load_stamp(),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Sketch-based approximate aggregation: count-min heavy hitters.

The reference has no sketches (its only aggregate is a per-batch record
count, ConsumerMain.scala:86-126); this is part of the training-pipeline
extension surface alongside HLL (q33) and MinHash (dd03).

Scale design: the sketch is built by Spark's JVM-side ``count_min_sketch``
aggregate — a map-side partial merge of fixed-size (depth x width) arrays, so
the shuffle is O(sketch bytes x partitions), independent of row count. At
100 TB the sketch build is one scan with no wide shuffle; only the tiny
serialized sketch (~100 KB at eps=1e-3) reaches the driver, where candidate
frequencies are probed via the same org.apache.spark.util.sketch
CountMinSketch implementation that built it (identical hashing, so estimates
are the ones a streaming consumer of the sketch would see).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def count_min_sketch_bytes(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """One-pass distributed CMS build; returns the serialized sketch."""
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sketch")
    ).collect()[0]
    return bytes(row["sketch"])


def cms_estimates(spark: SparkSession, sketch: bytes, values: list) -> dict:
    """Probe the sketch for each value (driver-side, O(len(values)))."""
    jvm = spark.sparkContext._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(sketch)
    return {v: sk.estimateCount(v) for v in values}


def heavy_hitters(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    k: int = 10,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Top-k heavy hitters with CMS-estimated frequencies.

    Candidates come from an exact distributed count (deterministic
    tie-break on the value), estimates from the sketch — the pattern a
    100 TB pipeline uses when the sketch is built once and probed by many
    consumers. est_count >= true count always; est - true <= eps * N with
    probability >= confidence.
    """
    sketch = count_min_sketch_bytes(df, col, eps, confidence, seed)
    cand = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.col(col))
        .limit(k)
        .collect()
    )
    est = cms_estimates(spark, sketch, [r[col] for r in cand])
    from ..functions.localframe import local_frame

    return local_frame(
        spark,
        [(r[col], int(r["true_count"]), int(est[r[col]])) for r in cand],
        f"{col} bigint, true_count bigint, est_count bigint",
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning — the explicit, declarative form of the
# runtime filter a warehouse injects for selective star joins: build a tiny
# bitmap over the SELECTIVE side's join keys, broadcast it, and prune the
# fact scan BEFORE the shuffle. The bloom can false-positive (rate set by
# m/n), never false-negative, so following it with the exact join keeps the
# result exact while the shuffle moves only candidate rows. At 100 TB this
# is the difference between shuffling the whole fact table and shuffling
# ~the matching fraction; m_bits scales with the build side's distinct keys
# (~16 bits/key for ~0.1% fpr at k=3), and the bitmap build itself is one
# partial-agg groupBy over 64-bit words — no driver round-trip.
# All hashes are md5-based (functions/hashing.py rationale).
# ---------------------------------------------------------------------------


def _bloom_pos_sql(key_sql: str, i: int, m_bits: int) -> str:
    """SQL for the i-th hash position of a key: md5('bloom{i}:' || key)
    folded to [0, m_bits)."""
    return (
        f"pmod(CAST(conv(substring(md5(concat('bloom{i}:', "
        f"CAST({key_sql} AS STRING))), 1, 8), 16, 10) AS BIGINT), {m_bits})"
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 3
) -> DataFrame:
    """ONE-row DataFrame holding the bitmap as ``_bm array<bigint>``
    (m_bits/64 packed words). Kept as a DataFrame (not collected) so the
    probe side attaches it with a broadcast cross join — the bitmap never
    visits the driver."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = [F.expr(_bloom_pos_sql(key_col, i, m_bits)) for i in range(k_hashes)]
    bits = df.select(F.explode(F.array(*pos)).alias("p")).select(
        F.expr("CAST(p div 64 AS INT)").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("bit"),
    )
    words = bits.groupBy("word").agg(F.expr("bit_or(bit)").alias("w"))
    n_words = m_bits // 64
    return words.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("w")).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("wm"), i), F.lit(0).cast("bigint")
            ),
        ).alias("_bm")
    )


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Rows of ``fact`` whose key MIGHT be in the bloom (superset of the
    true matches; no false negatives by construction — pinned by
    test_bloom_no_false_negatives). Pure column expressions over the
    broadcast 1-row bitmap: evaluated inside the scan stage, before any
    shuffle."""
    tests = [
        f"(element_at(_bm, CAST({_bloom_pos_sql(key_col, i, m_bits)} div 64 "
        f"AS INT) + 1) & shiftleft(CAST(1 AS BIGINT), "
        f"CAST({_bloom_pos_sql(key_col, i, m_bits)} % 64 AS INT))) <> 0"
        for i in range(k_hashes)
    ]
    return (
        fact.crossJoin(F.broadcast(bloom))
        .filter(F.expr(" AND ".join(tests)))
        .drop("_bm")
    )


def _cms_cells(col: str, depth: int, width: int) -> F.Column:
    """The (row, bucket) struct array of a value's CMS cells — the ONE
    place the hash layout lives: build (cms_expr_table) and probe
    (cms_expr_heavy_hitters) must agree bit-for-bit, so they both call
    this. The DuckDB oracle mirrors the same H32('r{r}#'||value) % width
    formula."""
    from ..functions.hashing import md5_hash32

    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (
                    md5_hash32(
                        F.concat(F.lit(f"r{r}#"), F.col(col).cast("string"))
                    )
                    % width
                ).alias("bucket"),
            )
            for r in range(depth)
        ]
    )


def cms_expr_table(
    df: DataFrame, col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Expression-level count-min sketch — the ORACLE-REPRODUCIBLE twin
    of the JVM ``count_min_sketch`` aggregate (sk01 keeps that one;
    its murmur hashing is library-internal so it can only ever be
    bound-tested). Here the ``depth`` row hashes are md5-derived
    (``H32('r{r}#' || value) % width``), so a SQL engine rebuilds the
    identical table. Returns (row, bucket, c) — depth×width cells, the
    same O(sketch) shuffle independence from row count: the explode
    emits depth rows per input row but they hash-aggregate into at most
    depth×width groups map-side."""
    return (
        df.select(F.explode(_cms_cells(col, depth, width)).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_expr_heavy_hitters(
    df: DataFrame, col: str, k: int = 10, depth: int = 4, width: int = 64
) -> DataFrame:
    """Top-k candidates (exact count, deterministic tie-break) probed
    against the expression-level CMS: est_count = min over rows of the
    candidate's cell — >= true_count always, with the overestimate
    exercising the width-bounded collision behavior. Everything is
    integer + md5, hence bit-exact cross-engine."""
    table = cms_expr_table(df, col, depth, width)
    cand = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.col(col))
        .limit(k)
    )
    probes = cand.select(
        col,
        "true_count",
        F.explode(_cms_cells(col, depth, width)).alias("rb"),
    )
    return (
        probes.join(
            table,
            (F.col("rb.row") == table["row"])
            & (F.col("rb.bucket") == table["bucket"]),
        )
        .groupBy(col, "true_count")
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )


def _bitlen_case_sql(x_sql: str, w: int) -> str:
    """Integer bit-length of a ``w``-bit non-negative value as a generated
    CASE chain — no float log2, so both engines agree at exact powers of
    two (where ``floor(log2(2^k))`` can land on k-epsilon in one engine
    and k in the other)."""
    branches = " ".join(
        f"WHEN {x_sql} >= {1 << (k - 1)} THEN {k}" for k in range(w, 0, -1)
    )
    return f"(CASE {branches} ELSE 0 END)"


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """The ``(bucket, reg)`` HLL register table of a frame — max rho per
    bucket over the md5-32 hash stream (see ``hll_expr_estimate`` for
    the estimator and exactness argument). Registers MERGE by bucket-wise
    max: idempotent, commutative, associative — the property both
    ``hll_union_by_group`` and the streaming monitor build on."""
    from ..functions.hashing import md5_hash32

    m = 1 << p
    w = 32 - p
    h = md5_hash32(F.col(col).cast("string"))
    keyed = df.select((h % m).alias("bucket"), h.alias("_h")).select(
        "bucket", F.expr(f"_h div {m}").alias("suffix")
    )
    rho = F.expr(f"{w + 1} - {_bitlen_case_sql('suffix', w)}")
    return keyed.withColumn("rho", rho).groupBy("bucket").agg(
        F.max("rho").alias("reg")
    )


def hll_estimate_from_registers(
    regs: DataFrame, p: int = 12
) -> DataFrame:
    """One-row ``(m, hll_estimate)`` from a register table — the same
    Flajolet estimator + small-range linear counting as
    ``hll_expr_estimate``, over registers that may have been merged from
    any number of slices (dyadic-exact harmonic sum, order-independent)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    harm = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    raw = F.lit(alpha * m * m) / (F.col("_s") + (F.lit(m) - F.col("_nb")))
    empty = F.lit(m) - F.col("_nb")
    est = F.round(
        F.when(
            (raw <= F.lit(2.5 * m)) & (empty > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
        ).otherwise(raw),
        6,
    )
    return harm.select(
        F.lit(m).cast("bigint").alias("m"), est.alias("hll_estimate")
    )


def hll_expr_estimate(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """Expression-level HyperLogLog distinct-count estimate — the
    oracle-reproducible twin of ``approx_count_distinct`` (whose
    HLL++ registers live in opaque JVM state a SQL engine can't replay).

    Flajolet et al. 2007 estimator over ``m = 2^p`` registers fed by
    the 32-bit md5 hash: bucket = h mod m, suffix = h div m (a
    ``32-p``-bit value), register = max over values of
    rho(suffix) = (32-p) + 1 - bitlen(suffix), WITH the paper's
    small-range correction (raw <= 2.5m and empty buckets present ->
    linear counting m*ln(m/V)) — without it the sparse regime reads
    ~2.5x high. No large-range correction (it needs the 32-bit hash
    collision term; irrelevant below ~1e8 distinct).

    Cross-engine exactness: bucket/suffix/rho are pure integer md5
    arithmetic; the harmonic sum Σ 2^-rho is a sum of dyadic rationals
    with denominators <= 2^(33-p) over <= 2^p registers, so every partial
    double sum is EXACT (fits 53 mantissa bits) — order-independent,
    hash-stable. The only rounding is the final round(estimate, 6).

    Scale shape: one scan -> 2^p-key hash agg (map-side combine) -> one
    1-row agg. The register table is the shuffle bound: 4096 rows at
    p=12, independent of input size. Emits (m, n_exact, hll_estimate,
    rel_err); n_exact is a COUNT(DISTINCT) the driver-side compare needs
    anyway — drop it at 100 TB and the plan is sketch-only.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, col, p)
    harm = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_s"),
        F.count(F.lit(1)).alias("_nb"),
    )
    exact = df.agg(F.countDistinct(col).cast("bigint").alias("n_exact"))
    raw = F.lit(alpha * m * m) / (F.col("_s") + (F.lit(m) - F.col("_nb")))
    empty = F.lit(m) - F.col("_nb")
    est = F.round(
        F.when(
            (raw <= F.lit(2.5 * m)) & (empty > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
        ).otherwise(raw),
        6,
    )
    return (
        harm.crossJoin(F.broadcast(exact))
        .select(
            F.lit(m).cast("bigint").alias("m"),
            "n_exact",
            est.alias("hll_estimate"),
            F.round(est / F.col("n_exact") - 1.0, 6).alias("rel_err"),
        )
    )


def hll_union_by_group(
    df: DataFrame,
    col: str,
    group_expr: str,
    group_alias: str = "grp",
    p: int = 12,
) -> DataFrame:
    """HLL register MERGEABILITY — the property that makes the sketch the
    100 TB distinct-count tool: per-group register tables (one max-rho per
    bucket) union into the EXACT register table of the combined stream by
    a plain per-bucket max, so the merged estimate is the estimate of the
    set-union — NOT the sum of group estimates (which double-counts every
    cross-group repeat). This is how a cluster counts distincts per
    partition/day/shard and folds them without ever re-reading data.

    Output: one row per group (the per-group estimate) plus one
    ``__union__`` row whose registers are the bucket-wise max across all
    groups. Each row carries the exact distinct count of its slice, so
    the driver compare pins both the register math and the union
    semantics. Same estimator as ``hll_expr_estimate`` (small-range
    linear counting included); same exact-dyadic cross-engine argument.

    Scale shape: one scan -> (group, bucket) hash agg (bounded by
    |groups|·2^p) -> per-group 1-row aggs + one bucket-wise re-agg. The
    union NEVER rescans the input — that is the point.
    """
    from ..functions.hashing import md5_hash32

    m = 1 << p
    w = 32 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    h = md5_hash32(F.col(col).cast("string"))
    keyed = df.select(
        F.expr(group_expr).cast("string").alias(group_alias),
        F.col(col).alias("_val"),
        (h % m).alias("bucket"),
        h.alias("_h"),
    ).select(
        group_alias, "_val", "bucket", F.expr(f"_h div {m}").alias("suffix")
    )
    rho = F.expr(f"{w + 1} - {_bitlen_case_sql('suffix', w)}")
    base = keyed.withColumn("rho", rho)
    per_group_regs = base.groupBy(group_alias, "bucket").agg(
        F.max("rho").alias("reg")
    )
    union_regs = per_group_regs.groupBy("bucket").agg(
        F.max("reg").alias("reg"), F.lit("__union__").alias(group_alias)
    )
    all_regs = per_group_regs.unionByName(
        union_regs.select(group_alias, "bucket", "reg")
    )

    def _estimate(grouped: DataFrame) -> DataFrame:
        raw = F.lit(alpha * m * m) / (F.col("_s") + (F.lit(m) - F.col("_nb")))
        empty = F.lit(m) - F.col("_nb")
        est = F.round(
            F.when(
                (raw <= F.lit(2.5 * m)) & (empty > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
            ).otherwise(raw),
            6,
        )
        return grouped.select(group_alias, est.alias("hll_estimate"))

    ests = _estimate(
        all_regs.groupBy(group_alias).agg(
            F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_s"),
            F.count(F.lit(1)).alias("_nb"),
        )
    )
    exact_groups = base.groupBy(group_alias).agg(
        F.countDistinct("_val").cast("bigint").alias("n_exact")
    )
    exact_union = base.agg(
        F.countDistinct("_val").cast("bigint").alias("n_exact"),
        F.lit("__union__").alias(group_alias),
    ).select(group_alias, "n_exact")
    exact = exact_groups.unionByName(exact_union)
    return ests.join(exact, group_alias).select(
        group_alias, "n_exact", "hll_estimate"
    )


def kmv_overlap(
    df: DataFrame,
    key_sql: str,
    cond_a_sql: str,
    cond_b_sql: str,
    k: int = 128,
) -> DataFrame:
    """KMV (k-minimum-values) distinct sketches with theta-style set
    overlap — the audience-overlap estimator (Beyer et al. 2007; the
    DataSketches theta-sketch intersection): keep each side's ``k``
    smallest md5 hashes, combine at ``theta = min(theta_A, theta_B)``,
    and scale the below-theta sample by ``M / theta``.

    Returns ONE row: exact distinct counts per side + intersection
    (driver-compare companions; drop them at 100 TB and the plan is
    sketch-only), the combined theta, sample sizes, and integer
    estimates ``est_union`` / ``est_inter`` / ``jaccard_est_ppm``.

    Cross-engine exactness: hashes are 60-bit md5 integers; a side with
    fewer than ``k`` distinct keys sets its theta to ``M = 2^60`` (its
    sketch is exact). Estimates are pure integer arithmetic —
    ``n * M // theta`` in DECIMAL(38,0)/HUGEINT intermediates (the
    dq05 convention; n*M overflows int64) — so the row is value-hash
    stable. Hash collisions merge keys at odds ~n^2/2^61: irrelevant
    below ~1e8 keys per side.

    Scale shape: one scan -> one keyed agg on the key (the exact
    columns' requirement; the sketch path alone needs only the per-side
    TakeOrdered top-k, never a global sort) -> two k-row TakeOrdereds
    -> one k-row join. Sketch state is O(k) per side and mergeable:
    union-of-sketches = k smallest of the concatenation.
    """
    from ..functions.hashing import md5_hash60

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    M = 1 << 60
    per_key = (
        df.select(
            F.expr(key_sql).alias("key"),
            F.expr(cond_a_sql).alias("ia"),
            F.expr(cond_b_sql).alias("ib"),
        )
        .filter(F.col("ia") | F.col("ib"))
        .groupBy("key")
        .agg(
            F.max(F.col("ia").cast("int")).alias("ia"),
            F.max(F.col("ib").cast("int")).alias("ib"),
        )
        .select(md5_hash60(F.col("key")).alias("h"), "ia", "ib")
    )
    exact = per_key.agg(
        F.sum("ia").cast("bigint").alias("n_a_exact"),
        F.sum("ib").cast("bigint").alias("n_b_exact"),
        F.sum((F.col("ia") + F.col("ib") == 2).cast("int"))
        .cast("bigint")
        .alias("n_inter_exact"),
    )
    # Each side's sketch is a k-row TakeOrdered over the hashed key
    # stream. Pin both (persist + materialize): theta, the union sample
    # AND the side stats all read them — unpinned, every consumer
    # re-runs the corpus scan (the px09/gr02 multi-reference lesson;
    # measured 5 scans of events instead of 3). k rows each, so the
    # cache is O(k) — nothing at corpus scale is cached.
    ka = (
        per_key.filter("ia = 1").select("h").orderBy("h").limit(k).persist()
    )
    kb = (
        per_key.filter("ib = 1").select("h").orderBy("h").limit(k).persist()
    )
    ka.count()
    kb.count()
    sa = ka.agg(F.max("h").alias("mxa"), F.count(F.lit(1)).alias("ca"))
    sb = kb.agg(F.max("h").alias("mxb"), F.count(F.lit(1)).alias("cb"))
    th = (
        sa.crossJoin(F.broadcast(sb))
        .select(
            F.least(
                F.when(F.col("ca") == k, F.col("mxa")).otherwise(F.lit(M)),
                F.when(F.col("cb") == k, F.col("mxb")).otherwise(F.lit(M)),
            ).alias("theta")
        )
    )
    u = (
        ka.select("h", F.lit(1).alias("in_a"))
        .join(kb.select("h", F.lit(1).alias("in_b")), "h", "full_outer")
        .crossJoin(F.broadcast(th))
        .filter(F.col("h") < F.col("theta"))
    )
    samp = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.coalesce(
            F.sum(
                (F.col("in_a").isNotNull() & F.col("in_b").isNotNull()).cast(
                    "int"
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_inter_sample"),
    ).crossJoin(F.broadcast(th))

    def _scale(n: str) -> F.Column:
        return F.expr(
            f"CAST(CASE WHEN {n} = 0 THEN 0 ELSE"
            f" CAST({n} AS DECIMAL(38,0))"
            f" * CAST({M} AS DECIMAL(38,0))"
            f" div CAST(theta AS DECIMAL(38,0)) END AS BIGINT)"
        )

    return (
        samp.crossJoin(F.broadcast(exact))
        .select(
            "n_a_exact",
            "n_b_exact",
            "n_inter_exact",
            F.col("theta").cast("bigint").alias("theta"),
            "n_sample",
            "n_inter_sample",
            _scale("n_sample").alias("est_union"),
            _scale("n_inter_sample").alias("est_inter"),
            F.expr(
                "CAST(CASE WHEN n_sample = 0 THEN 0 ELSE"
                " n_inter_sample * CAST(1000000 AS BIGINT) div n_sample"
                " END AS BIGINT)"
            ).alias("jaccard_est_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram quantile sketch (sk07) — the mergeable quantile
# summary every metrics/percentile system keeps (equi-width variant of the
# t-digest/KLL role, chosen here because its state and its estimates are
# INTEGER-exact and therefore cross-engine oracle-able; q59 covers Spark's
# built-in approx_percentile as the rows-only twin). State is (bin_id,
# bin_n) — O(domain / bin_w) rows regardless of input size — and merging
# partial histograms is a plain per-bin SUM, so per-day/per-shard sketches
# fold without rescanning data (the sk05 HLL-union argument, for ranks).
# ---------------------------------------------------------------------------


def histogram_bins(
    df: DataFrame,
    value_sql: str,
    bin_w: int = 65536,
    max_bins: int = 1 << 20,
) -> DataFrame:
    """One-pass histogram state: ``(bin_id, bin_n)`` with
    ``bin_id = value div bin_w``.

    Contract: ``value_sql`` must evaluate to a NON-NEGATIVE BIGINT
    (integer units, e.g. cents — Spark's ``div`` truncates toward zero
    while DuckDB's ``//`` floors, so negatives would diverge); a negative
    value or a bin beyond ``max_bins`` raises instead of silently
    producing an unbounded-domain histogram (the single-partition
    cumulative window downstream is only safe because the bin count is
    bounded).

    Scale shape: one scan, one map-side-combined hash agg on bin_id —
    the shuffle carries at most ``max_bins`` rows.
    """
    return (
        df.select(F.expr(value_sql).cast("bigint").alias("_c"))
        .select(
            F.expr(
                f"CASE WHEN _c >= 0 AND _c div {bin_w} <= {max_bins}"
                f" THEN _c div {bin_w}"
                f" ELSE raise_error('histogram_bins: value out of"
                f" [0, bin_w*max_bins] domain') END"
            ).alias("bin_id")
        )
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bin_n"))
    )


def histogram_quantiles_from_bins(
    bins: DataFrame,
    quantiles_ppm: tuple[int, ...] = (
        250000,
        500000,
        750000,
        900000,
        990000,
    ),
    bin_w: int = 65536,
) -> DataFrame:
    """Quantile estimates from (possibly pre-merged partial) histogram
    state: partials re-aggregate by per-bin SUM — the mergeability that
    makes this the 100 TB percentile tool — then for each requested
    quantile ``q_ppm`` the target rank is ``ceil(q·n)`` and the estimate
    interpolates inside the covering bin:

        est = bin_lo + (rank − cum_before) · bin_w div (bin_n + 1)

    All integer arithmetic (exact cross-engine); headroom: rank·bin_w
    <= n·2^16 stays far inside int64 at 10^12 rows.

    The cumulative window and the rank join run on the BOUNDED histogram
    frame (<= max_bins rows — a single-partition window over sketch
    state, never over data), with the 5-row quantile frame broadcast.
    """
    from pyspark.sql import Window

    # Pin the bounded sketch state (the sk06 KMV convention): the
    # cumulative-window branch and the total-count branch both reference
    # this frame — unpinned, each consumer would re-run the corpus scan.
    hist = (
        bins.groupBy("bin_id")
        .agg(F.sum("bin_n").cast("bigint").alias("bin_n"))
        .persist()
    )
    hist.count()
    w = Window.orderBy("bin_id").rowsBetween(  # bounded-ok: <=n_bins histogram rows
        Window.unboundedPreceding, -1
    )
    hist = hist.select(
        "bin_id",
        "bin_n",
        F.coalesce(F.sum("bin_n").over(w), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    )
    total = hist.agg(F.sum("bin_n").cast("bigint").alias("_n"))
    ranks = total.select(
        F.explode(
            F.array(*[F.lit(q).cast("bigint") for q in quantiles_ppm])
        ).alias("q_ppm"),
        "_n",
    ).select(
        "q_ppm",
        F.expr(
            "(q_ppm * _n + CAST(999999 AS BIGINT))"
            " div CAST(1000000 AS BIGINT)"
        )
        .cast("bigint")
        .alias("target_rank"),
    )
    j = hist.join(
        F.broadcast(ranks),
        (F.col("cum_before") < F.col("target_rank"))
        & (F.col("cum_before") + F.col("bin_n") >= F.col("target_rank")),
    )
    return j.select(
        "q_ppm",
        "target_rank",
        "bin_id",
        (F.col("bin_id") * bin_w).cast("bigint").alias("bin_lo_cents"),
        "bin_n",
        "cum_before",
        F.expr(
            f"CAST(bin_id * {bin_w} + (target_rank - cum_before)"
            f" * {bin_w} div (bin_n + 1) AS BIGINT)"
        ).alias("est_cents"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_sql: str,
    quantiles_ppm: tuple[int, ...] = (
        250000,
        500000,
        750000,
        900000,
        990000,
    ),
    bin_w: int = 65536,
) -> DataFrame:
    """Build the histogram sketch and estimate quantiles in one plan
    (sk07). See histogram_bins / histogram_quantiles_from_bins."""
    return histogram_quantiles_from_bins(
        histogram_bins(df, value_sql, bin_w=bin_w),
        quantiles_ppm=quantiles_ppm,
        bin_w=bin_w,
    )


def cms_join_size(
    dfa: DataFrame,
    col_a: str,
    dfb: DataFrame,
    col_b: str,
    depth: int = 4,
    width: int = 64,
    include_truth: bool = True,
) -> DataFrame:
    """CMS inner-product join-size estimate (sk08) — Cormode &
    Muthukrishnan's a·b estimator, the classical answer to "how big will
    this join be?" BEFORE running it (the cardinality input a cost-based
    planner or a shuffle-sizing heuristic needs): est = min over rows r
    of Σ_bucket cmsA[r][bucket] · cmsB[r][bucket]. The estimate is
    ≥ the true join size ALWAYS (collisions only add mass) and within
    ε·N_a·N_b of it with probability 1−δ at width = e/ε, depth = ln(1/δ).
    Completes the sketch family's set-operation story: HLL unions
    (sk04/sk05), KMV intersects (sk06), CMS inner-product sizes the JOIN.

    Built on the same md5-derived expression CMS as sk03
    (``cms_expr_table`` — the ONE place the hash layout lives), so both
    sketches are rebuilt bit-for-bit by a SQL engine. Everything is
    integer: the per-row dot products, the min, and the overestimate
    ratio in ppm.

    ``include_truth`` attaches the exact join size for the audit face
    (the oracle replays it; it is also what the error-bound test pins) —
    a production caller sizing a 100 TB join runs estimate-only, two
    O(depth·width) sketch scans and never the join itself.

    Scale: each side is one scan collapsing map-side into depth×width
    cells; the dot product joins two ≤depth·width-row tables. Sketch
    cost is independent of row count and join fan-out."""
    ta = cms_expr_table(dfa, col_a, depth, width).withColumnRenamed("c", "ca")
    tb = cms_expr_table(dfb, col_b, depth, width).withColumnRenamed("c", "cb")
    per_row = (
        ta.join(tb, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
    )
    est = per_row.agg(F.min("dot").cast("bigint").alias("est_join_size"))
    if not include_truth:
        return est.select(
            F.lit(depth).cast("int").alias("depth"),
            F.lit(width).cast("int").alias("width"),
            "est_join_size",
        )
    truth = (
        dfa.select(F.col(col_a).alias("k"))
        .join(dfb.select(F.col(col_b).alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_join_size"))
    )
    return est.crossJoin(F.broadcast(truth)).select(
        F.lit(depth).cast("int").alias("depth"),
        F.lit(width).cast("int").alias("width"),
        "true_join_size",
        "est_join_size",
        F.expr(
            "(1000000 * (est_join_size - true_join_size))"
            " div true_join_size"
        )
        .cast("bigint")
        .alias("overest_ppm"),
    )


def ams_f2_estimate(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    include_truth: bool = True,
) -> DataFrame:
    """Second frequency moment / self-join size estimate (sk09) — the
    AMS count-sketch (Alon-Matias-Szegedy 1996 via Charikar's
    count-sketch): per row r, bucket counters c_b = Σ_v sign_r(v)·f_v
    with md5-derived ±1 signs; E[Σ_b c_b²] = F2 EXACTLY (cross terms
    cancel in expectation), so the per-row estimate is unbiased with
    relative error ~√(2/width), and the LOWER MEDIAN over rows
    (deterministic: sorted dots, index (depth−1) div 2, row-ASC ties)
    is the served estimate. A plain CMS dotted with itself is biased
    +n²/width — measured 12.7× over on lineitem's near-unique
    l_orderkey, which is exactly the uniform-key regime a skew
    DIAGNOSTIC must not cry wolf in; the sign trick is what makes F2
    estimation usable there.

    F2 = Σ f_k² is the self-join size / collision mass of a shuffle on
    the key: F2 ≈ n·n/d means uniform keys, F2 ≫ that flags a hot key
    — the one-number input to the salting / AQE-skew-join decision.

    Scale: one O(depth·width) scan independent of row count;
    ``include_truth`` adds the exact groupBy Σf² audit face (the
    oracle replays both)."""
    from ..functions.hashing import md5_hash32

    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                (
                    md5_hash32(
                        F.concat(F.lit(f"r{r}#"), F.col(col).cast("string"))
                    )
                    % width
                ).alias("bucket"),
                F.when(
                    md5_hash32(
                        F.concat(F.lit(f"s{r}#"), F.col(col).cast("string"))
                    )
                    % 2
                    == 0,
                    1,
                )
                .otherwise(-1)
                .alias("sign"),
            )
            for r in range(depth)
        ]
    )
    # width rule (r13): the 2·depth md5s per row are scan-side compute —
    # a narrow fixture scan ran them 1-3 wide (the simhash/
    # hashed_shingles idiom; no-op at real scale)
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    t = (
        df.select(F.explode(cells).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("rb.sign").cast("bigint").alias("c"))
    )
    per_row = t.groupBy("row").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("dot")
    )
    from pyspark.sql import Window

    w = Window.orderBy("dot", "row")  # bounded-ok: <=depth sketch rows
    est = (
        per_row.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == (depth - 1) // 2 + 1)
        .select(F.col("dot").alias("est_f2"))
    )
    if not include_truth:
        return est.select(
            F.lit(depth).cast("int").alias("depth"),
            F.lit(width).cast("int").alias("width"),
            "est_f2",
        )
    truth = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("f"))
        .agg(F.sum(F.expr("f * f")).cast("bigint").alias("true_f2"))
    )
    return est.crossJoin(F.broadcast(truth)).select(
        F.lit(depth).cast("int").alias("depth"),
        F.lit(width).cast("int").alias("width"),
        "true_f2",
        "est_f2",
        F.expr("(1000000 * (est_f2 - true_f2)) div true_f2")
        .cast("bigint")
        .alias("err_ppm"),
    )

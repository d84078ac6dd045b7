"""Data-layout optimization: Z-order (Morton) clustering keys.

The reference pipeline writes row-by-row into Kudu, whose primary-key
range partitioning gives one-dimensional locality only
(KuduManager.scala:21-60 — upserts keyed on the table's PK). At lakehouse
scale the analogous problem is laying out 100 TB of parquet so that file
min/max statistics prune scans on MORE THAN ONE column: that is what
Delta/Iceberg `OPTIMIZE ZORDER BY` does, and this module re-expresses it
as a pure Catalyst column expression.

Design for 100 TB:
- ``zorder_key`` is scalar integer arithmetic (magic-number bit
  spreading), so it fuses into whole-stage codegen with ZERO shuffle —
  the key costs the same as a projection.
- the actual rewrite at scale is ``df.repartitionByRange(n_files,
  zkey).sortWithinPartitions(zkey)`` — Spark's range partitioner SAMPLES
  the key distribution (no global single-partition sort), and each task
  writes one clustered file.
- ``zorder_layout_stats`` reports per-target-file min/max of each input
  dimension — exactly the footer statistics a scan would prune on — so
  layout quality is measurable, not asserted.

All arithmetic is int64-exact, so a DuckDB oracle can replay it
bit-for-bit (the driver's hash gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.localframe import local_frame

# Morton magic masks: spread a 16-bit int so its bits occupy even
# positions of a 32-bit int (Hacker's Delight §7-2 / public-domain
# "Interleave bits by Binary Magic Numbers").
_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    for shift, mask in _MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def normalize16(c: Column, lo: Column, hi: Column) -> Column:
    """Scale ``c`` from [lo, hi] into [0, 65535] (floor division;
    degenerate lo==hi maps everything to 0).

    Exactness bound: the quotient goes through a double, which floors
    correctly while ``(c-lo)*65535 < 2^52`` — i.e. any dimension span
    below ~7e10 (epoch days, order/part keys at any TPC-H SF). Wider
    domains should be pre-bucketed before z-ordering."""
    span = hi - lo
    return F.when(span <= 0, F.lit(0).cast("bigint")).otherwise(
        ((c - lo).cast("bigint") * F.lit(65535)) / span
    ).cast("bigint")


def zorder_key(x16: Column, y16: Column) -> Column:
    """Interleave two 16-bit normalized dimensions into a 32-bit Morton
    key: bit i of x lands at position 2i, bit i of y at 2i+1. Rows close
    in EITHER dimension get close keys, which is why sorting by the key
    clusters both columns' min/max ranges at once."""
    return _spread16(x16).bitwiseOR(F.shiftleft(_spread16(y16), 1))


def zorder_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 64,
) -> DataFrame:
    """Assign every row to a target file by fixed-width Z-key range and
    report the per-file footer stats (min/max of both raw dimensions +
    row count). Two jobs total: one tiny global min/max agg (broadcast
    back as scalars), one groupBy(file_id) agg.

    ``x_col``/``y_col`` must be integer-valued columns (cast dates to
    epoch days first)."""
    bounds = df.agg(
        F.min(x_col).cast("bigint").alias("x_lo"),
        F.max(x_col).cast("bigint").alias("x_hi"),
        F.min(y_col).cast("bigint").alias("y_lo"),
        F.max(y_col).cast("bigint").alias("y_hi"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "zkey",
        zorder_key(
            normalize16(F.col(x_col).cast("bigint"), F.col("x_lo"), F.col("x_hi")),
            normalize16(F.col(y_col).cast("bigint"), F.col("y_lo"), F.col("y_hi")),
        ),
    )
    # fixed-width key ranges, not ntile: file assignment is a scalar
    # expression (zkey * n / 2^32), so no global sort anywhere.
    keyed = keyed.withColumn(
        "file_id",
        (F.col("zkey") * F.lit(n_files) / F.lit(1 << 32)).cast("bigint"),
    )
    return keyed.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(x_col).cast("bigint").alias(f"min_{x_col}"),
        F.max(x_col).cast("bigint").alias(f"max_{x_col}"),
        F.min(y_col).cast("bigint").alias(f"min_{y_col}"),
        F.max(y_col).cast("bigint").alias(f"max_{y_col}"),
    )


def with_hilbert_key(
    df: DataFrame,
    x16_col: str,
    y16_col: str,
    out: str = "hkey",
    bits: int = 16,
) -> DataFrame:
    """Hilbert-curve index of two ``bits``-bit dimensions (the curve
    Delta's liquid clustering uses): strictly better locality than
    Z-order — every unit step along the key moves exactly one unit in
    (x, y), so per-file min/max boxes are tighter for the same file
    count.

    Unlike the Morton key, the Hilbert transform carries STATE across
    bit levels (each level conditionally flips/swaps the remaining
    low bits), so it cannot be one scalar expression. It unrolls here
    as ``bits`` chained projections over named columns — Catalyst keeps
    the chain linear (each step's CASE expressions reference the prior
    step's columns more than once, which blocks CollapseProject from
    inlining them exponentially), and the whole chain is still
    shuffle-free whole-stage-codegen arithmetic.

    Classic xy2d formulation (public domain, e.g. Wikipedia "Hilbert
    curve"): d += s^2 * ((3*rx) XOR ry), then the (ry==0) quadrant
    rotation. Inputs must already be in [0, 2^bits) — use
    ``normalize16`` for arbitrary domains.
    """
    d = (
        df.withColumn("_hx", F.col(x16_col).cast("bigint"))
        .withColumn("_hy", F.col(y16_col).cast("bigint"))
        .withColumn(out, F.lit(0).cast("bigint"))
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        d = d.withColumn(
            "_rx",
            F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
                F.lit(0)
            ),
        ).withColumn(
            "_ry",
            F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        d = d.withColumn(
            out,
            F.col(out)
            + F.lit(s).cast("bigint")
            * F.lit(s)
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")).cast("bigint"),
        )
        # quadrant rotation: ry==0 → (flip if rx) then swap x/y
        nx = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
                F.col("_hy")
            ),
        ).otherwise(F.col("_hx"))
        ny = F.when(
            F.col("_ry") == 0,
            F.when(F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
                F.col("_hx")
            ),
        ).otherwise(F.col("_hy"))
        d = d.withColumn("_nhx", nx).withColumn("_nhy", ny).withColumn(
            "_hx", F.col("_nhx")
        ).withColumn("_hy", F.col("_nhy"))
    return d.drop("_hx", "_hy", "_nhx", "_nhy", "_rx", "_ry")


def hilbert_layout_stats(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int = 64,
) -> DataFrame:
    """``zorder_layout_stats``'s Hilbert twin: normalize both dims to
    16 bits, index on the Hilbert curve, assign fixed-width key-range
    files, report per-file footer stats. Same two-job shape (tiny
    global min/max agg + one groupBy) — no sort anywhere."""
    bounds = df.agg(
        F.min(x_col).cast("bigint").alias("x_lo"),
        F.max(x_col).cast("bigint").alias("x_hi"),
        F.min(y_col).cast("bigint").alias("y_lo"),
        F.max(y_col).cast("bigint").alias("y_hi"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).select(
        F.col(x_col),
        F.col(y_col),
        normalize16(
            F.col(x_col).cast("bigint"), F.col("x_lo"), F.col("x_hi")
        ).alias("_x16"),
        normalize16(
            F.col(y_col).cast("bigint"), F.col("y_lo"), F.col("y_hi")
        ).alias("_y16"),
    )
    keyed = with_hilbert_key(keyed, "_x16", "_y16", out="hkey")
    keyed = keyed.withColumn(
        "file_id",
        (F.col("hkey") * F.lit(n_files) / F.lit(1 << 32)).cast("bigint"),
    )
    return keyed.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min(x_col).cast("bigint").alias(f"min_{x_col}"),
        F.max(x_col).cast("bigint").alias(f"max_{x_col}"),
        F.min(y_col).cast("bigint").alias(f"min_{y_col}"),
        F.max(y_col).cast("bigint").alias(f"max_{y_col}"),
    )


def two_stage_offsets(
    df: DataFrame,
    value_col: str,
    width: int,
    weight_col: str | None = None,
    descending: bool = False,
    max_ranges: int = 4096,
):
    """The q90/q91 two-stage prefix-sum primitive with a GUARDED driver
    collect: bucket ``value_col`` into ``width``-wide ranges, collect one
    (range, subtotal) row per range, and cumulative-sum them on the driver
    into broadcastable offsets. The driver-side set is provably bounded:
    if the value distribution produces more than ``max_ranges`` distinct
    ranges, the width is COARSENED (x16 per retry) until it fits — range
    contiguity means any width yields the same global order, so outputs
    are identical; only the per-range parallelism granularity changes.
    A pathological distribution therefore cannot blow the driver; it just
    lands on wider buckets.

    Returns ``(keyed_df, offsets_df, width_used)``: ``keyed_df`` is ``df``
    plus the ``_rng`` column, ``offsets_df`` is the tiny (_rng, _offset)
    frame to broadcast-join, and ``_offset`` is the sum of subtotals of
    all ranges strictly before ``_rng`` in ascending (or descending)
    range order. ``weight_col=None`` counts rows (rank offsets);
    otherwise sums the column (byte offsets).
    """
    if width < 1:
        raise ValueError(f"width must be >= 1, got {width}")
    spark = df.sparkSession
    while True:
        # exact integer `div`, NOT float `/` cast to bigint: float division
        # is only truncation-safe while value/width stay exactly
        # representable in a double — a >2^53 value key would silently
        # mis-bucket (the mm07 `slot div N` lesson applied here).
        keyed = df.withColumn(
            "_rng", F.expr(f"CAST(`{value_col}` div {int(width)} AS BIGINT)")
        )
        agg = (
            F.count(F.lit(1))
            if weight_col is None
            else F.sum(weight_col)
        )
        grouped = keyed.groupBy("_rng").agg(agg.cast("bigint").alias("_n"))
        # limit(max_ranges + 1): the probe job never ships an unbounded
        # result — overflow is detected from ONE extra row, not by
        # collecting the whole pathological range set.
        rows = grouped.limit(max_ranges + 1).collect()
        if len(rows) <= max_ranges:
            break
        width *= 16
    subtotals = sorted(
        ((r["_rng"], r["_n"]) for r in rows),
        key=(lambda t: -t[0]) if descending else (lambda t: t[0]),
    )
    offsets, acc = [], 0
    for rng, n in subtotals:
        offsets.append((rng, acc))
        acc += n
    off_df = local_frame(spark, offsets, "_rng bigint, _offset bigint")
    return keyed, off_df, width


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 1,
    n_shards: int = 8,
    seed: str = "epoch",
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment (px15) — the
    "shuffle the corpus every epoch, reproducibly" step of a training
    data-loader: each row gets a pseudo-random md5 key from
    ``(seed, epoch, id)``, a global 1-based ``position`` in key order,
    and a round-robin ``(shard_id, pos_in_shard)``. Same epoch → same
    permutation on any cluster size; different epoch → a fresh one.

    Scale shape: the q90 two-stage rank — NO global sort. Hash-range
    subtotals go through the GUARDED ``two_stage_offsets`` collect
    (2^24-wide ranges over the 2^32 hash space = at most 256 rows, with
    automatic coarsening), then each range ranks locally under a keyed
    window and adds its broadcast offset. The md5 key is uniform, so
    ranges are balanced by construction — this is also the anti-skew
    argument: the shuffle key never inherits data skew.

    All arithmetic int64; ties on the 32-bit key break by ``id_col``,
    so the permutation is total and engine-reproducible.
    """
    from pyspark.sql import Window

    from ..functions.hashing import md5_hash32

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # seed and epoch each delimited: undelimited concat made
    # (seed='a', epoch=11) and (seed='a1', epoch=1) collide on 'a11:'.
    h = md5_hash32(
        F.concat(
            F.lit(f"{seed}:{epoch}:"), F.col(id_col).cast("string")
        )
    )
    keyed0 = df.select(F.col(id_col), h.alias("_h"))
    keyed, off_df, _ = two_stage_offsets(keyed0, "_h", width=1 << 24)
    w = Window.partitionBy("_rng").orderBy("_h", id_col)
    ranked = keyed.join(F.broadcast(off_df), "_rng").select(
        id_col,
        F.col("_h").alias("shuffle_key"),
        (F.row_number().over(w) + F.col("_offset"))
        .cast("bigint")
        .alias("position"),
    )
    return ranked.select(
        id_col,
        "shuffle_key",
        "position",
        F.expr(f"CAST((position - 1) % {n_shards} AS BIGINT)").alias(
            "shard_id"
        ),
        F.expr(f"CAST((position - 1) div {n_shards} AS BIGINT)").alias(
            "pos_in_shard"
        ),
    )


def sequence_packing(
    docs: DataFrame,
    id_col: str = "doc_id",
    chunk_tokens: int = 512,
) -> DataFrame:
    """Concat-and-chunk sequence packing layout (px17) — the context-
    window packing pass of LLM pretraining prep: documents are
    concatenated in ``id_col`` order (run it on px15's shuffled order in
    a real pipeline) and the token stream is cut into fixed
    ``chunk_tokens`` windows; each document gets its global token span
    and the chunks it lands in. ``n_chunks_spanned > 1`` marks docs that
    straddle a window boundary (the attention-masking / fragmentation
    cost packing trades against padding waste).

    Returns per document:
    ``(id, n_tok, tok_start, first_chunk, n_chunks_spanned)`` — all
    BIGINT, exact.

    Scale shape: the global token prefix sum is the q90/q91 two-stage
    pattern — per-id-range subtotals through the GUARDED
    ``two_stage_offsets`` collect, then one keyed window per range plus
    a broadcast offset join. NO global sort, no driver data beyond the
    bounded range subtotals; the oracle's single-partition running sum
    is exactly what the cluster never runs.
    """
    from pyspark.sql import Window

    from .text import tokens

    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    staged = docs.select(
        F.col(id_col), F.size(tokens("text")).cast("bigint").alias("n_tok")
    )
    keyed, off_df, _ = two_stage_offsets(
        staged, id_col, width=1 << 10, weight_col="n_tok"
    )
    w = Window.partitionBy("_rng").orderBy(id_col)
    cum = F.sum("n_tok").over(w)  # inclusive within-range running sum
    spanned = keyed.join(F.broadcast(off_df), "_rng").select(
        id_col,
        "n_tok",
        (F.col("_offset") + cum - F.col("n_tok"))
        .cast("bigint")
        .alias("tok_start"),
    )
    first = F.expr(f"tok_start div {int(chunk_tokens)}")
    return spanned.select(
        id_col,
        "n_tok",
        "tok_start",
        first.cast("bigint").alias("first_chunk"),
        F.when(F.col("n_tok") == 0, F.lit(0))
        .otherwise(
            F.expr(
                f"(tok_start + n_tok - 1) div {int(chunk_tokens)}"
                f" - tok_start div {int(chunk_tokens)} + 1"
            )
        )
        .cast("bigint")
        .alias("n_chunks_spanned"),
    )


def stratified_shards(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "p_keep",
    n_shards: int = 8,
    n_bands: int = 10,
    max_ranges: int = 4096,
) -> DataFrame:
    """Quality-stratified shard assignment (px19) — every training shard
    receives the SAME quality mix: docs are bucketed into ``n_bands``
    score bands (value-based — no quantile sort), given a deterministic
    md5 order WITHIN their band, and dealt round-robin to shards, so
    per-(shard, band) counts differ by at most 1 across shards. Random
    hashing balances only in expectation; a data-parallel run whose
    shards drift in quality trains on different curricula per worker —
    this makes the balance exact.

    Returns ``(id, band, shard_id, pos_in_shard)``.

    Scale shape: the GROUPED form of the q90 two-stage rank — per
    (band, hash-range) subtotals through one guarded bounded collect
    (≤ n_bands·ranges rows, width auto-coarsened ×16 like
    ``two_stage_offsets``), then ONE keyed window per (band, range)
    plus a broadcast offset join. No global or per-band global sort;
    the md5 order key is skew-immune by construction.
    """
    from pyspark.sql import Window

    from ..functions.hashing import md5_hash32

    if n_shards < 1 or n_bands < 1:
        raise ValueError("n_shards and n_bands must be >= 1")
    banded = scored.select(
        F.col(id_col),
        F.least(
            F.lit(n_bands - 1),
            F.floor(F.col(score_col) * n_bands).cast("int"),
        )
        .cast("int")
        .alias("band"),
        md5_hash32(F.col(id_col).cast("string")).alias("_h"),
    )
    width = 1 << 24
    spark = scored.sparkSession
    while True:
        keyed = banded.withColumn(
            "_rng", (F.col("_h") / F.lit(width)).cast("bigint")
        )
        rows = (
            keyed.groupBy("band", "_rng")
            .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
            .limit(max_ranges + 1)
            .collect()
        )
        if len(rows) <= max_ranges:
            break
        width *= 16
    offsets, acc = [], {}
    for band, rng, cnt in sorted((r["band"], r["_rng"], r["_n"]) for r in rows):
        offsets.append((band, rng, acc.get(band, 0)))
        acc[band] = acc.get(band, 0) + cnt
    off_df = local_frame(spark, offsets, "band int, _rng bigint, _offset bigint")
    w = Window.partitionBy("band", "_rng").orderBy("_h", id_col)
    rank0 = F.row_number().over(w) + F.col("_offset") - 1  # 0-based in band
    return (
        keyed.join(F.broadcast(off_df), ["band", "_rng"])
        .withColumn("_rank0", rank0.cast("bigint"))
        .select(
            F.col(id_col),
            "band",
            F.expr(f"CAST(_rank0 % {int(n_shards)} AS INT)").alias("shard_id"),
            F.expr(f"_rank0 div {int(n_shards)}")
            .cast("bigint")
            .alias("pos_in_shard"),
        )
    )


def budget_selection(
    scored: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    score_col: str = "p_keep",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Quality-greedy data selection under a token budget (px21) — take
    documents in (score DESC, id ASC) order while the RUNNING token sum
    (including the candidate) stays within ``token_budget``; everything
    ranked after the first overflow is excluded (the deterministic
    prefix-greedy rule — no backfilling with smaller docs, so the
    selected set is a clean quality prefix). The "how much of the best
    data fits my compute budget" pass of pretraining prep.

    Returns ``(id, <score_col>, <token_col>, cum_tokens, selected)``
    where cum_tokens is the inclusive running sum in selection order.

    Scale shape: the q90 two-stage prefix-sum primitive over the SCORE
    axis — per-range token subtotals through one guarded bounded collect
    (``two_stage_offsets``, descending), then ONE keyed window per score
    range + broadcast offsets. No global sort: equal scores share a
    range, so range-desc + within-range (score DESC, id) == the global
    greedy order.
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    from pyspark.sql import Window as W

    staged = scored.select(
        F.col(id_col),
        F.col(score_col),
        F.col(token_col).cast("bigint").alias(token_col),
        F.floor(F.col(score_col) * 1_000_000).cast("bigint").alias("_sk"),
    )
    keyed, off_df, _w = two_stage_offsets(
        staged, "_sk", width=256, weight_col=token_col, descending=True
    )
    w = (
        W.partitionBy("_rng")
        .orderBy(F.desc(score_col), id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        keyed.join(F.broadcast(off_df), "_rng")
        .withColumn(
            "cum_tokens",
            (F.sum(token_col).over(w) + F.col("_offset")).cast("bigint"),
        )
        .select(
            F.col(id_col),
            F.col(score_col),
            F.col(token_col),
            "cum_tokens",
            (F.col("cum_tokens") <= F.lit(int(token_budget))).alias(
                "selected"
            ),
        )
    )


def grouped_budget_selection(
    scored: DataFrame,
    token_budget_per_group: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    score_col: str = "p_keep",
    token_col: str = "n_tokens",
    max_ranges: int = 4096,
) -> DataFrame:
    """Per-GROUP token-budget selection (px22) — px21's prefix-greedy rule
    applied independently inside every corpus stratum: each group (source,
    domain, language) takes its best docs in (score DESC, id) order until
    ITS budget fills. This is how a mixture plan (px13/px18 decide each
    source's token share) is actually ENFORCED against the corpus — the
    missing step between "source X gets 12k tokens" and a concrete doc
    list.

    Returns ``(id, <group_col>, <score_col>, <token_col>, cum_tokens,
    selected)`` with cum_tokens the inclusive running token sum in
    selection order WITHIN the group.

    Scale shape: the px19 GROUPED two-stage pattern over token mass —
    one guarded bounded collect of per-(group, score-range) token
    subtotals (width auto-coarsened ×16 when groups·ranges would exceed
    ``max_ranges``), per-group cumulative offsets on the driver, ONE
    keyed window per (group, range) + broadcast offsets. No global or
    per-group global sort.
    """
    if token_budget_per_group < 0:
        raise ValueError(
            f"token_budget_per_group must be >= 0, got {token_budget_per_group}"
        )
    from pyspark.sql import Window as W

    spark = scored.sparkSession
    staged = scored.select(
        F.col(id_col),
        F.col(group_col),
        F.col(score_col),
        F.col(token_col).cast("bigint").alias(token_col),
        F.floor(F.col(score_col) * 1_000_000).cast("bigint").alias("_sk"),
    )
    width = 256
    while True:
        # exact integer `div` (same hazard note as two_stage_offsets): _sk
        # <= 1e6 today, but a wider score key must not float-round.
        keyed = staged.withColumn(
            "_rng", F.expr(f"CAST(_sk div {int(width)} AS BIGINT)")
        )
        rows = (
            keyed.groupBy(group_col, "_rng")
            .agg(F.sum(token_col).cast("bigint").alias("_n"))
            .limit(max_ranges + 1)
            .collect()
        )
        if len(rows) <= max_ranges:
            break
        width *= 16
    # per-group cumulative token offsets in DESCENDING range order
    offsets, acc = [], {}
    for g, rng, tok in sorted(
        ((r[group_col], r["_rng"], r["_n"]) for r in rows),
        key=lambda t: (str(t[0]), -t[1]),
    ):
        offsets.append((g, rng, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + tok
    off_df = local_frame(
        spark, offsets, f"{group_col} string, _rng bigint, _offset bigint"
    )
    w = (
        W.partitionBy(group_col, "_rng")
        .orderBy(F.desc(score_col), id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        keyed.join(F.broadcast(off_df), [group_col, "_rng"])
        .withColumn(
            "cum_tokens",
            (F.sum(token_col).over(w) + F.col("_offset")).cast("bigint"),
        )
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(score_col),
            F.col(token_col),
            "cum_tokens",
            (
                F.col("cum_tokens") <= F.lit(int(token_budget_per_group))
            ).alias("selected"),
        )
    )


def compact_epoch_partitions(
    spark,
    path: str,
    committed: list[int],
    partition_cols: tuple[str, ...],
    repartition_col: str,
    exclude_ids=None,
    exclude_col: str | None = None,
) -> int:
    """Fold the COMMITTED ``epoch=N`` partitions of an incrementally-
    maintained index (text.build_bm25_index / similarity.build_ivf_index
    layouts) into ONE fresh epoch directory — the lifecycle step after
    many appends: epoch count and small-file count reset to one
    build-shaped layout WITHOUT paying the build's tokenize/train cost
    (rows are already bucketed/celled; this is one column-pruned scan of
    the committed epochs + one repartition-on-the-partition-column
    write).

    Returns the new epoch id C = min(0, min(committed)) - 1 — compacted
    epochs live in a NEGATIVE namespace so they can never collide with
    an appender's epoch id (appenders require epoch >= 0; streaming
    epoch ids grow monotonically, so any non-negative choice here could
    equal a crashed append's replay id or the next post-restart
    streaming batch and silently no-op it — the folded-epoch memory in
    the callers' sidecars covers the complementary replay-of-folded
    case). Data is IN PLACE under ``epoch=C`` on return; the CALLER
    then commits by rewriting the sidecar with the folded per-epoch
    stats (sidecar-last, the same commit discipline as append/upsert)
    and finally deletes the folded epoch directories
    (``cleanup_foreign_epochs``).

    Crash-safe by replay: the fold writes to a ``_compact`` staging
    subtree (underscore-prefixed — invisible to parquet discovery), then
    renames ``_compact/epoch=C`` into place. Every window re-runs clean:
    stale staging and a half-landed ``epoch=C`` are deleted up front,
    and until the caller's sidecar write, probes still read the old
    committed set."""
    from ..streaming.fsio import delete_dir, rename

    new_epoch = min(0, min(committed)) - 1
    staging = f"{path}/_compact"
    delete_dir(spark, staging)  # stale from a crashed prior run
    delete_dir(spark, f"{path}/epoch={new_epoch}")  # half-landed rename
    rows = spark.read.parquet(path).filter(F.col("epoch").isin(committed))
    if exclude_ids is not None:
        # tombstoned rows are PHYSICALLY dropped by the fold (the LSM
        # major-compaction move); the caller clears its tombstone list
        # in the same sidecar commit
        rows = rows.join(F.broadcast(exclude_ids), exclude_col, "left_anti")
    (
        rows.withColumn("epoch", F.lit(int(new_epoch)))
        .repartition(F.col(repartition_col))
        .write.mode("overwrite")
        .partitionBy("epoch", *partition_cols)
        .parquet(staging)
    )
    rename(spark, f"{staging}/epoch={new_epoch}", f"{path}/epoch={new_epoch}")
    delete_dir(spark, staging)
    return new_epoch


def cleanup_foreign_epochs(spark, path: str, committed: list[int]) -> int:
    """Delete every ``epoch=N`` directory under ``path`` whose id is NOT
    in the committed set — the final step of compaction (removes the
    folded epochs) and the janitor for crashed appends (an uncommitted
    epoch's files are invisible to probes but still occupy storage; a
    replay after this cleanup simply rewrites them). Returns how many
    directories were removed."""
    from ..streaming.fsio import delete_dir, list_epochs

    keep = set(committed)
    n = 0
    for e in list_epochs(spark, path):
        if e not in keep:
            delete_dir(spark, f"{path}/epoch={e}")
            n += 1
    return n

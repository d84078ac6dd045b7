"""Text-analysis operators over the ``documents`` table — the LLM-pipeline
extension surface (BASELINE.json north-star): token statistics, quality
scoring, language ID, fingerprinting.

Everything is built-in column expressions (split/transform/filter/aggregate),
so at 100 TB these run inside whole-stage codegen with full column pruning —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import rolling_hash
from ..functions.topk import ranked_top_n

# Tiny per-language stopword lists for the n-gram/stopword-voting heuristic.
# Real deployments plug in fastText/CLD3 via a pandas_udf; the heuristic is
# the deterministic, JVM-side baseline.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "zh": ("的", "是", "了", "在", "和", "有", "我"),
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def stopword_count(toks: Column, lang: str) -> Column:
    wl = list(STOPWORDS[lang])
    return F.size(F.filter(toks, lambda t: t.isin(*wl)))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts + average token length."""
    t = tokens("text")
    n_tokens = F.size(t)
    return docs.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens
        ).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Composite quality score from length, lexical diversity, and stopword
    density — the standard cheap pre-filter for LLM training corpora.

    ``keep`` carries extra input columns through, so pipeline composers
    don't need a join-back to recover them (one scan, no shuffle)."""
    t = tokens("text")
    n_tokens = F.size(t)
    uniq_ratio = F.size(F.array_distinct(t)).cast("double") / n_tokens
    stop_ratio = stopword_count(t, "en").cast("double") / n_tokens
    len_score = F.least(F.col("n_chars").cast("double") / 400.0, F.lit(1.0))
    score = 0.4 * len_score + 0.3 * uniq_ratio + 0.3 * (1.0 - stop_ratio)
    return docs.select(
        "doc_id",
        *keep,
        n_tokens.alias("n_tokens"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stop_ratio"),
        len_score.alias("len_score"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-voting language ID: argmax of per-language stopword density,
    'und' when no list matches. Deterministic ties: en > es > zh."""
    t = tokens("text")
    n = F.size(t).cast("double")
    s_en = stopword_count(t, "en").cast("double") / n
    s_es = stopword_count(t, "es").cast("double") / n
    s_zh = stopword_count(t, "zh").cast("double") / n
    pred = (
        F.when((s_en >= s_es) & (s_en >= s_zh) & (s_en > 0), "en")
        .when((s_es >= s_zh) & (s_es > 0), "es")
        .when(s_zh > 0, "zh")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("pred_lang"),
        s_en.alias("score_en"),
        s_es.alias("score_es"),
        s_zh.alias("score_zh"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Two document fingerprints: content hash (md5 of lower-cased text,
    order-insensitive to nothing — exact content identity) and an
    order-sensitive polynomial rolling hash over token hashes."""
    return docs.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("content_fp"),
        rolling_hash(tokens("text")).alias("rolling_fp"),
    )


def top_bigrams(docs: DataFrame, k: int = 20) -> DataFrame:
    """Global top-k bigram counts (explode → count → top-k with
    deterministic tiebreak)."""
    # Stage the token array as a named column BEFORE building bigrams:
    # inside the transform lambda, `element_at(t, i + 2)` over the raw
    # split expression re-splits the whole text per element (O(n^2) per
    # document — measured 3x the query cost at sf0.1); over a bound
    # column it's an O(1) array access. The multi-reference blocks
    # CollapseProject from inlining the split back in.
    staged = docs.select(tokens("text").alias("_toks"))
    return (
        staged.select(F.explode(_bigrams(F.col("_toks"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(k)
    )


# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit runs,
# punctuation runs (each optionally space-prefixed). Counting these pieces
# is the standard cheap estimate of BPE token counts without a merges table;
# chars-per-piece is the "compression ratio" quality signal.
BPE_PIECE_REGEX = r"'[a-zA-Z]+| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def subword_counts(docs: DataFrame) -> DataFrame:
    """Whitespace-token AND BPE-ish piece counts per document — pure regex
    column expressions (JVM-side; the same \\p{L} classes exist in DuckDB's
    RE2, so counts are oracle-checkable)."""
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_PIECE_REGEX), F.lit(0))
    n_pieces = F.size(pieces)
    return docs.select(
        "doc_id",
        F.size(tokens("text")).alias("n_ws_tokens"),
        n_pieces.alias("n_pieces"),
        F.round(
            F.length("text") / F.greatest(n_pieces, F.lit(1)), 6
        ).alias("chars_per_piece"),
    )


def keyterms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document key terms: TF-IDF-style ranking with exact integer
    arithmetic. Term frequency and document frequency are both counts; the
    ranking score tf/df is evaluated as ``tf * 1e9 DIV df`` (integer
    division) so it is bit-identical across engines — for a fixed document
    the ordering is the classic tf-idf ordering (idf is monotone in 1/df).

    Scale shape: two hash aggregations (term counts per doc, doc freq per
    term) + one shuffle join on term + one per-doc window for top-k —
    vocabulary never touches the driver.
    """
    from pyspark.sql import Window

    t = tokens("text")
    tf = (
        docs.select("doc_id", F.explode(t).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df, "term").withColumn(
        "score", F.expr("tf * CAST(1000000000 AS BIGINT) div df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )


def denylist_scrub(
    docs: DataFrame, terms: tuple[str, ...] = ("customer", "merge"), mask: str = "[MASKED]"
) -> DataFrame:
    """Denylist scrubbing — the PII-removal shape of a curation pipeline
    (same plan for emails/phones/ids: swap the pattern). Pure JVM regex
    (regexp_extract_all + regexp_replace), no UDF; returns per-doc match
    count and post-scrub length so the redaction rate is auditable."""
    pat = r"\b(" + "|".join(terms) + r")\b"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).alias("n_masked"),
        F.length(F.regexp_replace("text", pat, mask)).alias("scrubbed_len"),
    )


def packing_index(
    docs: DataFrame, budget: int = 512, part_col: str = "source"
) -> DataFrame:
    """Sequence-packing index: concatenate every document's tokens in
    (partition, doc_id) order and slice the stream into fixed ``budget``-
    token context windows — each doc's placement is its token-offset range
    expressed in pack coordinates (first_pack..last_pack; docs straddle
    boundaries, exactly like pretraining concat-and-chunk).

    One window aggregation per partition column value: packing is
    embarrassingly parallel across ``part_col`` (source/shard), never a
    global sort.
    """
    from pyspark.sql import Window

    n_tok = F.size(tokens("text"))
    w = Window.partitionBy(part_col).orderBy("doc_id")
    cum = F.sum(n_tok).over(w)
    return (
        docs.select(
            "doc_id",
            F.col(part_col),
            n_tok.alias("n_tok"),
            cum.alias("cum"),
        )
        .select(
            "doc_id",
            part_col,
            "n_tok",
            (F.col("cum") - F.col("n_tok")).alias("start_off"),
            F.expr(f"(cum - n_tok) div {budget}").alias("first_pack"),
            F.expr(f"(cum - 1) div {budget}").alias("last_pack"),
        )
    )


def _bigrams(t: Column) -> Column:
    """Adjacent-token bigram array (shared by top_bigrams / repetition)."""
    return F.transform(
        F.slice(t, 1, F.size(t) - 1),
        lambda x, i: F.concat_ws(" ", x, F.element_at(t, i + 2)),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1: documents dominated by repeated lines/n-grams are boilerplate):

    - ``dup_token_frac``  — 1 − distinct/total tokens
    - ``top_bigram_frac`` — share of bigram instances taken by the single
      most frequent bigram
    - ``dup_bigram_frac`` — share of bigram instances whose bigram occurs
      more than once

    Scale shape: token stats are pure array expressions in the scan; the
    bigram shares are one explode + two hash aggregations keyed by
    (doc_id, bigram) then doc_id — per-document keys, so partial aggs
    combine map-side and no key is ever hot. All ratios are exact-integer
    divisions evaluated in double (no float-sum drift to pin)."""
    t = tokens("text")
    per = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.round(
            1.0 - F.size(F.array_distinct(t)).cast("double") / F.size(t), 6
        ).alias("dup_token_frac"),
    )
    # Token array staged as a column first — the top_bigrams lesson: the
    # lambda's element_at over the raw split expression is O(n^2)/doc.
    counts = (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", F.explode(_bigrams(F.col("_toks"))).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    shares = counts.groupBy("doc_id").agg(
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("top_bigram_frac"),
        F.round(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum("n"),
            6,
        ).alias("dup_bigram_frac"),
    )
    return per.join(shares, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        F.coalesce("dup_bigram_frac", F.lit(0.0)).alias("dup_bigram_frac"),
    )


# PII patterns: deliberately simple shapes every regex engine (Java regex
# here, RE2 in the DuckDB oracle) interprets identically. Real deployments
# extend the list; the plan shape (chained regexp_replace in one scan)
# doesn't change.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Deterministically append a synthetic contact line per document.

    The fixture corpus contains no PII (by construction), so a scrub over
    the raw text would trivially match on all-zero counts; this enrichment
    makes the scrub operator's regexes and replacement order actually
    load-bearing while staying exactly reproducible in the SQL oracle."""
    return docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1"),
        ),
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII masking in one scan: count then mask emails, IPv4 addresses and
    phone numbers (replacement order matters — emails contain dots/digits,
    so they are masked before IPs and phones). Returns per-doc category
    counts and an md5 of the scrubbed text (proves exact output equality
    without hauling full text through the comparator).

    Pure JVM regexp_count/regexp_replace — whole-stage codegen, no Python,
    trivially parallel at any scale."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count("text", F.lit(PII_IPV4)).alias("n_ips"),
        F.regexp_count("text", F.lit(PII_PHONE)).alias("n_phones"),
        F.md5(scrubbed).alias("scrub_fp"),
    )


def _token_shingles(t: Column, k: int) -> Column:
    """Adjacent k-token shingles as space-joined strings."""
    return F.transform(
        F.slice(t, 1, F.greatest(F.size(t) - (k - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", F.array(*[F.element_at(t, i + j + 1) for j in range(k)])
        ),
    )


def contamination_check(
    docs: DataFrame, bench_mod: int = 97, k: int = 3
) -> DataFrame:
    """Benchmark-contamination scan: which training documents contain
    verbatim k-token shingles from a held-out benchmark set? (The standard
    train/test leakage check run before any pretraining job; real corpora
    use k≈8–13 — the fixture's tiny vocabulary needs k=3 to have signal.)

    Benchmark = docs with ``doc_id % bench_mod == 0`` (a stand-in for the
    external eval set). Returns per contaminated doc: its shingle count,
    how many distinct shingles hit the benchmark, and the hit rate.

    Scale shape: the benchmark shingle set is small by construction →
    broadcast hash join against the exploded corpus shingles; the corpus
    side is one explode + distinct + per-doc agg, never a shuffle keyed on
    anything hotter than doc_id."""
    t = tokens("text")
    # explode_OUTER + null guard: the inner explode makes
    # InferFiltersFromGenerate add a size>0 filter whose alias-substituted
    # form (the whole tokenize+shingle expression) is pushed below the
    # width repartition and re-evaluated per doc on the narrow scan
    # (the dd09 pathology; measured 12-15x on the window-hash pass).
    # Shingle strings are never null, so dropping the null rows the outer
    # variant adds for shingle-less docs is bit-identical to the inner.
    sh = docs.select(
        "doc_id",
        F.explode_outer(F.array_distinct(_token_shingles(t, k))).alias("g"),
    ).filter(F.col("g").isNotNull())
    bench = (
        sh.filter((F.col("doc_id") % bench_mod) == 0).select("g").distinct()
    )
    corpus = sh.filter((F.col("doc_id") % bench_mod) != 0)
    # ONE corpus shingle pass (r13): a broadcast LEFT join + conditional
    # agg replaces the old two-branch shape (separate n_shingles agg +
    # inner-join hits agg), which evaluated the tokenize+shingle explode
    # twice. bench is distinct, so each corpus row matches at most one
    # bench row: count(hit) == the old inner-join count, and the
    # n_contaminated >= 1 filter reproduces the old inner join's
    # drop-uncontaminated-docs semantics exactly.
    return (
        corpus.join(
            F.broadcast(bench.withColumn("_hit", F.lit(1))), "g", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") >= 1)
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_shingles"), 6
            ).alias("contamination_rate"),
        )
    )


def domain_mixture_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    n_target: int = 200,
) -> DataFrame:
    """Temperature-weighted domain mixture (the multilingual/multi-source
    sampling rule: w_s ∝ n_s^α, α<1 upsamples small sources relative to
    their natural share): compute per-source quotas for an ``n_target``-doc
    sample and take each source's quota deterministically by md5-hash rank
    (reproducible across engines and runs, unlike rand()).

    Returns the per-source audit row: natural count, mixture weight, quota
    and kept count. One aggregation for counts, one broadcast-joined
    window rank for the take — no global sort.

    At 100 TB the same plan holds: source cardinality is tiny (the weight
    table is driver-size), and the per-source rank is a partitioned window
    over the source key."""
    from pyspark.sql import Window

    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    # z through DECIMAL: a plain double SUM is summation-order-dependent
    # and this plan references it from TWO branches (quota + kept join) —
    # at sf0.1 the quota expression lands EXACTLY on a ceil boundary
    # (200/20 sources = 10.0), where a 1-ulp re-evaluation difference
    # flips ceil and makes kept != quota (found by the sf0.1 sweep; the
    # DuckDB oracle inlines its CTE and hit it first).
    wsum = counts.agg(
        F.sum(
            F.pow(F.col("n_docs").cast("double"), F.lit(alpha)).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("z")
    )
    weights = counts.crossJoin(F.broadcast(wsum)).select(
        "source",
        "n_docs",
        F.round(F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("z"), 6).alias(
            "weight"
        ),
        F.least(
            F.ceil(
                F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
                / F.col("z")
                * n_target
            ).cast("int"),
            F.col("n_docs").cast("int"),
        ).alias("quota"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
    kept = (
        ranked.join(F.broadcast(weights.select("source", "quota")), "source")
        .filter(F.col("rk") <= F.col("quota"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return weights.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "weight",
        "quota",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


def decontaminated_split(
    docs: DataFrame, eval_mod: int = 10, k: int = 4
) -> DataFrame:
    """Deterministic train/eval split with decontamination — the full
    held-out-set hygiene pass a pretraining job runs: (1) assign ~1/
    ``eval_mod`` of documents to eval by md5 hash of the id (stable
    across runs and engines, unlike rand()); (2) remove from TRAIN every
    document sharing a verbatim k-token shingle with ANY eval document
    (contamination_check generalized from scan to removal; k=4 on the
    fixture's tiny vocabulary ≈ the selectivity k≈13 has on web text —
    k=3 saturates, removing 97% of train). Returns the per-source audit
    row: eval size, raw train size, removed count, clean train size.

    Scale shape: the eval side is a small fraction by construction, so
    its distinct shingle set broadcasts; the train side pays one explode
    + distinct + semi join — O(corpus tokens), no self-join. At real
    scale the eval set is an external benchmark suite (tiny), making the
    broadcast even cheaper."""
    from ..functions.hashing import md5_hash32

    is_eval = (md5_hash32(F.col("doc_id").cast("string")) % eval_mod) == 0
    base = docs.select("doc_id", "source", "text", is_eval.alias("is_eval"))
    # explode_OUTER + null guard: see contamination_check (the dd09
    # inferred-filter pathology; shingles are never null)
    sh = base.select(
        "doc_id",
        "is_eval",
        F.explode_outer(
            F.array_distinct(_token_shingles(tokens("text"), k))
        ).alias("g"),
    ).filter(F.col("g").isNotNull())
    eval_sh = sh.filter("is_eval").select("g").distinct()
    contaminated = (
        sh.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_sh), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    flagged = base.join(
        contaminated.withColumn("is_contaminated", F.lit(True)), "doc_id", "left"
    )
    return flagged.groupBy("source").agg(
        F.sum(F.when(F.col("is_eval"), 1).otherwise(0)).alias("n_eval"),
        F.sum(F.when(~F.col("is_eval"), 1).otherwise(0)).alias("n_train_raw"),
        F.sum(
            F.when(
                ~F.col("is_eval") & F.col("is_contaminated").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_removed"),
        F.sum(
            F.when(
                ~F.col("is_eval") & F.col("is_contaminated").isNull(), 1
            ).otherwise(0)
        ).alias("n_train_clean"),
    )


def token_freq_scores(docs: DataFrame, common_ppm: int = 1000) -> DataFrame:
    """Corpus-frequency language-model score — the CCNet/Gopher-style
    "does this document look like normal text" filter, with the unigram
    model trained ON the corpus itself (one aggregation) instead of an
    external LM. Per document:

    - ``avg_freq_ppm``: mean corpus frequency of the doc's tokens in parts
      per million — low values mean rare/garbage vocabulary (the
      perplexity-filter signal, monotone in avg unigram log-prob for a
      fixed doc length distribution);
    - ``min_freq_ppm``: the rarest token's frequency — a single OOV-ish
      token flags extraction noise;
    - ``pct_common``: fraction of tokens whose corpus frequency is
      ≥ ``common_ppm`` (Gopher §A1 "80% of words in a common-word list"
      rule, with the list derived from the corpus; the fixture's tiny
      vocabulary saturates the 1000-ppm web-corpus default, so the query
      entry probes at 33000).

    All arithmetic is exact integers/decimals (tf-idf precedent in
    ``keyterms``): frequencies are ``count * 1e6 div total`` bigints, the
    mean divides two exact sums — no transcendental functions, so the
    DuckDB oracle matches bit-for-bit.

    Scale shape: one explode (O(total tokens)), one vocabulary groupBy
    (partial-agg), a scalar total via a 1-row cross join (broadcast), one
    token→vocab shuffle join, one per-doc groupBy. The vocabulary never
    touches the driver — at 100 TB it is a distributed table like any
    other."""
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    freq = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        F.expr("cnt * CAST(1000000 AS BIGINT) div total").alias("freq_ppm"),
    )
    return (
        toks.join(freq, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr("sum(freq_ppm) div count(1)").alias("avg_freq_ppm"),
            F.min("freq_ppm").alias("min_freq_ppm"),
            F.round(
                F.sum(F.when(F.col("freq_ppm") >= common_ppm, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("pct_common"),
        )
    )


def bigram_surprisal_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    model_docs: DataFrame | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """CCNet-style LM-perplexity quality buckets (Wenzek et al. 2020:
    score each document with a language-model perplexity, split the
    corpus into head/middle/tail thirds), with the LM being a bigram
    model trained on ``model_docs`` (CCNet trains on a high-quality
    reference corpus; default = self-trained on ``docs``) and the score
    an exact-arithmetic surprisal: per bigram type,
    s = round(log2(CL(w1) / C2(w1 w2)), 6) — the negative log2 of the
    left-conditional probability — and per document the DECIMAL-exact
    mean of its bigram surprisals. Documents with fewer than two tokens
    have no bigrams and are omitted; bigrams absent from the model are
    ignored (OOV-skip policy, documented not smoothed). Self-trained
    caveat: a bigram whose left word appears only once scores 0 (its
    conditional is 1) — the standard unsmoothed-LM artifact; training on
    a reference corpus avoids it.

    Complements ``token_freq_scores`` (tx14, unigram common-word filter):
    this is the sequence-model signal — word-salad scores high surprisal
    even when every unigram is common.

    Scale shape: ONE bigram explode per corpus, immediately collapsed to
    per-(doc, bigram-type) counts — everything downstream (model aggs,
    scoring join, per-doc mean as the n-weighted sum(n·s)/sum(n), exact
    decimal either way) works at type granularity, which is much smaller
    than occurrence granularity; the model is two further hash aggs off
    that table (never a second token scan), and the scoring join keys on
    the bigram string against the vocabulary-sized type table (stays
    distributed — never on the driver). The head/middle/tail split is
    exactly ntile(3) over the total order (avg_surprisal, id), but
    computed WITHOUT a global single-partition window sort: a
    value-histogram (one hash agg; bin count bounded by the surprisal
    range, ~3k bins) locates the two boundary ranks, only the boundary
    bins are sorted (orderBy = range-partitioned sort, never
    Exchange-to-1; each bin holds a small value-slice of the corpus),
    and the two boundary tuples are broadcast scalars — bucketing is a
    pure per-row comparison. Bit-identical output, partition-parallel
    at every stage.
    """

    def _doc_types(frame: DataFrame) -> DataFrame:
        # Token array staged as a column first (the top_bigrams lesson):
        # _bigrams over the raw split expression re-splits the text per
        # lambda element — O(n^2) per document, ~3s of the ~5s this
        # query used to cost at sf0.1.
        return (
            frame.select(F.col(id_col), tokens("text").alias("_toks"))
            .select(
                F.col(id_col), F.explode(_bigrams(F.col("_toks"))).alias("bigram")
            )
            .groupBy(id_col, "bigram")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    dtypes = _doc_types(docs)
    if model_docs is None:
        # Self-trained: dtypes feeds BOTH the model aggs and the scoring
        # join — persist it so the token explode runs once, not twice.
        dtypes = dtypes.persist()
    model_types = dtypes if model_docs is None else _doc_types(model_docs)
    c2 = (
        model_types.groupBy("bigram")
        .agg(F.sum("n").alias("c2"))
        .withColumn("w1", F.substring_index("bigram", " ", 1))
    )
    cl = c2.groupBy("w1").agg(F.sum("c2").alias("cl"))
    s = c2.join(cl, "w1").select(
        "bigram",
        F.round(F.log2(F.col("cl").cast("double") / F.col("c2")), 6).alias("s"),
    )
    # The model is vocabulary-bounded (bigram TYPES, not occurrences) —
    # broadcast it so scoring is a map-side hash join instead of
    # shuffling the much larger per-(doc, type) frame. A reference-corpus
    # model (CCNet's actual setup) is small by construction; a
    # self-trained-at-open-web-scale caller whose type table outgrows the
    # broadcast limit passes broadcast_model=False to fall back to the
    # shuffle join.
    scoring = F.broadcast(s) if broadcast_model else s
    d = (
        dtypes.join(scoring, "bigram")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("int").alias("n_bigrams"),
            (
                F.sum(F.col("n") * F.col("s").cast("decimal(12,6)"))
                .cast("double")
                / F.sum("n")
            ).alias("avg_surprisal"),
        )
    )
    # ntile(3) over the total order (avg_surprisal, id) = a rank cut at
    # sizes q+(r>=1), q+(r>=2), q for n = 3q+r. Distributed exact rank
    # selection: histogram the score into value bins (tiny collect —
    # bounded by value range, not row count), walk the cumulative counts
    # to the bin holding each boundary rank, sort ONLY that bin's rows
    # to read the boundary tuple, then bucket by broadcast comparison.
    d = d.persist()
    bins = sorted(
        (r["b"], r["c"])
        for r in d.groupBy(F.floor(F.col("avg_surprisal") * 100).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = sum(c for _, c in bins)
    if n == 0:
        d.unpersist()
        return d.select(
            F.col(id_col),
            "n_bigrams",
            "avg_surprisal",
            F.lit("head").alias("ppl_bucket"),
        )
    q, r3 = divmod(n, 3)
    s1 = q + (1 if r3 >= 1 else 0)
    s2 = q + (1 if r3 >= 2 else 0)

    def _boundary(rank: int) -> tuple:
        cum = 0
        for b, c in bins:
            if cum + c >= rank:
                row = (
                    d.filter(F.floor(F.col("avg_surprisal") * 100) == b)
                    .orderBy("avg_surprisal", id_col)
                    .offset(rank - cum - 1)
                    .limit(1)
                    .collect()[0]
                )
                return row["avg_surprisal"], row[id_col]
            cum += c
        raise AssertionError("boundary rank beyond histogram total")

    b1 = _boundary(s1)
    b2 = _boundary(s1 + s2) if s2 > 0 else b1
    # d stays persisted: the returned projection reads it — unpersisting
    # here would make the final select recompute the entire bigram
    # pipeline a second time (measured 2× the query cost at sf0.1). The
    # dd04/px02 convention: the cache lives as long as the returned
    # frame; callers/bench clearCache between queries.

    def _le(bnd: tuple):
        bv, bi = bnd
        v = F.col("avg_surprisal")
        return (v < F.lit(bv)) | ((v == F.lit(bv)) & (F.col(id_col) <= F.lit(bi)))

    return d.select(
        F.col(id_col),
        "n_bigrams",
        "avg_surprisal",
        F.when(_le(b1), "head")
        .when(_le(b2), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


def token_entropy(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits/token)
    — the repetitiveness signal complementary to tx10's Gopher surface
    ratios: templated or looped text scores low entropy for its length
    even when no single n-gram dominates.

    entropy = sum over token types of (c/n) * log2(n/c). Exactness
    contract (the tx15 rounded-log2 rule): the per-type term
    round(log2(n/c), 6) is the only float op; the per-doc reduction is
    the DECIMAL-exact sum(c * term) / n, so both engines reduce
    identical decimals in any order.

    Scale shape: one token explode collapsed immediately to
    per-(doc, type) counts, one per-doc total, one join back on the doc
    id (reuses the same hash partitioning), one final agg — all keyed on
    the doc id, nothing global.
    """
    t = docs.select(F.col(id_col), F.explode(tokens("text")).alias("tok"))
    counts = t.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy(id_col).agg(F.sum("c").alias("n"))
    term = F.round(F.log2(F.col("n").cast("double") / F.col("c")), 6)
    return (
        counts.join(tot, id_col)
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("int").alias("n_tokens"),
            F.count(F.lit(1)).cast("int").alias("n_types"),
            (
                F.sum(F.col("c") * term.cast("decimal(12,6)")).cast("double")
                / F.sum("c")
            ).alias("entropy_bits"),
        )
    )


def rag_chunks(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/RAG ingestion
    shape (chunk size W, stride S < W ⇒ W−S tokens of overlap so no
    sentence is split across a hard boundary without context). One chunk
    per start position 1, 1+S, 1+2S, … ≤ n; the final chunks are short
    rather than padded (the embedder's tokenizer repads anyway).

    Output: (id, chunk_id, n_chunk_tokens, chunk_md5) — the md5 stands in
    for the chunk text so the result stays hashable/auditable without
    shipping the text twice; real pipelines select the slice itself.

    Scale shape: pure per-row expressions (sequence + explode + slice) —
    no shuffle, no Python; output rows ≈ n_tokens/S per doc.
    """
    t = tokens("text")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(stride)
    )
    e = docs.select(
        F.col(id_col), t.alias("toks"), F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.slice(F.col("toks"), F.col("start"), chunk_tokens)
    return e.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def dsir_importance_scores(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed-n-gram features are under the TARGET
    distribution than under the raw corpus, then keep the target-like
    ones. Here features are unigram tokens hashed into ``n_buckets``
    (DSIR's hashed feature space), the target slice is
    ``docs[target_col] == target_value``, and

        w_b   = round(log2( ((t_b+1)·(R+B)) / ((r_b+1)·(T+B)) ), 6)
        score = Σ_doc n_b · w_b / Σ_doc n_b   (DECIMAL-exact mean)

    with t_b/r_b the bucket's target/raw occurrence counts, T/R the
    totals, B the Laplace smoothing mass — the log importance ratio of
    Laplace-smoothed bucket probabilities. ``selected`` = score > 0
    (more target-like than corpus-average). The only float op is the
    rounded log2 of an exact integer ratio (the tx15 contract), so both
    engines agree bit-for-bit.

    Scale shape: one token explode collapsed to per-(doc, bucket)
    counts; bucket stats are ONE further agg over at most n_buckets
    groups (broadcast back as a 256-row join); the per-doc mean is one
    keyed agg. Integer-product bound: (t+1)·(R+B) must stay < 2^63 —
    fine to ~3e9 target tokens; beyond that switch the oracle-free
    deploy path to the difference-of-logs form.
    """
    from ..functions.hashing import md5_hash32

    occ = (
        docs.select(
            F.col(id_col),
            (F.col(target_col) == target_value).alias("__is_t"),
            F.explode(tokens("text")).alias("tok"),
        )
        .withColumn("bucket", md5_hash32(F.col("tok")) % n_buckets)
        .groupBy(id_col, "__is_t", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = occ.groupBy("bucket").agg(
        F.sum("n").alias("r_b"),
        F.sum(F.when(F.col("__is_t"), F.col("n")).otherwise(0)).alias("t_b"),
    )
    tot = stats.agg(
        F.sum("r_b").alias("R"), F.sum("t_b").alias("T")
    )
    w = stats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log2(
                ((F.col("t_b") + 1) * (F.col("R") + n_buckets)).cast("double")
                / ((F.col("r_b") + 1) * (F.col("T") + n_buckets)).cast("double")
            ),
            6,
        ).alias("w"),
    )
    return (
        occ.join(w, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("int").alias("n_tokens"),
            (
                F.sum(F.col("n") * F.col("w").cast("decimal(12,6)"))
                .cast("double")
                / F.sum("n")
            ).alias("dsir_score"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "dsir_score",
            (F.col("dsir_score") > 0).alias("selected"),
        )
    )


def temperature_mixture(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.7,
    budget: int = 100_000,
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus stratum — the
    multilingual-LM mixing rule (XLM-R, Conneau et al. 2020 §3.1: sample
    language i with q_i ∝ p_i^α, α<1 flattening the head so low-resource
    strata are up-sampled). Emits per stratum the exact share, the
    α-tempered weight, and the document budget it buys.

    Exactness contract: share_ppm is integer arithmetic; the α power is
    the one float op and is rounded to 12 decimals THEN summed as
    DECIMAL(18,12) — the normalizer is an exact, order-independent
    decimal sum, so cross-engine equality only needs pow() to agree to
    12 decimals (it does — both engines' pow is correctly rounded to
    well under 1e-13 relative, and the q87 ln() convention applies).
    Weights round to 6; the budget allocation floors w_raw * budget with
    both engines flooring the identical double product.

    Scale shape: one hash agg to stratum granularity (bounded by
    |strata|, e.g. languages or sources), then two broadcast scalars —
    the corpus is scanned once, nothing else leaves the executors.
    """
    counts = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").cast("bigint").alias("_total"))
    scored = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_pa",
        F.round(
            F.pow(F.col("n_docs").cast("double") / F.col("_total"), F.lit(alpha)),
            12,
        ).cast("decimal(18,12)"),
    )
    z = scored.agg(F.sum("_pa").alias("_z"))
    w_raw = F.col("_pa").cast("double") / F.col("_z").cast("double")
    return (
        scored.crossJoin(F.broadcast(z))
        .select(
            F.col(group_col),
            "n_docs",
            F.expr(
                "CAST(CAST(n_docs AS DECIMAL(38,0)) * 1000000"
                " div _total AS BIGINT)"
            ).alias("share_ppm"),
            F.round(w_raw, 6).alias("weight"),
            F.floor(w_raw * F.lit(budget)).cast("bigint").alias("budget_docs"),
        )
        .orderBy(F.col("n_docs").desc(), F.col(group_col))
    )


# Fixed, documented surrogate weights for the expression-level quality
# classifier: chosen so the score rewards lexical diversity and length
# and penalizes stopword saturation — the same signal mix a trained
# fastText quality model (GPT-3 / CCNet setups) learns. A real deployment
# swaps in learned weights (same plan) or a pandas_udf model; the
# decision PLUMBING — per-row linear score, sigmoid calibration,
# threshold gate — is what this operator pins.
QUALITY_LOGIT_WEIGHTS = {
    "uniq_ratio": 3.0,
    "stop_ratio": -2.0,
    "len_score": 1.5,
    "bias": -1.0,
}


def quality_classifier_scores(
    docs: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Model-based quality filtering — the classifier stage of a curation
    pipeline (Brown et al. 2020 §A: a linear classifier over document
    features gates pretraining data): p(keep) = sigmoid(w·x + b) over the
    tx02 quality features, with the keep decision at ``threshold`` (default 0.8 — near the
    fixture's median, so the gate genuinely splits the corpus).

    Exactness contract: features are the deterministic tx02 ratios; the
    logit is a fixed-literal dot product (exact double sequence); sigmoid
    is one exp() — correctly rounded in both engines — and the score
    rounds to 6. The keep flag compares the ROUNDED score to the
    threshold, so the gate itself is hash-stable.

    Scale shape: pure per-row expressions fused into the scan — the
    classifier costs a projection, exactly like the real fastText hashing
    trick does at inference time.
    """
    w = QUALITY_LOGIT_WEIGHTS
    feats = quality_scores(docs)
    logit = (
        F.lit(w["uniq_ratio"]) * F.col("uniq_ratio")
        + F.lit(w["stop_ratio"]) * F.col("stop_ratio")
        + F.lit(w["len_score"]) * F.col("len_score")
        + F.lit(w["bias"])
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return feats.select(
        "doc_id",
        "uniq_ratio",
        "stop_ratio",
        "len_score",
        score.alias("p_keep"),
        (score >= F.lit(threshold)).alias("keep"),
    )


def ngram_novelty_scores(
    docs: DataFrame, id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Per-document n-gram novelty — the memorization/boilerplate-risk
    signal beside tx10's within-doc repetition: what fraction of a
    document's DISTINCT k-gram shingles appears in no other document?
    Low novelty = the document is assembled from corpus-common phrasing
    (template/boilerplate/near-copy); high = original text. The
    standard triage column for "which docs does dedup threaten" before
    running the expensive pair pipelines.

    Exactness: counts and an integer-ppm ratio (the dq05 convention) —
    no floats anywhere.

    Scale shape: one shingle pass collapsed to (doc, shingle-hash) TYPES
    (the dedup.hashed_shingles int64 staging — shingle strings never
    shuffle), one vocabulary-keyed doc-frequency agg, one join back on
    the hash, one per-doc agg. All keys are content hashes: uniformly
    distributed, no hot keys.
    """
    from .dedup import hashed_shingles, shingles

    hs = hashed_shingles(docs, id_col, shingle_col=shingles("text", k)).select(
        F.col(id_col), F.explode("hs").alias("h")
    ).distinct()
    df_counts = hs.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    return (
        hs.join(df_counts, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_unique",
            F.expr(
                "CAST(n_unique * CAST(1000000 AS BIGINT) div n_shingles"
                " AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


def bpe_train_merges(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
    tokenizer-training pass of an LLM data pipeline: learn the first
    ``n_merges`` merge rules from the corpus and report each rule with
    its pair frequency.

    Returns one row per merge step:
    ``(step, left_sym, right_sym, pair_count)``.

    Algorithm (the standard word-frequency formulation every BPE trainer
    uses): aggregate the corpus to a (word, freq) table once; represent
    each word as a delimited symbol sequence; per iteration, count
    adjacent symbol pairs weighted by word frequency (overlapping
    occurrences count, as in the reference implementation), take the
    most frequent pair (ties broken by (left, right) ascending), and
    merge it everywhere.

    Scale shape: the ONLY pass that sees corpus-sized data is the word
    count (one shuffle, map-side combined). Every merge iteration runs
    on the persisted vocabulary-bounded frame — distinct words, not
    documents — so iteration cost is independent of corpus size; this
    is exactly how production tokenizer trainers scale. The per-step
    best-pair ``collect()`` is one row (bounded driver materialization,
    the k-means-seed convention).

    Exactness: symbols are wrapped as ``(sym)(sym)…`` so the merge is a
    plain ``replace`` of ``(l)(r)`` with ``(lr)`` — left-to-right
    non-overlapping, probe-verified identical in Spark and DuckDB (a
    space-joined form shares delimiters between matches and diverges on
    runs). Words are extracted as raw ``[A-Za-z]+`` then lowercased:
    lowercasing BEFORE extraction diverges cross-engine on chars like
    'İ' (Java lower() emits a combining dot that splits the match).
    All counts are BIGINT; no floats anywhere.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '[A-Za-z]+', 0)")
            ).alias("w")
        )
        .groupBy(F.lower("w").alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = words.select(
        F.regexp_replace("word", "(.)", r"($1)").alias("sym"), "freq"
    ).persist()
    try:
        out, _ = _bpe_merge_loop(syms, n_merges)
        from ..functions.localframe import local_frame

        return local_frame(
            spark,
            out,
            "step INT, left_sym STRING, right_sym STRING, pair_count BIGINT",
        )
    finally:
        syms.unpersist(blocking=True)


_BPE_CHECKPOINT_EVERY = 16


def _bpe_merge_loop(
    syms: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The BPE merge iterations shared by train (tx19) and encode (tx20).

    ``syms`` must carry ``sym`` (delimited ``(s)(s)…`` symbol string) and
    ``freq``; any other columns (e.g. ``word``) ride along untouched.
    Returns the merge rows and the frame with every learned merge
    applied — the latter IS the vocabulary's tokenization. Each step's
    best-pair ``collect()`` is one row (bounded driver materialization,
    the k-means-seed convention).

    Cost bound: ONE Spark job per merge step, inherently sequential —
    merge i+1's pair counts depend on merge i's replacement; no BPE
    trainer avoids this. Each job runs on the vocabulary-bounded frame
    (distinct words), so a realistic 32k-merge vocabulary is 32k small
    jobs, not 32k corpus scans. ``localCheckpoint`` every
    ``_BPE_CHECKPOINT_EVERY`` steps cuts the replace-chain lineage so
    plan depth — and per-step analysis/codegen time — stays flat instead
    of compounding (r8 stress: n_merges=64 per-step wall flat at ~60 ms
    after the first checkpoint vs monotonically growing without)."""
    cur = syms
    out: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        if step % _BPE_CHECKPOINT_EVERY == 0:
            cur = cur.localCheckpoint(eager=True)
        arr = F.split(
            F.expr("substring(sym, 2, length(sym) - 2)"), r"\)\("
        )
        n_pairs = F.greatest(F.size(arr) - 1, F.lit(0))
        z = F.arrays_zip(
            F.slice(arr, 1, n_pairs), F.slice(arr, 2, n_pairs)
        )
        best = (
            cur.select("freq", F.explode(z).alias("p"))
            .groupBy(
                F.col("p")["0"].alias("left_sym"),
                F.col("p")["1"].alias("right_sym"),
            )
            .agg(F.sum("freq").cast("bigint").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]
        out.append((step, l, r, int(c)))
        cur = cur.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f"({l})({r})"), F.lit(f"({l}{r})")
            ),
        )
    return out, cur


def bpe_encode_stats(
    docs: DataFrame, n_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Apply a corpus-trained BPE tokenizer to every document (tx20) —
    the tokenizer-APPLICATION pass that follows tx19's training pass:
    learn ``n_merges`` merge rules from the corpus itself, tokenize each
    document with them, and report per-document token statistics.

    Returns one row per document:
    ``(doc_id, n_words, n_tokens, n_chars_alpha, cpt_ppm)`` where
    ``cpt_ppm`` is alphabetic-chars-per-token in parts-per-million — the
    compression ratio tokenizer teams track; documents with no
    ``[A-Za-z]+`` words report all-zero stats.

    Scale shape (the production tokenizer-apply shape): the ONLY
    corpus-sized work is one (doc_id, word) count shuffle; the merge
    loop and the per-word token counts run on the vocabulary-bounded
    distinct-word frame, and encoding is a word-keyed join of the doc
    word counts against that vocabulary — never a per-document scan of
    the merge table. The (doc_id, word) frame is persisted and reused
    by the vocabulary derivation and the final join, so the raw corpus
    is tokenized exactly once.

    Exactness: token counts are ``(``-delimiter counts on the merged
    symbol string — all BIGINT, no floats; the ratio is integer ppm.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    dw = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '[A-Za-z]+', 0)")
            ).alias("w"),
        )
        .groupBy("doc_id", F.lower("w").alias("word"))
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .persist()
    )
    words = dw.groupBy("word").agg(
        F.sum("n_occ").cast("bigint").alias("freq")
    )
    # Persisted like tx19's syms: every merge iteration (and the final
    # join's recompute of the merged chain) reads the vocabulary-bounded
    # cache instead of re-running the word-count shuffle per step.
    syms = words.select(
        "word",
        F.regexp_replace("word", "(.)", r"($1)").alias("sym"),
        "freq",
    ).persist()
    _, merged = _bpe_merge_loop(syms, n_merges)
    vocab_tok = merged.select(
        "word",
        (
            F.length("sym")
            - F.length(F.replace(F.col("sym"), F.lit("("), F.lit("")))
        )
        .cast("bigint")
        .alias("n_tok_word"),
    )
    agg = (
        dw.join(vocab_tok, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_tok_word"))
            .cast("bigint")
            .alias("n_tokens"),
            F.sum(F.col("n_occ") * F.length("word"))
            .cast("bigint")
            .alias("n_chars_alpha"),
        )
    )
    filled = docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        F.coalesce("n_chars_alpha", F.lit(0))
        .cast("bigint")
        .alias("n_chars_alpha"),
    )
    return filled.withColumn(
        "cpt_ppm",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
            "ELSE n_chars_alpha * CAST(1000000 AS BIGINT) div n_tokens END"
        ),
    )


def zipf_stats(
    docs: DataFrame,
    text_col: str = "text",
    top_m: int = 1000,
    top_share_n: int = 100,
) -> DataFrame:
    """Corpus rank-frequency diagnostics (tx21) — the Zipf-law health
    check corpus teams run before training: vocabulary size, hapax mass,
    head concentration, and the fitted Zipf exponent. A natural corpus
    sits near slope −1; synthetic/templated/looped text bends the curve
    (flat head = boilerplate domination, steep tail = vocabulary
    collapse), so the slope is a one-number drift alarm between corpus
    snapshots.

    Returns ONE row: ``(n_vocab, n_tokens, n_hapax, top_share_ppm,
    zipf_slope)`` — ``top_share_ppm`` is the corpus-frequency share of
    the ``top_share_n`` most frequent words in parts-per-million,
    ``zipf_slope`` the least-squares slope of ln(freq) on ln(rank) over
    the ``top_m`` head words (rank ties broken by word ASC).

    Exactness: counts/shares are pure integers; the regression inputs
    are ln values ROUNDED(6) then summed as DECIMALs (the functions/
    exact.py convention — double SUM order-drift cannot reach the
    result), product sums reduced to scale 6 before the final double
    cast (prod_sum_double, mirrors the oracle's CAST chain); the slope
    algebra then runs in IEEE doubles identically in both engines.

    Scale shape: ONE corpus-sized shuffle (the word count — map-side
    combined); totals are a second pass over the persisted vocab frame;
    the regression runs on a TakeOrdered top-``top_m`` frame (partial
    per-partition top-k, never a global sort), ranked by a window over
    those ``top_m`` rows only. Driver sees one row.
    """
    from pyspark.sql import Window as W

    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '[A-Za-z]+', 0)")
            ).alias("w")
        )
        .groupBy(F.lower("w").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .persist()
    )
    totals = words.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum("freq").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
    )
    head = words.orderBy(F.desc("freq"), "word").limit(top_m)
    ranked = head.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("freq"), "word")),  # bounded-ok: <=top_m rows post-limit
    ).select(
        "rank",
        "freq",
        F.round(F.log(F.col("rank").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("y"),
    )
    from ..functions.exact import prod_sum_double

    reg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        prod_sum_double(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
        prod_sum_double(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(F.when(F.col("rank") <= top_share_n, F.col("freq")).otherwise(0))
        .cast("bigint")
        .alias("head_freq"),
    )
    return totals.crossJoin(reg).select(
        "n_vocab",
        "n_tokens",
        "n_hapax",
        F.expr("head_freq * CAST(1000000 AS BIGINT) div n_tokens")
        .cast("bigint")
        .alias("top_share_ppm"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


def mixture_epoch_plan(
    docs: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    token_budget: int = 1_000_000,
) -> DataFrame:
    """Training-mixture epoch plan (px18) — the LLaMA-style data table:
    per corpus stratum, its TOKEN mass, natural share, α-tempered target
    weight, the token budget that weight buys, and the implied number of
    passes (epochs) over the stratum in ppm — the "how many times does
    the model see Wikipedia" column. px13 plans by document counts; a
    token-budgeted pretraining run plans by tokens.

    Exactness (the px13 contract on token counts): shares are integer
    ppm; the α power is the single float op, rounded(12) then summed as
    DECIMAL(18,12) so the normalizer is exact and order-independent;
    weights round(6); budget = floor(w_raw · B) with both engines
    flooring the identical double; epochs_ppm = budget·1e6 // n_tokens.

    Scale shape: one corpus scan reduced map-side to |strata| rows, two
    broadcast scalars — nothing else leaves the executors.
    """
    counts = docs.select(
        F.col(group_col), F.size(tokens("text")).cast("bigint").alias("_n")
    ).groupBy(group_col).agg(F.sum("_n").cast("bigint").alias("n_tokens"))
    tot = counts.agg(F.sum("n_tokens").cast("bigint").alias("_total"))
    scored = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_pa",
        F.round(
            F.pow(F.col("n_tokens").cast("double") / F.col("_total"), alpha),
            12,
        ).cast("decimal(18,12)"),
    )
    z = scored.agg(F.sum("_pa").alias("_z"))
    w_raw = F.col("_pa").cast("double") / F.col("_z").cast("double")
    out = scored.crossJoin(F.broadcast(z)).select(
        F.col(group_col),
        "n_tokens",
        # DECIMAL(38,0) products (the px13 convention) — token masses at
        # real scale can push an int64 *1e6 product over 2^63
        F.expr(
            "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000"
            " div _total AS BIGINT)"
        ).alias("share_ppm"),
        F.round(w_raw, 6).alias("weight"),
        F.floor(w_raw * F.lit(int(token_budget)))
        .cast("bigint")
        .alias("target_tokens"),
    )
    return out.withColumn(
        "epochs_ppm",
        F.expr(
            "CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000000"
            " div n_tokens AS BIGINT)"
        ),
    )


def source_overlap_matrix(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source shingle-overlap matrix (tx22) — which corpus sources
    duplicate each other: for every source pair, the Jaccard similarity
    (integer ppm) of their DISTINCT 3-gram shingle-type sets plus both
    containment directions. The corpus-level complement of tx12's
    doc-level contamination: run it before mixing sources to find
    wholesale mirrors (Jaccard high) and subset scrapes (one containment
    high, the other low).

    Returns one row per unordered pair ``(src_a < src_b)`` *with at
    least one shared shingle type* (fully disjoint pairs — jaccard 0 —
    are omitted; the inner join on shared hashes never sees them):
    ``(src_a, src_b, n_types_a, n_types_b, n_shared, jaccard_ppm,
    containment_a_ppm, containment_b_ppm)`` — all integer/ppm exact.

    Scale shape: one shingle pass collapsed to DISTINCT (source, hash)
    TYPES (the dedup.hashed_shingles int64 staging — strings never
    shuffle), one join on the uniform hash key to count shared types per
    pair, one broadcast of the |sources|-row type counts. Never a
    doc-level pair join; cost is O(types) + O(shared-type pairs).
    """
    from .dedup import hashed_shingles

    st = (
        hashed_shingles(docs.select(F.col(group_col).alias("_g"), "text"), "_g")
        .select("_g", F.explode("hs").alias("h"))
        .distinct()
        .persist()
    )
    try:
        counts = st.groupBy("_g").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types")
        )
        a, b = st.alias("a"), st.alias("b")
        shared = (
            a.join(
                b,
                (F.col("a.h") == F.col("b.h"))
                & (F.col("a._g") < F.col("b._g")),
            )
            .groupBy(
                F.col("a._g").alias("src_a"), F.col("b._g").alias("src_b")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        )
        ca = counts.select(
            F.col("_g").alias("src_a"), F.col("n_types").alias("n_types_a")
        )
        cb = counts.select(
            F.col("_g").alias("src_b"), F.col("n_types").alias("n_types_b")
        )
        out = (
            shared.join(F.broadcast(ca), "src_a")
            .join(F.broadcast(cb), "src_b")
            .select(
                "src_a",
                "src_b",
                "n_types_a",
                "n_types_b",
                "n_shared",
                # DECIMAL(38,0) products (the px13/px18 convention) —
                # type counts at real scale push an int64 *1e6 over 2^63
                F.expr(
                    "CAST(CAST(n_shared AS DECIMAL(38,0)) * 1000000"
                    " div (n_types_a + n_types_b - n_shared) AS BIGINT)"
                ).alias("jaccard_ppm"),
                F.expr(
                    "CAST(CAST(n_shared AS DECIMAL(38,0)) * 1000000"
                    " div n_types_a AS BIGINT)"
                ).alias("containment_a_ppm"),
                F.expr(
                    "CAST(CAST(n_shared AS DECIMAL(38,0)) * 1000000"
                    " div n_types_b AS BIGINT)"
                ).alias("containment_b_ppm"),
            )
        )
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        st.unpersist()


# ---------------------------------------------------------------------------
# Feature hashing (the "hashing trick", Weinberger et al. 2009) — the
# dictionary-free featurizer in front of linear text classifiers
# (fastText-style quality/language classifiers trained over corpus-scale
# data): token -> md5-32 -> mod 2^k feature id. No vocabulary build, no
# dictionary broadcast, fixed feature width at any corpus size — which
# is exactly why it is the 100 TB featurizer: the alternative
# (a fitted vocabulary) is a corpus-wide distinct + a giant broadcast.
# ---------------------------------------------------------------------------
def hashed_tf_features(
    docs: DataFrame, n_features: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """Sparse hashed term-frequency vectors: one row per (doc, feature)
    with the collision-folded token count — ``feature_id =
    md5_32(token) mod n_features`` (hash collisions ARE the method's
    documented lossiness; the md5-32 contract is shared with the oracle).

    Scale shape: one explode + ONE (id, feature)-keyed groupBy — partial
    aggregation combines map-side, the single shuffle carries at most
    n_docs x n_features rows, and there is NO vocabulary state of any
    kind. n_features is the only memory knob (2^18-2^22 in production
    linear classifiers)."""
    from ..functions.hashing import md5_hash32

    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    t = docs.select(F.col(id_col), F.explode(tokens("text")).alias("tok"))
    return (
        t.select(
            id_col,
            (md5_hash32(F.col("tok")) % n_features).cast("int").alias(
                "feature_id"
            ),
        )
        .groupBy(id_col, "feature_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


def hashed_linear_score(
    docs: DataFrame,
    n_features: int = 1024,
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a linear model over the hashed features — the serving half
    of the hashing-trick classifier (px14 scores hand-built features;
    this scores the dictionary-free hashed space). Weights are a
    deterministic integer function of the feature id (Knuth
    multiplicative hash folded to [-1000, 1000]), standing in for a
    trained coefficient vector with the same storage shape: w IS a
    lookup on feature_id, so a real trained model drops in as a
    broadcast join or literal array without changing the plan.

    Returns ``(id, n_feats, tf_total, score)`` — score = Σ tf·w(f),
    all-integer, so both engines agree exactly.

    Scale shape: the tx23 aggregate + one per-row integer expression +
    one id-keyed re-aggregate; weights never materialize as state."""
    f = hashed_tf_features(docs, n_features, id_col)
    w = (F.pmod(F.col("feature_id").cast("bigint") * 2654435761, F.lit(2001))
         - 1000)
    return (
        f.select(id_col, "feature_id", "tf", (F.col("tf") * w).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_feats"),
            F.sum("tf").cast("bigint").alias("tf_total"),
            F.sum("_c").cast("bigint").alias("score"),
        )
    )


def hashed_tfidf_features(
    docs: DataFrame, n_features: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """Hashed TF-IDF featurizer (tx28) — tx23's dictionary-free hashed
    TF vectors weighted by inverse document frequency over the SAME
    hashed feature space (df counts collision-folded exactly like tf:
    the hash is the contract, its lossiness is the method's documented
    tradeoff). Completes the hashing-trick featurizer pair: tx23 feeds
    counts-based models, this feeds the retrieval/linear-classifier
    stacks that want idf damping — with still NO vocabulary state.

    idf = round(log2(1 + N/df), 6) (the tx15/tx26 cross-engine float
    recipe: log2 is the only libm call, rounded before use); tfidf =
    round(tf · idf, 6). Per-row values only — nothing float is ever
    summed, so no decimal-sum staging is needed.

    Scale shape: the tx23 aggregate + ONE feature-keyed window (the
    shuffle carries (doc, feature) rows, ≤ n_docs × n_features) + a
    1-row N broadcast. n_features stays the only memory knob."""
    from pyspark.sql import Window

    f = hashed_tf_features(docs, n_features, id_col)
    nd = (
        f.select(id_col)
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    wdf = Window.partitionBy("feature_id")
    return (
        f.withColumn("df", F.count(F.lit(1)).over(wdf).cast("bigint"))
        .crossJoin(F.broadcast(nd))
        .select(
            F.col(id_col),
            "feature_id",
            "tf",
            "df",
            F.expr(
                "CAST(round(CAST(tf AS DOUBLE)"
                " * round(log2(1 + CAST(n_docs AS DOUBLE)"
                " / CAST(df AS DOUBLE)), 6), 6) AS DOUBLE)"
            ).alias("tfidf"),
        )
    )


# The sanitize mapping: NFKC-lite normalizations every LLM ingest runs
# before tokenization (ftfy/CCNet-style), expressed as ONE translate()
# table + one whitespace-collapse regex so it stays a single JVM-side
# projection (no UDF) and is reproducible verbatim in any engine with
# PostgreSQL translate semantics.
#   - fullwidth ASCII (U+FF01-FF5E) -> ASCII (letters/digits/punct)
#   - curly quotes/dashes/ellipsis -> straight ASCII equivalents
#   - NBSP / ideographic space -> plain space
#   - zero-width chars (ZWSP/ZWNJ/ZWJ/BOM) and C0 controls (except
#     \t \n) -> deleted (translate's shorter-replacement deletion rule)
_FULLWIDTH_SRC = "".join(chr(c) for c in range(0xFF01, 0xFF5F))
_FULLWIDTH_DST = "".join(chr(c) for c in range(0x21, 0x7F))
_PUNCT_SRC = "‘’“”–—… 　"
_PUNCT_DST = "''\"\"--.  "  # ellipsis -> '.', NBSP + ideographic -> space
_DELETE_SRC = "​‌‍﻿" + "".join(
    chr(c) for c in range(0x00, 0x20) if chr(c) not in "\t\n"
)
SANITIZE_SRC = _FULLWIDTH_SRC + _PUNCT_SRC + _DELETE_SRC
SANITIZE_DST = _FULLWIDTH_DST + _PUNCT_DST


def sanitize_unicode(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode sanitization pass (tx25) — the pre-tokenization cleanup of
    a real ingest (fullwidth→ASCII, curly punctuation→straight,
    NBSP/ideographic space→space, zero-width + C0 controls stripped,
    whitespace runs collapsed, trimmed). ONE translate() over a
    module-level mapping table plus one ``[ \\t\\n]+`` collapse — stays
    inside whole-stage codegen, no per-row Python, and the mapping is an
    inspectable constant (SANITIZE_SRC/DST) rather than logic.

    Returns ``(id, text_clean, n_chars_before, n_chars_after, changed)``
    — codepoint counts, so the delta is exactly the deleted characters
    plus collapsed whitespace. Scale: a projection; cost is one scan."""
    cleaned = F.trim(
        F.regexp_replace(
            F.translate(F.col(text_col), SANITIZE_SRC, SANITIZE_DST),
            "[ \t\n]+",
            " ",
        )
    )
    return docs.select(
        F.col(id_col),
        cleaned.alias("text_clean"),
        F.length(text_col).cast("bigint").alias("n_chars_before"),
        F.length(cleaned).cast("bigint").alias("n_chars_after"),
        (cleaned != F.col(text_col)).alias("changed"),
    )


# BM25 per-(doc, term) contribution — ONE expression string shared
# verbatim by the Spark plan (F.expr) and the DuckDB oracle, over
# identically-named columns (tf, df, dl, n_docs, total_dl), so every
# float op (idf's log2, the length-normalized tf saturation) is evaluated
# through the same parse tree on both engines. Cross-engine exactness
# contract (the tx15/dd16 recipe):
#   - log2 is the ONLY libm call; it is rounded to 6 decimals BEFORE use
#     (proven stable in tx15's surprisal oracle);
#   - every constant is spelled identically on both sides (2.2 = k1+1,
#     1.2 = k1, 0.25 = 1-b, 0.75 = b — the Okapi defaults; 0.25/0.75 are
#     binary-exact, 2.2/1.2 parse to the same double under both engines'
#     correctly-rounded decimal->double literal conversion);
#   - the final per-(doc,term) value is rounded to 6 decimals and summed
#     as DECIMAL, so the per-doc aggregate is order-independent.
BM25_CONTRIB_EXPR = (
    "CAST(round("
    "round(log2(1 + (CAST(n_docs - df AS DOUBLE) + 0.5)"
    " / (CAST(df AS DOUBLE) + 0.5)), 6)"
    " * ((CAST(tf AS DOUBLE) * 2.2)"
    " / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75"
    " * (CAST(dl AS DOUBLE) / (CAST(total_dl AS DOUBLE)"
    " / CAST(n_docs AS DOUBLE))))))"
    ", 6) AS DECIMAL(12,6))"
)


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval (tx26) — Robertson/Spärck Jones Okapi BM25
    (k1=1.2, b=0.75) of every document against a bag of query terms: the
    classical lexical ranker (and the usual hybrid-retrieval partner of
    the ss* dense searches; the reference has no retrieval at all — its
    scope ends at CDC ingest, README.md:53). idf = log2(1 + (N-df+0.5)/
    (df+0.5)) (the +1 'plus' form, always positive), tf saturates at k1
    and is length-normalized by b against the corpus mean doc length.

    Plan shape: ONE tokenize-explode — dl rides along as a projected
    column (size of the staged token array), so tf needs NO join back to
    a per-doc side (at scale that side is O(N docs); a first plan-audit
    draft let Catalyst broadcast it — wrong at 100 TB); df is a window
    count over the postings themselves (no second scan — a naive
    ``tf.groupBy(term)`` re-executes the whole explode lineage); the
    (N, total_dl) corpus stats are a 1-row aggregate over a
    projection-only second scan (no explode), broadcast. Shuffles: the
    (doc,term) groupBy and the term-window over |postings of the query
    terms| only — the classical inverted-index cost, never all-terms.

    Returns ``(rank, doc_id, n_terms_hit, bm25)``, top_n by (score DESC,
    doc_id) — ties broken on the DECIMAL score, so ranking is exact."""
    from pyspark.sql import Window

    staged = docs.select(F.col(id_col), tokens(text_col).alias("arr"))
    toks = staged.select(
        F.col(id_col),
        F.size("arr").cast("bigint").alias("dl"),
        F.explode("arr").alias("term"),
    )
    stats = staged.select(F.size("arr").cast("bigint").alias("dl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
    )
    tf = (
        toks.filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.max("dl").alias("dl"),  # constant per doc
        )
    )
    wdf = Window.partitionBy("term")
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(wdf).cast("bigint")
        )
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.expr(BM25_CONTRIB_EXPR).alias("contrib"))
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("contrib").alias("bm25_dec"),
        F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
    )
    # VERDICT r11 #2: TakeOrdered top-n, not a global row_number window —
    # at scale "every doc containing any query term" is unbounded.
    return (
        ranked_top_n(agg, [F.col("bm25_dec").desc(), F.col(id_col)], top_n)
        .select(
            "rank",
            F.col(id_col),
            "n_terms_hit",
            F.col("bm25_dec").cast("double").alias("bm25"),
        )
    )


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of ``md5_hash32(term) % n_buckets`` — which index
    bucket a query term's postings live in, computed WITHOUT a cluster
    job (md5 is md5; both sides take the first 8 hex digits)."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def build_bm25_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    folded_epochs: tuple[int, ...] = (),
) -> dict:
    """Materialize the BM25 inverted index (tx29, VERDICT r11 #4): the
    (term → postings) table every retrieval pipeline ships, so repeated
    queries cost O(postings of the query terms) instead of tx26's
    re-tokenize-the-corpus scan.

    Layout: ``(term, doc_id, tf, dl)`` postings written partitioned by
    ``bucket = md5_hash32(term) % n_buckets`` — one directory per bucket
    (NOT per term: a 100 TB corpus has billions of distinct terms; 64-4096
    hash buckets keep directory listings bounded while a probe still
    prunes to ≤|query| buckets at the FILE level). A term's postings are
    entirely inside one bucket, so per-term df can be recounted from the
    pruned scan alone. Corpus stats (n_docs, total_dl — the BM25 length
    normalizer) go in a ``_bm25_meta.json`` sidecar; both are exact
    integers, so a probe reproduces tx26's DECIMAL scores bit-for-bit
    (contract test: tx29 shares tx26's oracle verbatim).

    Build cost: one tokenize-explode scan + one (term, doc) groupBy — the
    same shuffle tx26 pays PER QUERY, paid once.

    INCREMENTAL layout (r13): postings live under an ``epoch=N``
    partition prefix so ``append_bm25_index`` can add documents later
    without re-tokenizing the corpus; the sidecar carries per-epoch
    n_docs/total_dl plus the cumulative totals the probe scores with,
    and ``committed_epochs`` is the commit record (sidecar-last — a
    crashed append's files are invisible to probes). Bucket pruning is
    unchanged: partition columns prune independently, and a term's
    postings still all share one bucket VALUE across every epoch."""
    from ..functions.hashing import md5_hash32

    staged = docs.select(F.col(id_col), tokens(text_col).alias("arr"))
    post = _bm25_postings(staged, id_col, n_buckets, md5_hash32)
    # repartition ON the partition column first: without it every writer
    # task can emit a file into every bucket directory (n_tasks × n_buckets
    # small files — the gate-store lesson applied here too)
    post.withColumn("epoch", F.lit(0)).repartition(
        F.col("bucket")
    ).write.mode("overwrite").partitionBy("epoch", "bucket").parquet(path)
    meta = {
        "n_buckets": int(n_buckets),
        "id_col": id_col,
        # stats from the written postings + a pruned count — no second
        # tokenize scan (r13; see _bm25_epoch_stats_from_index)
        "epochs": {
            "0": _bm25_epoch_stats_from_index(docs.sparkSession, path, 0, staged)
        },
        # appender epochs whose data this build already contains — a
        # replayed append with one of these ids must no-op (the
        # streaming sync passes its building micro-batch's epoch id
        # here so a crash-replay of that batch cannot double-insert)
        "folded_epochs": sorted(int(e) for e in folded_epochs),
    }
    _write_bm25_meta(docs.sparkSession, path, meta)
    return meta


def _bm25_postings(staged, id_col: str, n_buckets: int, md5_hash32):
    toks = staged.select(
        F.col(id_col),
        F.size("arr").cast("bigint").alias("dl"),
        F.explode("arr").alias("term"),
    )
    return (
        toks.groupBy("term", id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.max("dl").alias("dl"),  # constant per doc
        )
        .withColumn("bucket", F.pmod(md5_hash32(F.col("term")), F.lit(n_buckets)))
    )


def _bm25_epoch_stats_from_index(spark, path: str, epoch: int, staged) -> dict:
    """Epoch corpus stats WITHOUT a second tokenize scan (r13, guide
    §1.2/§2.3): the old ``_bm25_epoch_stats(staged)`` aggregate re-ran
    ``tokens()`` over the whole corpus — the build's dominant cost paid
    twice. Instead: ``n_docs`` is a column-pruned count (Catalyst prunes
    the deterministic ``tokens()`` projection under ``count(1)``, so no
    text is read), and ``total_dl`` is Σ tf over the postings just
    written — exact, because every token instance lands in exactly one
    (term, doc) posting, so Σ tf == Σ size(arr) including the empty- and
    null-text edge cases (both contribute 0 to both sides). The explicit
    tf-only schema keeps the read-back cheap and safe on an empty index
    (no postings files → empty frame → 0, which IS the true total)."""
    n_docs = staged.count()
    tf_sum = (
        spark.read.schema("tf BIGINT, epoch INT")
        .parquet(path)
        .filter(F.col("epoch") == int(epoch))
        .agg(F.sum("tf").alias("s"))
        .collect()[0]["s"]
    )
    return {"n_docs": int(n_docs), "total_dl": int(tf_sum or 0)}


def _write_bm25_meta(spark, path: str, meta: dict) -> None:
    """Cumulative totals + commit record, written atomically through the
    Hadoop FS (remote-store safe — the ADVICE r12 gate-meta lesson)."""
    import json

    from ..streaming.fsio import write_text_atomic

    eps = meta["epochs"]
    meta["committed_epochs"] = sorted(int(e) for e in eps)
    meta.setdefault("folded_epochs", [])
    # tombstones (delete_from_bm25_index): cumulative corpus stats are
    # NET of committed deletions — probes score with the post-delete
    # n_docs/avgdl, exactly what a rebuild on the surviving docs would
    # use (the delete-equals-rebuild contract).
    tombs = meta.setdefault("tombstones", {})
    meta["tombstone_epochs"] = sorted(int(e) for e in tombs)
    meta.setdefault("folded_tombstone_epochs", [])
    meta["n_docs"] = sum(e["n_docs"] for e in eps.values()) - sum(
        t["n_docs"] for t in tombs.values()
    )
    meta["total_dl"] = sum(e["total_dl"] for e in eps.values()) - sum(
        t["total_dl"] for t in tombs.values()
    )
    write_text_atomic(spark, f"{path}/_bm25_meta.json", json.dumps(meta))


def _read_bm25_meta(spark, path: str) -> dict:
    import json

    from ..streaming.fsio import read_text

    txt = read_text(spark, f"{path}/_bm25_meta.json")
    if txt is None:
        raise FileNotFoundError(f"no _bm25_meta.json under {path}")
    return json.loads(txt)


def append_bm25_index(
    new_docs: DataFrame, path: str, epoch: int, text_col: str = "text"
) -> dict:
    """Add a batch of documents to a materialized BM25 postings index
    WITHOUT re-tokenizing the corpus — index freshness as an O(batch)
    operation (the build's tokenize shuffle runs over the NEW docs only;
    at 100 TB a per-ingest rebuild is the thing this avoids).

    Contract: ``doc_id``s must be NEW (append-only — the training-corpus
    regime; updating a doc needs delete + rebuild/compaction). BM25's
    corpus statistics are pure sums (n_docs, total_dl, per-term df
    recounted from the pruned scan at probe time), so a probe over
    build(A) + append(B) is BIT-IDENTICAL to build(A ∪ B) — pinned in
    tests. EXACTLY-ONCE by replay convergence: the batch's postings land
    under ``epoch=N`` via dynamic partition overwrite (a replay
    overwrites only its own files), and the sidecar — rewritten last,
    atomically — is the commit point; ``bm25_index_topk`` scans
    committed epochs only, so a crashed append is invisible.

    Returns the updated meta."""
    from ..functions.hashing import md5_hash32

    spark = new_docs.sparkSession
    if int(epoch) < 0:
        raise ValueError(
            f"appender epochs must be >= 0 (negative ids are the "
            f"compaction namespace), got {epoch}"
        )
    meta = _read_bm25_meta(spark, path)
    if str(epoch) in meta["epochs"] or int(epoch) in meta.get(
        "folded_epochs", []
    ):
        # replay of a committed epoch — possibly one compaction has
        # since folded away — is an idempotent no-op either way
        return meta
    id_col, n_buckets = meta["id_col"], meta["n_buckets"]
    staged = new_docs.select(F.col(id_col), tokens(text_col).alias("arr"))
    post = _bm25_postings(staged, id_col, n_buckets, md5_hash32)
    post.withColumn("epoch", F.lit(int(epoch))).repartition(
        F.col("bucket")
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("epoch", "bucket").parquet(path)
    # no second tokenize of the batch (r13; see _bm25_epoch_stats_from_index)
    meta["epochs"][str(epoch)] = _bm25_epoch_stats_from_index(
        spark, path, int(epoch), staged
    )
    _write_bm25_meta(spark, path, meta)
    return meta


def _read_bm25_tombstones(spark, path: str, meta: dict):
    """Committed tombstoned doc ids as a 1-column frame, or None when the
    index has no committed deletions (the common case — probes then keep
    their exact pre-delete plan, no anti-join node at all)."""
    eps = sorted(int(e) for e in meta.get("tombstones", {}))
    if not eps:
        return None
    return (
        spark.read.parquet(f"{path}/_tombstones")
        .filter(F.col("epoch").isin(eps))
        .select(meta["id_col"])
        .distinct()
    )


def delete_from_bm25_index(
    spark, path: str, doc_ids: DataFrame, epoch: int
) -> dict:
    """Delete documents from a materialized BM25 postings index WITHOUT
    a rebuild — the missing lifecycle piece next to append/compact (and
    the index-side half of px23's right-to-be-forgotten: a table delete
    that leaves the serving index still ranking the forgotten doc has
    not forgotten it). Tombstone design, the LSM idiom:

    - the batch's NET-NEW ids (minus anything already tombstoned, so a
      double delete subtracts nothing twice) land as parquet under
      ``{path}/_tombstones/epoch=N`` — the underscore prefix keeps them
      out of the postings scan's file listing entirely;
    - corpus stats for the removed docs — (n_docs, total_dl), read from
      the INDEX itself (one semi-join scan per delete batch; dl is a
      column of every posting, so no corpus access is needed) — are
      recorded per tombstone epoch in the sidecar, whose rewrite is the
      commit point: cumulative n_docs/total_dl go NET, and probes
      anti-join the committed tombstone ids while recounting df from
      the surviving postings, which is EXACTLY the ranking a rebuild on
      the surviving corpus produces (delete-equals-rebuild, pinned in
      tests and by the tx30 oracle);
    - physical space is reclaimed by ``compact_bm25_index``, which
      drops tombstoned rows during the fold and clears the tombstone
      list (``folded_tombstone_epochs`` remembers absorbed delete
      epochs so a replayed delete no-ops).

    Crash-safe by replay: files-then-sidecar — a crashed delete's
    tombstone files are invisible (probes read committed tombstone
    epochs only) and its replay overwrites them. Tombstone epoch ids
    are their own namespace (>= 0, disjoint from appender ids by
    bookkeeping, not by value). A tombstoned doc_id must not be
    re-appended before a compaction has cleared it — the anti-join
    would hide the new rows too (documented, same family as the
    append-only id contract)."""
    if int(epoch) < 0:
        raise ValueError(f"delete epochs must be >= 0, got {epoch}")
    meta = _read_bm25_meta(spark, path)
    if str(epoch) in meta.get("tombstones", {}) or int(epoch) in meta.get(
        "folded_tombstone_epochs", []
    ):
        return meta  # replay of a committed (possibly folded) delete
    id_col = meta["id_col"]
    ids = doc_ids.select(
        F.col(doc_ids.columns[0]).cast("bigint").alias(id_col)
    ).distinct()
    prev = _read_bm25_tombstones(spark, path, meta)
    if prev is not None:
        ids = ids.join(prev, id_col, "left_anti")
    # stats of the net-new deleted docs, from the index (ground truth):
    # dl is constant per doc across its postings rows
    gone = (
        spark.read.parquet(path)
        .filter(F.col("epoch").isin(meta["committed_epochs"]))
        .join(F.broadcast(ids), id_col, "left_semi")
        .select(id_col, "dl")
        .distinct()
    )
    row = gone.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("dl"),
    ).collect()[0]
    ids.repartition(1).write.mode("overwrite").parquet(
        f"{path}/_tombstones/epoch={int(epoch)}"
    )
    meta.setdefault("tombstones", {})[str(epoch)] = {
        "n_docs": int(row["n"]),
        "total_dl": int(row["dl"] or 0),
    }
    _write_bm25_meta(spark, path, meta)
    return meta


def bm25_index_topk(
    spark,
    path: str,
    query_terms: list[str],
    top_n: int = 20,
) -> DataFrame:
    """BM25 retrieval over a materialized postings index — same ranking
    contract as ``bm25_rank`` (identical tf/dl/df integers, the same
    ``BM25_CONTRIB_EXPR`` float parse tree, sidecar n_docs/total_dl as
    constant-folded literals), so the two paths hash-match.

    Plan shape: the scan lists ONLY the ≤|query_terms| buckets the terms
    hash to (``term_bucket`` is the driver-side md5 twin — no cluster job
    to plan the probe), filters to the exact terms, recounts df per term
    over that pruned frame, scores, and takes the top-n via the
    TakeOrdered house helper. No corpus-wide work anywhere: cost is
    O(postings of the query terms), the inverted-index promise."""
    from pyspark.sql import Window

    meta = _read_bm25_meta(spark, path)
    id_col = meta["id_col"]
    buckets = sorted({term_bucket(t, meta["n_buckets"]) for t in query_terms})
    post = (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(buckets))
        # committed epochs only: a crashed append's files are invisible
        .filter(F.col("epoch").isin(meta["committed_epochs"]))
        .filter(F.col("term").isin(list(query_terms)))
    )
    # committed deletions: drop tombstoned docs BEFORE the df recount, so
    # idf and the sidecar's net n_docs/avgdl agree with a rebuild on the
    # surviving corpus (delete-equals-rebuild); broadcast — tombstone
    # sets are small next to the corpus, and absent entirely (no extra
    # plan node) on an index with no deletes
    tomb = _read_bm25_tombstones(spark, path, meta)
    if tomb is not None:
        post = post.join(F.broadcast(tomb), id_col, "left_anti")
    wdf = Window.partitionBy("term")
    scored = (
        post.withColumn("df", F.count(F.lit(1)).over(wdf).cast("bigint"))
        .withColumn("n_docs", F.lit(meta["n_docs"]).cast("bigint"))
        .withColumn("total_dl", F.lit(meta["total_dl"]).cast("bigint"))
        .select(F.col(id_col), F.expr(BM25_CONTRIB_EXPR).alias("contrib"))
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("contrib").alias("bm25_dec"),
        F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
    )
    return (
        ranked_top_n(agg, [F.col("bm25_dec").desc(), F.col(id_col)], top_n)
        .select(
            "rank",
            F.col(id_col),
            "n_terms_hit",
            F.col("bm25_dec").cast("double").alias("bm25"),
        )
    )


# The 8-word stopword-presence list of the Gopher/MassiveText quality
# rules (Rae et al. 2021, table A1's "stop word" heuristic) — shared
# with the tx27 oracle.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, min_stops: int = 2) -> DataFrame:
    """Gopher/MassiveText quality rules (tx27 — Rae et al. 2021 appendix
    A1, the heuristic filter battery most open corpora replicate): per
    document, a named PASS/FAIL flag per rule plus the overall verdict —
    unlike tx02's composite score, this is the auditable rule-by-rule
    face (which rule killed the doc matters when tuning a corpus).

    Rules (every threshold an INTEGER cross-multiplication — no
    division, so both engines compare exactly):
      - word_count_ok:  50 ≤ n_words ≤ 100000
      - mean_len_ok:    3 ≤ mean word length ≤ 10
                        (3·n_words ≤ Σ len(word) ≤ 10·n_words)
      - symbol_ok:      (#hash + #ellipsis) / words ≤ 0.1
      - alpha_ok:       ≥ 80% of words contain an alphabetic char
      - bullet_ok:      < 90% of lines start with a bullet
      - ellipsis_ok:    < 30% of lines end with an ellipsis
      - stopword_ok:    ≥ ``min_stops`` distinct words from the 8-word
                        stop list (paper default 2; the synthetic
                        fixture's ~54-word docs carry at most one, so
                        the oracled query pins 1 — same rule, scaled
                        threshold, documented rather than silently
                        always-False)

    Scale: a single-scan projection of array expressions — no shuffle,
    no UDF; the rule battery runs inside whole-stage codegen."""
    arr = tokens("text")
    docs = docs.select("doc_id", "text").withColumn("arr", arr)
    n_words = F.size("arr").cast("bigint")
    sum_chars = F.expr(
        "aggregate(transform(arr, x -> CAST(length(x) AS BIGINT)),"
        " CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    n_hash = F.length("text") - F.length(F.expr("replace(text, '#', '')"))
    n_ellipsis = (
        F.length("text") - F.length(F.expr("replace(text, '...', '')"))
    ) / 3
    n_sym = (n_hash + n_ellipsis).cast("bigint")
    n_alpha = F.expr(
        "size(filter(arr, x -> x rlike '[A-Za-z]'))"
    ).cast("bigint")
    lines = F.expr("split(text, '\n')")
    n_lines = F.size(lines).cast("bigint")
    n_bullet = F.expr(
        "size(filter(split(text, '\n'),"
        " x -> ltrim(x) LIKE '-%' OR ltrim(x) LIKE '*%'))"
    ).cast("bigint")
    n_ell_lines = F.expr(
        "size(filter(split(text, '\n'), x -> rtrim(x) LIKE '%...'))"
    ).cast("bigint")
    stops_sql = ", ".join(f"'{s}'" for s in GOPHER_STOPS)
    n_stops = F.expr(
        "size(array_intersect(array_distinct(transform(arr, x -> lower(x))),"
        f" array({stops_sql})))"
    ).cast("bigint")
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        ((F.lit(50) <= n_words) & (n_words <= 100000)).alias("word_count_ok"),
        (
            (3 * n_words <= sum_chars) & (sum_chars <= 10 * n_words)
        ).alias("mean_len_ok"),
        (10 * n_sym <= n_words).alias("symbol_ok"),
        (5 * n_alpha >= 4 * n_words).alias("alpha_ok"),
        (10 * n_bullet < 9 * n_lines).alias("bullet_ok"),
        (10 * n_ell_lines < 3 * n_lines).alias("ellipsis_ok"),
        (n_stops >= min_stops).alias("stopword_ok"),
    )
    flags = [
        "word_count_ok", "mean_len_ok", "symbol_ok", "alpha_ok",
        "bullet_ok", "ellipsis_ok", "stopword_ok",
    ]
    passed = F.lit(True)
    for f in flags:
        passed = passed & F.col(f)
    return out.withColumn("passed", passed)


def compact_bm25_index(spark, path: str) -> dict:
    """Fold an appended postings index back to ONE epoch — the lifecycle
    step after many ``append_bm25_index`` batches (epoch dirs and small
    files accumulate per append; compaction resets both without the
    build's tokenize shuffle — one bucket-pruned scan + one repartition
    write, layout.compact_epoch_partitions). Probe results are
    BIT-UNCHANGED (postings rows and sidecar sums are preserved; pinned
    in tests). Crash-safe by replay: data folds into a fresh epoch via
    staging+rename, the sidecar rewrite is the commit point, folded
    epoch dirs are deleted last (a crash anywhere re-runs clean)."""
    from .layout import cleanup_foreign_epochs, compact_epoch_partitions

    from ..streaming.fsio import delete_dir

    meta = _read_bm25_meta(spark, path)
    committed = meta["committed_epochs"]
    tombs = meta.get("tombstones", {})
    if len(committed) == 1 and not tombs:
        cleanup_foreign_epochs(spark, path, committed)
        return meta
    # cumulative stats are already NET of committed deletions, so the
    # folded epoch's stats equal a rebuild on the surviving corpus
    folded = {"n_docs": meta["n_docs"], "total_dl": meta["total_dl"]}
    tomb_ids = _read_bm25_tombstones(spark, path, meta)
    new_epoch = compact_epoch_partitions(
        spark,
        path,
        committed,
        ("bucket",),
        "bucket",
        exclude_ids=tomb_ids,
        exclude_col=meta["id_col"],
    )
    meta2 = {
        "n_buckets": meta["n_buckets"],
        "id_col": meta["id_col"],
        "epochs": {str(new_epoch): folded},
        # remember every appender (>= 0) epoch this fold absorbed, plus
        # whatever earlier folds absorbed — a replayed append with a
        # folded id must no-op, not double-insert
        "folded_epochs": sorted(
            set(meta.get("folded_epochs", []))
            | {e for e in committed if e >= 0}
        ),
        # the fold PHYSICALLY dropped every tombstoned row, so the
        # tombstone list resets; absorbed delete-epoch ids are
        # remembered so a replayed delete no-ops instead of re-deleting
        "folded_tombstone_epochs": sorted(
            set(meta.get("folded_tombstone_epochs", []))
            | {int(e) for e in tombs}
        ),
    }
    _write_bm25_meta(spark, path, meta2)
    cleanup_foreign_epochs(spark, path, meta2["committed_epochs"])
    delete_dir(spark, f"{path}/_tombstones")  # after the sidecar commit
    return meta2

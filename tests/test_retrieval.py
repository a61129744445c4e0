"""Positional inverted index + phrase search: posting tf/first-position
values, adjacent-pair derivation (no cross-word-boundary grams), the
deterministic top-bigram choice, and multi-match counting — on a corpus
where every posting is derivable by eye."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.operators.retrieval import (
    phrase_search,
    posting_lists,
)

DOCS = [
    (0, "to be or not to be"),  # "to be" twice
    (1, "not to be"),  # "to be" once
    (2, "or not"),  # no "to be"
    (3, "be"),  # single word: postings yes, pairs none
]
# bigram counts: "to be"=3, "not to"=2, "or not"=2, "be or"=1, "not to"...
# top = ("to", "be") by count; no tie to break here, and the tie-break
# ordering itself is pinned by the count assertions below.


@pytest.fixture(scope="module")
def retr_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("retr")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    return str(path)


def test_posting_lists_tf_and_positions(spark, retr_dir):
    posts = {
        (r["term"], r["doc_id"]): (r["tf"], r["first_pos"])
        for r in posting_lists(spark, retr_dir).collect()
    }
    assert posts[("to", 0)] == (2, 0)
    assert posts[("be", 0)] == (2, 1)
    assert posts[("or", 0)] == (1, 2)
    assert posts[("not", 0)] == (1, 3)
    assert posts[("to", 1)] == (1, 1)
    assert posts[("be", 3)] == (1, 0)
    # no term leaks across documents
    assert ("to", 2) not in posts and ("to", 3) not in posts
    # distinct (term, doc) postings: doc0 {to,be,or,not}=4, doc1 3,
    # doc2 2, doc3 1 → 10 (doc 0's repeated "to"/"be" collapse into one)
    assert len(posts) == 10


def test_phrase_search_picks_top_bigram_and_counts_matches(spark, retr_dir):
    rows = {
        r["doc_id"]: (r["phrase"], r["n_matches"])
        for r in phrase_search(spark, retr_dir).collect()
    }
    # "to be" (count 3) beats "not to"/"or not" (2); doc 2 has no match
    assert rows == {0: ("to be", 2), 1: ("to be", 1)}


def test_posting_build_is_single_shuffle_pruned_scan(spark, retr_dir):
    from pulsar_topic_deduplicator_spark.plans import (
        count_exchanges,
        formatted_plan,
        read_schema_columns,
    )

    df = posting_lists(spark, retr_dir)
    # tokenize → partial agg → ONE exchange → final agg
    assert count_exchanges(df) == 1, formatted_plan(df)[:2000]
    # only the two needed columns reach the scan
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"doc_id", "text"}, cols


def test_pmi_ranks_planted_collocation_first(spark):
    """A pair that ALWAYS co-occurs ('new york', 5x) must out-PMI a pair
    of frequent-but-independent words; the nanonat score of the perfect
    collocation is ln(N / c) · 1e9 exactly."""
    import math

    from pulsar_topic_deduplicator_spark.operators.classify import _nanonat_ln  # noqa: F401
    from pulsar_topic_deduplicator_spark.operators.retrieval import (
        PMI_MIN_COUNT,
        pmi_collocations,
    )

    assert PMI_MIN_COUNT == 5
    filler = " ".join(["the cat sat on the mat"] * 5)
    rows = [(1, f"new york {filler}"), (2, f"new york {filler}"),
            (3, f"new york {filler}"), (4, f"new york {filler}"),
            (5, f"new york {filler}")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import pulsar_topic_deduplicator_spark.operators.retrieval as R
    import pulsar_topic_deduplicator_spark.sources.io as io_mod

    orig = io_mod.load_table
    try:
        io_mod_load = lambda spark_, sf_dir_, name_: docs  # noqa: E731
        R.load_table = io_mod_load
        out = pmi_collocations(spark, "ignored").collect()
    finally:
        R.load_table = orig
    by_pair = {(r["w1"], r["w2"]): r for r in out}
    assert ("new", "york") in by_pair
    ny = by_pair[("new", "york")]
    top = out[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    # perfect collocation: c_xy = c_x = c_y = 5 ⇒ pmi = ln(N/5)
    n_total = sum(
        len(t.split()) - 1 for _, t in rows
    )
    assert ny["pmi_nanonats"] == round(math.log(n_total / 5) * 1e9)

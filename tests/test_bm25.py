"""BM25 ranking invariants (`operators/textops.py::bm25_rank`) — oracle
parity is covered by test_oracle_parity; these pin the retrieval
semantics parity can't state."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.operators.textops import (
    BM25_QUERY,
    bm25_rank,
)
from pulsar_topic_deduplicator_spark.sources.io import load_table


def test_bm25_ranks_only_matching_docs_positively(spark, sf_dir):
    rows = bm25_rank(spark, sf_dir).collect()
    assert rows
    scores = [r["bm25"] for r in rows]
    # non-increasing down the ranking, and strictly positive: the
    # Lucene-style IDF is non-negative and only matching docs participate
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    q = set(BM25_QUERY)
    for r in rows:
        assert set(texts[r["doc_id"]].split(" ")) & q


def test_bm25_more_hits_beats_fewer_at_equal_length(spark, sf_dir):
    """Synthetic head-to-head: with equal doc length, a doc with strictly
    more query-term occurrences (every term) must outscore one with
    fewer — monotonicity in tf with all else equal."""
    from pyspark.sql import Row

    filler = "zzz"
    q = list(BM25_QUERY)
    heavy = " ".join(q * 4 + [filler] * 8)  # 12 hits, 20 words
    light = " ".join(q * 1 + [filler] * 17)  # 3 hits, 20 words
    none = " ".join([filler] * 20)
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=heavy, lang="en", source="s", n_chars=len(heavy)),
            Row(doc_id=2, text=light, lang="en", source="s", n_chars=len(light)),
            Row(doc_id=3, text=none, lang="en", source="s", n_chars=len(none)),
        ]
    )
    import tempfile

    d = tempfile.mkdtemp("bm25")
    docs.write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r["bm25"] for r in bm25_rank(spark, d).collect()}
    assert set(rows) == {1, 2}  # the term-free doc is excluded
    assert rows[1] > rows[2] > 0

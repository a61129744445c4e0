"""Span-tier dedup invariants: the exact (``dedup_paragraphs``) and fuzzy
(``near_dup_paragraphs``) paragraph operators must agree where their
semantics overlap — identical cross-span content is always LSH-discoverable
(identical signatures share every band), so every exact-duplicate span pair
with at least SHINGLE_N words must surface in the fuzzy tier at Jaccard 1."""

from __future__ import annotations


from pulsar_topic_deduplicator_spark.operators.neardup import (
    SHINGLE_N,
    near_dup_paragraphs,
)
from pulsar_topic_deduplicator_spark.operators.textops import (
    dedup_paragraphs,
    para_spans as _spans,
)


def test_exact_span_dups_surface_in_fuzzy_tier_at_jaccard_one(spark, sf_dir):
    spans = _spans(spark, sf_dir).collect()
    by_text: dict[str, list[tuple[int, int]]] = {}
    for r in spans:
        by_text.setdefault(r["para"], []).append((r["doc_id"], r["para_idx"]))
    exact_pairs = set()
    for text, keys in by_text.items():
        if len(keys) < 2 or len(text.split(" ")) < SHINGLE_N:
            continue
        keys.sort()
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                exact_pairs.add((*keys[i], *keys[j]))
    assert exact_pairs, "corpus has no exact duplicate spans — fixture too small"

    fuzzy = {
        (r["doc_a"], r["para_a"], r["doc_b"], r["para_b"]): r["jaccard"]
        for r in near_dup_paragraphs(spark, sf_dir).collect()
    }
    missing = exact_pairs - set(fuzzy)
    assert not missing, f"exact-dup span pairs absent from fuzzy tier: {missing}"
    for p in exact_pairs:
        assert fuzzy[p] == 1.0

    # cross-operator consistency: dedup_paragraphs must have DROPPED the
    # later member of every exact pair (it keeps only first occurrences)
    kept_counts = {
        r["doc_id"]: (r["n_paras"], r["n_paras_kept"])
        for r in dedup_paragraphs(spark, sf_dir).collect()
    }
    later_members = {(d, p) for (_, _, d, p) in exact_pairs}
    dropped_by_doc: dict[int, int] = {}
    for d, _ in later_members:
        dropped_by_doc[d] = dropped_by_doc.get(d, 0) + 1
    for d, n_dropped_min in dropped_by_doc.items():
        n_paras, n_kept = kept_counts[d]
        assert n_paras - n_kept >= n_dropped_min


def test_fuzzy_removal_contains_exact_removal(spark, sf_dir):
    """Every span the EXACT tier drops (identical earlier twin) with at
    least SHINGLE_N words must also be dropped by the FUZZY tier (identical
    spans are always LSH-discoverable at Jaccard 1), so per doc:
    fuzzy-kept ≤ exact-kept + (short dup spans the fuzzy tier cannot see)."""
    from pulsar_topic_deduplicator_spark.operators.neardup import (
        dedup_paragraphs_fuzzy,
    )

    spans = _spans(spark, sf_dir).collect()
    first_seen: dict[str, tuple[int, int]] = {}
    short_dups: dict[int, int] = {}
    for r in sorted(spans, key=lambda r: (r["doc_id"], r["para_idx"])):
        t = r["para"]
        if t in first_seen and len(t.split(" ")) < SHINGLE_N:
            short_dups[r["doc_id"]] = short_dups.get(r["doc_id"], 0) + 1
        first_seen.setdefault(t, (r["doc_id"], r["para_idx"]))

    exact = {
        r["doc_id"]: r["n_paras_kept"]
        for r in dedup_paragraphs(spark, sf_dir).collect()
    }
    fuzzy = {
        r["doc_id"]: (r["n_paras"], r["n_paras_kept"], r["cleaned_text"])
        for r in dedup_paragraphs_fuzzy(spark, sf_dir).collect()
    }
    assert set(exact) == set(fuzzy)
    for d, (n_paras, n_kept_fuzzy, cleaned) in fuzzy.items():
        assert n_kept_fuzzy <= exact[d] + short_dups.get(d, 0), d
        # reassembly self-consistency: cleaned text has exactly the kept spans
        if n_kept_fuzzy == n_paras:
            n_words = sum(1 for _ in cleaned.split(" "))
            orig = [r for r in spans if r["doc_id"] == d]
            assert n_words == sum(len(r["para"].split(" ")) for r in orig)


def test_packed_key_unpack_exact_at_documented_bound(spark, tmp_path):
    """Regression for the review-caught float-unpack bug: doc_ids near the
    documented _PARA_PACK validity bound (~9.2e12) pack to keys far above
    2^53, where float division rounds across the integer boundary and
    attributes pairs to the WRONG document. The integer-DIV unpack must
    agree with the DuckDB oracle exactly — and with ground truth."""
    import duckdb

    from pulsar_topic_deduplicator_spark.operators.neardup import (
        near_dup_paragraphs,
    )
    from tests.oracle_harness import compare
    import __spark_entry__ as entrymod

    big = 9_000_000_000_000  # near the documented doc_id bound
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (big, text, "en", "s", len(text)),
        (big + 1, text, "en", "s", len(text)),  # identical -> jaccard-1 pair
        (big + 2, "totally different words everywhere in this span here now",
         "en", "s", 58),
    ]
    d = str(tmp_path / "bigid")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    pairs = near_dup_paragraphs(spark, d).collect()
    assert [(r["doc_a"], r["para_a"], r["doc_b"], r["para_b"], r["jaccard"])
            for r in pairs] == [(big, 0, big + 1, 0, 1.0)]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    try:
        result = compare(
            near_dup_paragraphs(spark, d),
            con,
            entrymod.oracle_sql()["near_dup_paragraphs"],
        )
        assert result["match"], result
    finally:
        con.close()


def test_span_geometry_partitions_tokens_at_boundaries(spark, tmp_path):
    """span_frame must PARTITION each document's tokens exactly — spans
    are consecutive, non-overlapping, PARA_WORDS-sized except the natural
    remainder tail — across every boundary word count (1, PARA−1, PARA,
    PARA+1, 2·PARA±1, …)."""
    from pulsar_topic_deduplicator_spark.operators.textops import (
        PARA_WORDS,
        para_spans,
    )

    sizes = [1, 2, PARA_WORDS - 1, PARA_WORDS, PARA_WORDS + 1,
             2 * PARA_WORDS - 1, 2 * PARA_WORDS, 2 * PARA_WORDS + 1,
             3 * PARA_WORDS, 3 * PARA_WORDS + 5]
    rows = []
    for i, n in enumerate(sizes):
        text = " ".join(f"w{i}x{j}" for j in range(n))
        rows.append((i, text, "en", "s", len(text)))
    d = str(tmp_path / "geom")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")

    by_doc: dict[int, list] = {}
    for r in para_spans(spark, d).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(sizes):
        spans = sorted(by_doc[i], key=lambda r: r["para_idx"])
        assert [r["para_idx"] for r in spans] == list(range(len(spans)))
        rejoined = " ".join(r["para"] for r in spans).split(" ")
        assert rejoined == [f"w{i}x{j}" for j in range(n)]
        for r in spans[:-1]:
            assert len(r["para"].split(" ")) == PARA_WORDS
        assert 1 <= len(spans[-1]["para"].split(" ")) <= PARA_WORDS

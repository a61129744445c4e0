"""Semantic invariants for the curation tier (decontamination, sequence
packing, PII scan) — oracle parity is covered by test_oracle_parity; these
pin the properties parity alone can't state."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators import curation
from pulsar_topic_deduplicator_spark.operators.curation import (
    DECON_FLAG_RATE,
    DECON_N,
    PACK_BUDGET,
    PACK_BUCKETS,
)
from pulsar_topic_deduplicator_spark.sources.io import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }


def _grams(text: str) -> set[str]:
    w = text.split(" ")
    return {
        " ".join(w[i : i + DECON_N]) for i in range(len(w) - DECON_N + 1)
    }


def test_pack_sequences_partitions_every_doc_once(spark, sf_dir, docs):
    rows = curation.pack_sequences(spark, sf_dir).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(docs)
    # per bucket: ordered by doc_id, offsets are contiguous (concat-then-
    # chunk leaves no holes) and pack ids follow from the offsets
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert len(by_bucket) > 1
    for bucket_rows in by_bucket.values():
        bucket_rows.sort(key=lambda r: r["doc_id"])
        expected_start = 0
        for r in bucket_rows:
            assert r["token_start"] == expected_start
            assert r["n_tokens"] == len(docs[r["doc_id"]].split(" "))
            assert r["first_pack"] == r["token_start"] // PACK_BUDGET
            assert (
                r["last_pack"]
                == (r["token_start"] + r["n_tokens"] - 1) // PACK_BUDGET
            )
            assert r["first_pack"] <= r["last_pack"]
            expected_start += r["n_tokens"]


def test_pack_sequences_span_only_at_boundaries(spark, sf_dir):
    rows = curation.pack_sequences(spark, sf_dir).collect()
    spanners = [r for r in rows if r["last_pack"] > r["first_pack"]]
    # chunking must split exactly the docs that straddle a budget boundary
    for r in spanners:
        assert r["token_start"] % PACK_BUDGET + r["n_tokens"] > PACK_BUDGET
    # the corpus is big enough that boundaries exist
    assert spanners


def test_pack_bucket_assignment_is_content_keyed(spark, sf_dir, docs):
    rows = curation.pack_sequences(spark, sf_dir).collect()
    for r in rows[:50]:
        h = int(
            hashlib.sha256(docs[r["doc_id"]].encode()).hexdigest()[:15], 16
        )
        assert r["bucket"] == h % PACK_BUCKETS


def test_decontaminate_flags_match_recomputed_overlap(spark, sf_dir, docs):
    out = {
        r["doc_id"]: r
        for r in curation.decontaminate_overlap(spark, sf_dir).collect()
    }
    # benchmark docs (test split) are never in the decontamination output
    def pct(text: str) -> int:
        return int(hashlib.sha256(text.encode()).hexdigest()[:15], 16) % 100

    bench_grams: set[str] = set()
    for did, text in docs.items():
        if pct(text) >= 90:
            assert did not in out
            bench_grams |= _grams(text)
    checked_hits = 0
    for did, text in docs.items():
        if pct(text) >= 90 or not _grams(text):
            continue
        g = _grams(text)
        n_cont = len(g & bench_grams)
        r = out[did]
        assert r["n_grams"] == len(g)
        assert r["n_contaminated"] == n_cont
        assert r["contaminated"] == (n_cont / len(g) >= DECON_FLAG_RATE)
        checked_hits += n_cont > 0
    assert checked_hits > 0, "fixture has no contamination signal"


_PII_RES = {
    "n_emails": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "n_ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "n_phones": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
}


def test_pii_scan_finds_exactly_the_planted_pii(spark, sf_dir, docs):
    rows = curation.pii_scan(spark, sf_dir).collect()
    planted = clean = 0
    for r in rows:
        text = docs[r["doc_id"]]
        sel = (
            int(
                hashlib.sha256((text + "#pii").encode()).hexdigest()[:15], 16
            )
            % 10
            == 0
        )
        if sel:
            assert (r["n_emails"], r["n_ipv4"], r["n_phones"]) == (1, 1, 1)
            assert r["has_pii"]
            # digest proves the typed-sentinel redaction byte-for-byte
            aug = (
                f"{text} contact user{r['doc_id']}@example.com "
                f"ip 10.0.{r['doc_id'] % 256}.7 "
                f"ph 555-010-{r['doc_id'] % 10000:04d}"
            )
            red = aug
            for pat, sub in (
                (_PII_RES["n_emails"], "[EMAIL]"),
                (_PII_RES["n_ipv4"], "[IP]"),
                (_PII_RES["n_phones"], "[PHONE]"),
            ):
                red = re.sub(pat, sub, red)
            assert "@" not in red and "555-" not in red
            assert (
                r["redacted_digest"]
                == hashlib.sha256(red.encode()).hexdigest()
            )
            planted += 1
        else:
            assert not r["has_pii"]
            assert (
                r["redacted_digest"]
                == hashlib.sha256(text.encode()).hexdigest()
            )
            clean += 1
    assert planted > 0 and clean > 0


def test_decontaminated_training_set_excludes_flagged(spark, sf_dir):
    """Composition check: filtering the corpus by the decontamination
    verdict drops exactly the flagged docs."""
    flagged = {
        r["doc_id"]
        for r in curation.decontaminate_overlap(spark, sf_dir)
        .filter("contaminated")
        .collect()
    }
    assert flagged  # the corpus plants near-dup leaks across the split
    kept = (
        curation.decontaminate_overlap(spark, sf_dir)
        .filter(~F.col("contaminated"))
        .select("doc_id")
        .collect()
    )
    assert flagged.isdisjoint({r["doc_id"] for r in kept})


def test_token_budget_mixture_invariants(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators.curation import (
        MIXTURE_BUDGET_TOKENS,
        token_budget_mixture,
    )

    rows = token_budget_mixture(spark, sf_dir).collect()
    assert len(rows) > 1
    # shares sum to 1 (up to fold rounding), rates bounded, realized kept
    # tokens track the per-source target within binomial noise
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["target_tokens"] for r in rows) - MIXTURE_BUDGET_TOKENS) < 1e-6
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
        assert r["n_docs_kept"] <= r["n_docs"]
        assert r["n_tokens_kept"] <= r["n_tokens"]
        if r["keep_rate"] == 1.0:
            assert r["n_docs_kept"] == r["n_docs"]
        else:
            # hash-uniform selection: realized tokens within 5 sd of target
            import math

            sd = math.sqrt(r["n_docs"] * r["keep_rate"] * (1 - r["keep_rate"]))
            mean_doc = r["n_tokens"] / r["n_docs"]
            assert (
                abs(r["n_tokens_kept"] - r["target_tokens"])
                < 5 * max(sd, 1.0) * mean_doc
            )


def test_training_batch_pipeline_composition(spark, sf_dir):
    """The composite equals its stage-by-stage recomposition from the
    already-tested operators."""
    from pulsar_topic_deduplicator_spark.operators.curation import (
        decontaminate_overlap,
        training_batch_pipeline,
    )
    from pulsar_topic_deduplicator_spark.operators.pipeline import (
        corpus_clean_pipeline,
    )
    from pulsar_topic_deduplicator_spark.operators.sampling import (
        train_val_test_split,
    )

    out = {r["doc_id"]: r for r in training_batch_pipeline(spark, sf_dir).collect()}
    survivors = {r["doc_id"] for r in corpus_clean_pipeline(spark, sf_dir).collect()}
    train = {
        r["doc_id"]
        for r in train_val_test_split(spark, sf_dir).collect()
        if r["split"] == "train"
    }
    flagged = {
        r["doc_id"]
        for r in decontaminate_overlap(spark, sf_dir).filter("contaminated").collect()
    }
    expected = (survivors & train) - flagged
    assert set(out) == expected
    assert expected, "pipeline produced an empty training set"
    # placement invariants hold on the filtered set too
    for r in out.values():
        assert r["first_pack"] == r["token_start"] // 512
        assert r["last_pack"] >= r["first_pack"]


def test_cap_docs_per_source_two_stage_is_lossless(spark, sf_dir):
    """The salted prefilter must select exactly the rows a direct
    single-window per-source top-CAP selects (the lossless-prefilter
    identity), and every source ends at or under the cap with dense
    deterministic ranks."""
    from pyspark.sql import Window

    from pulsar_topic_deduplicator_spark.operators.curation import (
        CAP_PER_SOURCE,
    )
    from pulsar_topic_deduplicator_spark.operators.textops import quality_expr

    out = curation.cap_docs_per_source(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rows in by_source.values():
        assert len(rows) <= CAP_PER_SOURCE
        rows.sort(key=lambda r: r["rank_in_source"])
        assert [r["rank_in_source"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        # ranks follow the (quality DESC, doc_id ASC) total order
        keys = [(-r["quality"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    direct = (
        docs.select(
            "doc_id", "source", quality_expr(F.col("text")).alias("quality")
        )
        .withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= CAP_PER_SOURCE)
        .collect()
    )
    assert {(r["doc_id"], r["rank_in_source"]) for r in out} == {
        (r["doc_id"], r["rank_in_source"]) for r in direct
    }


def test_curriculum_order_is_a_tiered_permutation(spark, sf_dir):
    """global_pos must be an exact permutation of 0..n-1 built without a
    global sort, with tiers forming contiguous blocks (curriculum: every
    tier-t doc trains before any tier-t+1 doc) and hash-shuffled
    deterministic order within (tier, bucket)."""
    rows = curriculum = curation.curriculum_order(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert sorted(r["global_pos"] for r in rows) == list(range(n))
    # tier blocks are contiguous in global-position space
    tiers = sorted({r["tier"] for r in rows})
    spans = {
        t: (
            min(r["global_pos"] for r in rows if r["tier"] == t),
            max(r["global_pos"] for r in rows if r["tier"] == t),
        )
        for t in tiers
    }
    for lo_t, hi_t in zip(tiers, tiers[1:]):
        assert spans[lo_t][1] < spans[hi_t][0]
    # deterministic on re-run (pure function of content, no RNG)
    again = curation.curriculum_order(spark, sf_dir).collect()
    assert {(r["doc_id"], r["global_pos"]) for r in curriculum} == {
        (r["doc_id"], r["global_pos"]) for r in again
    }


def test_chunk_documents_covers_and_reconstructs(spark, sf_dir):
    """Chunking invariants beyond the value oracle: (a) chunk spans cover
    every token exactly as the geometry dictates; (b) stitching the first
    CHUNK_STRIDE tokens of each chunk plus the final chunk's tail
    reconstructs the document byte-for-byte — nothing lost, nothing
    invented by the overlap."""
    from pulsar_topic_deduplicator_spark.operators.textops import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        chunk_documents,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    chunks = chunk_documents(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        toks = docs[doc_id].split(" ")
        # geometry: starts are exactly 0, stride, 2*stride … < n_tokens
        assert [r["start_tok"] for r in rows] == list(
            range(0, len(toks), CHUNK_STRIDE)
        )
        for r in rows:
            assert r["n_tokens"] == min(CHUNK_SIZE, len(toks) - r["start_tok"])
        # reconstruction from the stride prefixes + last chunk
        stitched: list = []
        for r in rows[:-1]:
            stitched.extend(r["chunk_text"].split(" ")[:CHUNK_STRIDE])
        stitched.extend(rows[-1]["chunk_text"].split(" "))
        assert stitched == toks


def test_dedup_docs_by_url_keeps_first_crawl(spark, tmp_path_factory):
    """Re-crawls (same source+lang+opening words, drifted tail) collapse to
    the EARLIEST crawl; a different domain or different opening is a
    different page. Funnel arithmetic reconciles per domain."""
    from pulsar_topic_deduplicator_spark.operators.curation import (
        dedup_docs_by_url,
        domain_attrition_report,
    )

    opening = "the quick brown fox jumps over the lazy"  # 8 words = the key
    rows = [
        # page A on src0.en: crawled 3x (doc_ids 0, 5, 9) with tail drift
        (0, f"{opening} dog first crawl", "en", "src0"),
        (5, f"{opening} dog second crawl updated", "en", "src0"),
        (9, f"{opening} dog third crawl updated again", "en", "src0"),
        # same opening on ANOTHER domain -> different url
        (1, f"{opening} dog mirrored elsewhere", "en", "src1"),
        # same source, different lang -> different domain, different url
        (2, f"{opening} dog translated", "de", "src0"),
        # unrelated page on src0.en
        (3, "completely different opening words for the other page here",
         "en", "src0"),
    ]
    path = tmp_path_factory.mktemp("urls")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))

    out = {r["url"]: r for r in dedup_docs_by_url(spark, str(path)).collect()}
    assert len(out) == 4  # 6 docs, the 3-way re-crawl collapses to one
    recrawled = [r for r in out.values() if r["n_crawls"] == 3]
    assert len(recrawled) == 1
    assert recrawled[0]["doc_id"] == 0  # keep-first by crawl_ts
    assert recrawled[0]["url"].startswith("https://src0.en.example/")
    assert str(recrawled[0]["crawl_ts"]) == "2024-01-01 00:00:00"
    assert {r["doc_id"] for r in out.values()} == {0, 1, 2, 3}

    rep = {
        r["domain"]: r
        for r in domain_attrition_report(spark, str(path)).collect()
    }
    assert set(rep) == {"src0.en.example", "src1.en.example", "src0.de.example"}
    a = rep["src0.en.example"]
    # 4 docs (0,5,9,3) -> url stage keeps 0 and 3 -> both unique content,
    # both fail the 20-word Gopher floor (short fixtures)
    assert (a["n_docs"], a["n_after_url"], a["n_after_exact"]) == (4, 2, 2)
    assert a["n_after_quality"] == 0
    for r in rep.values():  # funnel is monotone per domain
        assert (
            r["n_docs"] >= r["n_after_url"] >= r["n_after_exact"]
            >= r["n_after_quality"]
        )


def test_greedy_coverage_invariants(spark, sf_dir):
    """Greedy max-coverage: marginal gains are non-increasing (the
    submodularity signature), cumulative coverage is exactly the running
    gain sum (picks never re-cover), and picks are distinct docs."""
    from pulsar_topic_deduplicator_spark.operators.curation import (
        greedy_coverage_select,
    )

    rows = sorted(
        greedy_coverage_select(spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert all(g > 0 for g in gains)
    running = 0
    for r in rows:
        running += r["gain"]
        assert r["covered_total"] == running
    assert len({r["doc_id"] for r in rows}) == len(rows)

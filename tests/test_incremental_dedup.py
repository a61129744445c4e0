"""Incremental ingest dedup invariants (``dedup_docs_incremental``) beyond
the value oracle: verdict conservation over the new batch, exact verdicts
backed by a byte-identical twin in the existing split, and near verdicts
backed by a batch near-dup pair crossing the split."""

from __future__ import annotations

from pulsar_topic_deduplicator_spark.operators.neardup import (
    INCR_MOD,
    dedup_docs_incremental,
    near_dup_pairs_verified,
)
from pulsar_topic_deduplicator_spark.sources.io import load_table


def test_incremental_verdicts_conserve_and_ground(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    verdicts = {
        r["doc_id"]: r["verdict"]
        for r in dedup_docs_incremental(spark, sf_dir).collect()
    }
    new_ids = {d for d in docs if d % INCR_MOD == 0}
    # conservation: every new doc classified exactly once, nothing else
    assert set(verdicts) == new_ids
    assert set(verdicts.values()) <= {"exact_dup", "near_dup", "unique"}

    old_texts = {t for d, t in docs.items() if d % INCR_MOD != 0}
    for d, v in verdicts.items():
        if v == "exact_dup":
            assert docs[d] in old_texts, d
        elif v == "unique":
            # a unique doc has no byte-identical twin in the index
            assert docs[d] not in old_texts, d

    # every cross-split pair the BATCH near-dup tier verifies must have
    # produced a non-unique verdict for its new-side member (same banding,
    # same threshold — the incremental path cannot miss what batch found)
    for r in near_dup_pairs_verified(spark, sf_dir).collect():
        for d in (r["doc_a"], r["doc_b"]):
            other = r["doc_b"] if d == r["doc_a"] else r["doc_a"]
            if d % INCR_MOD == 0 and other % INCR_MOD != 0:
                assert verdicts[d] != "unique", (d, other)

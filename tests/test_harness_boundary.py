"""Harness-boundary discipline: driver-checked query outputs must be
canonicalizable — the driver's canon sorts/hashes result columns with
pandas, which cannot hash list/dict cells, so every registry entry must
emit atomic (sortable, hashable) columns only.

Round-3 lost five entries to this (`unhashable type` ERRs); these tests pin
the long-form/JSON-serialized boundary shapes introduced in round 4.
"""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

ATOMIC = (
    T.StringType, T.BooleanType, T.DateType, T.TimestampType,
    T.TimestampNTZType, T.ByteType, T.ShortType, T.IntegerType,
    T.LongType, T.FloatType, T.DoubleType, T.DecimalType, T.BinaryType,
)


def _assert_atomic(df, name):
    for f in df.schema.fields:
        assert isinstance(f.dataType, ATOMIC), (
            f"{name}.{f.name} is {f.dataType.simpleString()} — not "
            "canonicalizable by the driver's pandas sort/hash"
        )


@pytest.mark.parametrize(
    "name",
    [
        "multimodal_features",
        "multimodal_decode",
        "multimodal_resize",
        "approx_quantiles_value",
    ],
)
def test_fixed_entries_emit_atomic_columns(spark, sf_dir, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, sf_dir)
    _assert_atomic(df, name)
    assert df.count() > 0


def test_multimodal_long_forms_preserve_values(spark, sf_dir):
    """Long form is a reshape, not a recompute: regrouping the exploded
    pixels must reproduce the wide arrays exactly."""
    from pulsar_topic_deduplicator_spark.operators.multimodal import (
        multimodal_decode,
        multimodal_decode_long,
    )

    wide = {
        r["asset_id"]: r["pixels"] for r in multimodal_decode(spark, sf_dir).collect()
    }
    long_rows = multimodal_decode_long(spark, sf_dir).collect()
    regrouped: dict[int, dict[int, int]] = {}
    for r in long_rows:
        regrouped.setdefault(r["asset_id"], {})[r["pixel_idx"]] = r["pixel"]
    assert set(regrouped) == set(wide)
    for aid, cells in regrouped.items():
        assert [cells[i] for i in sorted(cells)] == wide[aid]


def test_registry_nonstream_entries_all_atomic(spark, sf_dir):
    """Every driver-checked batch entry emits atomic columns. Streaming and
    heavyweight index-building entries are exercised in their own suites;
    schema inspection alone would execute them (bounded runs / codebook
    collects), so they are skipped here."""
    import __spark_entry__ as e

    skip = {
        # bounded streaming runs execute on construction
        "stream_dedup", "stream_dedup_ttl", "stream_windowed_counts",
        "stream_session_activity", "stream_near_dup", "stream_warmup_flagged",
        "stream_near_dup_contracts", "stream_quality_gate",
        # collect codebooks / write an index / run counts on construction
        "ivf_topk_cosine", "ivf_topk_indexed", "pq_topk_cosine",
        "near_dup_clusters_lss", "embedding_near_dup_clusters",
        "near_dup_clusters", "bloom_digest_prefilter", "ann_recall_contracts",
    }
    for name, fn in e.queries().items():
        if name in skip:
            continue
        _assert_atomic(fn(spark, sf_dir), name)


def test_checked_window_oracle_less_entries_are_documented():
    """The driver checks the first ~50 queries() entries. In round 11 the
    seven rows-only RAW entries deliberately rotate through the window
    once (VERDICT r10 item 7 — fresh rows-only evidence; values stay
    oracle-checked via contract twins). Any OTHER oracle-less entry in
    the window is a bug: it would put an unplanned `no_oracle` row into
    the driver ledger."""
    import __spark_entry__ as e
    from tests.test_registry import ROWS_ONLY_RAW

    names = list(e.queries())
    oracles = e.oracle_sql()
    window = names[:55]  # window is ~50; pad for driver-side slack
    missing = [n for n in window if n not in oracles and n not in ROWS_ONLY_RAW]
    assert not missing, f"undocumented oracle-less entries in window: {missing}"

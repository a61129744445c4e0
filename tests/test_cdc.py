"""CDC merge + SCD2 history semantics (operators/cdc.py).

The DuckDB value parity for both query entries is pinned in
test_oracle_parity; these tests pin the MERGE-arm semantics, the interval
algebra of the SCD2 build, and the one-shuffle plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.operators import cdc
from pulsar_topic_deduplicator_spark.sources.io import load_table


def test_merge_upsert_three_arms(spark, sf_dir):
    merged = cdc.merge_upsert_orders(spark, sf_dir).cache()
    try:
        orders = load_table(spark, sf_dir, "orders")
        n_base = orders.filter(F.col("o_orderkey") % 5 != 0).count()
        n_insert = orders.filter(
            (F.col("o_orderkey") % 10 == 0)
        ).count()  # even AND div-5 → only in the update batch
        # WHEN MATCHED update + WHEN NOT MATCHED insert + untouched pass-through
        assert merged.count() == n_base + n_insert
        # one row per key, never duplicated by the merge
        assert merged.select("o_orderkey").distinct().count() == merged.count()
        # every even key must carry the update payload; odd keys the base one
        assert (
            merged.filter(
                (F.col("o_orderkey") % 2 == 0) & (F.col("src") != "update")
            ).count()
            == 0
        )
        assert (
            merged.filter(
                (F.col("o_orderkey") % 2 != 0) & (F.col("src") != "base")
            ).count()
            == 0
        )
        # updated rows: exact +10.0 on the base price, status rewritten
        joined = merged.filter(F.col("src") == "update").join(
            orders.select("o_orderkey", F.col("o_totalprice").alias("orig")),
            "o_orderkey",
        )
        assert (
            joined.filter(F.col("o_totalprice") != F.col("orig") + 10.0).count() == 0
        )
        assert joined.filter(F.col("o_orderstatus") != "U").count() == 0
    finally:
        merged.unpersist()


def test_merge_upsert_is_one_shuffle(spark, sf_dir):
    plan = (
        cdc.merge_upsert_orders(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_scd2_intervals_tile_per_user(spark, sf_dir):
    hist = cdc.scd2_event_type_history(spark, sf_dir).cache()
    try:
        ev = load_table(spark, sf_dir, "events")
        # exactly one open (current) version per user
        n_users = ev.select("user_id").distinct().count()
        assert hist.filter(F.col("valid_to").isNull()).count() == n_users
        # versions are 1..n dense per user and ordered by valid_from
        bad_version = (
            hist.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.max("version").alias("vmax"))
            .filter(F.col("n") != F.col("vmax"))
            .count()
        )
        assert bad_version == 0
        # adjacent versions abut: valid_to == next version's valid_from,
        # and consecutive versions never share the attribute value
        nxt = hist.select(
            "user_id",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
            F.col("event_type").alias("next_type"),
        )
        j = hist.join(nxt, ["user_id", "version"]).cache()
        try:
            assert j.filter(F.col("valid_to") != F.col("next_from")).count() == 0
            assert j.filter(F.col("event_type") == F.col("next_type")).count() == 0
        finally:
            j.unpersist()
        # every source event falls inside its user's interval for its type
        probe = ev.alias("e").join(
            hist.alias("h"),
            (F.col("e.user_id") == F.col("h.user_id"))
            & (F.col("e.ts") >= F.col("h.valid_from"))
            & (
                F.col("h.valid_to").isNull() | (F.col("e.ts") < F.col("h.valid_to"))
            ),
        )
        mismatched = probe.filter(
            F.col("e.event_type") != F.col("h.event_type")
        ).count()
        # ties on identical ts across versions are resolved by event_id in
        # the build; a same-ts boundary can place an event at the edge of
        # the neighbouring interval, so allow the tie rows only
        ties = (
            ev.groupBy("user_id", "ts")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum("n"), F.lit(0)))
            .collect()[0][0]
        )
        assert mismatched <= ties
    finally:
        hist.unpersist()


def test_keep_latest_is_batch_split_independent(spark, sf_dir):
    """The streaming materializer's correctness rests on keep_latest being
    associative: folding per-slice compactions must equal compacting the
    whole table."""
    ev = load_table(spark, sf_dir, "events")
    key, order = ["user_id"], ["ts", "event_id"]
    whole = cdc.keep_latest(ev, key, order)
    a = cdc.keep_latest(ev.filter(F.col("event_id") % 3 == 0), key, order)
    b = cdc.keep_latest(ev.filter(F.col("event_id") % 3 != 0), key, order)
    folded = cdc.keep_latest(a.unionByName(b), key, order)
    assert folded.exceptAll(whole).count() == 0
    assert whole.exceptAll(folded).count() == 0


def test_stream_latest_state_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """Stream the events table one file per micro-batch (4 source files →
    4 folds) and require the final snapshot to equal the batch argmax."""
    from pulsar_topic_deduplicator_spark.streaming.latest_state import (
        run_stream_latest_state_bounded,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    snap = run_stream_latest_state_bounded(
        spark, src, str(tmp_path / "work"), glob_filter="*.parquet",
        max_files_per_trigger=1,
    )
    batch = cdc.keep_latest(ev, ["user_id"], ["ts", "event_id"]).select(
        *snap.columns
    )
    assert snap.exceptAll(batch).count() == 0
    assert batch.exceptAll(snap).count() == 0


def test_point_in_time_join_lands_in_the_right_interval(spark, sf_dir):
    """Every matched lookup must fall inside the matched version's
    validity interval; nulls only when the lookup predates the user's
    first version."""
    pit = cdc.scd2_point_in_time_join(spark, sf_dir).cache()
    try:
        hist = cdc.scd2_event_type_history(spark, sf_dir)
        j = pit.filter(F.col("version").isNotNull()).join(
            hist.select(
                "user_id", "version", "valid_from", "valid_to",
                F.col("event_type").alias("h_type"),
            ),
            ["user_id", "version"],
        )
        assert j.filter(F.col("lookup_ts") < F.col("valid_from")).count() == 0
        assert (
            j.filter(
                F.col("valid_to").isNotNull()
                & (F.col("lookup_ts") >= F.col("valid_to"))
            ).count()
            == 0
        )
        assert j.filter(F.col("regime_type") != F.col("h_type")).count() == 0
        # null rows: lookup strictly before the user's first valid_from
        first = hist.groupBy("user_id").agg(F.min("valid_from").alias("f"))
        nulls = pit.filter(F.col("version").isNull()).join(first, "user_id")
        assert nulls.filter(F.col("lookup_ts") >= F.col("f")).count() == 0
    finally:
        pit.unpersist()


def test_stream_latest_state_resume_processes_only_new_files(spark, sf_dir, tmp_path):
    """Resume path: a second run with the SAME checkpoint sees only files
    added since, folds them onto the prior run's last snapshot version,
    and the result equals the batch argmax over everything."""
    from pulsar_topic_deduplicator_spark.streaming.latest_state import (
        run_stream_latest_state_bounded,
    )

    ev = load_table(spark, sf_dir, "events")
    old = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 != 0)
    src, work, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "work"),
        str(tmp_path / "ckpt"),
    )
    old.coalesce(1).write.mode("append").parquet(src)
    snap1 = run_stream_latest_state_bounded(
        spark, src, work, glob_filter="*.parquet", checkpoint_dir=ckpt
    )
    batch_old = cdc.keep_latest(old, ["user_id"], ["ts", "event_id"])
    assert snap1.exceptAll(batch_old.select(*snap1.columns)).count() == 0
    # land new files, resume with the same checkpoint
    new.coalesce(1).write.mode("append").parquet(src)
    snap2 = run_stream_latest_state_bounded(
        spark, src, work, glob_filter="*.parquet", checkpoint_dir=ckpt
    )
    batch_all = cdc.keep_latest(ev, ["user_id"], ["ts", "event_id"]).select(
        *snap2.columns
    )
    assert snap2.exceptAll(batch_all).count() == 0
    assert batch_all.exceptAll(snap2).count() == 0


def test_scd2_is_one_shuffle(spark, sf_dir):
    plan = (
        cdc.scd2_event_type_history(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan

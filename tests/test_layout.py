"""Physical-layout guarantees: partition pruning and shuffle-free bucketed
joins, asserted from the plans."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pulsar_topic_deduplicator_spark.plans import count_exchanges, formatted_plan
from pulsar_topic_deduplicator_spark.sources.io import load_table
from pulsar_topic_deduplicator_spark.sources.layout import (
    write_bucketed_table,
    write_partitioned,
)


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = formatted_plan(back)
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "event_type" in m.group(1), plan[:1500]
    # pruning is real: only the one directory's rows come back
    expected = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == expected


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        write_bucketed_table(orders, "orders_b", "o_orderkey", 8, "o_orderkey")
        write_bucketed_table(li, "lineitem_b", "l_orderkey", 8, "l_orderkey")

        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        # co-located buckets: the join runs with ZERO shuffle exchanges
        assert count_exchanges(joined) == 0, formatted_plan(joined)[:2000]
        # and it is still correct
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_compact_files_hits_target_partition_count(spark, sf_dir, tmp_path):
    """A fragmented directory (64 shards of a small table) compacts to the
    measured-size-derived partition count with identical content."""
    from pulsar_topic_deduplicator_spark.sources.io import load_table
    from pulsar_topic_deduplicator_spark.sources.layout import compact_files

    ev = load_table(spark, sf_dir, "events")
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)
    n_frag = len([f for f in __import__("os").listdir(frag) if f.endswith(".parquet")])
    assert n_frag >= 32  # genuinely fragmented input

    out = str(tmp_path / "compacted")
    report = compact_files(spark, frag, out, target_mb=128)
    assert report["n_input_files"] == n_frag
    assert report["n_output_partitions"] == 1  # tiny table, one 128MB target
    n_out = len([f for f in __import__("os").listdir(out) if f.endswith(".parquet")])
    assert n_out == 1
    # content survives byte-for-byte at row level
    assert spark.read.parquet(out).count() == ev.count()
    a = {tuple(r) for r in spark.read.parquet(out).collect()}
    b = {tuple(r) for r in ev.collect()}
    assert a == b


def test_orc_round_trip(spark, sf_dir, tmp_path):
    from pulsar_topic_deduplicator_spark.sources.formats import (
        read_table,
        write_table,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    nat = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_table(nat, path, fmt="orc")
    back = read_table(spark, path, nat.schema, fmt="orc")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nat.collect()}


def test_compact_files_preserves_hive_partitioning(spark, sf_dir, tmp_path):
    """Compacting a Hive-partitioned tree must PRESERVE the col=value layout
    (ADVICE r4): flattening would turn pruned scans into full scans on the
    compacted copy. The report names the preserved columns, the output tree
    has the same partition directories, and a filtered read of the compacted
    copy still partition-prunes."""
    import os

    from pulsar_topic_deduplicator_spark.sources.io import load_table
    from pulsar_topic_deduplicator_spark.sources.layout import (
        compact_files,
        write_partitioned,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "part_src")
    write_partitioned(ev, src, ["event_type"])
    out = str(tmp_path / "part_out")
    report = compact_files(spark, src, out, target_mb=128)
    assert report["partition_columns"] == ["event_type"]

    src_dirs = {d for d in os.listdir(src) if d.startswith("event_type=")}
    out_dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert out_dirs == src_dirs and src_dirs

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    plan = (
        back.filter(back.event_type == "click")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1][:200]


def test_zorder_layout_skips_files_on_both_columns(spark, sf_dir, tmp_path):
    """Z-ordering must deliver MEASURED multi-column file-skipping: after
    clustering events by (user_id, value), a quarter-domain range predicate
    on EITHER column overlaps at most half the files' [min, max] footer
    ranges, while the round-robin baseline overlaps essentially all of
    them. This is the parquet row-group/footer pruning a 100 TB scan lives
    on — checked from the actual file statistics, not the plan."""
    import os

    import pyarrow.parquet as pq

    from pulsar_topic_deduplicator_spark.sources.io import load_table
    from pulsar_topic_deduplicator_spark.sources.layout import write_zordered

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zdir = str(tmp_path / "zorder")
    rdir = str(tmp_path / "roundrobin")
    write_zordered(ev, zdir, ["user_id", "value"], n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(rdir)

    def file_ranges(d, col):
        out = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    def touched(ranges, lo, hi):
        return sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))

    stats = ev.agg(
        {"user_id": "min", "value": "min"}
    ).first()  # noqa: F841 — corpus sanity probe only
    for col, lo_q, hi_q in (("user_id", 0.25, 0.5), ("value", 0.25, 0.5)):
        mn, mx = ev.agg({col: "min"}).first()[0], ev.agg({col: "max"}).first()[0]
        lo = mn + (mx - mn) * lo_q
        hi = mn + (mx - mn) * hi_q
        z_touch = touched(file_ranges(zdir, col), lo, hi)
        rr_touch = touched(file_ranges(rdir, col), lo, hi)
        n_z = len(file_ranges(zdir, col))
        assert rr_touch >= n_z - 1, (col, rr_touch)  # baseline: ~every file
        assert z_touch <= n_z // 2, (col, z_touch, rr_touch)

"""Misra-Gries heavy hitters over the event stream — the frequent-items
member of the sketch tier (Bloom / KMV / CMS / HLL / GK already exist).

NOT in the reference (its counters are three scalars — ``src/index.ts``
telemetry); this is the bounded-memory "top talkers" sketch a dedup
service publishes next to its counters, with DETERMINISTIC error
guarantees (unlike CMS's probabilistic ones):

* no overcount: every reported estimate is ≤ the true count;
* bounded undercount: true − estimate ≤ n / (MG_K + 1);
* total recall above threshold: every item with true count
  > n / (MG_K + 1) is present in the summary.

Scale design: the classic two-level Misra-Gries (Agarwal et al., SIGMOD
2012, "Mergeable summaries"). Each partition folds its rows into a
≤ MG_K-counter summary inside ONE ``mapInPandas`` pass (per-batch exact
counts at C speed via ``value_counts``, then the trim-by-(k+1)-th-weight
fold — stateful counter maintenance across batches is the one thing
Catalyst cannot express, the sanctioned Python escape hatch), emitting a
≤ MG_K-row summary per partition. The merge is then pure SQL over
P×MG_K rows: sum same-item counters, subtract the (MG_K+1)-th largest
merged weight (the mergeable-summaries offset step), keep positive —
KB-sized at any corpus scale, so the wire cost is constant in row count,
like every sketch in this tier.

Two driver surfaces, mirroring the KMV exact-when-unsaturated precedent:

* ``mg_heavy_hitters`` sketches ``event_type`` (5-value vocabulary ≪
  MG_K): an UNSATURATED Misra-Gries never decrements and the merge
  offset is 0, so the summary equals the exact counts on ANY partition
  layout — the entry is oracle-EXACT, and the exactness property is
  itself the thing being checked.
* ``mg_heavy_hitters_contracts`` sketches ``user_id`` (1,500 users ≫
  MG_K at sf0.1): the summary SATURATES and its estimates are
  partition-layout dependent, so the driver-checked truth is the
  guarantee contract replayed against the exact counts, every verdict
  an oracle-pinned constant (the Bloom/GK contract pattern). The
  saturation algebra (decrement correctness, bound tightness, recall)
  is pinned on adversarial fixtures in ``tests/test_heavyhitters.py``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table

#: counters per summary — heavy hitters are items above n/(MG_K+1);
#: 15 counters → every item above ~6.7% of the stream is guaranteed out.
MG_K = 15

_SUMMARY_SCHEMA = "item string, weight long"


def _mg_partition_summaries(
    df: DataFrame, col: str, weight: str | None = None
) -> DataFrame:
    """≤ MG_K (item, weight) rows per partition: the k-counter Misra-Gries
    pass in its BATCHED form (Agarwal et al. §3.1 — fold each batch's
    exact counts into the summary, then trim by the (MG_K+1)-th largest
    weight and keep positive). Each trim removes ≥ (MG_K+1)·offset total
    mass, so Σ offsets ≤ n/(MG_K+1) — the classic per-row decrement bound,
    reached with pandas ``value_counts`` doing the per-batch counting at C
    speed instead of a per-row Python loop; only the ≤ MG_K + distinct-
    per-batch counter merge runs in Python. State carries across the
    partition's Arrow batches.

    With ``weight`` set (a non-negative BIGINT column), each row carries
    that many units instead of 1 — the WEIGHTED Misra-Gries (top talkers
    by bytes/revenue, not by message count): the same fold with per-batch
    ``groupby(...).sum()``, the same trim, and the same guarantees with n
    replaced by the total weight W (every bound statement scales)."""

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            per_batch = (
                pdf.groupby(col)["w"].sum()
                if weight is not None
                else pdf[col].value_counts()
            )
            for item, c in per_batch.items():
                key = str(item)
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > MG_K:
                off = sorted(counters.values(), reverse=True)[MG_K]
                counters = {
                    k: v - off for k, v in counters.items() if v > off
                }
        yield pd.DataFrame(
            {"item": list(counters), "weight": list(counters.values())}
        )

    cols = [F.col(col).cast("string").alias(col)]
    if weight is not None:
        cols.append(F.col(weight).cast("long").alias("w"))
    return df.select(*cols).mapInPandas(summarize, _SUMMARY_SCHEMA)


def _mg_merged(
    df: DataFrame, col: str, weight: str | None = None
) -> DataFrame:
    """Merged summary ``(item, est_count)``: sum per-partition counters,
    apply the mergeable-summaries offset (subtract the (MG_K+1)-th
    largest merged weight; 0 when fewer items), keep positive. Runs
    entirely on P×MG_K rows."""
    from pyspark.sql import Window

    parts = _mg_partition_summaries(df, col, weight)
    merged = parts.groupBy("item").agg(F.sum("weight").alias("w"))
    # rank window over the KB-sized merged frame (single partition by
    # construction: ≤ P×MG_K rows — never corpus-sized)
    ranked = merged.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.col("w").desc(), "item"))
    )
    offset = ranked.filter(F.col("rn") == MG_K + 1).select(
        F.col("w").alias("off")
    )
    return (
        ranked.crossJoin(
            F.broadcast(
                offset.groupBy().agg(
                    F.coalesce(F.max("off"), F.lit(0)).alias("off")
                )
            )
        )
        .filter(F.col("rn") <= MG_K)
        .select("item", (F.col("w") - F.col("off")).alias("est_count"))
        .filter(F.col("est_count") > 0)
    )


def mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries summary of ``event_type`` — ``(item, est_count)``.
    Oracle-EXACT because the 5-value vocabulary never saturates the
    MG_K=15 counters: no decrement ever fires, the merge offset is 0,
    and the summary equals the exact counts on any partition layout
    (the KMV unsaturated-exactness discipline; saturation behavior is
    the contract twin's job)."""
    ev = load_table(spark, sf_dir, "events").select("event_type")
    return _mg_merged(ev, "event_type")


def mg_heavy_hitters_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract twin on the SATURATING ``user_id`` sketch: the
    Misra-Gries guarantees replayed against the exact counts, as one
    verdict row the oracle pins:

    * ``n_events`` / ``k`` — exact scalars (data, not verdicts);
    * ``at_most_k_ok`` — the summary never exceeds MG_K rows;
    * ``no_overcount_ok`` — every estimate ≤ its true count;
    * ``undercount_bounded_ok`` — true − estimate ≤ n/(k+1) for every
      reported item (the two-level merge preserves the bound);
    * ``all_heavy_present_ok`` — every user with true count > n/(k+1)
      appears in the summary (vacuously true on a uniform corpus slice;
      non-vacuous at sf0.001, where the busiest users cross the
      threshold — and exercised adversarially in pytest).
    """
    from ..cachereg import persist_scoped

    ev = load_table(spark, sf_dir, "events").select("user_id")
    mg = persist_scoped(_mg_merged(ev, "user_id"))
    exact = persist_scoped(
        ev.groupBy(F.col("user_id").cast("string").alias("item")).agg(
            F.count(F.lit(1)).alias("true_count")
        )
    )
    n = exact.agg(F.sum("true_count").alias("n")).select(
        "n", F.floor(F.col("n") / (MG_K + 1)).alias("bound")
    )
    per_item = (
        mg.join(exact, "item", "left")
        .crossJoin(F.broadcast(n))
        .select(
            (F.col("est_count") <= F.col("true_count")).alias("noc"),
            (
                F.col("true_count") - F.col("est_count") <= F.col("bound")
            ).alias("ub"),
        )
    )
    heavy_missing_empty = (
        exact.crossJoin(F.broadcast(n))
        .filter(F.col("true_count") > F.col("bound"))
        .join(mg, "item", "left_anti")
        .groupBy()
        .agg((F.count(F.lit(1)) == 0).alias("all_heavy_present_ok"))
    )
    # min over an EMPTY summary is NULL → coalesce to vacuous TRUE (an
    # empty summary violates nothing; recall is all_heavy_present's job)
    verdicts = per_item.groupBy().agg(
        F.coalesce(F.min("noc"), F.lit(True)).alias("no_overcount_ok"),
        F.coalesce(F.min("ub"), F.lit(True)).alias("undercount_bounded_ok"),
        (F.count(F.lit(1)) <= MG_K).alias("at_most_k_ok"),
    )
    scalars = n.select("n")
    return (
        scalars.crossJoin(F.broadcast(verdicts))
        .crossJoin(F.broadcast(heavy_missing_empty))
        .select(
            F.col("n").alias("n_events"),
            F.lit(MG_K).alias("k"),
            "at_most_k_ok",
            "no_overcount_ok",
            "undercount_bounded_ok",
            "all_heavy_present_ok",
        )
    )


def mg_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED Misra-Gries over orders — ``(item, est_revenue_cents)``:
    ``o_orderpriority`` items, each carrying the order's exact totalprice
    cents (non-negative BIGINT — the guarantee precondition). Oracle-EXACT
    by the unsaturated discipline: the 5-value priority vocabulary never
    saturates MG_K=15, so no trim fires, the merge offset is 0, and the
    summary equals the exact per-priority revenue on any partition
    layout. The saturating weighted algebra is ``mg_revenue_contracts``'s
    job."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return _mg_merged(od, "o_orderpriority", "cents").select(
        "item", F.col("est_count").alias("est_revenue_cents")
    )


def mg_revenue_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract twin on the SATURATING weighted sketch: per-customer
    revenue (customers ≫ MG_K everywhere), every Misra-Gries guarantee
    restated with n replaced by the total weight W (cents):

    * ``total_cents`` / ``k`` — exact scalars;
    * ``at_most_k_ok`` — ≤ MG_K summary rows;
    * ``no_overcount_ok`` — every estimate ≤ the customer's true revenue;
    * ``undercount_bounded_ok`` — true − estimate ≤ floor(W/(k+1));
    * ``all_heavy_present_ok`` — every customer with revenue above the
      threshold is reported (non-vacuity is pinned adversarially in
      ``tests/test_heavyhitters.py``, where a dominant weighted item must
      survive saturation)."""
    from ..cachereg import persist_scoped

    od = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    mg = persist_scoped(_mg_merged(od, "o_custkey", "cents"))
    exact = persist_scoped(
        od.groupBy(F.col("o_custkey").cast("string").alias("item")).agg(
            F.sum("cents").alias("true_w")
        )
    )
    n = exact.agg(F.sum("true_w").alias("w")).select(
        "w", F.floor(F.col("w") / (MG_K + 1)).alias("bound")
    )
    per_item = (
        mg.join(exact, "item", "left")
        .crossJoin(F.broadcast(n))
        .select(
            (F.col("est_count") <= F.col("true_w")).alias("noc"),
            (F.col("true_w") - F.col("est_count") <= F.col("bound")).alias(
                "ub"
            ),
        )
    )
    heavy_missing_empty = (
        exact.crossJoin(F.broadcast(n))
        .filter(F.col("true_w") > F.col("bound"))
        .join(mg, "item", "left_anti")
        .groupBy()
        .agg((F.count(F.lit(1)) == 0).alias("all_heavy_present_ok"))
    )
    verdicts = per_item.groupBy().agg(
        F.coalesce(F.min("noc"), F.lit(True)).alias("no_overcount_ok"),
        F.coalesce(F.min("ub"), F.lit(True)).alias("undercount_bounded_ok"),
        (F.count(F.lit(1)) <= MG_K).alias("at_most_k_ok"),
    )
    return (
        n.select("w")
        .crossJoin(F.broadcast(verdicts))
        .crossJoin(F.broadcast(heavy_missing_empty))
        .select(
            F.col("w").alias("total_cents"),
            F.lit(MG_K).alias("k"),
            "at_most_k_ok",
            "no_overcount_ok",
            "undercount_bounded_ok",
            "all_heavy_present_ok",
        )
    )


ORACLES: dict[str, str] = {
    #: exact BECAUSE unsaturated — see mg_heavy_hitters docstring
    "mg_heavy_hitters": """
        SELECT event_type AS item, CAST(count(*) AS BIGINT) AS est_count
        FROM events GROUP BY event_type
    """,
    #: contract oracle: exact scalar + pinned verdict constants (the
    #: bloom_digest_prefilter / ann_recall_contracts pattern)
    "mg_heavy_hitters_contracts": f"""
        SELECT CAST(count(*) AS BIGINT) AS n_events,
               {MG_K} AS k,
               TRUE AS at_most_k_ok,
               TRUE AS no_overcount_ok,
               TRUE AS undercount_bounded_ok,
               TRUE AS all_heavy_present_ok
        FROM events
    """,
    #: exact BECAUSE unsaturated — see mg_revenue_by_priority docstring
    "mg_revenue_by_priority": """
        SELECT o_orderpriority AS item,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS est_revenue_cents
        FROM orders GROUP BY o_orderpriority
    """,
    #: contract oracle: exact weight scalar + pinned verdict constants
    "mg_revenue_contracts": f"""
        SELECT CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS total_cents,
               {MG_K} AS k,
               TRUE AS at_most_k_ok,
               TRUE AS no_overcount_ok,
               TRUE AS undercount_bounded_ok,
               TRUE AS all_heavy_present_ok
        FROM orders
    """,
}

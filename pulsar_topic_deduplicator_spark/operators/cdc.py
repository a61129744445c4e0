"""Table mutation & versioning — CDC upsert-merge and SCD2 history builds.

NOT in the reference (its topic is append-only; `src/deduplication.ts`
forwards or drops, never rewrites). Mandated by the training-data-pipeline
extension tier: dataset curation at 100 TB is iterative — corpora get
re-crawled, relabeled, and re-scored, so the engine needs a MERGE that
folds an update batch into a base snapshot, and an SCD2 build that turns an
append-only change log into validity intervals for time-travel joins.

Scale notes:

* ``merge_upsert`` is a UNION + per-key argmax — ONE map-side-combined
  shuffle on the key, no join. The classic join-based MERGE shuffles both
  sides AND coalesces columns; the argmax form touches each row once and
  partial-aggregates before the exchange, so wire cost is O(distinct keys)
  on the combine-heavy side. Keys are ids (no skew); an adversarial hot key
  would fall out of AQE skew handling like any other agg.
* ``scd2_event_type_history`` is two window passes over the SAME
  ``user_id`` partitioning — the second window (and the start-row filter
  between them) reuses the first exchange, so the whole build is one
  shuffle regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table

#: price delta applied by the synthetic CDC batch (pure double add — exact
#: and identical in Spark and DuckDB, no rounding boundary to straddle)
_UPDATE_PRICE_DELTA = 10.0


def merge_upsert(base: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """Latest-wins MERGE of ``updates`` into ``base`` (same schema): rows
    whose key exists in both sides come from ``updates``; unmatched rows
    from either side pass through (i.e. MERGE ... WHEN MATCHED THEN UPDATE
    WHEN NOT MATCHED THEN INSERT).

    Implemented as union + per-key argmax over a version tag, not a join:
    one shuffle, partial agg, and at most one survivor per key per side —
    ``max_by`` never ties because the tag is distinct across sides.
    """
    payload = [c for c in base.columns if c not in key_cols]
    tagged = base.withColumn("__v", F.lit(0)).unionByName(
        updates.withColumn("__v", F.lit(1))
    )
    picked = tagged.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.col("__v")).alias("__row")
    )
    return picked.select(*key_cols, "__row.*")


def keep_latest(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Last-wins compaction: one row per key, the one greatest by
    ``order_cols`` (ties impossible when the order ends in a unique id).
    ``max_by`` over an ordering struct — one map-side-combined shuffle, and
    ASSOCIATIVE: keep_latest(keep_latest(A) ∪ keep_latest(B)) equals
    keep_latest(A ∪ B), which is what lets the streaming materializer fold
    micro-batches into a snapshot in any batch split (test-pinned)."""
    payload = [c for c in df.columns if c not in key_cols]
    picked = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*payload), F.struct(*order_cols)).alias("__row")
    )
    return picked.select(*key_cols, "__row.*")


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge demo on ``orders``: base snapshot = keys not divisible by
    5; update batch = even keys with the price bumped and status rewritten.
    Even-not-div-5 keys are updated in place, div-10 keys are fresh
    inserts, odd-not-div-5 keys survive untouched — all three MERGE arms in
    one deterministic fixture (reference semantics source: none — extension
    tier, see module docstring)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    base = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "src", F.lit("base")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(_UPDATE_PRICE_DELTA))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("src", F.lit("update"))
    )
    return merge_upsert(base, updates, ["o_orderkey"])


def scd2_history(changelog: DataFrame, key: str, attr: str, order_cols: list[str]) -> DataFrame:
    """Build SCD type-2 validity intervals from an append-only change log:
    collapse consecutive runs of the same ``attr`` value per ``key`` into
    one row [valid_from, valid_to), ``valid_to`` NULL for the current
    version. Both window passes partition on ``key`` — one shuffle."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = F.lag(attr).over(w)
    starts = (
        changelog.withColumn(
            "__chg", F.when(prev.isNull() | (prev != F.col(attr)), 1).otherwise(0)
        )
        .filter(F.col("__chg") == 1)
        .drop("__chg")
    )
    ws = Window.partitionBy(key).orderBy(*order_cols)
    return starts.select(
        key,
        F.row_number().over(ws).alias("version"),
        F.col(attr),
        F.col(order_cols[0]).alias("valid_from"),
        F.lead(order_cols[0]).over(ws).alias("valid_to"),
    )


def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the events log: per user, the history of ``event_type``
    as validity intervals — a new version starts whenever the type differs
    from the previous event's. The time-travel-join companion to
    ``sessionize_events`` (islands by value change, not by silence)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return scd2_history(ev, "user_id", "event_type", ["ts", "event_id"])


#: look-back offset for the point-in-time lookup (µs): "what was the user
#: doing 10 minutes before the purchase"
_LOOKBACK_US = 10 * 60 * 1_000_000


def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel join: each purchase fact looks up the SCD2 version that
    was current ten minutes BEFORE it — the query shape versioned
    dimensions exist for (joining facts against the dimension as-of the
    fact time, not as-of now). Composed from two already-verified kernels:
    the ``scd2_history`` build above and the as-of union+carry-forward
    join (``asof.asof_join``) — one shuffle each on user_id. Versions
    sharing a valid_from instant (same-ts ties) collapse to the highest
    version first, so the right side is unique per (key, ts) as the as-of
    kernel requires. Purchases earlier than any history row carry nulls
    (left semantics)."""
    from .asof import asof_join

    hist = scd2_event_type_history(spark, sf_dir)
    dim = (
        hist.groupBy("user_id", "valid_from")
        .agg(F.max(F.struct("version", "event_type")).alias("m"))
        .select(
            "user_id",
            "valid_from",
            F.col("m.version").alias("version"),
            F.col("m.event_type").alias("regime_type"),
        )
    )
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.timestamp_micros(F.unix_micros("ts") - F.lit(_LOOKBACK_US)).alias(
            "lookup_ts"
        ),
    )
    return asof_join(
        purch,
        dim,
        key="user_id",
        left_ts="lookup_ts",
        right_ts="valid_from",
        payload_cols=["version", "regime_type"],
    )


ORACLES: dict[str, str] = {
    "merge_upsert_orders": f"""
        WITH base AS (
          SELECT o_orderkey, o_totalprice, o_orderstatus, 'base' AS src, 0 AS v
          FROM orders WHERE o_orderkey % 5 <> 0),
        upd AS (
          SELECT o_orderkey, o_totalprice + {_UPDATE_PRICE_DELTA} AS o_totalprice,
                 'U' AS o_orderstatus, 'update' AS src, 1 AS v
          FROM orders WHERE o_orderkey % 2 = 0),
        u AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
        SELECT o_orderkey, o_totalprice, o_orderstatus, src
        FROM (SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rn
              FROM u)
        WHERE rn = 1
    """,
    "scd2_event_type_history": """
        WITH ord AS (
          SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        starts AS (
          SELECT user_id, event_type, ts AS valid_from, event_id
          FROM ord WHERE prev IS NULL OR prev <> event_type)
        SELECT user_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS INT) AS version,
               event_type, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
        FROM starts
    """,
}

ORACLES["scd2_point_in_time_join"] = f"""
    WITH hist AS ({ORACLES["scd2_event_type_history"]}),
    dim AS (
      SELECT user_id, valid_from,
             max(version) AS version,
             arg_max(event_type, version) AS regime_type
      FROM hist GROUP BY user_id, valid_from),
    p AS (
      SELECT event_id, user_id, ts,
             ts - INTERVAL {_LOOKBACK_US} MICROSECOND AS lookup_ts
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, p.lookup_ts,
           d.version, d.regime_type
    FROM p ASOF LEFT JOIN dim d
      ON p.user_id = d.user_id AND p.lookup_ts >= d.valid_from
"""

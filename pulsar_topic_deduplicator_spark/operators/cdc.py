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


#: Merkle-diff bucket geometry: LEAF buckets are the sync unit (what gets
#: re-shipped); TOP buckets are the first tree level the replicas compare.
#: leaf→top rollup is ``leaf div (MERKLE_LEAVES // MERKLE_TOPS)``.
MERKLE_LEAVES = 512
MERKLE_TOPS = 64
#: deterministic "replica drift" fixture: keys divisible by 997 got a price
#: bump + status rewrite on the remote side, keys divisible by 1499 were
#: deleted there (inserts are symmetric — a bucket with an extra row diffs
#: the same way a bucket with a missing one does)
_DRIFT_UPDATE_MOD = 997
_DRIFT_DELETE_MOD = 1499


def _orders_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, leaf, fp): 60-bit row fingerprint over every column
    (canonical renderings: %.2f price, epoch-µs date) + the key's leaf
    bucket. The fingerprint construction is the engine's standard
    ``stable_uint60`` so the oracle replays it exactly."""
    from ..functions.hashing import SEP, stable_uint60

    o = load_table(spark, sf_dir, "orders")
    rendered = F.concat_ws(
        SEP,
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.format_string("%.2f", F.col("o_totalprice")),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")),
        F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        (stable_uint60(F.col("o_orderkey").cast("string")) % MERKLE_LEAVES).alias(
            "leaf"
        ),
        stable_uint60(rendered).alias("fp"),
        "o_totalprice",
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        "o_orderpriority",
    )


def snapshot_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy snapshot diff via Merkle buckets — how two 100 TB
    replicas find their differences WITHOUT shipping either table: each
    side publishes per-bucket summaries ``(count, XOR of row
    fingerprints)``, the comparison descends the bucket tree, and only
    buckets whose summaries differ are re-synced (the rsync/Dynamo/
    Cassandra repair primitive, as a declarative plan).

    Local side = the orders snapshot; remote side = the same snapshot with
    a deterministic drift fixture applied (price/status updates on keys
    ÷ 997, deletions on keys ÷ 1499). Both sides are summarized at
    MERKLE_LEAVES leaf buckets; the engine compares the MERKLE_TOPS
    top-level rollups FIRST (XOR of leaf XORs — XOR is associative, so the
    rollup needs no re-scan) and descends only into differing top buckets
    — a semi-join prune that touches O(drifted buckets) of the leaf
    summaries, which is the property that makes repair feasible at scale
    (the exchanged summaries are KBs; re-shipped data is proportional to
    actual drift, not table size).

    Returns one row per DIFFERING leaf bucket: ``(leaf, n_local, n_remote,
    xor_local, xor_remote)`` (absent side = count 0 / XOR 0). The oracle
    computes the leaf-level diff FLAT — the tree descent is pure pruning,
    so hash-equality against the flat answer proves the descent lost
    nothing, the same completeness discipline as the prefix-filtered
    Jaccard join."""
    from ..cachereg import persist_scoped

    base = persist_scoped(_orders_fingerprints(spark, sf_dir))
    remote = (
        base.filter(F.col("o_orderkey") % _DRIFT_DELETE_MOD != 0)
        .withColumn(
            "drifted", F.col("o_orderkey") % _DRIFT_UPDATE_MOD == 0
        )
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("drifted"),
                F.col("o_totalprice") + F.lit(_UPDATE_PRICE_DELTA),
            ).otherwise(F.col("o_totalprice")),
        )
        .withColumn(
            "o_orderstatus",
            F.when(F.col("drifted"), F.lit("U")).otherwise(
                F.col("o_orderstatus")
            ),
        )
    )
    # drifted rows need their fingerprint recomputed from the new values
    remote = _refingerprint(remote)

    def _leaves(df: DataFrame) -> DataFrame:
        return df.groupBy("leaf").agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(fp)").alias("x")
        )

    # persist both leaf-summary frames (round 15, guide §2.4): each side
    # feeds TWO consumers (the top-level rollup and the pruned leaf
    # comparison), and a lazy frame re-runs its corpus-sized aggregate per
    # consumer — 4 leaf aggregations instead of 2. The frames are
    # MERKLE_LEAVES-sized (KBs) at any corpus scale.
    lv_l = persist_scoped(_leaves(base))
    lv_r = persist_scoped(_leaves(remote))
    top_div = MERKLE_LEAVES // MERKLE_TOPS

    def _tops(lv: DataFrame) -> DataFrame:
        return (
            lv.withColumn("top", F.expr(f"leaf div {top_div}"))
            .groupBy("top")
            .agg(F.sum("n").alias("n"), F.expr("bit_xor(x)").alias("x"))
        )

    t = (
        _tops(lv_l)
        .alias("a")
        .join(_tops(lv_r).alias("b"), "top", "full_outer")
        .filter(
            ~(
                F.col("a.n").eqNullSafe(F.col("b.n"))
                & F.col("a.x").eqNullSafe(F.col("b.x"))
            )
        )
        .select("top")
    )
    # descend: leaf comparison restricted to differing top buckets only
    in_tops = F.broadcast(t)

    def _pruned(lv: DataFrame) -> DataFrame:
        return lv.join(
            in_tops, F.expr(f"leaf div {top_div}") == F.col("top"), "semi"
        )

    diff = (
        _pruned(lv_l)
        .alias("a")
        .join(_pruned(lv_r).alias("b"), "leaf", "full_outer")
        .filter(
            ~(
                F.col("a.n").eqNullSafe(F.col("b.n"))
                & F.col("a.x").eqNullSafe(F.col("b.x"))
            )
        )
        .select(
            "leaf",
            F.coalesce(F.col("a.n"), F.lit(0)).alias("n_local"),
            F.coalesce(F.col("b.n"), F.lit(0)).alias("n_remote"),
            F.coalesce(F.col("a.x"), F.lit(0)).alias("xor_local"),
            F.coalesce(F.col("b.x"), F.lit(0)).alias("xor_remote"),
        )
    )
    return diff


def _refingerprint(df: DataFrame) -> DataFrame:
    from ..functions.hashing import SEP, stable_uint60

    rendered = F.concat_ws(
        SEP,
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.format_string("%.2f", F.col("o_totalprice")),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")),
        F.col("o_orderpriority"),
    )
    return df.withColumn("fp", stable_uint60(rendered))


def _merkle_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    def fp(price_expr: str, status_expr: str) -> str:
        return duck_stable_uint60(
            "CAST(o_orderkey AS VARCHAR) || chr(31) || "
            "CAST(o_custkey AS VARCHAR) || chr(31) || "
            f"{status_expr} || chr(31) || "
            f"printf('%.2f', {price_expr}) || chr(31) || "
            "CAST(epoch_us(o_orderdate) AS VARCHAR) || chr(31) || "
            "o_orderpriority"
        )

    leaf = (
        duck_stable_uint60("CAST(o_orderkey AS VARCHAR)")
        + f" % {MERKLE_LEAVES}"
    )
    return f"""
    WITH local AS (
      SELECT {leaf} AS leaf,
             {fp("o_totalprice", "o_orderstatus")} AS fp
      FROM orders),
    remote AS (
      SELECT {leaf} AS leaf,
             {fp(
                 f"CASE WHEN o_orderkey % {_DRIFT_UPDATE_MOD} = 0 "
                 f"THEN o_totalprice + {_UPDATE_PRICE_DELTA} "
                 "ELSE o_totalprice END",
                 f"CASE WHEN o_orderkey % {_DRIFT_UPDATE_MOD} = 0 "
                 "THEN 'U' ELSE o_orderstatus END",
             )} AS fp
      FROM orders WHERE o_orderkey % {_DRIFT_DELETE_MOD} != 0),
    la AS (SELECT leaf, count(*) AS n, bit_xor(fp) AS x
           FROM local GROUP BY leaf),
    ra AS (SELECT leaf, count(*) AS n, bit_xor(fp) AS x
           FROM remote GROUP BY leaf)
    SELECT COALESCE(la.leaf, ra.leaf) AS leaf,
           CAST(COALESCE(la.n, 0) AS BIGINT) AS n_local,
           CAST(COALESCE(ra.n, 0) AS BIGINT) AS n_remote,
           CAST(COALESCE(la.x, 0) AS BIGINT) AS xor_local,
           CAST(COALESCE(ra.x, 0) AS BIGINT) AS xor_remote
    FROM la FULL OUTER JOIN ra ON la.leaf = ra.leaf
    WHERE la.n IS DISTINCT FROM ra.n OR la.x IS DISTINCT FROM ra.x
    """


ORACLES["snapshot_merkle_diff"] = _merkle_oracle()

"""As-of join — point-in-time lookup, composed from Spark primitives.

NOT in the reference (no joins of any kind — SURVEY.md §2.3); this is the
classic time-series operator Spark lacks natively, implemented as the
union + carry-forward-window composition (brief: "composition of existing
DataFrame ops" before reaching for Pandas UDFs):

    1. tag right-side rows 0 and left-side rows 1,
    2. union on (key, ts, side),
    3. one window per key ordered by (ts, side):
       ``last(right_payload, ignorenulls=True)`` carries the most recent
       right row forward — at equal timestamps the right row sorts first,
       giving the standard ASOF ``left.ts >= right.ts`` inclusive semantics,
    4. keep the left rows.

Cost: ONE shuffle on the join key + a per-key sort — the same price as a
sort-merge join, with no range-explosion. Skewed keys behave like any
window (AQE/salting apply). Verified against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Generic inclusive as-of join: for each left row, the right row with
    the greatest ``right_ts`` ≤ ``left_ts`` within the same ``key``.

    ``payload_cols`` are the right-side columns carried onto the left rows
    (null when no right row precedes). Right side must be unique per
    (key, right_ts) — pre-aggregate if not."""
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload_cols).alias("_payload"),
    )
    l = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType))
    )
    # right rows carry null for left-only columns; they are dropped after
    # the carry-forward window anyway
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_match.{p}").alias(p) for p in payload_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the user's most recent purchase at-or-before its
    timestamp (inclusive — a purchase event matches itself)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max(
                F.struct(
                    F.col("event_id").alias("p_event_id"),
                    F.col("value").alias("p_value"),
                )
            ).alias("p")
        )
        .select(
            "user_id",
            F.col("ts").alias("p_ts_src"),
            F.col("p.p_event_id").alias("p_event_id"),
            F.col("ts").alias("p_ts"),
            F.col("p.p_value").alias("p_value"),
        )
    )
    return asof_join(
        ev.select("event_id", "ts", "user_id", "event_type"),
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="p_ts_src",
        payload_cols=["p_event_id", "p_ts", "p_value"],
    )


#: attribution-window length (µs) for the named interval-join query; also
#: the bucket width, so every interval explodes to at most 2 bucket rows
ATTRIB_WINDOW_US = 30 * 60 * 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: tuple = (),
    bucket_us: int = ATTRIB_WINDOW_US,
) -> DataFrame:
    """Generic point-in-interval (range) join: one output row per (point,
    interval) pair with ``start ≤ point_ts < end`` (and equal ``keys``,
    if given — each a column name shared by both sides, or a
    ``(point_col, interval_col)`` pair when the sides name the key
    differently).

    Spark has no native range join — expressed directly, the range
    predicate becomes a BroadcastNestedLoopJoin (or a cartesian product),
    both O(n×m) scale killers. This is the BUCKETIZED composition instead:
    each interval explodes to the coarse time buckets it covers
    (``sequence(floor(start/w), floor((end−1)/w))`` — end exclusive), each
    point hashes to exactly one bucket, and the range predicate rides a
    plain equi-join on (keys…, bucket) as a post-filter. A point matches
    each interval at most once (it lives in one bucket), so no dedup pass
    is needed. Explode factor is ≤ ``len/bucket_us + 1`` per interval — 2
    when the bucket width equals the max interval length — and the shuffle
    is the ordinary hash-partitioned equi-join exchange, AQE-skew-safe.

    Degenerate intervals (``end ≤ start``) can never contain a point under
    the half-open predicate, so they are filtered out before the explode —
    without this, Spark's ``sequence(lo, hi)`` with ``hi < lo`` generates a
    DESCENDING range, which for a far-negative interval length would
    explode unboundedly.
    """
    # Bucket ids come from double division + floor (Spark's `/` on longs).
    # Exactness doesn't matter — coverage does: double division is
    # monotone, every side uses the SAME formula, and start ≤ point < end
    # implies floor(start/w) ≤ floor(point/w) ≤ floor((end−1)/w), so a
    # point's bucket is always inside its interval's covered range even if
    # a quotient rounds across an integer boundary. The exact range
    # predicate below decides actual membership.
    p_us = F.unix_micros(F.col(point_ts))
    s_us = F.unix_micros(F.col(start_ts))
    e_us = F.unix_micros(F.col(end_ts))
    iv = intervals.filter(e_us > s_us).withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(s_us / F.lit(bucket_us)),
                F.floor((e_us - 1) / F.lit(bucket_us)),
            )
        ),
    )
    pt = points.withColumn("_pb", F.floor(p_us / F.lit(bucket_us)))
    on = pt["_pb"] == iv["_ib"]
    for k in keys:
        lk, rk = (k, k) if isinstance(k, str) else k
        on = on & (pt[lk] == iv[rk])
    on = (
        on
        & (pt[point_ts] >= iv[start_ts])
        & (pt[point_ts] < iv[end_ts])
    )
    return pt.join(iv, on)


def purchase_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution window table: one [ts, ts + 30 min) window per
    purchase — shared by the batch range join below and its streaming
    twin (``streaming/attribution.py``), so the two paths cannot drift."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("window_id"),
        F.col("user_id").alias("w_user_id"),
        F.col("ts").alias("w_start"),
        F.timestamp_micros(
            F.unix_micros("ts") + F.lit(ATTRIB_WINDOW_US)
        ).alias("w_end"),
    )


def purchase_attribution_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """For every purchase, the same user's events inside the 30-minute
    attribution window starting at the purchase (inclusive of the purchase
    itself) — the classic marketing-attribution range join, one row per
    (event, window) pair. Verified against DuckDB's native range join."""
    ev = load_table(spark, sf_dir, "events")
    pt = ev.select("event_id", "user_id", "ts", "event_type")
    joined = interval_join(
        pt,
        purchase_windows(spark, sf_dir),
        point_ts="ts",
        start_ts="w_start",
        end_ts="w_end",
        keys=(("user_id", "w_user_id"),),
    )
    return joined.select(
        pt["event_id"],
        pt["user_id"],
        pt["ts"],
        pt["event_type"],
        "window_id",
        "w_start",
    )


#: band half-width for the price band join, in exact tenths (the corpus's
#: price precision): |Δprice| ≤ 1.0
PRICE_BAND_DECI = 10

#: bucket width 2δ — each probe row explodes to at most 2 buckets
_BAND_BUCKET = 2 * PRICE_BAND_DECI


def band_self_join_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (theta) self-join on a VALUE domain — same-brand part pairs
    within 1.0 of retail price ("competing parts") — via the same
    bucketization as ``interval_join``, generalized off the time axis:
    expressed directly, ``abs(a.price − b.price) ≤ δ`` is a non-equi
    predicate Catalyst can only run as a nested-loop join; bucketized, the
    probe side explodes to ≤2 width-2δ buckets and the band check rides
    the (brand, bucket) equi-join.

    Prices are converted to EXACT tenths first (the data's precision), so
    band membership is integer arithmetic — no float-boundary flake in
    the pair set — and each (a, b) pair matches at most once because the
    build side sits in exactly one bucket.
    """
    part = load_table(spark, sf_dir, "part")
    deci = F.round(F.col("p_retailprice") * 10).cast("bigint")
    p = part.select("p_partkey", "p_brand", "p_retailprice", deci.alias("u"))
    b = p.select(*[F.col(c).alias(f"b_{c}") for c in p.columns]).withColumn(
        "_bb", F.floor(F.col("b_u") / F.lit(_BAND_BUCKET))
    )
    a = p.withColumn(
        "_ab",
        F.explode(
            F.sequence(
                F.floor(
                    (F.col("u") - PRICE_BAND_DECI) / F.lit(_BAND_BUCKET)
                ),
                F.floor(
                    (F.col("u") + PRICE_BAND_DECI) / F.lit(_BAND_BUCKET)
                ),
            )
        ),
    )
    joined = a.join(
        b,
        (F.col("_ab") == F.col("_bb"))
        & (F.col("p_brand") == F.col("b_p_brand"))
        & (F.col("b_p_partkey") < F.col("p_partkey"))
        & (F.abs(F.col("u") - F.col("b_u")) <= PRICE_BAND_DECI),
    )
    return joined.select(
        F.col("p_partkey").alias("part_a"),
        F.col("b_p_partkey").alias("part_b"),
        "p_brand",
        F.col("p_retailprice").alias("price_a"),
        F.col("b_p_retailprice").alias("price_b"),
        F.abs(F.col("u") - F.col("b_u")).alias("price_diff_tenths"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: tuple = (),
    bucket_us: int = ATTRIB_WINDOW_US,
) -> DataFrame:
    """Interval × interval OVERLAP join — the third member of the
    bucketized non-equi family (point-in-interval ``interval_join``,
    value-band ``band_self_join_prices``). Left intervals are CLOSED
    [l_start, l_end] (both bounds are observed timestamps, e.g. session
    min/max); right intervals are HALF-OPEN [r_start, r_end). Overlap iff
    ``l_start < r_end AND r_start <= l_end``.

    Both sides explode to their covered coarse buckets and the overlap
    predicate rides the (keys…, bucket) equi-join. Unlike the point case,
    an overlapping pair can share SEVERAL buckets, so the join keeps only
    the FIRST shared bucket — ``bucket == greatest(floor(ls/w),
    floor(rs/w))`` — which both sides provably cover whenever the pair
    overlaps (monotonicity of floor division), making the output
    duplicate-free without a distinct pass. Explode factor is
    ``len/bucket_us + 1`` per interval; the shuffle is an ordinary
    hash-partitioned equi-join, AQE-skew-safe, never an NLJ.
    """
    ls = F.unix_micros(F.col(l_start))
    le = F.unix_micros(F.col(l_end))
    rs = F.unix_micros(F.col(r_start))
    re_ = F.unix_micros(F.col(r_end))
    lt = left.filter(le >= ls).withColumn(
        "_lb",
        F.explode(
            F.sequence(F.floor(ls / F.lit(bucket_us)), F.floor(le / F.lit(bucket_us)))
        ),
    )
    rt = right.filter(re_ > rs).withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.floor(rs / F.lit(bucket_us)),
                F.floor((re_ - 1) / F.lit(bucket_us)),
            )
        ),
    )
    on = lt["_lb"] == rt["_rb"]
    for k in keys:
        lk, rk = (k, k) if isinstance(k, str) else k
        on = on & (lt[lk] == rt[rk])
    first_bucket = F.greatest(
        F.floor(F.unix_micros(lt[l_start]) / F.lit(bucket_us)),
        F.floor(F.unix_micros(rt[r_start]) / F.lit(bucket_us)),
    )
    on = (
        on
        & (F.unix_micros(lt[l_start]) < F.unix_micros(rt[r_end]))
        & (F.unix_micros(rt[r_start]) <= F.unix_micros(lt[l_end]))
        & (lt["_lb"] == first_bucket)
    )
    return lt.join(rt, on)


def session_purchase_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which user sessions overlap which purchase-attribution windows —
    the session-stitching shape (two interval sets over the same
    timeline). Sessions come from ``sessionize_events`` (closed: bounds
    are observed event times); windows from ``purchase_windows``
    (half-open), so both interval tables are shared with their verified
    sibling queries and the overlap semantics are the only new code."""
    from . import relational

    sess = relational.sessionize_events(spark, sf_dir).select(
        F.col("user_id").alias("s_user_id"),
        "session_id",
        "session_start",
        "session_end",
    )
    joined = interval_overlap_join(
        sess,
        purchase_windows(spark, sf_dir),
        l_start="session_start",
        l_end="session_end",
        r_start="w_start",
        r_end="w_end",
        keys=(("s_user_id", "w_user_id"),),
    )
    return joined.select(
        F.col("s_user_id").alias("user_id"),
        "session_id",
        "window_id",
        "session_start",
        "session_end",
        "w_start",
    )


ORACLES: dict[str, str] = {
    "band_self_join_prices": f"""
        WITH p AS (
          SELECT p_partkey, p_brand, p_retailprice,
                 CAST(round(p_retailprice * 10) AS BIGINT) AS u
          FROM part)
        SELECT a.p_partkey AS part_a, b.p_partkey AS part_b, a.p_brand,
               a.p_retailprice AS price_a, b.p_retailprice AS price_b,
               abs(a.u - b.u) AS price_diff_tenths
        FROM p a JOIN p b
          ON a.p_brand = b.p_brand AND b.p_partkey < a.p_partkey
         AND abs(a.u - b.u) <= {PRICE_BAND_DECI}
    """,
    "purchase_attribution_events": """
        WITH win AS (
          SELECT event_id AS window_id, user_id, ts AS w_start,
                 ts + INTERVAL 30 MINUTE AS w_end
          FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               w.window_id, w.w_start
        FROM events e JOIN win w
          ON e.user_id = w.user_id
         AND e.ts >= w.w_start AND e.ts < w.w_end
    """,
    "asof_last_purchase": """
        WITH purch AS (
          SELECT user_id, ts AS p_ts,
                 max(event_id) AS p_event_id,
                 arg_max(value, event_id) AS p_value
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id, ts)
        SELECT e.event_id, e.ts, e.user_id, e.event_type,
               p.p_event_id, p.p_ts, p.p_value
        FROM events e
        ASOF LEFT JOIN purch p
          ON e.user_id = p.user_id AND e.ts >= p.p_ts
    """,
}


def _session_overlap_oracle() -> str:
    """Reuse the verified sessionize SQL as the session CTE (shared
    fragment — the two oracles cannot drift) and join it to the window
    table with DuckDB's native non-equi predicate."""
    from .relational import ORACLES as _rel

    return f"""
        WITH sess AS ({_rel["sessionize_events"]}),
        win AS (
          SELECT event_id AS window_id, user_id, ts AS w_start,
                 ts + INTERVAL 30 MINUTE AS w_end
          FROM events WHERE event_type = 'purchase')
        SELECT s.user_id, s.session_id, w.window_id,
               s.session_start, s.session_end, w.w_start
        FROM sess s JOIN win w
          ON s.user_id = w.user_id
         AND s.session_start < w.w_end
         AND w.w_start <= s.session_end
    """


ORACLES["session_purchase_overlaps"] = _session_overlap_oracle()

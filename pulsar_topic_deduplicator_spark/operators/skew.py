"""Skew-mitigation utilities: salted two-stage aggregation and salted joins.

Low-cardinality / power-law keys (here: ``event_type`` — 5 values over the
whole corpus) put entire key populations on single reducers. The standard
fixes, provided as engine utilities:

* ``salted_aggregate`` — two-stage agg: shuffle on (key, salt) spreads each
  hot key over N reducers, then a cheap second agg over N partials merges.
  Works for any algebraic aggregate (sum/count/min/max and compositions).
* ``salted_broadcast_left`` — for joins, the small side is replicated per
  salt so the big side's hot keys spread (only needed when the big side
  must shuffle; with a broadcastable small side prefer plain broadcast).

AQE's skew-join handling covers *sort-merge join* skew at runtime;
aggregation skew and deliberate pre-spreading remain the author's job —
hence these helpers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table

DEFAULT_SALT = 16


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-stage aggregation over (keys + salt) then keys.

    ``partial_aggs`` run per (key, salt) shard; ``merge_aggs`` combine the
    shard partials (they reference the partial alias names). The salt is
    derived from a uniform random-ish but DETERMINISTIC expression
    (xxhash64 of the whole row via monotonically-increasing id is not
    reproducible across runs, so we hash the row content)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salt)
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def event_type_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats via salted two-stage aggregation — identical
    results to the direct groupBy (oracle-checked), but each of the 5 hot
    keys is spread over 16 reducers in stage one. Decimal sums make the
    two-stage merge bit-identical to the one-stage oracle."""
    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev,
        keys=["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("_sum"),
            F.min("value").alias("_min"),
            F.max("value").alias("_max"),
        ],
        merge_aggs=[
            F.sum("_n").alias("n"),
            F.sum("_sum").cast("double").alias("sum_value"),
            F.min("_min").alias("min_value"),
            F.max("_max").alias("max_value"),
        ],
    )


ORACLES: dict[str, str] = {
    "event_type_stats_salted": """
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
    """,
}


#: a key whose hottest value exceeds this share (ppm of rows) would put
#: >1% of the shuffle into one task — the documented trigger for the
#: salted-aggregation path above / AQE skew-join handling
SKEW_FLAG_PPM = 10_000

#: (table, column) shuffle-key candidates the advisor profiles
SKEW_KEYS = (
    ("events", "user_id"),
    ("events", "event_type"),
    ("orders", "o_custkey"),
)


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew advisor: for each candidate partitioning key,
    EXACT distribution facts a planner (or engineer) reads before keying
    a join/aggregation on it — ``(key, n_rows, n_keys, max_key_rows,
    max_share_ppm, hot_factor_x1000, needs_salting)``, where
    ``max_share_ppm`` is the hottest value's row share in parts-per-
    million, ``hot_factor_x1000`` is that share relative to the uniform
    1/n_keys share (1000 = perfectly uniform), and ``needs_salting``
    applies the SKEW_FLAG_PPM rule that gates the salted path in this
    module. At sf ≥ 0.01, ``events.event_type`` (5 values) flags while
    ``user_id``/``o_custkey`` don't — skew is a property of the KEY, not
    the table (at sf0.001 every key flags: 15 users over 6 000 rows is
    genuinely coarse).

    All-integer (ppm/x1000 fixed-point, no doubles). Cost per key: one
    scan → one map-side-combined count (vocab-sized) → a one-row
    aggregate; the advisor is cheap enough to run on every ingest
    batch."""
    parts = []
    for table, col in SKEW_KEYS:
        t = load_table(spark, sf_dir, table).select(
            F.col(col).cast("string").alias("k")
        )
        kc = t.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        parts.append(
            kc.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("c").alias("n_rows"),
                F.max("c").alias("max_key_rows"),
            ).select(
                F.lit(f"{table}.{col}").alias("key"),
                "n_rows",
                "n_keys",
                "max_key_rows",
            )
        )
    rep = parts[0]
    for p in parts[1:]:
        rep = rep.unionByName(p)
    return rep.select(
        "key",
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.expr("(max_key_rows * 1000000) div n_rows").alias("max_share_ppm"),
        F.expr("(max_key_rows * n_keys * 1000) div n_rows").alias(
            "hot_factor_x1000"
        ),
        (
            F.expr("(max_key_rows * 1000000) div n_rows") >= SKEW_FLAG_PPM
        ).alias("needs_salting"),
    )


def _skew_report_oracle() -> str:
    selects = []
    for table, col in SKEW_KEYS:
        selects.append(
            f"""SELECT '{table}.{col}' AS key,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(c) AS BIGINT) AS max_key_rows
        FROM (SELECT CAST({col} AS VARCHAR) AS k, count(*) AS c
              FROM {table} GROUP BY 1)"""
        )
    u = "\n        UNION ALL\n        ".join(selects)
    return f"""
    WITH rep AS (
        {u})
    SELECT key, n_rows, n_keys, max_key_rows,
           (max_key_rows * 1000000) // n_rows AS max_share_ppm,
           (max_key_rows * n_keys * 1000) // n_rows AS hot_factor_x1000,
           (max_key_rows * 1000000) // n_rows >= {SKEW_FLAG_PPM}
             AS needs_salting
    FROM rep
    """


ORACLES["key_skew_report"] = _skew_report_oracle()


#: rendezvous demo fleet sizes (scale-up from W to W+1)
HRW_W = 5


def rendezvous_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) key→worker placement and its
    minimal-movement guarantee under scale-up (Thaler & Ravishankar 1998
    — what consistent hashing gives rings, HRW gives with plain hashing):
    each key goes to ``argmax over workers of hash(key, worker)``, so
    growing the fleet from W to W+1 moves ONLY the keys the new worker
    now wins (expected 1/(W+1) of them) and every mover lands on the new
    worker — modulo-hashing would reshuffle ~all keys.

    Returns one row per worker of the W+1 fleet: ``(worker, n_keys_w5,
    n_keys_w6, n_arrivals)`` — counts under the old and new fleet and how
    many keys ARRIVED in the move. The guarantee is visible as data:
    ``n_arrivals`` is 0 everywhere except the new worker, where it equals
    ``n_keys_w6``.

    Plan: distinct keys × (W+1) literal workers explode (zero-shuffle per
    row), one per-key argmax (max_by over the (hash, worker) struct —
    deterministic tiebreak), one KB-sized count. The same expression
    placed in a streaming `withColumn` routes live traffic."""
    keys = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").cast("string").alias("k"))
        .distinct()
    )
    from ..functions.hashing import stable_uint60

    w_arr = F.array(*[F.lit(i) for i in range(HRW_W + 1)])
    h = stable_uint60(F.concat_ws("#", F.col("k"), F.col("w")))
    hashed = keys.select(
        "k", F.explode(w_arr).alias("w")
    ).select(
        "k",
        "w",
        # pack the (hash, worker) order into ONE BIGINT: h < 2^60 and
        # w < 8, so h*8 + w < 2^63 — injective and order-preserving,
        # and (unlike a struct key) portable to the oracle's arg_max
        (h * 8 + F.col("w")).alias("hw"),
    )
    per_key = hashed.groupBy("k").agg(
        F.max_by("w", F.col("hw")).alias("a6"),
        F.max_by(
            F.when(F.col("w") < HRW_W, F.col("w")),
            F.when(F.col("w") < HRW_W, F.col("hw")),
        ).alias("a5"),
    )
    w5 = per_key.groupBy(F.col("a5").alias("worker")).agg(
        F.count(F.lit(1)).alias("n_keys_w5")
    )
    w6 = per_key.groupBy(F.col("a6").alias("worker")).agg(
        F.count(F.lit(1)).alias("n_keys_w6"),
        F.sum((F.col("a5") != F.col("a6")).cast("long")).alias("n_arrivals"),
    )
    return (
        w6.join(w5, "worker", "full_outer")
        .select(
            "worker",
            F.coalesce("n_keys_w5", F.lit(0)).alias("n_keys_w5"),
            F.coalesce("n_keys_w6", F.lit(0)).alias("n_keys_w6"),
            F.coalesce("n_arrivals", F.lit(0)).alias("n_arrivals"),
        )
        .orderBy("worker")
    )


def _hrw_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    h = duck_stable_uint60("k || '#' || CAST(w AS VARCHAR)")
    workers = ", ".join(f"({i})" for i in range(HRW_W + 1))
    return f"""
    WITH keys AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events),
    hashed AS (
      SELECT k, w, {h} * 8 + w AS hw
      FROM keys CROSS JOIN (VALUES {workers}) AS ws(w)),
    per_key AS (
      SELECT k,
             arg_max(w, hw) AS a6,
             arg_max(CASE WHEN w < {HRW_W} THEN w END,
                     CASE WHEN w < {HRW_W} THEN hw END) AS a5
      FROM hashed GROUP BY k),
    w5 AS (SELECT a5 AS worker, count(*) AS n_keys_w5
           FROM per_key GROUP BY a5),
    w6 AS (SELECT a6 AS worker, count(*) AS n_keys_w6,
                  sum(CASE WHEN a5 != a6 THEN 1 ELSE 0 END) AS n_arrivals
           FROM per_key GROUP BY a6)
    SELECT COALESCE(w6.worker, w5.worker) AS worker,
           CAST(COALESCE(n_keys_w5, 0) AS BIGINT) AS n_keys_w5,
           CAST(COALESCE(n_keys_w6, 0) AS BIGINT) AS n_keys_w6,
           CAST(COALESCE(n_arrivals, 0) AS BIGINT) AS n_arrivals
    FROM w6 FULL OUTER JOIN w5 ON w6.worker = w5.worker
    ORDER BY worker
    """


ORACLES["rendezvous_assignment"] = _hrw_oracle()

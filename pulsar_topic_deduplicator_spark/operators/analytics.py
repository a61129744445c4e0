"""Product-analytics tier — funnel, cohort retention, histogram.

NOT in the reference (its telemetry is two scalar counters, op #13,
``src/deduplication.ts:80-95``); these are the standard event-analytics
aggregations any engine fed a deduplicated event stream gets asked for
next, and they exercise aggregation shapes the rest of the surface doesn't:
chained same-partition windows (funnel), self-derived dimension + offset
aggregation (cohorts), and float binning (histogram).

Scale notes: every operator here is ONE shuffle on its natural key.

* ``funnel_steps`` chains three window expressions over the SAME
  ``user_id`` partitioning — Catalyst plans them in one exchange; the
  final per-step rollup is a KB-sized aggregate of per-user booleans.
* ``weekly_cohort_retention`` derives the cohort dimension from the fact
  table itself with a min-over-user window (no dimension join), then
  counts distinct (user, offset) pairs — the distinct rides the same
  user-hashed exchange.
* ``value_histogram`` is a pure projection + count: bins are
  ``floor(value / width)`` — IEEE double division and floor are
  bit-identical cross-engine, so the oracle is exact (the float-binning
  analog of the integer ``_time_bucket``).

All time arithmetic is integer µs/day/week index math (`div`), never
calendar ``date_trunc`` — locale/week-start-independent and exactly
reproducible in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table

#: ordered funnel definition over the events stream
FUNNEL_STEPS = ["view", "click", "purchase"]

_US_PER_DAY = 86_400_000_000


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: a user reaches step k when
    the steps can be completed in ts order (greedy: each step matches its
    EARLIEST occurrence after the previous step — the standard funnel
    semantics, and the greedy choice is provably optimal: taking the
    earliest view leaves the most room for a later click). Output: one row
    per step with the number of users that reached it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("ts"))).over(w)
    ev1 = ev.select("user_id", "event_type", "ts", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STEPS[1]) & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    ev2 = ev1.select("*", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == FUNNEL_STEPS[2]) & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        ev2.select("*", t3.alias("t3"))
        .groupBy("user_id")
        .agg(
            F.max(F.col("t1").isNotNull()).alias("s1"),
            F.max(F.col("t2").isNotNull()).alias("s2"),
            F.max(F.col("t3").isNotNull()).alias("s3"),
        )
    )
    counts = per_user.agg(
        F.count(F.when(F.col("s1"), 1)).alias("n1"),
        F.count(F.when(F.col("s2"), 1)).alias("n2"),
        F.count(F.when(F.col("s3"), 1)).alias("n3"),
    )
    steps = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"n{i + 1}").alias("n_users"),
            )
            for i, s in enumerate(FUNNEL_STEPS)
        ]
    )
    return counts.select(F.explode(steps).alias("s")).select("s.*")


def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by the week index of their
    FIRST event; for each (cohort_week, week_offset) the number of
    distinct users active that many weeks later. Week index is integer
    epoch-day-div-7 — calendar-free and oracle-exact."""
    ev = load_table(spark, sf_dir, "events")
    # integer div throughout: double division near an exact day boundary
    # could truncate off-by-one
    week = F.expr(f"(unix_micros(ts) div {_US_PER_DAY}) div 7")
    ev = ev.select("user_id", week.alias("week_idx"))
    w = Window.partitionBy("user_id")
    ev = ev.select(
        "user_id", "week_idx", F.min("week_idx").over(w).alias("cohort_week")
    )
    return (
        ev.select(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


#: histogram bin width; the oracle SQL is derived from THIS constant so a
#: non-default width can never silently diverge from the checked contract
#: (ADVICE r5 item 4)
HIST_WIDTH = 25.0


def value_histogram(spark: SparkSession, sf_dir: str, width: float = HIST_WIDTH) -> DataFrame:
    """Fixed-width histogram of event values per type: bin k covers
    [k·width, (k+1)·width). floor(double / double) is IEEE-deterministic,
    so bins — and therefore counts — are exact cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / F.lit(width)).cast("long")
    return (
        ev.select("event_type", bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            (F.col("bin") * width).alias("bin_lo"),
            "n",
        )
    )


ORACLES: dict[str, str] = {
    "funnel_steps": f"""
        WITH e1 AS (
          SELECT user_id, event_type, ts,
                 min(CASE WHEN event_type = '{FUNNEL_STEPS[0]}' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
          FROM events),
        e2 AS (
          SELECT *, min(CASE WHEN event_type = '{FUNNEL_STEPS[1]}' AND ts > t1
                             THEN ts END) OVER (PARTITION BY user_id) AS t2
          FROM e1),
        e3 AS (
          SELECT *, min(CASE WHEN event_type = '{FUNNEL_STEPS[2]}' AND ts > t2
                             THEN ts END) OVER (PARTITION BY user_id) AS t3
          FROM e2),
        per_user AS (
          SELECT user_id,
                 max(t1 IS NOT NULL) AS s1,
                 max(t2 IS NOT NULL) AS s2,
                 max(t3 IS NOT NULL) AS s3
          FROM e3 GROUP BY user_id),
        c AS (
          SELECT count(CASE WHEN s1 THEN 1 END) AS n1,
                 count(CASE WHEN s2 THEN 1 END) AS n2,
                 count(CASE WHEN s3 THEN 1 END) AS n3
          FROM per_user)
        SELECT 1 AS step, '{FUNNEL_STEPS[0]}' AS event_type, n1 AS n_users FROM c
        UNION ALL
        SELECT 2, '{FUNNEL_STEPS[1]}', n2 FROM c
        UNION ALL
        SELECT 3, '{FUNNEL_STEPS[2]}', n3 FROM c
    """,
    "weekly_cohort_retention": f"""
        WITH w AS (
          SELECT user_id, (epoch_us(ts) // {_US_PER_DAY}) // 7 AS week_idx
          FROM events),
        c AS (
          SELECT user_id, week_idx,
                 min(week_idx) OVER (PARTITION BY user_id) AS cohort_week
          FROM w)
        SELECT cohort_week, week_idx - cohort_week AS week_offset,
               count(DISTINCT user_id) AS n_users
        FROM c
        GROUP BY 1, 2
    """,
    "value_histogram": """
        SELECT event_type,
               CAST(floor(value / {W}) AS BIGINT) AS bin,
               CAST(floor(value / {W}) AS BIGINT) * CAST({W} AS DOUBLE) AS bin_lo,
               count(*) AS n
        FROM events
        GROUP BY 1, 2, 3
    """,
}

# the histogram oracle shares HIST_WIDTH with the operator default (the
# BM25/CMS shared-constant pattern): change the width, the contract follows
ORACLES["value_histogram"] = ORACLES["value_histogram"].format(W=repr(HIST_WIDTH))


#: SAX symbolic time-series indexing knobs (Lin et al. 2003, "A Symbolic
#: Representation of Time Series"): PAA segments over the global event
#: span, and the alphabet size. Equi-WIDTH quantization over exact
#: integer cent-sums replaces the canonical z-norm + Gaussian breakpoints
#: — every step is integer arithmetic, so word assembly is bit-exact
#: cross-engine (the classic variant needs mean/std/libm; this variant
#: trades its distribution-adaptivity for exactness, the value_histogram
#: precedent). Shared verbatim with the oracle.
SAX_SEGMENTS = 8
SAX_ALPHA = 4


def sax_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user SAX word over the event-value time series — the symbolic
    time-series index for similarity grouping/search (users with the same
    word have the same coarse activity shape; a classic index for
    "find entities that behave like this one" over billions of series).
    Pipeline: bucket each event into its PAA segment (integer µs math
    over the global [min,max] span), sum exact value-cents per (user,
    segment), densify missing segments to 0, quantize each segment sum
    into SAX_ALPHA equi-width symbols over the global sum range, and
    assemble the per-user word in segment order. Returns (user_id,
    sax_word, n_events, total_cents).

    Exactness: cents are exact BIGINTs (2-dp fixture values × 100);
    segment and symbol assignment are pure integer floor-division —
    no libm anywhere, bit-identical on any engine or partitioning.

    Plan: two corpus scans (the scalar span aggregate, then the cent-sum
    build) and ONE corpus shuffle (the (user, segment) cent-sum, map-side
    combined); ``seg_sums`` and ``dense`` are scope-persisted — each
    feeds multiple consumers (users grid + dense join; sum-range scalar +
    lettering) and without the persists the cent-sum pipeline re-executes
    per consumer (measured: 13 parquet scans instead of 2). The global
    span and sum-range are scalar aggregates broadcast back; the dense
    grid is users × SAX_SEGMENTS rows (tiny); the word assembly rides
    the same user-keyed exchange as the grid. At 100 TB the series never
    materializes raw — only SEGMENTS longs per user cross the wire."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    span = ev.agg(
        F.min("tus").alias("smin"), F.max("tus").alias("smax")
    )
    seg_sums = (
        ev.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            ((F.col("tus") - F.col("smin")) * SAX_SEGMENTS)
            .cast("long")
            .alias("num"),
            (F.col("smax") - F.col("smin") + 1).alias("den"),
            "cents",
        )
        .select(
            "user_id",
            F.expr("num div den").alias("seg"),
            "cents",
        )
        .groupBy("user_id", "seg")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    from ..cachereg import persist_scoped

    seg_sums = persist_scoped(seg_sums)  # consumers: users grid + dense join
    users = seg_sums.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(SAX_SEGMENTS - 1))
        ).alias("seg0"),
    ).select("user_id", F.col("seg0").cast("long").alias("seg"))
    dense = grid.join(seg_sums, ["user_id", "seg"], "left").select(
        "user_id",
        "seg",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("s", F.lit(0)).alias("s"),
    )
    dense = persist_scoped(dense)  # consumers: sum-range scalar + lettering
    srange = dense.agg(
        F.min("s").alias("qmin"), F.max("s").alias("qmax")
    )
    lettered = (
        dense.crossJoin(F.broadcast(srange))
        .select(
            "user_id",
            "seg",
            "n",
            "s",
            F.expr(
                f"char(97 + ((s - qmin) * {SAX_ALPHA})"
                " div (qmax - qmin + 1))"
            ).alias("letter"),
        )
    )
    return lettered.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("seg"), F.col("letter")))
                ),
                lambda x: x["letter"],
            ),
            "",
        ).alias("sax_word"),
        F.sum("n").alias("n_events"),
        F.sum("s").alias("total_cents"),
    )


def sax_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX bucket census: how many users share each activity-shape word
    (the bucket sizes an index lookup would fan out to), with the bucket's
    event mass. Composed on ``sax_fingerprints``; one extra KB-sized
    shuffle on the word."""
    fp = sax_fingerprints(spark, sf_dir)
    return fp.groupBy("sax_word").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"),
        F.sum("total_cents").alias("total_cents"),
    )


_SAX_CTE = f"""
    ev AS (
      SELECT user_id, epoch_us(ts) AS tus,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    span AS (SELECT min(tus) AS smin, max(tus) AS smax FROM ev),
    seg_sums AS (
      SELECT user_id,
             ((tus - smin) * {SAX_SEGMENTS}) // (smax - smin + 1) AS seg,
             count(*) AS n, sum(cents) AS s
      FROM ev, span GROUP BY 1, 2),
    grid AS (
      SELECT user_id, CAST(g AS BIGINT) AS seg
      FROM (SELECT DISTINCT user_id FROM seg_sums),
           (SELECT unnest(generate_series(0, {SAX_SEGMENTS - 1})) AS g)),
    dense AS (
      SELECT grid.user_id, grid.seg,
             coalesce(ss.n, 0) AS n, coalesce(ss.s, 0) AS s
      FROM grid LEFT JOIN seg_sums ss
        ON grid.user_id = ss.user_id AND grid.seg = ss.seg),
    srange AS (SELECT min(s) AS qmin, max(s) AS qmax FROM dense),
    lettered AS (
      SELECT user_id, seg, n, s,
             chr(97 + CAST(((s - qmin) * {SAX_ALPHA})
                           // (qmax - qmin + 1) AS INTEGER)) AS letter
      FROM dense, srange),
    fp AS (
      SELECT user_id,
             string_agg(letter, '' ORDER BY seg) AS sax_word,
             CAST(sum(n) AS BIGINT) AS n_events,
             CAST(sum(s) AS BIGINT) AS total_cents
      FROM lettered GROUP BY user_id)"""

ORACLES["sax_fingerprints"] = f"""
    WITH {_SAX_CTE}
    SELECT user_id, sax_word, n_events, total_cents FROM fp
"""

ORACLES["sax_word_counts"] = f"""
    WITH {_SAX_CTE}
    SELECT sax_word, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(total_cents) AS BIGINT) AS total_cents
    FROM fp GROUP BY sax_word
"""


#: anomaly detection knobs: trailing history window (hourly buckets) and
#: the spike threshold in sigmas. The z-test is evaluated as the exact
#: integer inequality (c·n − s1)² > SIGMAS²·(n·s2 − s1²) — algebraically
#: identical to (c − mean) > SIGMAS·σ for a spike, with no division, no
#: sqrt, no float anywhere — so the flags are bit-exact cross-engine.
ANOM_WINDOW = 24
ANOM_SIGMAS = 3
ANOM_MIN_HIST = 8


def hourly_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window spike detection over the deduplicated event stream
    — the monitoring read a dedup service's operators actually watch
    ("did event volume for this topic just triple?"): hourly event counts
    per type, each bucket tested against the mean/σ of its own trailing
    ANOM_WINDOW buckets (the bucket itself excluded), flagged when it
    exceeds mean + ANOM_SIGMAS·σ. Returns (event_type, bucket_us,
    n_events, hist_n, hist_sum, hist_sumsq, is_spike); buckets with
    history shorter than ANOM_MIN_HIST are never flagged (cold start).

    Exactness: counts are integers; the z-test runs entirely in integer
    algebra (see ANOM_WINDOW note) — the one subtlety is squaring before
    comparing, which requires the spike side (c·n − s1 > 0) to be tested
    first so dips don't alias into spikes.

    Plan: ONE (type, bucket) count aggregate (map-side combined — the
    corpus collapses to types × hours rows) and one type-partitioned
    ordered window over that KB-to-MB-sized frame; nothing corpus-sized
    shuffles twice. At 100 TB the bucket frame is still tiny (types ×
    hours), so the window is cheap regardless of corpus size."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hb = F.expr("unix_micros(ts) div 3600000000") * F.lit(3_600_000_000)
    counts = (
        ev.select("event_type", hb.alias("bucket_us"))
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    hist = counts.select(
        "event_type",
        "bucket_us",
        "n_events",
        F.count(F.lit(1)).over(w).alias("hist_n"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).alias("hist_sum"),
        F.coalesce(
            F.sum(F.col("n_events") * F.col("n_events")).over(w), F.lit(0)
        ).alias("hist_sumsq"),
    )
    c, n, s1, s2 = (
        F.col("n_events"),
        F.col("hist_n"),
        F.col("hist_sum"),
        F.col("hist_sumsq"),
    )
    # (c−mean)² > S²·var, both sides × n²:  (c·n−s1)² > S²·(n·s2−s1²)
    dev = c * n - s1  # n·(c − mean), integer
    var_n2 = n * s2 - s1 * s1  # n²·var, integer
    spike = (
        (n >= ANOM_MIN_HIST)
        & (dev > 0)
        & (dev * dev > F.lit(ANOM_SIGMAS * ANOM_SIGMAS) * var_n2)
    )
    return hist.select(
        "event_type",
        "bucket_us",
        "n_events",
        "hist_n",
        "hist_sum",
        "hist_sumsq",
        spike.alias("is_spike"),
    )


ORACLES["hourly_anomaly_flags"] = f"""
    WITH counts AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
             count(*) AS n_events
      FROM events GROUP BY 1, 2),
    hist AS (
      SELECT event_type, bucket_us, n_events,
             count(*) OVER tw AS hist_n,
             coalesce(sum(n_events) OVER tw, 0) AS hist_sum,
             coalesce(sum(n_events * n_events) OVER tw, 0) AS hist_sumsq
      FROM counts
      WINDOW tw AS (PARTITION BY event_type ORDER BY bucket_us
                    ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING))
    SELECT event_type, CAST(bucket_us AS BIGINT) AS bucket_us,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(hist_n AS BIGINT) AS hist_n,
           CAST(hist_sum AS BIGINT) AS hist_sum,
           CAST(hist_sumsq AS BIGINT) AS hist_sumsq,
           hist_n >= {ANOM_MIN_HIST}
           AND (n_events * hist_n - hist_sum) > 0
           AND (n_events * hist_n - hist_sum)
               * (n_events * hist_n - hist_sum)
               > {ANOM_SIGMAS * ANOM_SIGMAS}
                 * (hist_n * hist_sumsq - hist_sum * hist_sum)
             AS is_spike
    FROM hist
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream —
    ``(from_type, to_type, n_transitions, prob_ppb)``: for each user's
    event sequence (ordered by event time, tie-broken by event_id), the
    count of each consecutive type pair and the row-normalized transition
    probability in exact integer parts-per-billion
    (``1e9·n div row_total`` — no float division, the `cf_similar_suppliers`
    fixed-point discipline). The next-event model behind funnel analysis
    and session-behavior monitoring.

    Plan: one per-user ordered window (lead) over the events scan — the
    same single-shuffle shape as `sessionize_events` — then a (from, to)
    count whose output is |types|² rows, and a broadcast row-total join on
    the KB-sized matrix. Nothing corpus-sized shuffles twice."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    from ..cachereg import persist_scoped

    # counts feeds both the join side and the row totals — without the
    # persist, Catalyst evaluates the corpus-sized window+count sub-DAG
    # twice (plan audit showed 5 exchanges; the matrix is |types|² rows,
    # so pinning it costs KBs and halves the corpus work)
    counts = persist_scoped(
        steps.groupBy("from_type", "to_type").agg(
            F.count(F.lit(1)).alias("n_transitions")
        )
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("row_total")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr("(1000000000 * n_transitions) div row_total").alias(
            "prob_ppb"
        ),
    )


ORACLES["event_transitions"] = """
    WITH steps AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    counts AS (
      SELECT from_type, to_type, count(*) AS n_transitions
      FROM steps WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type),
    totals AS (
      SELECT from_type, sum(n_transitions) AS row_total
      FROM counts GROUP BY from_type)
    SELECT c.from_type, c.to_type,
           CAST(c.n_transitions AS BIGINT) AS n_transitions,
           CAST((1000000000 * c.n_transitions) // t.row_total AS BIGINT)
             AS prob_ppb
    FROM counts c JOIN totals t USING (from_type)
"""


def seasonal_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-baseline spike detection — the complement of
    ``hourly_anomaly_flags``'s trailing window: each (event_type, hourly
    bucket) is tested against the mean/σ of the SAME HOUR-OF-DAY across
    all OTHER days (leave-one-out), catching "3 am traffic at noon
    levels" that a trailing window normalizes away and not flagging a
    daily rush hour the trailing window would. Returns (event_type,
    bucket_us, hour_of_day, n_events, hist_n, hist_sum, hist_sumsq,
    is_spike); baselines shorter than ANOM_MIN_HIST never flag.

    Exactness: the same all-integer z-test algebra as the trailing twin —
    (c·n − s1)² > S²·(n·s2 − s1²) with the spike side sign-tested first —
    where the leave-one-out history is derived by SUBTRACTION from the
    (type, hour-of-day) group totals: hist_n = cnt−1, hist_sum = Σ−c,
    hist_sumsq = Σ²−c², all BIGINT.

    Plan: ONE (type, bucket) count aggregate (the corpus-sized stage,
    map-side combined), then one (type, hour-of-day) aggregate over the
    bucket frame broadcast-joined back — no ordered window at all; at
    100 TB the bucket frame is types × hours, KBs."""
    ev = load_table(spark, sf_dir, "events")
    hb = F.expr("unix_micros(ts) div 3600000000") * F.lit(3_600_000_000)
    counts = (
        ev.select("event_type", hb.alias("bucket_us"))
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "hour_of_day",
            # integer div/mod, matching the oracle's // arithmetic exactly
            # (float division happens to be exact on the hour grid, but
            # BIGINT-in/BIGINT-out is the discipline)
            F.expr(
                "CAST((bucket_us div 3600000000) % 24 AS INT)"
            ),
        )
    )
    totals = counts.groupBy("event_type", "hour_of_day").agg(
        F.count(F.lit(1)).alias("g_n"),
        F.sum("n_events").alias("g_sum"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("g_sumsq"),
    )
    j = counts.join(F.broadcast(totals), ["event_type", "hour_of_day"])
    c = F.col("n_events")
    n = F.col("g_n") - 1
    s1 = F.col("g_sum") - c
    s2 = F.col("g_sumsq") - c * c
    dev = c * n - s1
    var_n2 = n * s2 - s1 * s1
    spike = (
        (n >= ANOM_MIN_HIST)
        & (dev > 0)
        & (dev * dev > F.lit(ANOM_SIGMAS * ANOM_SIGMAS) * var_n2)
    )
    return j.select(
        "event_type",
        F.col("bucket_us").cast("long").alias("bucket_us"),
        "hour_of_day",
        c.cast("long").alias("n_events"),
        n.cast("long").alias("hist_n"),
        s1.cast("long").alias("hist_sum"),
        s2.cast("long").alias("hist_sumsq"),
        spike.alias("is_spike"),
    )


ORACLES["seasonal_anomaly_flags"] = f"""
    WITH counts AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
             count(*) AS n_events
      FROM events GROUP BY 1, 2),
    hod AS (
      SELECT event_type, bucket_us, n_events,
             CAST((bucket_us // 3600000000) % 24 AS INTEGER) AS hour_of_day
      FROM counts),
    totals AS (
      SELECT event_type, hour_of_day,
             count(*) AS g_n, sum(n_events) AS g_sum,
             sum(n_events * n_events) AS g_sumsq
      FROM hod GROUP BY 1, 2)
    SELECT h.event_type, CAST(h.bucket_us AS BIGINT) AS bucket_us,
           h.hour_of_day,
           CAST(h.n_events AS BIGINT) AS n_events,
           CAST(t.g_n - 1 AS BIGINT) AS hist_n,
           CAST(t.g_sum - h.n_events AS BIGINT) AS hist_sum,
           CAST(t.g_sumsq - h.n_events * h.n_events AS BIGINT) AS hist_sumsq,
           (t.g_n - 1) >= {ANOM_MIN_HIST}
           AND (h.n_events * (t.g_n - 1) - (t.g_sum - h.n_events)) > 0
           AND (h.n_events * (t.g_n - 1) - (t.g_sum - h.n_events))
               * (h.n_events * (t.g_n - 1) - (t.g_sum - h.n_events))
               > {ANOM_SIGMAS * ANOM_SIGMAS}
                 * ((t.g_n - 1) * (t.g_sumsq - h.n_events * h.n_events)
                    - (t.g_sum - h.n_events) * (t.g_sum - h.n_events))
             AS is_spike
    FROM hod h JOIN totals t
      ON h.event_type = t.event_type AND h.hour_of_day = t.hour_of_day
"""


#: reported histogram quantiles (permille — integer rank math end to end)
HQ_PERMILLES = (500, 950, 990)


def histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile ROLLUP from mergeable fixed-bin histograms — the
    monitoring-percentile pattern (Prometheus ``histogram_quantile``):
    quantiles don't re-roll, so the store materializes per-hour histograms
    and answers daily (or any coarser) percentiles from the MERGED bins —
    bin counts add, so the merge is one sum, never a raw re-scan. Returns
    ``(event_type, bucket_day_us, quantile_permille, total_n, est_upper)``
    per day × HQ_PERMILLES: est_upper is the upper edge of the first bin
    whose cumulative count reaches rank ceil(q·total/1000) — the
    conservative upper bound; the true value lies in
    (est_upper − width, est_upper], pinned in tests.

    Exactness: bins are floor(value/width) (IEEE-deterministic like
    ``value_histogram``); the rank crossing is pure BIGINT
    (cum·1000 ≥ total·q ⟺ cum ≥ ⌈total·q/1000⌉); est_upper is an exact
    multiple of the width. Fully oracle-exact — the property HLL/t-digest
    style sketches cannot offer.

    Plan: ONE corpus-sized (type, hour, bin) count agg (the level-1
    artifact a store materializes incrementally), then everything runs on
    the bin frame: a (type, day, bin) re-sum, one cumulative window per
    (type, day) over ≤ bins rows, a broadcast quantile frame, and a
    min-bin argmin — KBs at any corpus scale."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hb = F.expr("unix_micros(ts) div 3600000000") * F.lit(3_600_000_000)
    hourly = (
        ev.select(
            "event_type",
            hb.alias("bucket_us"),
            F.floor(F.col("value") / F.lit(HIST_WIDTH)).cast("long").alias(
                "bin"
            ),
        )
        .groupBy("event_type", "bucket_us", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    day = (
        F.expr("bucket_us div 86400000000") * F.lit(86_400_000_000)
    ).cast("long")
    daily = (
        hourly.groupBy("event_type", day.alias("bucket_day_us"), "bin")
        .agg(F.sum("n").alias("n"))
    )
    w = Window.partitionBy("event_type", "bucket_day_us").orderBy("bin")
    cum = daily.select(
        "event_type",
        "bucket_day_us",
        "bin",
        F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("n").over(
            Window.partitionBy("event_type", "bucket_day_us")
        ).alias("total_n"),
    )
    qf = spark.createDataFrame(
        [(q,) for q in HQ_PERMILLES], "quantile_permille int"
    )
    hits = cum.crossJoin(F.broadcast(qf)).filter(
        F.col("cum") * 1000 >= F.col("total_n") * F.col("quantile_permille")
    )
    return hits.groupBy(
        "event_type", "bucket_day_us", "quantile_permille"
    ).agg(
        F.max("total_n").alias("total_n"),
        ((F.min("bin") + 1) * F.lit(HIST_WIDTH)).alias("est_upper"),
    )


ORACLES["histogram_quantile_rollup"] = f"""
    WITH hourly AS (
      SELECT event_type,
             (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
             CAST(floor(value / {HIST_WIDTH!r}) AS BIGINT) AS bin,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3),
    daily AS (
      SELECT event_type,
             (bucket_us // 86400000000) * 86400000000 AS bucket_day_us,
             bin, sum(n) AS n
      FROM hourly GROUP BY 1, 2, 3),
    cum AS (
      SELECT event_type, bucket_day_us, bin,
             sum(n) OVER (PARTITION BY event_type, bucket_day_us
                          ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             sum(n) OVER (PARTITION BY event_type, bucket_day_us)
               AS total_n
      FROM daily),
    qs AS (SELECT unnest([{", ".join(str(q) for q in HQ_PERMILLES)}])
             AS quantile_permille)
    SELECT event_type, CAST(bucket_day_us AS BIGINT) AS bucket_day_us,
           CAST(quantile_permille AS INTEGER) AS quantile_permille,
           CAST(max(total_n) AS BIGINT) AS total_n,
           (min(bin) + 1) * CAST({HIST_WIDTH!r} AS DOUBLE) AS est_upper
    FROM cum, qs
    WHERE cum * 1000 >= total_n * quantile_permille
    GROUP BY 1, 2, 3
"""


#: A/B assignment split point (hash-percent of user id; < AB_SPLIT = control)
AB_SPLIT = 50
#: conversion event + value floor (the corpus's per-user max purchase value
#: has median ≈ 140 at every SF, so this keeps conversion near 50% — a
#: degenerate all-converted pool makes the z denominator exactly 0)
AB_GOAL = "purchase"
AB_VALUE_MIN = 140.0


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B experiment readout over the event stream — the
    analysis every deduped product-event pipeline feeds next: users are
    assigned to control/treatment by the STABLE content hash of their id
    (a pure function of the user — same arm on every run, every cluster,
    and on re-ingest; `rand()` assignment would unbalance on retries),
    conversion = the user emitted ≥1 ``AB_GOAL`` event, and the readout is
    one row: per-arm user/converter counts, exact-integer value totals
    (cents), conversion rates, and the pooled two-proportion z-score.

    Determinism: counts and cent totals are exact BIGINTs; the rates and
    z-score are doubles built from the SAME expression tree in both
    engines (casts, div, sqrt — all IEEE-exact operations), so even the
    float columns hash-match. (The synthetic arms differ only by hash
    noise, so z ≈ 0 — the A/A-test shape; a real experiment reads the same
    query.)

    Plan: per-user conversion flags are one groupBy(user) over a
    projected scan; arm totals are a second KB-sized agg; the final row
    is a conditional-aggregation pivot — two shuffles total, the second
    over (n_users ≪ events) rows."""
    ev = load_table(spark, sf_dir, "events")
    from ..functions.hashing import stable_uint60

    goal = (F.col("event_type") == AB_GOAL) & (
        F.col("value") >= AB_VALUE_MIN
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(goal.cast("int")).alias("conv"),
        F.sum(
            F.when(
                F.col("event_type") == AB_GOAL,
                F.floor(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("value_cents"),
    )
    armed = per_user.withColumn(
        "arm",
        F.when(
            stable_uint60(F.col("user_id").cast("string")) % 100 < AB_SPLIT,
            "control",
        ).otherwise("treatment"),
    )
    arms = armed.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").alias("x"),
        F.sum("value_cents").alias("v"),
    )
    row = arms.agg(
        F.sum(F.when(F.col("arm") == "control", F.col("n"))).alias("n_c"),
        F.sum(F.when(F.col("arm") == "control", F.col("x"))).alias("x_c"),
        F.sum(F.when(F.col("arm") == "control", F.col("v"))).alias(
            "value_cents_c"
        ),
        F.sum(F.when(F.col("arm") == "treatment", F.col("n"))).alias("n_t"),
        F.sum(F.when(F.col("arm") == "treatment", F.col("x"))).alias("x_t"),
        F.sum(F.when(F.col("arm") == "treatment", F.col("v"))).alias(
            "value_cents_t"
        ),
    )
    # rates and z from the exact counts — identical expression text in the
    # oracle so the doubles are bit-equal
    z_expr = (
        "(CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c) / "
        "sqrt((CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) * "
        "(CAST(1 AS DOUBLE) - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) * "
        "(CAST(1 AS DOUBLE) / n_c + CAST(1 AS DOUBLE) / n_t))"
    )
    return row.select(
        "n_c",
        "x_c",
        "value_cents_c",
        "n_t",
        "x_t",
        "value_cents_t",
        F.expr("CAST(x_c AS DOUBLE) / n_c").alias("rate_c"),
        F.expr("CAST(x_t AS DOUBLE) / n_t").alias("rate_t"),
        F.expr(z_expr).alias("z_score"),
    )


def _ab_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    h = duck_stable_uint60("CAST(user_id AS VARCHAR)")
    return f"""
    WITH per_user AS (
      SELECT user_id,
             max(CASE WHEN event_type = '{AB_GOAL}'
                       AND value >= {AB_VALUE_MIN} THEN 1 ELSE 0 END)
               AS conv,
             sum(CASE WHEN event_type = '{AB_GOAL}'
                      THEN CAST(floor(value * 100) AS BIGINT)
                      ELSE 0 END) AS value_cents
      FROM events GROUP BY user_id),
    armed AS (
      SELECT *, CASE WHEN {h} % 100 < {AB_SPLIT} THEN 'control'
                     ELSE 'treatment' END AS arm
      FROM per_user),
    arms AS (
      SELECT arm, count(*) AS n, sum(conv) AS x, sum(value_cents) AS v
      FROM armed GROUP BY arm),
    row_ AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'control' THEN n END) AS BIGINT) AS n_c,
        CAST(sum(CASE WHEN arm = 'control' THEN x END) AS BIGINT) AS x_c,
        CAST(sum(CASE WHEN arm = 'control' THEN v END) AS BIGINT)
          AS value_cents_c,
        CAST(sum(CASE WHEN arm = 'treatment' THEN n END) AS BIGINT) AS n_t,
        CAST(sum(CASE WHEN arm = 'treatment' THEN x END) AS BIGINT) AS x_t,
        CAST(sum(CASE WHEN arm = 'treatment' THEN v END) AS BIGINT)
          AS value_cents_t
      FROM arms)
    SELECT n_c, x_c, value_cents_c, n_t, x_t, value_cents_t,
           CAST(x_c AS DOUBLE) / n_c AS rate_c,
           CAST(x_t AS DOUBLE) / n_t AS rate_t,
           (CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c) /
           sqrt((CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) *
                (CAST(1 AS DOUBLE) - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) *
                (CAST(1 AS DOUBLE) / n_c + CAST(1 AS DOUBLE) / n_t))
             AS z_score
    FROM row_
    """


ORACLES["ab_test_report"] = _ab_oracle()


#: trim share per tail, in percent (10 % lowest + 10 % highest dropped)
TRIM_PCT = 10


def trimmed_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistic: the TRIMMED mean of event value per
    event_type — drop the lowest and highest TRIM_PCT% of rows by rank
    (deterministic tiebreak on event_id) and average the middle. The
    robust-location complement of the profiler's raw mean and the GK
    median: outliers and fat tails can't move it, which is why metric
    pipelines alert on trimmed means.

    Exactness: the trim boundary is integer rank arithmetic (drop k =
    (n·TRIM_PCT) div 100 per tail); the kept sum accumulates in
    DECIMAL(18,2) (associative — no float-order dependence) and divides
    once at the end. One shuffle on event_type + one ranked window on the
    same exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    ).withColumn("k", F.expr(f"(n * {TRIM_PCT}) div 100"))
    kept = ranked.filter(
        (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("trimmed_mean"),
    )


ORACLES["trimmed_mean_by_type"] = f"""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    kept AS (
      SELECT event_type, value
      FROM ranked
      WHERE rn > (n * {TRIM_PCT}) // 100
        AND rn <= n - (n * {TRIM_PCT}) // 100)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             AS trimmed_mean
    FROM kept GROUP BY event_type
"""


# --- rolling distinct actives -----------------------------------------------

#: rolling window width in days for the WAU readout
ROLLING_WINDOW_DAYS = 7


def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and rolling 7-day distinct actives (WAU) for every epoch-day in
    the data range — the standard engagement readout over a deduplicated
    event stream (complements ``weekly_cohort_retention``'s cohort view;
    the reference's telemetry, op #13, stops at two scalar counters).

    Scale: the textbook formulation — ``COUNT(DISTINCT user_id) OVER
    (ORDER BY day RANGE 6 PRECEDING)`` — puts a distinct inside a window,
    which neither partial-aggregates nor distributes (one task owns the
    whole ordered stream). This plan rewrites it as COVERAGE EXPLODE:
    each distinct (user, day) activity is visible to exactly the W
    window-days ``day .. day+W−1``, so the rolling distinct becomes an
    ordinary ``groupBy(day).count_distinct(user)`` over a W×-linear
    exploded frame — every stage partial-aggregated, no self-range-join
    (which would carry the same W× blowup plus a shuffle per side and
    hot-day skew). Day arithmetic is integer µs-div (calendar-free,
    oracle-exact); the day grid and per-day frames are KB-sized at any
    corpus scale, so the closing left joins broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {_US_PER_DAY}")
    act = ev.select("user_id", day.alias("day")).distinct()
    return actives_readout(act)


def actives_readout(act: DataFrame) -> DataFrame:
    """(day, dau, wau_7d) grid from a DISTINCT (user_id, day) activity
    frame — shared by the batch operator above and the streaming
    incremental-index twin (``streaming/actives.py``), so both surfaces
    compute the readout from one definition."""
    horizon = F.lit(ROLLING_WINDOW_DAYS - 1)
    cover = act.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + horizon)).alias("day"),
    )
    wau = cover.groupBy("day").agg(F.count_distinct("user_id").alias("wau_7d"))
    dau = act.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    grid = (
        act.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    zero = F.lit(0).cast("long")
    return (
        grid.join(F.broadcast(dau), "day", "left")
        .join(F.broadcast(wau), "day", "left")
        .select(
            "day",
            F.coalesce("dau", zero).alias("dau"),
            F.coalesce("wau_7d", zero).alias("wau_7d"),
        )
    )


ORACLES["rolling_active_users"] = f"""
    WITH act AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_US_PER_DAY} AS day
      FROM events),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM act),
    grid AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
    dau AS (SELECT day, count(DISTINCT user_id) AS n FROM act GROUP BY day),
    cover AS (
      SELECT user_id, act.day + t.o AS day
      FROM act, generate_series(0, {ROLLING_WINDOW_DAYS - 1}) AS t(o)),
    wau AS (SELECT day, count(DISTINCT user_id) AS n FROM cover GROUP BY day)
    SELECT g.day,
           coalesce(d.n, CAST(0 AS BIGINT)) AS dau,
           coalesce(w.n, CAST(0 AS BIGINT)) AS wau_7d
    FROM grid g
    LEFT JOIN dau d ON d.day = g.day
    LEFT JOIN wau w ON w.day = g.day
"""


def gini_revenue_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row EXACT revenue-concentration readout over the customer
    base: Gini coefficient and top-decile revenue share, both integer
    ppb. Gini comes from the sorted-rank identity ``G = (2·Σ i·x_i −
    (n+1)·Σx) / (n·Σx)`` (x ascending, i = 1..n) — every intermediate an
    exact integer (cents), no pairwise |x_i − x_j| expansion. The
    concentration watch beside ``key_skew_report``'s partition-skew
    lens: same corpus, economic rather than physical skew.

    Exactness: revenue accumulates in decimal(12,2) (``relational.dec2``
    discipline) then converts to BIGINT cents; Σ i·x_i stays int64 to
    n·Σx ≈ 5e16 at sf0.1 (past ~sf100 the same plan runs the T sum on
    DECIMAL); both ppb ratios are computed in DECIMAL(38,0) because the
    1e9·numerators overflow int64 first. Rank ties share equal x, so
    Σ i·x_i is tie-order invariant; ordering is pinned (cents, custkey)
    anyway. Numerator ≥ 0 for ascending x, so floor (DuckDB ``//``) and
    truncation (Spark ``div``) agree. "Top decile" = the n div 10
    highest-revenue customers (exactly the ranks above n − n div 10).

    Scale: one (custkey) revenue aggregate (map-side combined; the
    shuffled frame is the customer domain), ONE ordered prefix window
    over that domain — the accepted SinglePartition-over-aggregate
    shape (``shard_plan_tokens`` precedent; a 100 TB run swaps in the
    same two-stage distributed prefix sum), one scalar aggregate."""
    from .relational import dec2

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            (F.sum(dec2("o_totalprice")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("cents", "o_custkey")
    tot = Window.partitionBy()
    flagged = (
        rev.select(
            "cents",
            F.row_number().over(w).alias("i"),
            F.count(F.lit(1)).over(tot).alias("n"),
        )
        # the n div 10 top-ranked customers — i and n both BIGINT
        .withColumn("is_top", F.expr("i > n - n div 10"))
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("i") * F.col("cents")).alias("t"),
        F.coalesce(
            F.sum(F.when(F.col("is_top"), F.col("cents"))),
            F.lit(0).cast("long"),
        ).alias("top_cents"),
    ).select(
        "n_customers",
        "total_cents",
        F.expr(
            "CASE WHEN total_cents = 0 THEN NULL ELSE CAST("
            "(1000000000 * CAST(2 * t - (n_customers + 1) * total_cents"
            " AS DECIMAL(38,0)))"
            " div (CAST(n_customers AS DECIMAL(38,0))"
            "      * CAST(total_cents AS DECIMAL(38,0))) AS BIGINT) END"
        ).alias("gini_ppb"),
        F.expr(
            "CASE WHEN total_cents = 0 THEN NULL ELSE CAST("
            "(1000000000 * CAST(top_cents AS DECIMAL(38,0)))"
            " div CAST(total_cents AS DECIMAL(38,0)) AS BIGINT) END"
        ).alias("top_decile_share_ppb"),
    )


ORACLES["gini_revenue_report"] = """
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i,
             count(*) OVER () AS n
      FROM rev),
    agg AS (
      SELECT count(*) AS n_customers,
             sum(cents) AS total_cents,
             sum(i * cents) AS t,
             coalesce(sum(CASE WHEN i > n - n // 10 THEN cents END), 0)
               AS top_cents
      FROM ranked)
    SELECT CAST(n_customers AS BIGINT) AS n_customers,
           CAST(total_cents AS BIGINT) AS total_cents,
           CASE WHEN total_cents = 0 THEN NULL
                ELSE CAST((1000000000 *
                           (2 * t - (n_customers + 1) * total_cents))
                          // (n_customers * total_cents) AS BIGINT) END
             AS gini_ppb,
           CASE WHEN total_cents = 0 THEN NULL
                ELSE CAST((1000000000 * top_cents) // total_cents AS BIGINT)
                END AS top_decile_share_ppb
    FROM agg
"""


#: top-k churn knobs: leaderboard size and the cohort split (the
#: ks_drift_report epoch-day split, re-declared here to keep analytics
#: import-free of the changepoint module). Shared by the oracle.
CHURN_TOP_K = 20
CHURN_SPLIT_DAYS = 14


def topk_churn_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard churn between the early and late cohorts: which users
    entered, left, or stayed in the top-``CHURN_TOP_K`` by event count —
    the ops readout behind every "top talkers" dashboard (a stable
    leaderboard and a churning one are different systems, and neither a
    drift statistic nor a heavy-hitter sketch says which you have).
    One row per user appearing in EITHER cohort's top-k:
    ``(user_id, rank_early, rank_late, n_early, n_late, status)`` with
    status ∈ entered/left/stayed.

    Exactness: counts are integers; ranks are row_number over the total
    order (count DESC, user_id ASC) — deterministic cut at k in both
    engines; the full-outer join keys on user_id.

    Scale: one (cohort, user) count aggregate (map-side combined), two
    rank windows over the per-cohort user-count DOMAIN (the accepted
    SinglePartition-over-aggregate shape; TakeOrdered at 100 TB), a
    k-row × k-row full outer join; the count join-back is pruned to the
    top-k id union before it broadcasts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day"),
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    early = F.col("day") < F.col("d0") + CHURN_SPLIT_DAYS
    counts = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.count(F.when(early, 1)).alias("n_early"),
            F.count(F.when(~early, 1)).alias("n_late"),
        )
    )

    def _top(col: str, alias: str) -> DataFrame:
        w = Window.orderBy(F.col(col).desc(), F.col("user_id").asc())
        return (
            counts.filter(F.col(col) > 0)
            .select(
                "user_id", col, F.row_number().over(w).alias(alias)
            )
            .filter(F.col(alias) <= CHURN_TOP_K)
        )

    te = _top("n_early", "rank_early").drop("n_early")
    tl = _top("n_late", "rank_late").drop("n_late")
    # prune counts to the ≤2k top-k users BEFORE broadcasting: a broadcast
    # of the full per-user counts frame would collect the unbounded user
    # domain (review finding, round 11); the k-row id union is the only
    # frame that ever reaches the driver
    users = te.select("user_id").unionByName(tl.select("user_id")).distinct()
    pruned = counts.join(F.broadcast(users), "user_id")
    return (
        te.join(tl, "user_id", "full")
        .join(F.broadcast(pruned), "user_id")
        .select(
            "user_id",
            F.col("rank_early").cast("long").alias("rank_early"),
            F.col("rank_late").cast("long").alias("rank_late"),
            "n_early",
            "n_late",
            F.expr(
                "CASE WHEN rank_early IS NULL THEN 'entered' "
                "WHEN rank_late IS NULL THEN 'left' "
                "ELSE 'stayed' END"
            ).alias("status"),
        )
    )


ORACLES["topk_churn_report"] = f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) // {{us_per_day}} AS day FROM events),
    b AS (SELECT min(day) AS d0 FROM ev),
    counts AS (
      SELECT user_id,
             count(CASE WHEN day < d0 + {{split}} THEN 1 END) AS n_early,
             count(CASE WHEN day >= d0 + {{split}} THEN 1 END) AS n_late
      FROM ev, b GROUP BY user_id),
    te AS (
      SELECT user_id, rank_early FROM (
        SELECT user_id,
               row_number() OVER (ORDER BY n_early DESC, user_id ASC)
                 AS rank_early
        FROM counts WHERE n_early > 0) t
      WHERE rank_early <= {{k}}),
    tl AS (
      SELECT user_id, rank_late FROM (
        SELECT user_id,
               row_number() OVER (ORDER BY n_late DESC, user_id ASC)
                 AS rank_late
        FROM counts WHERE n_late > 0) t
      WHERE rank_late <= {{k}})
    SELECT u.user_id,
           CAST(te.rank_early AS BIGINT) AS rank_early,
           CAST(tl.rank_late AS BIGINT) AS rank_late,
           CAST(c.n_early AS BIGINT) AS n_early,
           CAST(c.n_late AS BIGINT) AS n_late,
           CASE WHEN te.rank_early IS NULL THEN 'entered'
                WHEN tl.rank_late IS NULL THEN 'left'
                ELSE 'stayed' END AS status
    FROM (SELECT user_id FROM te UNION SELECT user_id FROM tl) u
    LEFT JOIN te USING (user_id)
    LEFT JOIN tl USING (user_id)
    JOIN counts c USING (user_id)
""".format(us_per_day=_US_PER_DAY, split=CHURN_SPLIT_DAYS, k=CHURN_TOP_K)

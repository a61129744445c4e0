"""CUSUM drift detection over the event stream — the sequential
changepoint monitor (Page 1954) next to `hourly_anomaly_flags`' trailing
z-test: the z-test catches single-bucket spikes, CUSUM accumulates SMALL
persistent shifts ("volume has been 10% above normal for six hours")
that no single bucket trips.

NOT in the reference (its telemetry is three scalar counters —
SURVEY.md §2.2 op #13); this is the drift alarm a production dedup
service publishes beside them.

**The recursion → prefix-min reduction (why this is pure SQL).** CUSUM is
defined sequentially: ``S_t = max(0, S_{t-1} + y_t)`` — not directly a
window aggregate. But the classic max-drawdown identity rewrites it
closed-form: with prefix sums ``P_t = Σ_{i≤t} y_i``,

    S_t = P_t − min(0, min_{i≤t} P_i)

(each reset-to-0 is exactly the running-minimum baseline). Both sides
are plain ordered-window aggregates, so the whole operator is two
windows over the bucket frame — no recursion, no Python, no loop.

**Exactness discipline.** The centered increment is scaled to stay
integer: ``y_t = n·x_t − total`` per event type (n = the type's bucket
count, total = its total events; Σy = 0 by construction, so a
drift-free stream accumulates nothing). S_t is then n×(the run's excess
event count), all BIGINT; the alarm ``S_t > CUSUM_H · total`` means
"this run's cumulative excess exceeds CUSUM_H average-hours of volume"
(both sides integers — total·CUSUM_H = n·mean·CUSUM_H exactly).

**Scale shape.** ONE (type, bucket) count aggregate (map-side combined —
the corpus collapses to types × hours rows), then per-type windows over
that KB-to-MB frame: one unordered (n, total), one ordered prefix
(P, running min). Nothing corpus-sized is shuffled twice; at 100 TB the
window input is still types × hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table

#: alarm threshold, in average-hours of excess volume: a run must
#: accumulate more than CUSUM_H hours' worth of mean traffic above the
#: type's own mean before its buckets flag. Shared verbatim by the oracle.
CUSUM_H = 3

_US_PER_HOUR = 3_600_000_000


def cusum_flags(counts: DataFrame) -> DataFrame:
    """The CUSUM kernel over a bucket-count frame ``(event_type,
    bucket_us, n_events)`` — shared by the batch entry and the streaming
    monitor (``streaming/drift.py``), which differ only in how the counts
    frame is produced."""
    from pyspark.sql import Window

    whole = Window.partitionBy("event_type")
    prefix = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # windows can't nest: stage y = n·x − total, then prefix-sum it
    with_y = counts.select(
        "event_type",
        "bucket_us",
        "n_events",
        F.sum("n_events").over(whole).alias("total"),
        (
            F.count(F.lit(1)).over(whole) * F.col("n_events")
            - F.sum("n_events").over(whole)
        ).alias("y"),
    )
    with_p = with_y.select(
        "event_type",
        "bucket_us",
        "n_events",
        "total",
        F.sum("y").over(prefix).alias("p"),
    )
    s = F.col("p") - F.least(F.lit(0), F.min("p").over(prefix))
    return with_p.select(
        "event_type",
        "bucket_us",
        "n_events",
        s.alias("cusum_scaled"),
        (s > F.col("total") * CUSUM_H).alias("is_drift"),
    )


def cusum_drift_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(event_type, bucket_us, n_events, cusum_scaled, is_drift)`` —
    hourly buckets per type with the integer CUSUM statistic (scaled by
    the type's bucket count n) and the drift alarm. Consecutive flagged
    buckets are one sustained run crossing the threshold — the intended
    monitoring read."""
    ev = load_table(spark, sf_dir, "events")
    hb = F.expr(f"unix_micros(ts) div {_US_PER_HOUR}") * F.lit(_US_PER_HOUR)
    counts = (
        ev.select("event_type", hb.alias("bucket_us"))
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return cusum_flags(counts)


ORACLES: dict[str, str] = {
    "cusum_drift_flags": f"""
        WITH counts AS (
          SELECT event_type,
                 (epoch_us(ts) // {_US_PER_HOUR}) * {_US_PER_HOUR}
                   AS bucket_us,
                 count(*) AS n_events
          FROM events GROUP BY 1, 2),
        centered AS (
          SELECT event_type, bucket_us, n_events,
                 sum(n_events) OVER tw AS total,
                 count(*) OVER tw * n_events - sum(n_events) OVER tw AS y
          FROM counts
          WINDOW tw AS (PARTITION BY event_type)),
        pre AS (
          SELECT event_type, bucket_us, n_events, total,
                 sum(y) OVER pw AS p
          FROM centered
          WINDOW pw AS (PARTITION BY event_type ORDER BY bucket_us
                        ROWS UNBOUNDED PRECEDING))
        SELECT event_type, bucket_us,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(p - least(0, min(p) OVER pw) AS BIGINT)
                 AS cusum_scaled,
               (p - least(0, min(p) OVER pw)) > total * {CUSUM_H}
                 AS is_drift
        FROM pre
        WINDOW pw AS (PARTITION BY event_type ORDER BY bucket_us
                      ROWS UNBOUNDED PRECEDING)
    """,
}


# --- two-sample KS drift --------------------------------------------------------

#: cohort split: events in the first KS_SPLIT_DAYS epoch-days (from the
#: stream's own first day) are the "early" reference sample
KS_SPLIT_DAYS = 14

#: drift verdict threshold on the KS statistic, in ppm (0.10)
KS_FLAG_PPM = 100_000

_US_PER_DAY = 86_400_000_000


def ks_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift test per event type:
    is the VALUE DISTRIBUTION of the late cohort (after the first
    ``KS_SPLIT_DAYS`` days) the same as the early cohort's? CUSUM
    (above) watches volume drift; this watches the distribution itself —
    the check that catches "same traffic, different payloads" shifts
    (an upstream schema change, a new client version) that no count
    monitor sees.

    Exactness: KS = max_x |F1(x) − F2(x)| is evaluated only at observed
    values, where ECDF differences are rationals — the statistic is
    carried as the exact integer ``|cum1·n2 − cum2·n1|`` and reported in
    ppm (``1e6·D div (n1·n2)``; int64-safe for cohorts up to ~3M rows per
    type — past that the same plan runs on DECIMAL). No KS p-value: the
    asymptotic critical value needs sqrt/exp, so the verdict is a plain
    ppm threshold, cross-engine exact.

    Scale: one (type, value) count aggregate (map-side combined; the
    shuffled frame is the per-type value domain), then two ordered
    windows per type over that domain frame and a final per-type max —
    the per-type ordered window is the accepted SinglePartition-per-group
    shape (``ccnet_quality_buckets`` precedent); a 100 TB deployment cuts
    the domain with a two-pass quantile sketch instead."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day"),
    )
    counts = ev.groupBy("event_type", "value", "day").agg(
        F.count(F.lit(1)).alias("n")
    )
    return ks_from_day_counts(counts)


def ks_from_day_counts(counts: DataFrame) -> DataFrame:
    """The KS kernel over a ``(event_type, value, day, n)`` count frame —
    shared by the batch entry and the streaming monitor
    (``streaming/drift.py::run_stream_ks_drift_bounded``), which differ
    only in how the counts frame is produced (one batch aggregate vs an
    incrementally-maintained streaming aggregate; counts are ADDITIVE,
    so the drained snapshot equals the batch frame exactly and the
    streaming entry shares this entry's oracle verbatim)."""
    from pyspark.sql import Window

    d0 = counts.agg(F.min("day").alias("d0"))
    early = F.col("day") < F.col("d0") + KS_SPLIT_DAYS
    grp = (
        counts.crossJoin(F.broadcast(d0))
        .groupBy("event_type", "value")
        .agg(
            F.coalesce(
                F.sum(F.when(early, F.col("n"))), F.lit(0).cast("long")
            ).alias("c1"),
            F.coalesce(
                F.sum(F.when(~early, F.col("n"))), F.lit(0).cast("long")
            ).alias("c2"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("event_type")
    stepped = grp.select(
        "event_type",
        (F.sum("c1").over(w) * F.sum("c2").over(tot)
         - F.sum("c2").over(w) * F.sum("c1").over(tot)).alias("diff"),
        F.sum("c1").over(tot).alias("n1"),
        F.sum("c2").over(tot).alias("n2"),
    )
    return (
        stepped.groupBy("event_type")
        .agg(
            F.max("n1").alias("n_early"),
            F.max("n2").alias("n_late"),
            F.max(F.abs(F.col("diff"))).alias("d_scaled"),
        )
        .select(
            "event_type",
            "n_early",
            "n_late",
            F.expr("(1000000 * d_scaled) div (n_early * n_late)").alias(
                "ks_ppm"
            ),
            F.expr(
                f"(1000000 * d_scaled) div (n_early * n_late) > {KS_FLAG_PPM}"
            ).alias("drifted"),
        )
    )


ORACLES["ks_drift_report"] = f"""
    WITH ev AS (
      SELECT event_type, value, epoch_us(ts) // {_US_PER_DAY} AS day
      FROM events),
    b AS (SELECT min(day) AS d0 FROM ev),
    grp AS (
      SELECT event_type, value,
             count(CASE WHEN day < d0 + {KS_SPLIT_DAYS} THEN 1 END) AS c1,
             count(CASE WHEN day >= d0 + {KS_SPLIT_DAYS} THEN 1 END) AS c2
      FROM ev, b GROUP BY event_type, value),
    stepped AS (
      SELECT event_type,
             sum(c1) OVER pw * sum(c2) OVER tw
               - sum(c2) OVER pw * sum(c1) OVER tw AS diff,
             sum(c1) OVER tw AS n1,
             sum(c2) OVER tw AS n2
      FROM grp
      WINDOW pw AS (PARTITION BY event_type ORDER BY value
                    ROWS UNBOUNDED PRECEDING),
             tw AS (PARTITION BY event_type))
    SELECT event_type,
           CAST(max(n1) AS BIGINT) AS n_early,
           CAST(max(n2) AS BIGINT) AS n_late,
           CAST((1000000 * max(abs(diff))) // (max(n1) * max(n2)) AS BIGINT)
             AS ks_ppm,
           (1000000 * max(abs(diff))) // (max(n1) * max(n2)) > {KS_FLAG_PPM}
             AS drifted
    FROM stepped GROUP BY event_type
"""


#: ACF lags reported (hours). Shared verbatim by the oracle.
ACF_MAX_LAG = 6


def acf_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lag-k autocorrelation of the hourly event-count series per
    event type, k = 1..``ACF_MAX_LAG`` — the periodicity lens beside
    CUSUM's level watch and KS's distribution watch: a daily-cycle
    corpus shows the signature positive ridge, and a drifting one decays
    slowly. ``acf_r2_ppb`` is the SIGNED squared Pearson correlation of
    (x_t, x_{t+k}) pairs in integer ppb — squared because Pearson's
    denominator needs a sqrt that would break cross-engine exactness;
    the square is the exact rational num²/(den_x·den_y), and the sign
    carries the direction.

    Unlike CUSUM's observed-bucket frame, the series here is ZERO-FILLED
    over the global [min,max] hour span (coverage-explode grid, the
    ``rolling_active_users`` idiom) — autocorrelation over a gappy index
    would silently splice non-adjacent hours together.

    Exactness: counts are integers; the OPERANDS are cast to
    DECIMAL(19,0) before the multiply and the sum (DuckDB: HUGEINT), so
    the aggregation buffers themselves are decimal — per-hour counts up
    to ~1e18 are exact in both engines. Buffer envelopes differ by sum
    kind (Spark's sum widens precision by 10): the LINEAR sums sx/sy
    accumulate in DECIMAL(29,0), exact to ~1e29; only the product sums
    sxx/syy/sxy (DECIMAL(38,0) buffers) carry the full 1e38 envelope
    (ADVICE r13).
    Beyond that the engines diverge LOUDLY, not silently: Spark decimal
    overflow yields NULL (non-ANSI) and DuckDB HUGEINT raises — the
    silent int64 wrap (~3e9 hours·counts, ADVICE round 12) is gone.
    The Pearson components m·Σxy − Σx·Σy stay exact while m·Σxx < 1e38
    (m ≈ hour-span; comfortably true even at 100 TB). The final ratio
    follows the degree_profile_report/bm25 pinned-float discipline:
    exact integer operands, one libm-free IEEE double expression in
    PINNED operation order ((num/den_x)·(num/den_y)·1e9), ONE rounding
    to ppb — both engines produce bit-identical doubles from identical
    exact inputs. The sign is a separate integer CASE; constant series
    (den = 0) emit NULL.

    Scale: one (type, hour) count aggregate (map-side combined — the
    corpus collapses to types × hours), a broadcast span join, then ONE
    per-type ordered window producing all six leads in a single pass
    (types × hours frame, KB–MB), a 6-way ``stack`` and a (type, lag)
    aggregate. Nothing corpus-sized is shuffled twice."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"),
    )
    counts = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("c")
    )
    span = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
        )
    )
    filled = grid.join(counts, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("c", F.lit(0).cast("long")).alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    leads = filled.select(
        "event_type",
        "x",
        *[
            F.lead("x", k).over(w).alias(f"y{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    stack_args = ", ".join(
        f"{k}, y{k}" for k in range(1, ACF_MAX_LAG + 1)
    )
    pairs = leads.select(
        "event_type",
        "x",
        F.expr(f"stack({ACF_MAX_LAG}, {stack_args}) AS (lag_h, y)"),
    ).filter(F.col("y").isNotNull())
    # Operands are cast to DECIMAL **before** the multiply and the sum so
    # Spark's aggregation buffer itself is decimal — casting the finished
    # F.sum(x*y) would still accumulate in int64 and wrap silently
    # (ADVICE round 12). decimal(19,0) operands make each product exact
    # below 1e38 and the decimal(38,0) running sums exact to 1e38.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    g = pairs.groupBy("event_type", "lag_h").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
        F.sum(xd).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    return g.select(
        "event_type",
        "lag_h",
        F.col("m").cast("long").alias("n_pairs"),
        F.expr(
            "CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0 "
            "THEN NULL ELSE "
            "(CASE WHEN m * sxy - sx * sy < 0 THEN -1 "
            " WHEN m * sxy - sx * sy > 0 THEN 1 ELSE 0 END) * CAST(round("
            "(CAST(m * sxy - sx * sy AS DOUBLE)"
            " / CAST(m * sxx - sx * sx AS DOUBLE))"
            " * (CAST(m * sxy - sx * sy AS DOUBLE)"
            "    / CAST(m * syy - sy * sy AS DOUBLE)) * 1e9, 0)"
            " AS BIGINT) END"
        ).alias("acf_r2_ppb"),
    )


ORACLES["acf_event_counts"] = """
    WITH ev AS (
      SELECT event_type, epoch_us(ts) // {us_per_hour} AS h FROM events),
    counts AS (
      SELECT event_type, h, count(*) AS c FROM ev GROUP BY event_type, h),
    b AS (SELECT min(h) AS h0, max(h) AS h1 FROM counts),
    grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM counts) t,
           (SELECT unnest(generate_series(h0, h1)) AS h FROM b) g),
    filled AS (
      SELECT grid.event_type, grid.h,
             coalesce(c, CAST(0 AS BIGINT)) AS x
      FROM grid LEFT JOIN counts
        ON counts.event_type = grid.event_type AND counts.h = grid.h),
    pairs AS (
      -- the grid is contiguous, so the lag-k successor is EXACTLY h + k
      SELECT f1.event_type, k.lag_h, f1.x, f2.x AS y
      FROM filled f1
      JOIN generate_series(1, {max_lag}) AS k(lag_h) ON TRUE
      JOIN filled f2
        ON f2.event_type = f1.event_type AND f2.h = f1.h + k.lag_h),
    g AS (
      -- operands cast to HUGEINT BEFORE the multiply: a BIGINT*BIGINT
      -- per-pair product would overflow (loudly) at ~3e9 counts, well
      -- below the decimal(19,0)-operand headroom the Spark side
      -- guarantees — the engines must share one exactness envelope
      SELECT event_type, lag_h,
             CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM pairs GROUP BY event_type, lag_h)
    SELECT event_type, CAST(lag_h AS INTEGER) AS lag_h,
           CAST(m AS BIGINT) AS n_pairs,
           CASE WHEN m * sxx - sx * sx = 0 OR m * syy - sy * sy = 0
                THEN NULL ELSE
             (CASE WHEN m * sxy - sx * sy < 0 THEN -1
                   WHEN m * sxy - sx * sy > 0 THEN 1 ELSE 0 END)
             * CAST(round(
                 (CAST(m * sxy - sx * sy AS DOUBLE)
                  / CAST(m * sxx - sx * sx AS DOUBLE))
                 * (CAST(m * sxy - sx * sy AS DOUBLE)
                    / CAST(m * syy - sy * sy AS DOUBLE)) * 1e9, 0)
               AS BIGINT)
           END AS acf_r2_ppb
    FROM g
""".format(us_per_hour=_US_PER_HOUR, max_lag=ACF_MAX_LAG)


#: PSI alarm threshold in nano-nats — the classic "PSI > 0.25 ⇒ major
#: population shift" rule (Siddiqi 2006), exactly representable as an
#: integer. Shared verbatim by the oracle.
PSI_FLAG_NANONATS = 250_000_000

#: fixed bin width for the PSI value histogram (the ``value_histogram``
#: IEEE floor-binning discipline — deterministic cross-engine).
PSI_BIN_WIDTH = 25.0


def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the early and
    late cohorts (the ``ks_drift_report`` split): the industry-standard
    drift scalar — PSI = Σ_bins (p₁ − p₂)·ln(p₁/p₂) — beside KS's
    sup-norm. KS is sensitive to the single worst ECDF gap; PSI
    integrates shift over ALL bins, so a broad small reshaping that
    never builds one big gap still trips it. Value space is cut into
    fixed ``PSI_BIN_WIDTH`` bins (IEEE floor-binning, bit-identical
    cross-engine); rates are Laplace-smoothed (cᵢ+1)/(n+B) over the
    type's B observed bins so empty-in-one-cohort bins stay finite —
    the smoothing is part of the metric definition, mirrored exactly by
    the oracle.

    Exactness: with Dⱼ = nⱼ + B, each term is
    ((c₁+1)·D₂ − (c₂+1)·D₁) · ln((c₁+1)·D₂ / ((c₂+1)·D₁)) / (D₁·D₂) —
    the ln of an exact integer ratio gets the single nano-nat rounding
    (``classify._nanonat_ln`` discipline), the numerator products run in
    DECIMAL(38,0) (bin-count × cohort-size × 2e10 nano-nats overflows
    int64), and the per-type sum divides by the constant D₁·D₂ once.
    Each term is ≥ 0 ((x−y) and ln(x/y) share sign), so floor ≡ trunc.

    Scale: one (type, bin) count aggregate (map-side combined — the
    corpus collapses to types × bins), per-type totals via tiny windows
    over that domain frame, one per-type aggregate. Same shape as
    ``ks_drift_report`` with bins in place of the value domain."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") / F.lit(PSI_BIN_WIDTH))
        .cast("long")
        .alias("bin"),
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day"),
    )
    d0 = ev.agg(F.min("day").alias("d0"))
    early = F.col("day") < F.col("d0") + KS_SPLIT_DAYS
    grp = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.when(early, 1)).alias("c1"),
            F.count(F.when(~early, 1)).alias("c2"),
        )
    )
    from pyspark.sql import Window

    tot = Window.partitionBy("event_type")
    staged = grp.select(
        "event_type",
        "c1",
        "c2",
        (F.sum("c1").over(tot) + F.count(F.lit(1)).over(tot)).alias("d1"),
        (F.sum("c2").over(tot) + F.count(F.lit(1)).over(tot)).alias("d2"),
        F.sum("c1").over(tot).alias("n1"),
        F.sum("c2").over(tot).alias("n2"),
        F.count(F.lit(1)).over(tot).alias("nbins"),
    )
    terms = staged.select(
        "event_type",
        "n1",
        "n2",
        "nbins",
        "d1",
        "d2",
        (
            (
                (F.col("c1") + 1) * F.col("d2")
                - (F.col("c2") + 1) * F.col("d1")
            ).cast("decimal(38,0)")
            * F.round(
                F.ln(
                    ((F.col("c1") + 1) * F.col("d2")).cast("double")
                    / ((F.col("c2") + 1) * F.col("d1")).cast("double")
                )
                * 1e9,
                0,
            ).cast("decimal(38,0)")
        ).alias("t"),
    )
    return terms.groupBy("event_type").agg(
        F.max("n1").alias("n_early"),
        F.max("n2").alias("n_late"),
        F.max("nbins").alias("n_bins"),
        F.expr(
            "CAST(sum(t) div (CAST(max(d1) AS DECIMAL(38,0))"
            " * CAST(max(d2) AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("psi_nanonats"),
    ).withColumn(
        "shifted", F.col("psi_nanonats") > F.lit(PSI_FLAG_NANONATS)
    )


ORACLES["psi_drift_report"] = f"""
    WITH ev AS (
      SELECT event_type,
             CAST(floor(value / {PSI_BIN_WIDTH!r}) AS BIGINT) AS bin,
             epoch_us(ts) // {_US_PER_DAY} AS day
      FROM events),
    b AS (SELECT min(day) AS d0 FROM ev),
    grp AS (
      SELECT event_type, bin,
             count(CASE WHEN day < d0 + {KS_SPLIT_DAYS} THEN 1 END) AS c1,
             count(CASE WHEN day >= d0 + {KS_SPLIT_DAYS} THEN 1 END) AS c2
      FROM ev, b GROUP BY event_type, bin),
    staged AS (
      SELECT event_type, c1, c2,
             sum(c1) OVER tw + count(*) OVER tw AS d1,
             sum(c2) OVER tw + count(*) OVER tw AS d2,
             sum(c1) OVER tw AS n1,
             sum(c2) OVER tw AS n2,
             count(*) OVER tw AS nbins
      FROM grp WINDOW tw AS (PARTITION BY event_type)),
    terms AS (
      SELECT event_type, n1, n2, nbins, d1, d2,
             CAST((c1 + 1) * d2 - (c2 + 1) * d1 AS HUGEINT)
             * CAST(round(ln(CAST((c1 + 1) * d2 AS DOUBLE)
                             / CAST((c2 + 1) * d1 AS DOUBLE)) * 1e9, 0)
                    AS HUGEINT) AS t
      FROM staged)
    SELECT event_type,
           CAST(max(n1) AS BIGINT) AS n_early,
           CAST(max(n2) AS BIGINT) AS n_late,
           CAST(max(nbins) AS BIGINT) AS n_bins,
           CAST(sum(t) // (CAST(max(d1) AS HUGEINT)
                           * CAST(max(d2) AS HUGEINT)) AS BIGINT)
             AS psi_nanonats,
           CAST(sum(t) // (CAST(max(d1) AS HUGEINT)
                           * CAST(max(d2) AS HUGEINT)) AS BIGINT)
             > {PSI_FLAG_NANONATS} AS shifted
    FROM terms GROUP BY event_type
"""

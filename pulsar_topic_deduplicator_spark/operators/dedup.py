"""Batch dedup operator family — the reference's core semantics, Spark-first.

Reference contract (SURVEY.md §2.1; ``src/deduplication.ts:97-160``): compute
a content digest per message (event timestamp EXCLUDED), keep the FIRST
occurrence of each digest, suppress duplicates arriving within a TTL window,
and count forwarded/dropped per 60 s interval.

Batch expression: first-occurrence dedup is a ranked window —
``row_number() OVER (PARTITION BY digest ORDER BY ts, event_id) = 1`` — which
Catalyst executes as one hash shuffle on the digest + a partition-local sort.
At 100 TB this is the right shape: digests are uniformly distributed (they're
cryptographic hashes), so the shuffle has no skew by construction and
partial aggregation/AQE handle sizing. No Python crosses the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import events_digest
from ..sources.io import load_table
from ._oracle_fragments import duck_events_digest

#: keys stripped from the hash input in the ignore-projection demo — the
#: reference's production ignore-list (``README.md:49``,
#: ``src/deduplication.test.ts:197-201``).
REFERENCE_IGNORED = ("mqttQos", "mqttIsRetained", "mqttIsDuplicate")

_FIRST_WINS = ["ts", "event_id"]  # deterministic tiebreak (SURVEY.md §7.4.1)


def with_digest(df: DataFrame, ignored=()) -> DataFrame:
    return df.withColumn("digest", events_digest(ignored))


def hash_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference op #6: content digest per message
    (``src/deduplication.ts:26-39``)."""
    return with_digest(load_table(spark, sf_dir, "events")).select(
        "event_id", "digest"
    )


def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ops #6+#7 batch analog: one row per digest, earliest by
    (ts, event_id) — "send the first of each unique message"
    (``README.md:3-5``).

    Implemented as ``min_by(payload, struct(ts, event_id))`` per digest
    rather than a ranked window: the aggregation gets map-side PARTIAL
    aggregation — duplicates collapse before the shuffle, so only one row
    per (digest, input-partition) crosses the wire — where a window function
    must shuffle and sort EVERY row. That asymmetry is the 100 TB story; the
    deterministic (ts, event_id) ordering tuple matches SURVEY.md §7.4.1."""
    payload = F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
    order = F.struct(*_FIRST_WINS)
    return (
        with_digest(load_table(spark, sf_dir, "events"))
        .groupBy("digest")
        .agg(F.min_by(payload, order).alias("f"))
        .select(
            "f.event_id", "f.ts", "f.user_id", "f.event_type", "f.value",
            "f.props", "digest",
        )
    )


def dedup_within_window(
    spark: SparkSession, sf_dir: str, window_seconds: int = 3600
) -> DataFrame:
    """Reference op #7 TTL analog: suppress duplicates only within a time
    window of the kept first occurrence (``src/deduplication.ts:76``; default
    TTL 3600 s, ``src/config.ts:133-134``).

    Batch rendering uses epoch-aligned tumbling buckets (digest, bucket) —
    the documented deviation from the reference's rolling
    processing-time TTL (SURVEY.md §7.4.2); the streaming path
    (streaming/dedup.py) keeps the rolling-window semantics.
    """
    bucket = F.timestamp_seconds(
        F.expr(f"(unix_timestamp(ts) div {window_seconds}) * {window_seconds}")
    )
    payload = F.struct("event_id", "ts", "event_type", "value", "props")
    return (
        with_digest(load_table(spark, sf_dir, "events"))
        .withColumn("w_start", bucket)
        .groupBy("digest", "w_start")
        .agg(F.min_by(payload, F.struct(*_FIRST_WINS)).alias("f"))
        .select(
            "f.event_id", "f.ts", "f.event_type", "f.value", "f.props",
            "digest", "w_start",
        )
    )


def ignore_props_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference ops #4+#5: canonical JSON of properties with and without the
    ignore-list applied (``src/deduplication.ts:14-23``). ``digest_ign``
    demonstrates that messages differing only in ignored properties (or the
    event timestamp) hash equal (``src/deduplication.test.ts:115-128``)."""
    from ..functions.canonical import canonical_props

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        canonical_props(F.col("props")).alias("canon_all"),
        canonical_props(F.col("props"), ("k",)).alias("canon_ign_k"),
        events_digest(REFERENCE_IGNORED).alias("digest_ign"),
    )


def first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"First occurrence" generalized to a business key (SURVEY.md §2.4):
    earliest event per user."""
    w = Window.partitionBy("user_id").orderBy(*_FIRST_WINS)
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            F.col("event_type").alias("first_event_type"),
        )
    )


def dedup_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference op #13: forwarded/dropped counts per 60 s interval — the
    system's only aggregation (``src/deduplication.ts:80-95``). A duplicate
    is any row that is not the global first occurrence of its digest."""
    w = Window.partitionBy("digest").orderBy(*_FIRST_WINS)
    bucket = F.timestamp_seconds(F.expr("(unix_timestamp(ts) div 60) * 60"))
    return (
        with_digest(load_table(spark, sf_dir, "events"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("w_start", bucket)
        .groupBy("w_start")
        .agg(
            # count(CASE...) not sum: DuckDB's sum(int) widens to HUGEINT,
            # count stays BIGINT on both engines.
            F.count(F.when(F.col("rn") == 1, 1)).alias("n_forwarded"),
            F.count(F.when(F.col("rn") > 1, 1)).alias("n_dropped"),
        )
    )


def distinct_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cardinality of dedup keys (how much state the TTL set holds)."""
    return with_digest(load_table(spark, sf_dir, "events")).agg(
        F.countDistinct("digest").alias("n_distinct")
    )


def approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality — the 100 TB path where an exact distinct
    would shuffle every digest (HLL sketches merge map-side; only the
    fixed-size registers cross the wire).

    HLL values differ between engines by design, so the oracle-checkable
    output is the exact count plus a tolerance verdict: the HLL estimate at
    rsd=0.01 must land within 4·rsd of the exact count (≈4σ; HLL++ bias
    correction keeps the observed error far inside that). The DuckDB oracle
    asserts the same exact count and a constant TRUE, so a drifting sketch
    turns the driver row red instead of being unverifiable."""
    agg = with_digest(load_table(spark, sf_dir, "events")).agg(
        F.countDistinct("digest").alias("n_distinct_exact"),
        F.approx_count_distinct("digest", 0.01).alias("_n_approx"),
    )
    tol = F.col("n_distinct_exact").cast("double") * (4 * 0.01)
    return agg.select(
        "n_distinct_exact",
        (
            F.abs(F.col("_n_approx") - F.col("n_distinct_exact")).cast("double")
            <= tol
        ).alias("approx_ok"),
    )


_DIGEST = duck_events_digest()

ORACLES: dict[str, str] = {
    "hash_payload": f"SELECT event_id, {_DIGEST} AS digest FROM events",
    "dedup_exact_keep_first": f"""
        WITH d AS (
          SELECT event_id, ts, user_id, event_type, value, props,
                 {_DIGEST} AS digest,
                 row_number() OVER (PARTITION BY {_DIGEST}
                                    ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT event_id, ts, user_id, event_type, value, props, digest
        FROM d WHERE rn = 1
    """,
    "dedup_within_window": f"""
        WITH d AS (
          SELECT event_id, ts, event_type, value, props, {_DIGEST} AS digest,
                 make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600) * 1000000) AS w_start
          FROM events),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY digest, w_start
                                       ORDER BY ts, event_id) AS rn
          FROM d)
        SELECT event_id, ts, event_type, value, props, digest, w_start
        FROM r WHERE rn = 1
    """,
    "first_per_key": """
        WITH r AS (
          SELECT user_id, event_id, ts, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT user_id, event_id AS first_event_id, ts AS first_ts,
               event_type AS first_event_type
        FROM r WHERE rn = 1
    """,
    "dedup_counters": f"""
        WITH d AS (
          SELECT ts, {_DIGEST} AS digest,
                 row_number() OVER (PARTITION BY {_DIGEST}
                                    ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60) * 1000000) AS w_start,
               count(CASE WHEN rn = 1 THEN 1 END) AS n_forwarded,
               count(CASE WHEN rn > 1 THEN 1 END) AS n_dropped
        FROM d GROUP BY 1
    """,
    "distinct_digests": f"SELECT count(DISTINCT {_DIGEST}) AS n_distinct FROM events",
    "approx_distinct_events": f"""
        SELECT count(DISTINCT {_DIGEST}) AS n_distinct_exact,
               TRUE AS approx_ok
        FROM events
    """,
}

# ignore_props_projection oracle needs fragments with a different ignore-list
from ._oracle_fragments import duck_canon_props  # noqa: E402

ORACLES["ignore_props_projection"] = f"""
    SELECT event_id,
           {duck_canon_props('props')} AS canon_all,
           {duck_canon_props('props', ('k',))} AS canon_ign_k,
           {duck_events_digest(REFERENCE_IGNORED)} AS digest_ign
    FROM events
"""


# ─── Bloom-filter membership prefilter ──────────────────────────────────────
#
# At 100 TB the warm-up digest set (op #11) outgrows a broadcastable exact
# dimension; the standard scale pattern is a Bloom prefilter: a fixed-size
# bitset answers "definitely new" locally on every executor, and only the
# maybe-seen minority pays the exact state lookup. PySpark does not expose
# the JVM DataFrameStatFunctions.bloomFilter, so the engine builds its own
# with the same distributed shape: per-partition bitsets built in one
# Arrow-batched pass (map-side, like treeAggregate's leaves), OR-merged on
# the driver (the merged filter is the only thing collected — m/8 bytes,
# independent of row count), then re-broadcast for the vectorized probe.
# Hash derivation is JVM-side (two 32-bit lanes from the hex digest via
# conv()), so the Python stages do pure numpy bit arithmetic — no per-row
# Python in either pass.

BLOOM_FPP = 0.01


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n·ln p / ln²2 bits (rounded up to whole
    longs), k = (m/n)·ln 2 probes."""
    import math

    n = max(n_items, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _with_hash_lanes(df: DataFrame) -> DataFrame:
    """Two independent 32-bit hash lanes from the hex digest, derived
    JVM-side (conv runs in codegen; the Python stages see plain longs).
    h2 is forced odd — the classic double-hashing stride guard."""
    h1 = F.conv(F.substring("digest", 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring("digest", 9, 8), 16, 10).cast("long")
    return df.withColumn("h1", h1).withColumn("h2", h2.bitwiseOR(F.lit(1)))


def _bloom_build(warm: DataFrame, m: int, k: int) -> bytes:
    """Per-partition bitsets OR-merged on the driver. Each partition ships
    exactly m/8 bytes regardless of its row count — the same wire cost as
    Spark's native bloomFilter treeAggregate."""
    import numpy as np

    def build(batches):
        import pandas as pd

        bits = np.zeros(m // 8, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if not len(pdf):
                continue
            touched = True
            h1 = pdf["h1"].to_numpy(np.int64)[:, None]
            h2 = pdf["h2"].to_numpy(np.int64)[:, None]
            pos = (h1 + np.arange(k)[None, :] * h2) % m
            np.bitwise_or.at(
                bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8)
            )
        if touched:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = _with_hash_lanes(warm).select("h1", "h2").mapInPandas(
        build, schema="bits binary"
    )
    merged = np.zeros(m // 8, dtype=np.uint8)
    for row in parts.collect():  # one m/8-byte row per non-empty partition
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    return merged.tobytes()


def bloom_digest_prefilter(
    spark: SparkSession, sf_dir: str, fpp: float = BLOOM_FPP
) -> DataFrame:
    """Bloom prefilter of the live event stream against the warm-up digest
    set, verified: the output is the aggregate CONTRACT of a Bloom filter —
    exact totals plus two verdicts the oracle pins as constants (the
    approx_distinct_events tolerance-oracle pattern):

    * ``no_false_negatives`` — every true warm-up member was flagged
      maybe-seen (a Bloom filter can never miss; a false here is a bug);
    * ``fp_rate_ok`` — the observed false-positive rate on true negatives
      is within 5× the configured fpp (sizing math holds). The observed
      rate is a binomial draw over the corpus's true negatives, so this
      verdict has a STATED failure probability: with ~49k true negatives
      at fpp=0.01 the Chernoff tail gives
      P[rate > 5·fpp] ≤ exp(−n·fpp·(5·ln5−4)) ≈ e^−2000 — a regenerated
      corpus cannot plausibly flip it without an engine bug; the margin
      only matters (and should be re-derived from the binomial tail) if
      the true-negative population drops below a few thousand.

    The per-row flag column itself is engine-specific (bit positions depend
    on this engine's hash lanes), which is exactly why the driver-checked
    surface is the contract, not the bits."""
    import numpy as np

    # the warm set feeds THREE consumers (sizing count, bitset build,
    # is_warm verification join) — persist so the scan + digest + distinct
    # shuffle runs once, not three times
    from ..cachereg import persist_scoped

    warm = persist_scoped(
        with_digest(load_table(spark, sf_dir, "events"))
        .filter(F.col("ts") < F.lit(_WARMUP_CUTOFF).cast("timestamp"))
        .select("digest")
        .distinct()
    )
    n_items = warm.count()  # scalar for sizing (same pass native bloom needs)
    m, k = _bloom_params(n_items, fpp)
    bits_bytes = _bloom_build(warm, m, k)
    bc = spark.sparkContext.broadcast(bits_bytes)

    def probe(batches):
        import pandas as pd

        bits = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            h1 = pdf["h1"].to_numpy(np.int64)[:, None]
            h2 = pdf["h2"].to_numpy(np.int64)[:, None]
            pos = (h1 + np.arange(k)[None, :] * h2) % m
            hit = ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
            yield pd.DataFrame({"digest": pdf["digest"], "maybe_seen": hit})

    flagged = (
        _with_hash_lanes(with_digest(load_table(spark, sf_dir, "events")))
        .select("digest", "h1", "h2")
        .mapInPandas(probe, schema="digest string, maybe_seen boolean")
    )
    is_warm = F.broadcast(warm.withColumn("is_warm", F.lit(True)))
    joined = flagged.join(is_warm, "digest", "left").withColumn(
        "is_warm", F.coalesce("is_warm", F.lit(False))
    )
    fn = F.count(F.when(F.col("is_warm") & ~F.col("maybe_seen"), 1))
    fp = F.count(F.when(~F.col("is_warm") & F.col("maybe_seen"), 1))
    tn = F.count(F.when(~F.col("is_warm"), 1))
    return joined.agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.count(F.when(F.col("is_warm"), 1)).alias("n_warmup_hits"),
        (fn == 0).alias("no_false_negatives"),
        (fp.cast("double") <= tn.cast("double") * F.lit(5 * fpp)).alias(
            "fp_rate_ok"
        ),
    )


from ._oracle_fragments import WARMUP_CUTOFF as _WARMUP_CUTOFF  # noqa: E402

ORACLES["bloom_digest_prefilter"] = f"""
    WITH m AS (SELECT {_DIGEST} AS digest, ts FROM events),
    w AS (SELECT DISTINCT digest FROM m WHERE ts < TIMESTAMP '{_WARMUP_CUTOFF}')
    SELECT count(*) AS n_messages,
           count(CASE WHEN w.digest IS NOT NULL THEN 1 END) AS n_warmup_hits,
           TRUE AS no_false_negatives,
           TRUE AS fp_rate_ok
    FROM m LEFT JOIN w ON m.digest = w.digest
"""


#: count-min-sketch geometry: 4 hash lanes × 256 slots. At 100 TB the
#: sketch is still 4×256 longs — the POINT of the operator: per-key
#: frequency telemetry whose wire cost is constant in the row count
#: (reference op #13 generalized from two scalar counters to a keyed
#: frequency table), with the classic one-sided guarantee
#: estimate ≥ true, P[overshoot > e·n/width] ≤ e^-depth.
CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_slots(key) -> "F.Column":
    """Array of the key's slot per lane — lane d hashes sha2('cms{d}#'+key),
    the same seeded-hash construction as the MinHash seeds, so the oracle
    reproduces every slot exactly."""
    from pyspark.sql import functions as F

    from ..functions.hashing import stable_uint60

    return F.array(
        *[
            stable_uint60(F.concat(F.lit(f"cms{d}#"), key)) % CMS_WIDTH
            for d in range(CMS_DEPTH)
        ]
    )


def cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch of user_id frequencies as a long-form table
    (depth, slot, count): one scan, posexplode to DEPTH rows per event,
    map-side combine collapses to ≤ DEPTH×WIDTH groups before the single
    KB-sized shuffle. Deterministic hash lanes make the sketch itself
    oracle-exact — unlike HLL registers, every cell value is reproducible
    cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.posexplode(
                _cms_slots(F.col("user_id").cast("string"))
            ).alias("depth", "slot")
        )
        .groupBy("depth", "slot")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user frequency estimates read back from the sketch next to the
    exact truth: estimate = min over lanes of the user's slot counts —
    never an undercount, overshoot bounded by colliding keys. The sketch
    side is broadcast (DEPTH×WIDTH rows at any corpus scale); the truth
    side is the ordinary keyed count. Emitting both makes the entry
    exactly value-checkable — the estimator's actual error surface on this
    corpus, not just a verdict."""
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_sketch(spark, sf_dir)
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    user_slots = truth.select(
        "user_id",
        "true_count",
        F.posexplode(
            _cms_slots(F.col("user_id").cast("string"))
        ).alias("depth", "slot"),
    )
    est = (
        user_slots.join(F.broadcast(sketch), ["depth", "slot"])
        .groupBy("user_id", "true_count")
        .agg(F.min("n").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_count")).alias("overshoot"),
        (F.col("cms_estimate") >= F.col("true_count")).alias("no_undercount"),
    )


def _duck_cms_slot() -> str:
    """DuckDB twin of ``_cms_slots`` for one lane, parameterized by the
    lane column ``d`` from the cross-joined lane table."""
    lane_key = "'cms' || CAST(d AS VARCHAR) || '#' || CAST(user_id AS VARCHAR)"
    return f"CAST('0x' || substr(sha256({lane_key}), 1, 15) AS BIGINT) % {CMS_WIDTH}"


_CMS_LANES_CTE = f"""
    lanes AS (
      SELECT user_id, d, {_duck_cms_slot()} AS slot
      FROM events, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d) ds
    )
"""

ORACLES["cms_sketch"] = f"""
    WITH {_CMS_LANES_CTE}
    SELECT CAST(d AS INTEGER) AS depth, slot, count(*) AS n
    FROM lanes GROUP BY d, slot
"""

ORACLES["cms_user_counts"] = f"""
    WITH {_CMS_LANES_CTE},
    sketch AS (SELECT d, slot, count(*) AS n FROM lanes GROUP BY d, slot),
    truth AS (SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id),
    user_slots AS (SELECT DISTINCT user_id, d, slot FROM lanes),
    est AS (
      SELECT u.user_id, min(s.n) AS cms_estimate
      FROM user_slots u JOIN sketch s ON u.d = s.d AND u.slot = s.slot
      GROUP BY u.user_id)
    SELECT t.user_id, t.true_count, e.cms_estimate,
           e.cms_estimate - t.true_count AS overshoot,
           e.cms_estimate >= t.true_count AS no_undercount
    FROM truth t JOIN est e ON t.user_id = e.user_id
"""


#: KMV (k-minimum-values) sketch size: the k smallest stable hashes of a
#: set estimate its cardinality as (k−1)/u_k (u_k = k-th minimum mapped to
#: [0,1)). Deterministic under the sha2-derived hash — so unlike HLL the
#: whole sketch AND its estimate are oracle-exact — and mergeable: the
#: union sketch is the k smallest of the concatenated sketches, giving
#: distinct-count SET ALGEBRA across sources for k longs per source.
KMV_K = 64

#: stage-1 salt fan-out for the per-group k-smallest (same lossless
#: two-stage pattern as cap_docs_per_source: a row in the true k-smallest
#: ranks ≤ k within its salt subgroup too)
_KMV_SALTS = 4

_TWO_POW_60 = float(2**60)


def _kmv_k_smallest(hashes: DataFrame, group_col: str) -> DataFrame:
    """The ``KMV_K`` smallest distinct hashes per group via the salted
    two-stage rank — no group's sort ever sees more than ~1/salts of a
    hot group's hashes."""
    w1 = Window.partitionBy(
        group_col, (F.col("h") % _KMV_SALTS).alias("salt")
    ).orderBy("h")
    pre = hashes.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= KMV_K
    )
    w2 = Window.partitionBy(group_col).orderBy("h")
    return (
        pre.withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= KMV_K)
        .select(group_col, "h")
    )


def _kmv_saturated_est(u_k_int):
    """(k−1)/u_k — THE KMV cardinality estimate for a FULL sketch, shared
    by the per-group report and the pairwise set-algebra tier so a future
    estimator change (e.g. bias correction) cannot silently diverge."""
    return F.lit(float(KMV_K - 1)) / (
        u_k_int.cast("double") / F.lit(_TWO_POW_60)
    )


def _kmv_report(kept: DataFrame, exact: DataFrame, group_col: str) -> DataFrame:
    """(group, n_exact, n_kept, kmv_estimate): estimate = (k−1)/u_k when
    the sketch is full, else the sketch IS the set and the count is exact."""
    agg = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("u_k_int"),
    )
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")
    ).otherwise(_kmv_saturated_est(F.col("u_k_int")))
    return (
        exact.join(agg, group_col)
        .select(
            group_col,
            "n_exact",
            "n_kept",
            est.alias("kmv_estimate"),
        )
    )


def kmv_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-digest cardinality from a KMV sketch, next
    to the exact count — plus the ``__union__`` row estimated from the
    MERGED per-type sketches (k smallest of the concatenation), the
    set-algebra read: at 100 TB only k longs per group cross the wire to
    answer "how many unique payloads across all topics"."""
    ev = with_digest(load_table(spark, sf_dir, "events"))
    from ..functions.hashing import stable_uint60

    hashes = (
        ev.select(
            "event_type", stable_uint60(F.col("digest")).alias("h")
        ).distinct()
    )
    kept = _kmv_k_smallest(hashes, "event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("digest").alias("n_exact")
    )
    per_type = _kmv_report(kept, exact, "event_type")

    # union row: merge = k smallest of the concatenated sketches (dedup h
    # first — the same digest appears under one type only, but the 60-bit
    # projection could collide across types). The union's EXACT count is
    # the sum of the per-type exacts — the digest embeds event_type, so no
    # digest can exist under two types — which saves re-scanning the
    # corpus for a global distinct.
    union_kept = _kmv_k_smallest(
        kept.select(F.lit("__union__").alias("event_type"), "h").distinct(),
        "event_type",
    )
    union_exact = exact.agg(F.sum("n_exact").alias("n_exact")).select(
        F.lit("__union__").alias("event_type"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
    )
    return per_type.unionByName(
        _kmv_report(union_kept, union_exact, "event_type")
    )


_KMV_SALT_RANK = f"""
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type, h % {_KMV_SALTS}
                                ORDER BY h) AS r1
"""

ORACLES["kmv_distinct_by_type"] = f"""
    WITH hashes AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substr(sha256({_DIGEST}), 1, 15) AS BIGINT) AS h
      FROM events),
    pre AS ({_KMV_SALT_RANK} FROM hashes),
    kept AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS r2
        FROM pre WHERE r1 <= {KMV_K})
      WHERE r2 <= {KMV_K}),
    u_pre AS (
      SELECT 'u' AS event_type, h,
             row_number() OVER (PARTITION BY h % {_KMV_SALTS} ORDER BY h) AS r1
      FROM (SELECT DISTINCT h FROM kept)),
    u_kept AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS r2
        FROM u_pre WHERE r1 <= {KMV_K})
      WHERE r2 <= {KMV_K}),
    exact AS (
      SELECT event_type, count(DISTINCT {_DIGEST}) AS n_exact
      FROM events GROUP BY event_type),
    rep AS (
      SELECT k.event_type,
             count(*) AS n_kept,
             max(k.h) AS u_k_int
      FROM kept k GROUP BY k.event_type),
    per_type AS (
      SELECT e.event_type, e.n_exact, CAST(r.n_kept AS BIGINT) AS n_kept,
             CASE WHEN r.n_kept < {KMV_K} THEN CAST(r.n_kept AS DOUBLE)
                  ELSE {float(KMV_K - 1)}
                       / (CAST(r.u_k_int AS DOUBLE) / {_TWO_POW_60}) END
               AS kmv_estimate
      FROM exact e JOIN rep r ON e.event_type = r.event_type),
    u_rep AS (
      SELECT count(*) AS n_kept, max(h) AS u_k_int FROM u_kept),
    u_row AS (
      SELECT '__union__' AS event_type,
             (SELECT CAST(sum(n_exact) AS BIGINT) FROM exact) AS n_exact,
             CAST(n_kept AS BIGINT) AS n_kept,
             CASE WHEN n_kept < {KMV_K} THEN CAST(n_kept AS DOUBLE)
                  ELSE {float(KMV_K - 1)}
                       / (CAST(u_k_int AS DOUBLE) / {_TWO_POW_60}) END
               AS kmv_estimate
      FROM u_rep)
    SELECT * FROM per_type UNION ALL SELECT * FROM u_row
"""


def kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience-overlap estimates between event types from KMV
    sketches — the multiset set-algebra read (Beyer et al. 2007, "On
    Synopses for Distinct Value Estimation Under Multiset Operations"):
    for every (type_a < type_b) pair, estimate |users_a ∪ users_b|,
    |users_a ∩ users_b| and the user-set Jaccard from the two per-type
    k-minimum-value sketches alone, next to the exact answers for audit.

    Sketch algebra: merge = k smallest of the two sketches' union;
    ρ = (merged hashes present in BOTH input sketches) / |merged|;
    union_est = (k−1)/u_k when the merged sketch is full (else the merged
    sketch IS the union — counts are exact); inter_est = ρ · union_est.
    Every branch is mirrored expression-for-expression in the oracle, so
    the doubles are bit-identical.

    Plan: ONE distinct (type, user-hash) shuffle + the salted k-smallest
    windows build the per-type sketches; everything pairwise after that
    runs on sketch-sized frames (types × k longs — KB, broadcast), so at
    100 TB the corpus is scanned once no matter how many pairs are asked.
    The pairwise stage itself scales as T²·k/2 rows for T groups — fine
    for the enum-like group columns this targets (event types, sources,
    shards; thousands of groups ⇒ millions of 16-byte rows); a
    million-group keyspace would need a candidate pre-filter before the
    pair frame, not this operator. The exact audit tier (a user-keyed
    self-join) is the thing the sketch path REPLACES at scale; it rides
    along here as the per-row error witness.
    """
    from ..cachereg import persist_scoped
    from ..functions.hashing import stable_uint60

    ev = load_table(spark, sf_dir, "events")
    users = persist_scoped(
        ev.select(
            "event_type", F.col("user_id").cast("string").alias("u")
        ).distinct()
    )  # consumers: sketch hashes + sizes + both exact-audit join sides
    hashes = users.select(
        "event_type", stable_uint60(F.col("u")).alias("h")
    )
    kept = _kmv_k_smallest(hashes, "event_type")

    # pairwise merged sketches: every merged row is (pair, h, side flags);
    # the pair frame and both sketch joins are KB-sized
    pairs = (
        kept.select(F.col("event_type").alias("type_a"))
        .distinct()
        .join(
            kept.select(F.col("event_type").alias("type_b")).distinct(),
            F.col("type_a") < F.col("type_b"),
        )
    )
    pa = pairs.join(
        kept.select(F.col("event_type").alias("type_a"), "h"), "type_a"
    ).select("type_a", "type_b", "h", F.lit(1).alias("fa"), F.lit(0).alias("fb"))
    pb = pairs.join(
        kept.select(F.col("event_type").alias("type_b"), "h"), "type_b"
    ).select("type_a", "type_b", "h", F.lit(0).alias("fa"), F.lit(1).alias("fb"))
    merged = (
        pa.unionByName(pb)
        .groupBy("type_a", "type_b", "h")
        .agg(F.max("fa").alias("in_a"), F.max("fb").alias("in_b"))
    )
    wp = Window.partitionBy("type_a", "type_b").orderBy("h")
    sk = merged.withColumn("r", F.row_number().over(wp)).filter(
        F.col("r") <= KMV_K
    )
    est = sk.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_merged"),
        F.max("h").alias("u_k_int"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("n_both"),
    )
    full = F.col("n_merged") >= KMV_K
    union_est = F.when(
        full, _kmv_saturated_est(F.col("u_k_int"))
    ).otherwise(F.col("n_merged").cast("double"))
    rho = F.col("n_both").cast("double") / F.col("n_merged").cast("double")
    inter_est = F.when(
        full, rho * _kmv_saturated_est(F.col("u_k_int"))
    ).otherwise(F.col("n_both").cast("double"))

    # exact audit tier (the full-cost path the sketches replace at scale).
    # Disjoint pairs matter — "which audiences DON'T overlap" is half the
    # point of the report — so the exact counts left-join onto the pair
    # frame and coalesce to 0 instead of silently dropping empty
    # intersections (the inner-join shape lost them).
    ua = users.select(F.col("event_type").alias("type_a"), "u")
    ub = users.select(F.col("event_type").alias("type_b"), "u")
    sizes = users.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    inter_exact = (
        ua.join(ub, "u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sz_b = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    exact = (
        pairs.join(inter_exact, ["type_a", "type_b"], "left")
        .join(F.broadcast(sz_a), "type_a")
        .join(F.broadcast(sz_b), "type_b")
        .select(
            "type_a",
            "type_b",
            (
                F.col("na") + F.col("nb")
                - F.coalesce("n_inter", F.lit(0))
            ).alias("n_union_exact"),
            F.coalesce("n_inter", F.lit(0)).alias("n_inter_exact"),
        )
    )
    return (
        est.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_union_exact",
            "n_inter_exact",
            F.col("n_merged").cast("bigint").alias("n_merged"),
            F.col("n_both").cast("bigint").alias("n_both"),
            union_est.alias("union_est"),
            inter_est.alias("inter_est"),
            rho.alias("jaccard_est"),
        )
    )


ORACLES["kmv_audience_overlap"] = f"""
    WITH users AS (
      SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u FROM events),
    hashes AS (
      SELECT event_type,
             CAST('0x' || substr(sha256(u), 1, 15) AS BIGINT) AS h
      FROM users),
    pre AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type, h % {_KMV_SALTS}
                                ORDER BY h) AS r1
      FROM hashes),
    kept AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS r2
        FROM pre WHERE r1 <= {KMV_K})
      WHERE r2 <= {KMV_K}),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM kept) a
      JOIN (SELECT DISTINCT event_type FROM kept) b
        ON a.event_type < b.event_type),
    merged AS (
      SELECT type_a, type_b, h, max(fa) AS in_a, max(fb) AS in_b
      FROM (
        SELECT p.type_a, p.type_b, k.h, 1 AS fa, 0 AS fb
        FROM pairs p JOIN kept k ON k.event_type = p.type_a
        UNION ALL
        SELECT p.type_a, p.type_b, k.h, 0 AS fa, 1 AS fb
        FROM pairs p JOIN kept k ON k.event_type = p.type_b)
      GROUP BY type_a, type_b, h),
    sk AS (
      SELECT * FROM (
        SELECT type_a, type_b, h, in_a, in_b,
               row_number() OVER (PARTITION BY type_a, type_b ORDER BY h)
                 AS r
        FROM merged)
      WHERE r <= {KMV_K}),
    est AS (
      SELECT type_a, type_b, count(*) AS n_merged, max(h) AS u_k_int,
             count(CASE WHEN in_a * in_b = 1 THEN 1 END) AS n_both
      FROM sk GROUP BY type_a, type_b),
    sizes AS (SELECT event_type, count(*) AS n FROM users GROUP BY event_type),
    inter_exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_inter_exact
      FROM users a JOIN users b
        ON a.u = b.u AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT e.type_a, e.type_b,
           CAST(x.n + y.n - coalesce(i.n_inter_exact, 0) AS BIGINT)
             AS n_union_exact,
           CAST(coalesce(i.n_inter_exact, 0) AS BIGINT) AS n_inter_exact,
           CAST(e.n_merged AS BIGINT) AS n_merged,
           CAST(e.n_both AS BIGINT) AS n_both,
           CASE WHEN e.n_merged >= {KMV_K}
                THEN {float(KMV_K - 1)}
                     / (CAST(e.u_k_int AS DOUBLE) / {_TWO_POW_60})
                ELSE CAST(e.n_merged AS DOUBLE) END AS union_est,
           CASE WHEN e.n_merged >= {KMV_K}
                THEN (CAST(e.n_both AS DOUBLE) / CAST(e.n_merged AS DOUBLE))
                     * ({float(KMV_K - 1)}
                        / (CAST(e.u_k_int AS DOUBLE) / {_TWO_POW_60}))
                ELSE CAST(e.n_both AS DOUBLE) END AS inter_est,
           CAST(e.n_both AS DOUBLE) / CAST(e.n_merged AS DOUBLE)
             AS jaccard_est
    FROM est e
    LEFT JOIN inter_exact i ON e.type_a = i.type_a AND e.type_b = i.type_b
    JOIN sizes x ON x.event_type = e.type_a
    JOIN sizes y ON y.event_type = e.type_b
"""


_HOUR_US = 3600 * 1_000_000
_DAY_US = 24 * _HOUR_US


def kmv_hourly_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count ROLLUP HIERARCHY from mergeable sketches — the
    non-additive-metric twin of ``hourly_rollup_from_minutely``: distinct
    counts don't re-roll (daily uniques ≠ sum of hourly uniques), so a
    time-series store materializes per-bucket SKETCHES and answers coarser
    windows by MERGING them. Hourly KMV sketches of the distinct-user set
    are built once from the corpus; the daily estimate is then computed
    ONLY from the hourly sketches (k smallest of their concatenation —
    never re-scanning raw events). Returns one row per day:
    ``(bucket_day, n_exact, n_kept, kmv_estimate)`` with the exact daily
    distinct beside the sketch-merged estimate (deterministic under the
    sha2-derived hash, hence oracle-EXACT — unlike HLL).

    100 TB: the raw scan happens once at sketch-build; every coarser
    window (day/week/month/arbitrary range) reads k longs per hour —
    KBs — and a new hour's data touches only its own sketch (incremental
    refresh is O(new data), the continuous-aggregate contract)."""
    from ..functions.hashing import stable_uint60

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    h = stable_uint60(F.col("user_id").cast("string"))
    hashes = ev.select(
        F.timestamp_micros(us - (us % F.lit(_HOUR_US))).alias("bucket_hour"),
        h.alias("h"),
    ).distinct()
    hourly_kept = _kmv_k_smallest(hashes, "bucket_hour")

    hour_us = F.unix_micros(F.col("bucket_hour"))
    daily_in = hourly_kept.select(
        F.timestamp_micros(hour_us - (hour_us % F.lit(_DAY_US))).alias(
            "bucket_day"
        ),
        "h",
    ).distinct()
    merged = _kmv_k_smallest(daily_in, "bucket_day")

    exact = (
        ev.select(
            F.timestamp_micros(us - (us % F.lit(_DAY_US))).alias("bucket_day"),
            h.alias("h"),
        )
        .groupBy("bucket_day")
        .agg(F.countDistinct("h").alias("n_exact"))
    )
    return _kmv_report(merged, exact, "bucket_day")


def _kmv_rollup_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    h = duck_stable_uint60("CAST(user_id AS VARCHAR)")
    return f"""
    WITH hashes AS (
      SELECT DISTINCT
             make_timestamp(epoch_us(ts) - epoch_us(ts) % {_HOUR_US})
               AS bucket_hour,
             {h} AS h
      FROM events),
    pre AS (
      SELECT bucket_hour, h,
             row_number() OVER (PARTITION BY bucket_hour, h % {_KMV_SALTS}
                                ORDER BY h) AS r1
      FROM hashes),
    hourly AS (
      SELECT bucket_hour, h FROM (
        SELECT bucket_hour, h,
               row_number() OVER (PARTITION BY bucket_hour ORDER BY h) AS r2
        FROM pre WHERE r1 <= {KMV_K})
      WHERE r2 <= {KMV_K}),
    daily_in AS (
      SELECT DISTINCT
             make_timestamp(epoch_us(bucket_hour)
                            - epoch_us(bucket_hour) % {_DAY_US}) AS bucket_day,
             h
      FROM hourly),
    dpre AS (
      SELECT bucket_day, h,
             row_number() OVER (PARTITION BY bucket_day, h % {_KMV_SALTS}
                                ORDER BY h) AS r1
      FROM daily_in),
    merged AS (
      SELECT bucket_day, h FROM (
        SELECT bucket_day, h,
               row_number() OVER (PARTITION BY bucket_day ORDER BY h) AS r2
        FROM dpre WHERE r1 <= {KMV_K})
      WHERE r2 <= {KMV_K}),
    agg AS (
      SELECT bucket_day, count(*) AS n_kept, max(h) AS u_k_int
      FROM merged GROUP BY bucket_day),
    exact AS (
      SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % {_DAY_US})
               AS bucket_day,
             count(DISTINCT {h}) AS n_exact
      FROM events GROUP BY 1)
    SELECT e.bucket_day, CAST(e.n_exact AS BIGINT) AS n_exact,
           CAST(a.n_kept AS BIGINT) AS n_kept,
           CASE WHEN a.n_kept < {KMV_K} THEN CAST(a.n_kept AS DOUBLE)
                ELSE {float(KMV_K - 1)}
                     / (CAST(a.u_k_int AS DOUBLE) / {_TWO_POW_60})
           END AS kmv_estimate
    FROM exact e JOIN agg a ON e.bucket_day = a.bucket_day
    """


ORACLES["kmv_hourly_distinct_rollup"] = _kmv_rollup_oracle()


#: per-(user, hour) event quota — the rate-limiting generalization of
#: first-wins (K=1 degenerates to first_per_key on the windowed key)
QUOTA_K = 5


def quota_cap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota enforcement / rate limiting: keep the EARLIEST ``QUOTA_K``
    events per (user, hour window), drop the overflow — the governance
    pass a multi-tenant ingest runs before dedup (a runaway producer
    cannot flood the pipeline). Returns the kept rows as (event_id,
    user_id, bucket_us, rank_in_window) plus the window's overflow count
    on each row — first_per_key generalized from K=1 to K per windowed
    key, deterministic under the (ts, event_id) order.

    Plan: ONE shuffle on (user, bucket) + a ranked window inside each
    group; groups are user-hour sized (bounded by the quota's reason for
    existing), so no skew — a hot user produces many GROUPS, not a hot
    partition."""
    ev = load_table(spark, sf_dir, "events")
    hb = F.expr("unix_micros(ts) div 3600000000") * F.lit(3_600_000_000)
    w = Window.partitionBy("user_id", "bucket_us").orderBy("ts", "event_id")
    ranked = (
        ev.select("event_id", "user_id", "ts", hb.alias("bucket_us"))
        .withColumn("rank_in_window", F.row_number().over(w))
        .withColumn(
            "n_overflow",
            F.greatest(
                F.count(F.lit(1)).over(
                    Window.partitionBy("user_id", "bucket_us")
                )
                - F.lit(QUOTA_K),
                F.lit(0),
            ),
        )
    )
    return ranked.filter(F.col("rank_in_window") <= QUOTA_K).select(
        "event_id",
        "user_id",
        F.col("bucket_us").cast("long").alias("bucket_us"),
        "rank_in_window",
        F.col("n_overflow").cast("long").alias("n_overflow"),
    )


ORACLES["quota_cap_events"] = f"""
    WITH ranked AS (
      SELECT event_id, user_id,
             (epoch_us(ts) // 3600000000) * 3600000000 AS bucket_us,
             row_number() OVER (PARTITION BY user_id,
                                  (epoch_us(ts) // 3600000000)
                                ORDER BY ts, event_id) AS rank_in_window,
             count(*) OVER (PARTITION BY user_id,
                              (epoch_us(ts) // 3600000000)) AS n_in_window
      FROM events)
    SELECT event_id, user_id, CAST(bucket_us AS BIGINT) AS bucket_us,
           CAST(rank_in_window AS BIGINT) AS rank_in_window,
           CAST(greatest(n_in_window - {QUOTA_K}, 0) AS BIGINT)
             AS n_overflow
    FROM ranked WHERE rank_in_window <= {QUOTA_K}
"""


#: join-size estimator sampling rate denominator: keys with
#: hash < 2^60/R are sampled (a coordinated ~1/R hash sample of the KEY
#: DOMAIN — the same keys on both sides, which is the whole trick)
JSE_R = 8
_JSE_THRESHOLD = (1 << 60) // JSE_R


def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based JOIN-CARDINALITY estimation — the number a cost-based
    planner needs BEFORE running a join (broadcast vs shuffle vs
    skew-handling decisions): |A ⋈ B on k| = Σ over shared keys of
    cA(k)·cB(k), estimated from a COORDINATED hash sample of the key
    domain (keys with stable-hash < 2⁶⁰/R; both sides sample the SAME
    keys because the hash is of the key, so per-key products are observed
    intact — independent row samples would square the rate on the
    products). Estimate = R · Σ over sampled shared keys cA·cB.

    Demo pair: events.user_id ⋈ orders.o_custkey (both sides many rows
    per key — the join-size problem is only interesting off unique keys).
    Returns one row with the exact size beside the estimate:
    ``(n_keys_shared, n_keys_sampled, join_rows_exact, join_rows_est)``
    — all exact BIGINTs (the estimator itself is deterministic under the
    seeded hash, so it is oracle-EXACT even though it is an estimate of
    the true size).

    100 TB: each side ships only its sampled-key counts (≈ vocab/R rows,
    KBs) to the planner; the exact column here exists to expose the
    estimator's real error as data, like the KMV/CMS entries."""
    from ..functions.hashing import stable_uint60

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("k")
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("k")
    )
    ca = ev.groupBy("k").agg(F.count(F.lit(1)).alias("ca"))
    cb = od.groupBy("k").agg(F.count(F.lit(1)).alias("cb"))
    joined = ca.join(cb, "k").select(
        "k",
        (F.col("ca") * F.col("cb")).alias("prod"),
        (
            stable_uint60(F.col("k").cast("string")) < _JSE_THRESHOLD
        ).alias("sampled"),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_keys_shared"),
        F.sum(F.col("sampled").cast("long")).alias("n_keys_sampled"),
        F.sum("prod").alias("join_rows_exact"),
        (
            F.lit(JSE_R)
            * F.sum(F.when(F.col("sampled"), F.col("prod")).otherwise(0))
        ).alias("join_rows_est"),
    )


def _jse_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    h = duck_stable_uint60("CAST(kk AS VARCHAR)")
    return f"""
    WITH ca AS (SELECT CAST(user_id AS BIGINT) AS k, count(*) AS ca
                FROM events GROUP BY 1),
    cb AS (SELECT CAST(o_custkey AS BIGINT) AS k, count(*) AS cb
           FROM orders GROUP BY 1),
    j AS (SELECT ca.k AS kk, ca.ca * cb.cb AS prod
          FROM ca JOIN cb ON ca.k = cb.k),
    js AS (SELECT prod, {h} < {_JSE_THRESHOLD} AS sampled FROM j)
    SELECT CAST(count(*) AS BIGINT) AS n_keys_shared,
           CAST(sum(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keys_sampled,
           CAST(sum(prod) AS BIGINT) AS join_rows_exact,
           CAST({JSE_R} * sum(CASE WHEN sampled THEN prod ELSE 0 END)
                AS BIGINT) AS join_rows_est
    FROM js
    """


ORACLES["join_size_estimate"] = _jse_oracle()

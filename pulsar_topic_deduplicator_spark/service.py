"""Service composition — the reference's ``main()``, Spark-first.

The reference's startup wiring (``src/index.ts:107-213``) is a fixed order:
config (fail-fast) → health server up but UNHEALTHY → Pulsar client/
producer/reader/consumer → warm-up scan of the *own output* topic → mark
healthy → steady-state dedup loop; teardown reverses it with each step
isolated (``src/index.ts:18-101``). This module is that composition over
the engine's pieces:

1. ``EngineConfig`` (same env names, fail-fast — ``config.py``);
2. warm-up (op #11): batch-scan the service's prior output within
   ``CACHE_WINDOW_IN_SECONDS``, parse-and-validate ``origin`` digests
   (op #12, message-granular skip), seed the dedup state — completed
   strictly BEFORE live consumption, the reference's happens-before edge
   (``src/deduplication.ts:75-79``);
3. exact-TTL streaming dedup keyed on the config's ignored-properties
   projection (ops #4–#9);
4. health / counters / graceful stop (ops #13–#15) surfaced as methods.

The live broker line is the one piece the sandbox cannot exercise: swap the
file source for ``.format("pulsar"|"kafka")`` + the option maps in
``sources/formats.py`` (the envelope bridges are digest-stable round-trip
tested there).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .config import EngineConfig
from .operators.lineage import extract_origin_digests
from .streaming.dedup import run_ttl_dedup_bounded, start_ttl_dedup
from .streaming.ops import graceful_stop, health_status, observed_counters


def warmup_seed_digests(
    prior_output: DataFrame, config: EngineConfig, now_ts
) -> DataFrame:
    """Op #11's scan shape on a batch view of the service's prior output
    (columns ``publish_ts``/``event_ts`` + ``origin``): keep rows inside
    ``[now − cache_window, now]`` — publish time preferred, event time as
    fallback (``src/cacheBuilding.ts:144-150``) — unless seek is disabled,
    in which case scan from Earliest (``CACHE_REBUILD_DISABLE_SEEK``,
    ``src/cacheBuilding.ts:133-138``); then parse-and-validate the origin
    digests (op #12). The time filter lands BEFORE extraction so it pushes
    into the scan — the broker-side ``seekTimestamp`` analog."""
    ts = F.coalesce("publish_ts", "event_ts")
    if not config.cache_rebuild_disable_seek:
        cutoff = F.lit(now_ts).cast("timestamp") - F.expr(
            f"INTERVAL {int(config.cache_window_seconds)} SECONDS"
        )
        prior_output = prior_output.filter(
            (ts >= cutoff) & (ts <= F.lit(now_ts).cast("timestamp"))
        )
    return extract_origin_digests(prior_output).distinct()


@dataclass
class DedupService:
    """Running dedup service handle: the reference's process, as an object.

    ``health()`` is the ``/healthz`` mapping (204/500 — wire to any HTTP
    thread), ``counters()`` the 60 s forwarded/dropped telemetry analog,
    ``stop()`` the ordered teardown (final micro-batch commit = producer
    flush)."""

    spark: SparkSession
    query: StreamingQuery
    output_table: str

    def health(self) -> tuple[int, str]:
        return health_status(self.query)

    def counters(self) -> dict:
        return observed_counters(self.query)

    def output(self) -> DataFrame:
        return self.spark.table(self.output_table)

    def stop(self, timeout_seconds: float = 60.0) -> bool:
        return graceful_stop(self.query, timeout_seconds)


def start_dedup_service(
    spark: SparkSession,
    config: EngineConfig,
    source_dir: str,
    checkpoint_dir: str,
    prior_output: DataFrame | None = None,
    now_ts: str = "2024-01-03 00:00:00",
    glob_filter: str | None = None,
    use_tws: bool | None = None,
) -> DedupService:
    """Wire config → warm-up → live dedup in the reference's startup order
    and return the running service. ``prior_output`` is the batch view of
    the service's own previous output (the reference re-reads its output
    topic); None (or a disabled cache window) skips warm-up exactly like
    ``cacheWindowInSeconds <= 0`` (``src/cacheBuilding.ts:71-77``)."""
    seeds = None
    if config.warmup_enabled and prior_output is not None:
        seeds = warmup_seed_digests(prior_output, config, now_ts)
    query, name = start_ttl_dedup(
        spark,
        source_dir,
        checkpoint_dir,
        ttl_ms=config.dedup_window_ms,
        seed_digests=seeds,
        glob_filter=glob_filter,
        use_tws=use_tws,
        ignored=config.ignored_properties,
    )
    return DedupService(spark=spark, query=query, output_table=name)


def run_dedup_service_bounded(
    spark: SparkSession,
    config: EngineConfig,
    source_dir: str,
    checkpoint_dir: str,
    prior_output: DataFrame | None = None,
    now_ts: str = "2024-01-03 00:00:00",
    glob_filter: str | None = None,
    use_tws: bool | None = None,
) -> DataFrame:
    """Bounded (drain-and-stop) run of the full service composition — the
    test/backfill entry point."""
    seeds = None
    if config.warmup_enabled and prior_output is not None:
        seeds = warmup_seed_digests(prior_output, config, now_ts)
    return run_ttl_dedup_bounded(
        spark,
        source_dir,
        checkpoint_dir,
        ttl_ms=config.dedup_window_ms,
        seed_digests=seeds,
        glob_filter=glob_filter,
        use_tws=use_tws,
        ignored=config.ignored_properties,
    )

"""Deterministic sampling & splitting — the selection operators a training
pipeline runs before anything else.

NOT in the reference (it forwards everything it doesn't drop); mandated by
the training-data-pipeline extension tier. Everything here is HASH-BASED
selection, never RNG sampling: ``rand()``-style samples change with
partitioning, retries, and cluster size, which silently breaks lineage and
makes A/B runs incomparable. A stable content/key hash makes every decision
a pure function of the row — reproducible on any cluster, incrementally
consistent as the corpus grows (a document keeps its split forever), and
exactly reproducible in the DuckDB oracle (same sha2 construction as the
MinHash seeds).

The hash-percent operators are single-scan, shuffle-free selections (the
plan is scan → filter/project), so they run at 100 TB for the cost of
reading the input once — and the hash predicate could push into a smarter
source. ``stratified_sample_events`` adds the EXACT-k per-stratum variant
(bottom-k of the same hash), which costs one per-stratum top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_uint60
from ..sources.io import load_table
from ._oracle_fragments import duck_stable_uint60

#: train/val/test boundaries in hash-percent space
SPLIT_TRAIN = 80
SPLIT_VAL = 90

#: per-source keep rates for the mixture (hash-percent thresholds); sources
#: not listed keep the default. Deterministic stand-in for the "upsample
#: books, downsample web" mixture step of corpus curation.
MIXTURE_RATES = {"src0": 100, "src1": 50, "src2": 25, "src3": 10}
MIXTURE_DEFAULT = 75


def _hash_pct(c: Column) -> Column:
    """Stable per-row percentile bucket 0..99 from the 60-bit content hash."""
    return stable_uint60(c) % 100


def hash_sample_events(spark: SparkSession, sf_dir: str, pct: int = 10) -> DataFrame:
    """Deterministic ``pct``% sample of events keyed on event_id: a row is
    in the sample iff hash(id) lands under the threshold — same rows on
    every run, every cluster, every retry."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        _hash_pct(F.col("event_id").cast("string")) < pct
    ).select("event_id", "user_id", "event_type", "value")


def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 split of the document corpus keyed on doc content (not id:
    re-ingesting the same text under a new id must not leak it across
    splits — the classic eval-contamination bug)."""
    docs = load_table(spark, sf_dir, "documents")
    pct = _hash_pct(F.col("text"))
    return docs.select(
        "doc_id",
        F.when(pct < SPLIT_TRAIN, "train")
        .when(pct < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixture: each source keeps its configured hash-percent
    of documents (upsample-by-keeping-more, downsample-by-keeping-less) —
    the curation step that rebalances web/books/code proportions. The rate
    lookup is a small CASE expression (JVM-side, no join)."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(MIXTURE_DEFAULT)
    for src, r in sorted(MIXTURE_RATES.items()):
        rate = F.when(F.col("source") == src, r).otherwise(rate)
    return docs.filter(_hash_pct(F.col("text")) < rate).select(
        "doc_id", "source", "lang"
    )


_H_PCT = "(" + duck_stable_uint60("{expr}") + " % 100)"

_MIX_CASE = (
    "CASE "
    + " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in sorted(MIXTURE_RATES.items())
    )
    + f" ELSE {MIXTURE_DEFAULT} END"
)

ORACLES: dict[str, str] = {
    "hash_sample_events": f"""
        SELECT event_id, user_id, event_type, value
        FROM events
        WHERE {_H_PCT.format(expr="CAST(event_id AS VARCHAR)")} < 10
    """,
    "train_val_test_split": f"""
        SELECT doc_id,
               CASE WHEN {_H_PCT.format(expr="text")} < {SPLIT_TRAIN} THEN 'train'
                    WHEN {_H_PCT.format(expr="text")} < {SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "source_mixture_sample": f"""
        SELECT doc_id, source, lang
        FROM documents
        WHERE {_H_PCT.format(expr="text")} < {_MIX_CASE}
    """,
}


#: exact per-stratum sample size
STRATUM_K = 20


def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k stratified sample: precisely ``STRATUM_K`` events per
    event_type (or all of them if the stratum is smaller), selected as the
    bottom-k of the stable content hash — i.e. a uniform
    without-replacement draw per stratum that is a pure function of the
    data (same rows on every run/cluster/retry, and a row stays selected
    as long as it stays in the k smallest of its stratum).

    The hash-percent operators above give BERNOULLI samples (size varies
    ±√n); evaluation sets and per-class probes need exact counts — this is
    the bottom-k/priority-sampling construction those pipelines use.

    Plan: one shuffle on event_type + a ranked window per stratum; stratum
    count is small (event types), so the 100 TB shape is a per-stratum
    top-k which Spark executes as partial top-k map-side (rank ≤ k filter
    collapses each partition to k rows before the exchange under AQE's
    window-group-limit pushdown)."""
    ev = load_table(spark, sf_dir, "events")
    h = stable_uint60(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    return (
        ev.select("event_id", "event_type", h.alias("h"))
        .withColumn("stratum_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("stratum_rank") <= STRATUM_K)
        .select("event_id", "event_type", "stratum_rank")
    )


_H_ID = duck_stable_uint60("CAST(event_id AS VARCHAR)")

ORACLES["stratified_sample_events"] = f"""
    SELECT event_id, event_type, CAST(stratum_rank AS BIGINT) AS stratum_rank
    FROM (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY {_H_ID}, event_id) AS stratum_rank
      FROM events)
    WHERE stratum_rank <= {STRATUM_K}
"""

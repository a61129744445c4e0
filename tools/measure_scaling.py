#!/usr/bin/env python
"""Measured scaling curve: one operator per tier at 1× (sf0.01), 10×
(sf0.1), and a synthetic 100× built by replicating the sf0.1 FACT tables
×10 with fresh keys (dimensions unchanged) — the engine's evidence that no
plan goes super-linear under the next 10×. Cited by BASELINE.md's
"measured scaling curve" table; re-run per round.

Synthetic 100× construction (written once to --workdir, reused):
- events ×10 → 1M rows: event_id/user_id offset per replica, props
  re-keyed per replica (fresh digests — replicas must NOT collapse as
  duplicates), ts unchanged;
- lineitem ×10 → 6M and orders ×10 → 1.5M: l_orderkey/o_orderkey offset
  per replica IN STEP (joins stay consistent), o_custkey unchanged (dims
  are not replicated);
- documents ×10 → 50k: doc_id offset, every WORD suffixed with the
  replica tag so replica corpora are mutually unrelated (near-dup
  operators must not find cross-replica pairs);
- dimensions (region nation customer supplier part) symlink-copied as-is.

Wall seconds, noop sink, cold per (op, scale) run in ONE session per scale
(cache registry drained between ops, same hygiene as bench.py).

Usage: python tools/measure_scaling.py [--workdir /tmp/scale100]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from pulsar_topic_deduplicator_spark.session import get_spark  # noqa: E402

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"

#: one operator per tier (see BASELINE.md scaling table)
OPS = [
    "dedup_exact_keep_first",     # exact dedup (min_by agg)
    "kmv_hourly_distinct_rollup", # sketch rollup hierarchy
    "event_type_stats_salted",    # salted skew agg
    "sessionize_events",          # gaps-and-islands windows
    "q1_pricing_summary",         # TPC-H scan+agg
    "q3_shipping_priority",       # broadcast dim + fact join
    "dedup_docs_by_url",          # URL keep-first (documents)
    "text_stats",                 # zero-shuffle text projection
    "near_dup_pairs_verified",    # LSH candidates + exact verify
    "bpe_merge_steps",            # iterative trainer loop
    # span/substring dedup tier — the most corpus-bound LLM tier; the
    # gram explode is the likeliest place a super-linear surprise hides
    # (VERDICT r10 item 6)
    "duplicate_substring_spans",  # Lee et al. exact-substring spans
    "dedup_paragraphs",           # paragraph-hash keep-first
    # media fingerprint tier (round 11): decode+hash Arrow stage feeding
    # the banded hamming join; replicated docs give replicated assets
    "phash_image_near_dup",       # image aHash banding + verify
    "video_near_dup",             # 8-frame stream decode + frame-0 banding
    "near_dup_paragraphs",        # paragraph MinHash/LSH + verify
    # round-11 LATE additions: the coverage-explode rolling distinct
    # (events-bound, W× row blowup must stay linear) and the T5 span
    # plan (corpus-bound zero-shuffle explode). fd_violations_report /
    # k_anonymity_report are deliberately absent: they aggregate the
    # UNREPLICATED dimension tables, so all three scales would measure
    # the same input — no scaling information.
    "rolling_active_users",       # coverage-explode rolling distinct
    "span_corruption_masks",      # T5 denoising spans (zero-shuffle)
    # round-11 second LATE wave: the within-part pair explosion is the
    # one new shape with super-linear potential (Σ C(deg_p, 2) — the
    # LINKPRED_MAX_PART_DEG cap is its guard); the self-retrieval eval
    # scales the postings join; the streaming KS monitor scales the
    # complete-mode (type, value, day) aggregate with event volume.
    "common_neighbor_links",      # capped co-supply pair explosion
    "tfidf_selfretrieval_eval",   # postings + broadcast query probe
    "stream_ks_drift",            # streaming count agg + KS kernel
    # round-12: the ACF Pearson sums moved to decimal accumulation + the
    # pinned-float ratio (ADVICE r12) — sentinel that the events-bound
    # (type, hour) aggregate + constant-size lag windows stay linear
    "acf_event_counts",           # zero-filled hourly ACF (decimal sums)
    # round-13: the converted-to-oracle streaming LSH filter — documents-
    # bound banding + bucket self-join inside one foreachBatch; replicated
    # corpora are word-re-keyed so cross-replica pairs cannot appear and
    # the bucket join must stay linear in the corpus
    "stream_near_dup",            # streaming MinHash/LSH first-wins filter
    # round-14: the codebook tier left the rows-only raw set (fixed-point
    # Lloyd updates). Embeddings now replicate ×10 with IDENTICAL vectors
    # under fresh vec_ids — for semantic_dedup that is a deliberately
    # dup-heavy stress (every replica pair collides at cosine 1.0 within
    # its cell; the hot-cell sub-bucket bound is allowed to engage, so
    # the shim calls the operator WITHOUT the oracle-regime guard), and
    # for IVF it scales the scan/assign path under a fixed codebook.
    "semantic_dedup",             # SemDeDup within-cell pairwise + codebook
    "ivf_topk_cosine",            # IVF train/assign + pruned probe
]

REPLICAS = 10
_KEY_STRIDE = 10_000_000_000  # far above any sf0.1 key


def build_100x(spark, workdir: str) -> str:
    out = os.path.join(workdir, "sf1_synth")
    # marker renamed round 14 (embeddings replication added) so stale
    # workdirs rebuild instead of serving the old unreplicated table
    marker = os.path.join(out, "_BUILT_r14")
    if os.path.exists(marker):
        print(f"reusing synthetic 100x at {out}")
        return out
    os.makedirs(out, exist_ok=True)
    t0 = time.time()

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    reps = []
    for r in range(REPLICAS):
        off = F.lit(r * _KEY_STRIDE)
        reps.append(
            ev.select(
                (F.col("event_id") + off).alias("event_id"),
                "ts",
                (F.col("user_id") + off).alias("user_id"),
                "event_type",
                "value",
                # fresh content per replica: dedup digests must not
                # collapse replicas into one another
                F.concat(F.col("props"), F.lit(f'#r{r}')).alias("props"),
            )
        )
    _union(reps).write.mode("overwrite").parquet(f"{out}/events.parquet")

    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    _union(
        [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(r * _KEY_STRIDE)
            )
            for r in range(REPLICAS)
        ]
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    od = spark.read.parquet(f"{SF01}/orders.parquet")
    _union(
        [
            od.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(r * _KEY_STRIDE)
            )
            for r in range(REPLICAS)
        ]
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    _union(
        [
            docs.select(
                (F.col("doc_id") + F.lit(r * _KEY_STRIDE)).alias("doc_id"),
                # suffix every word → replica corpora share no shingles
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"_r{r}")),
                    ),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for r in range(REPLICAS)
        ]
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    # identical vectors under fresh ids: a dup-heavy corpus for the
    # semantic tier (the workload it exists for); seeds (vec_id < 16) and
    # the query vector (vec_id 0) stay unique to replica 0, so the
    # codebook is FIXED while the corpus grows — the deployment shape
    _union(
        [
            emb.withColumn(
                "vec_id", F.col("vec_id") + F.lit(r * _KEY_STRIDE)
            )
            for r in range(REPLICAS)
        ]
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    for dim in ["region", "nation", "customer", "supplier", "part"]:
        dst = f"{out}/{dim}.parquet"
        if not os.path.exists(dst):
            src = f"{SF01}/{dim}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    open(marker, "w").write("ok")
    print(f"built synthetic 100x in {time.time() - t0:.0f}s at {out}")
    return out


def _union(frames):
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f)
    return df


def run_tier(sf_dir: str, label: str) -> dict[str, float]:
    import __spark_entry__ as entrymod
    from pulsar_topic_deduplicator_spark.cachereg import release_all

    spark = get_spark(f"scaling-{label}")
    spark.sparkContext.setLogLevel("ERROR")
    if label == "100x":
        sf_dir = build_100x(spark, WORKDIR)
    qs = entrymod.queries()
    # session warm-up so the first op doesn't pay JVM/codegen startup
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    out: dict[str, float] = {}
    for name in OPS:
        t0 = time.perf_counter()
        if name == "stream_ks_drift" and os.path.isdir(
            f"{sf_dir}/events.parquet"
        ):
            # synthetic tiers write events.parquet as a DIRECTORY of part
            # files; the entry's leaf-name glob ("events.parquet") only
            # fits the driver's single-file layout — stream the subdir
            from pulsar_topic_deduplicator_spark.streaming.drift import (
                run_stream_ks_drift_bounded,
            )

            df = run_stream_ks_drift_bounded(
                spark, f"{sf_dir}/events.parquet", glob_filter="*.parquet"
            )
        elif name == "stream_near_dup" and os.path.isdir(
            f"{sf_dir}/documents.parquet"
        ):
            # same directory-layout shim for the documents stream. The
            # filter materializes a corpus-sized kept/bucket-index work
            # dir — consume it within the shim and delete it (the other
            # OPS only write to the noop sink; leaking multi-GB tempdirs
            # per tier would fill /tmp across repeated runs)
            import tempfile

            from pulsar_topic_deduplicator_spark.streaming.neardup_stream import (
                run_stream_near_dup_bounded,
            )

            nd_work = tempfile.mkdtemp("nd_scale")
            try:
                df = run_stream_near_dup_bounded(
                    spark,
                    f"{sf_dir}/documents.parquet",
                    nd_work,
                    glob_filter="*.parquet",
                )
                df.write.format("noop").mode("overwrite").save()
            finally:
                shutil.rmtree(nd_work, ignore_errors=True)
            df = None
        elif name == "semantic_dedup":
            # direct call WITHOUT the oracle-regime guard: at the dup-heavy
            # synthetic 100× the hot-cell sub-bucket bound is allowed (and
            # expected) to engage — that is the behavior being measured
            from pulsar_topic_deduplicator_spark.operators.similarity import (
                semantic_dedup,
            )

            df = semantic_dedup(spark, sf_dir)
        else:
            df = qs[name](spark, sf_dir)
        if df is not None:
            df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 2)
        release_all()
        spark.catalog.clearCache()
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):  # localCheckpoint leftovers (see bench.py hygiene note)
            rdd.unpersist()
        print(f"  {label:5s} {name} {out[name]}s")
    spark.stop()
    return out


WORKDIR = "/tmp/scale100"

if __name__ == "__main__":
    if "--workdir" in sys.argv:
        WORKDIR = sys.argv[sys.argv.index("--workdir") + 1]
    if "--ops" in sys.argv:  # measure a subset (new-op follow-up runs)
        only = sys.argv[sys.argv.index("--ops") + 1].split(",")
        OPS[:] = [op for op in OPS if op in only]
    os.makedirs(WORKDIR, exist_ok=True)
    results = {
        "1x": run_tier(SF001, "1x"),
        "10x": run_tier(SF01, "10x"),
        "100x": run_tier("", "100x"),
    }
    table = {
        op: {
            "1x": results["1x"][op],
            "10x": results["10x"][op],
            "100x": results["100x"][op],
            "r10_1": round(results["10x"][op] / max(results["1x"][op], 1e-9), 1),
            "r100_10": round(
                results["100x"][op] / max(results["10x"][op], 1e-9), 1
            ),
        }
        for op in OPS
    }
    print(json.dumps(table, indent=1))

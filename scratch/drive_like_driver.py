"""Simulate the verify driver: vanilla SparkSession (none of our tuned
configs), import the entry module, run entry() + a sample of queries()
against oracle_sql() through DuckDB, exactly like CORRECTNESS_r{N}."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# deliberately plain session — the driver won't use our session.py
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print("ENTRY rows:", len(rows), "| schema:", [f.name for f in df.schema.fields])
print("ENTRY sample:", rows[0])
# driver retries: a second entry() in the same session must be stable
df2 = e.entry(spark)
assert len(df2.collect()) == len(rows) and df2.schema == df.schema, "entry() unstable"
print("ENTRY retry: stable")

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")

qs, os_ = e.queries(), e.oracle_sql()
print(f"{len(qs)} queries, {len(os_)} oracles")
import math
def cell(v):
    return repr(v) if isinstance(v, float) else str(v)
mismatch = 0
for name in sorted(os_):
    sdf = qs[name](spark, "/root/testdata/sf0.01")
    srows = sorted(tuple(cell(r[c]) for c in sorted(sdf.columns)) for r in sdf.collect())
    rel = con.sql(os_[name])
    dcols = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    drows = sorted(tuple(cell(r[i]) for i in dcols) for r in rel.fetchall())
    ok = srows == drows
    mismatch += not ok
    print(("OK  " if ok else "FAIL"), name, len(srows), "rows")
print("mismatches:", mismatch)
for name in sorted(set(qs) - set(os_)):
    df = qs[name](spark, "/root/testdata/sf0.01")
    print("ROWS", name, df.count())
# sf0.1 spot-checks: hardcoded-path and nanos-timestamp hazards at scale
for name in [
    "q1_pricing_summary",
    "dedup_exact_keep_first",
    "text_stats",
    "hourly_rollup_from_minutely",  # µs bucketing on the big events table
    "band_self_join_prices",  # bucketized theta join at scale
    "kmv_distinct_by_type",  # sketch ranks over the full digest set
    "pagerank_top_suppliers",  # iterative joins over the full edge list
    "session_purchase_overlaps",  # interval-overlap explode at scale
    "merge_upsert_orders",  # CDC argmax merge on the full orders table
    "funnel_steps",  # chained windows over the big events table
    "stream_dedup_ttl_watermark",  # JVM watermark TTL kernel at scale
    "cluster_representatives",  # CC + quality argmax composition at scale
    "chunk_documents",  # zero-shuffle chunk explode at scale
    "lm_bigram_nll",  # bigram-LM scoring joins at scale
    "dedup_paragraphs",  # span explode + hash window + reassembly at scale
    "near_dup_paragraphs",  # span-keyed LSH + verify at scale
    "dedup_paragraphs_fuzzy",  # pair-driven removal + reassembly at scale
    "dedup_docs_incremental",  # new-vs-index classification at scale
    "service_counters_watermark",  # gated watermark-kernel service at scale
    "dedup_substrings_global",  # gram windows + word-position join at scale
    "decontaminate_fuzzy",  # corpus x bench band join + verify at scale
    "kmv_audience_overlap",  # sketch build over the full distinct user set
    "supplier_affinity",  # OPH sketch affinity (round-10 default read)
    "contrastive_pair_mining",  # blockwise BLAS mining at scale
    "ccnet_quality_buckets",  # LM scoring + per-lang ntile at scale
    "shard_plan_tokens",  # two-stage global prefix sum at scale
    "tokenizer_fertility_by_lang",  # BPE vocab loop + encode join at scale
]:
    print("SF01", name, qs[name](spark, "/root/testdata/sf0.1").count())
spark.stop()
print("DRIVER-SIM FINAL mismatches:", mismatch)
sys.exit(1 if mismatch else 0)

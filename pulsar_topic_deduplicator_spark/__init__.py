"""PySpark-native analytics engine with the capabilities of
``tvv-lippu-ja-maksujarjestelma-oy/pulsar-topic-deduplicator``.

The reference is a single-process Pulsar stream deduplicator (keep the FIRST
occurrence of each unique message within a TTL window — see SURVEY.md §2.1).
This package re-expresses that semantics Spark-first (DataFrame/SQL plans that
Catalyst optimizes; Structured Streaming for the live path) and extends it
with the large-scale training-data-pipeline operators mandated by the project
brief: dedup families (exact, window, MinHash/LSH, SimHash, n-gram Jaccard),
similarity search over embeddings, text analysis, and multimodal-column
plumbing.

Layout:
    functions/  — column-level expression builders (canonical JSON, hashing,
                  tokenization, vector math)
    operators/  — batch operators, each a (spark, sf_dir) -> DataFrame or
                  df -> df transform (dedup, lineage, relational, text,
                  near-dup, similarity, multimodal)
    sources/    — table loaders and the message-shaped view of the events
                  table (FIXTURES.md §A.1)
    streaming/  — Structured Streaming dedup pipeline (watermark +
                  dropDuplicatesWithinWatermark + origin enrichment)
    plans/      — plan-inspection helpers used by tests to assert pushdown /
                  broadcast / codegen properties
"""

__version__ = "0.1.0"

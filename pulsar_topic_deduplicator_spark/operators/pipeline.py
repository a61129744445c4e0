"""End-to-end corpus-cleaning pipeline — the composite query a training-data
pipeline actually runs, chaining the engine's operator families:

    exact dedup (content fingerprint, keep lowest doc_id)
      → near-dup removal (MinHash/LSH candidates + exact Jaccard verify;
        drop the higher doc_id of each verified pair)
      → quality gate (length band + stopword ratio + lexical diversity)

One DataFrame program, one oracle — demonstrating that the per-operator
parity composes. Pair-drop is non-transitive by design (A~B, B~C drops B
and C, keeps A — the standard connected-component refinement is a
documented scale-path extension, not needed at the verified threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from .neardup import ORACLES as NEARDUP_ORACLES
from .neardup import near_dup_pairs_verified
from .textops import STOPWORDS

QUALITY_THRESHOLD = 0.55


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept documents after exact-dedup + near-dup removal + quality gate."""
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: exact dedup — keep the lowest doc_id per content fingerprint
    kept_exact = (
        docs.select(F.sha2(F.col("text"), 256).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )

    # stage 2: near-dup removal — drop the higher doc_id of each verified pair
    near_dups = (
        near_dup_pairs_verified(spark, sf_dir).select(
            F.col("doc_b").alias("doc_id")
        )
    ).distinct()

    # stage 3: quality gate
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(words, lambda w: F.array_contains(stop, w))).cast("double")
        / n.cast("double")
    )
    quality = (
        F.when((n >= 20) & (n <= 400), F.lit(1.0)).otherwise(F.lit(0.5)) * 0.4
        + stop_ratio * 0.2
        + (nd.cast("double") / n.cast("double")) * 0.4
    )
    scored = docs.select("doc_id", "lang", quality.alias("quality"))

    return (
        scored.join(kept_exact, "doc_id", "left_semi")
        .join(near_dups, "doc_id", "left_anti")
        .filter(F.col("quality") >= QUALITY_THRESHOLD)
        .select("doc_id", "lang", "quality")
    )


def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation FUNNEL over the round-5 operators: how many docs
    survive each sequential stage — exact dedup → boilerplate prefix dedup →
    Gopher quality gate — the per-mixture-component attrition table a
    training-data curation run reports.

    Shape: three survivor-id sets (two min-aggregations + one pushed-down
    filter) left-joined back and counted per source — at 100 TB every stage
    is the already-plan-asserted single-shuffle shape, the id sets are
    join-reduced (AQE broadcasts them when small), and the final aggregate
    is per-source scalar rows."""
    from .textops import PREFIX_WORDS, gopher_pass

    from ..cachereg import persist_scoped

    docs = load_table(spark, sf_dir, "documents")
    # each survivor-id set is consumed twice (the next stage's semi-join
    # AND the final funnel join) and the later sets nest the earlier ones
    # — unpinned, the full-text sha2 pass re-ran ~4x (plan-audit finding);
    # the id frames are doc-count-sized, so the persists are cheap
    exact_ids = persist_scoped(
        docs.select(F.sha2(F.col("text"), 256).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d1 = docs.join(exact_ids, "doc_id", "left_semi")
    prefix = F.array_join(F.slice(F.split(F.col("text"), " "), 1, PREFIX_WORDS), " ")
    prefix_ids = persist_scoped(
        d1.select(F.sha2(prefix, 256).alias("pk"), "doc_id")
        .groupBy("pk")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d2 = d1.join(prefix_ids, "doc_id", "left_semi")
    quality_ids = d2.filter(gopher_pass(F.col("text"))).select("doc_id")

    flagged = (
        docs.select("doc_id", "source")
        .join(exact_ids.withColumn("s1", F.lit(1)), "doc_id", "left")
        .join(prefix_ids.withColumn("s2", F.lit(1)), "doc_id", "left")
        .join(quality_ids.withColumn("s3", F.lit(1)), "doc_id", "left")
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("s1").alias("n_after_exact"),
        F.count("s2").alias("n_after_prefix"),
        F.count("s3").alias("n_after_quality"),
    )


# the oracle composes the already-verified near-dup CTE chain with the
# exact-dedup and quality stages
_NEAR_DUP_SQL = NEARDUP_ORACLES["near_dup_pairs_verified"].strip().rstrip()

_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

ORACLES: dict[str, str] = {
    "corpus_clean_pipeline": f"""
        WITH near_dup_drop AS (
          SELECT DISTINCT doc_b AS doc_id FROM ({_NEAR_DUP_SQL})
        ),
        kept_exact AS (
          SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
        ),
        scored AS (
          SELECT doc_id, lang,
                 (CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 400
                       THEN 1.0 ELSE 0.5 END) * 0.4
                 + (len(list_filter(string_split(text, ' '),
                                    w -> w IN ({_STOP_SQL}))) * 1.0
                    / len(string_split(text, ' '))) * 0.2
                 + (len(list_distinct(string_split(text, ' '))) * 1.0
                    / len(string_split(text, ' '))) * 0.4 AS quality
          FROM documents
        )
        SELECT s.doc_id, s.lang, s.quality
        FROM scored s
        WHERE s.doc_id IN (SELECT doc_id FROM kept_exact)
          AND s.doc_id NOT IN (SELECT doc_id FROM near_dup_drop)
          AND s.quality >= {QUALITY_THRESHOLD}
    """,
}


def _curation_oracle() -> str:
    from .textops import PREFIX_KEY_SQL, GOPHER_PASS_SQL, gopher_stats_sql

    return f"""
        WITH e AS (
          SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
        ),
        p AS (
          SELECT min(doc_id) AS doc_id
          FROM documents WHERE doc_id IN (SELECT doc_id FROM e)
          GROUP BY {PREFIX_KEY_SQL}
        ),
        g AS (
          SELECT doc_id
          FROM ({gopher_stats_sql(
              src="(SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM p)) d2"
          )}) stats
          WHERE {GOPHER_PASS_SQL}
        )
        SELECT d.source,
               count(*) AS n_docs,
               count(e.doc_id) AS n_after_exact,
               count(p.doc_id) AS n_after_prefix,
               count(g.doc_id) AS n_after_quality
        FROM documents d
        LEFT JOIN e ON d.doc_id = e.doc_id
        LEFT JOIN p ON d.doc_id = p.doc_id
        LEFT JOIN g ON d.doc_id = g.doc_id
        GROUP BY d.source
    """


ORACLES["corpus_curation_report"] = _curation_oracle()

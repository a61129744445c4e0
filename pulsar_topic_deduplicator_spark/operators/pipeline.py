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

"""Classifier-based quality filtering — a multinomial Naive Bayes text
classifier TRAINED IN-QUERY on the corpus's own labels and applied to
every document, the "train a filter model, score the crawl" pipeline
stage (GPT-3's WebText-vs-crawl classifier, CCNet's fastText filter,
LLaMA's Wikipedia-reference classifier all have this shape).

NOT in the reference (no text ops there — SURVEY.md §2.3). The demo task
is language classification: positive class = ``lang = 'en'`` (the corpus
ships the label), evidence = word occurrences. Swapping the label column
for any other deterministic predicate re-targets the same plan at
quality, domain, or toxicity filtering — the label is one boolean
expression.

**Exactness discipline (the `lm_bigram_nll` nano-nat shape, taken one
step further).** Each per-word class log-likelihood
``ln((c_cls(w)+1) / (n_cls+V))`` (Laplace smoothing) is rounded ONCE to
integer nano-nats; the word's logit weight is the exact BIGINT
difference of the two rounded terms; the document score is the exact
BIGINT sum of its words' weights plus the (identically rounded) class
prior. Unlike `lm_bigram_nll` there is NO float in the output at all:
the score column IS the nano-nat integer, so the only cross-engine
surface is ln() itself — absorbed by the nano-nat rounding, same
acceptance as the bigram LM.

**Scale shape.** Training = ONE aggregate over the exploded token
stream (both class counts in the same pass via conditional sums —
map-side combined) + three scalars (class totals, vocabulary size);
the resulting vocabulary-sized weight table IS the trained model — at
100 TB it is materialized once and reused across scoring runs, exactly
like the bigram LM's count tables. Scoring = one token⋈weights join
keyed by word (stopword skew is real — AQE skew-join splits it, the
`lm_bigram_nll` precedent) + one per-doc aggregate. No per-row Python
anywhere; the whole plan is codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachereg import persist_scoped
from ..sources.io import load_table
from .textops import _WORDS, _words

#: the positive-class label: the demo trains an is-English classifier.
NB_POS_LANG = "en"


def _nanonat_ln(num, den):
    """round(ln(num/den) * 1e9) as BIGINT — num/den exact integers, the
    single rounding per term (associative BIGINT sums after this)."""
    return F.round(
        F.ln(num.cast("double") / den.cast("double")) * 1e9, 0
    ).cast("long")


def nb_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(doc_id, n_words, logit_nanonats, is_pos_pred)`` — every document
    scored by the corpus-trained NB model: logit > 0 predicts the
    positive class. Documents with no tokens (NULL text) carry no word
    evidence and are absent, like the oracle's unnest."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    tok = persist_scoped(
        docs.select(
            "doc_id",
            # NULL lang is NOT the positive class, in both engines (a bare
            # equality would three-value NULL through the class sums)
            F.coalesce(F.col("lang") == NB_POS_LANG, F.lit(False)).alias(
                "pos"
            ),
            F.explode(_words(F.col("text"))).alias("w"),
        )
    )
    # training pass: both class counts per word in ONE aggregate
    pos_int = F.col("pos").cast("long")
    counts = tok.groupBy("w").agg(
        F.sum(pos_int).alias("c_pos"),
        F.sum(1 - pos_int).alias("c_neg"),
    )
    # model scalars: class token totals, vocabulary, doc-level priors
    n_pos, n_neg = (
        tok.agg(F.sum(pos_int), F.sum(1 - pos_int)).collect()[0]
    )
    v = counts.count()  # vocabulary size (counts has one row per word)
    is_pos = F.coalesce(F.col("lang") == NB_POS_LANG, F.lit(False))
    d_pos, d_neg = (
        docs.agg(
            F.sum(is_pos.cast("long")),
            F.sum((~is_pos).cast("long")),
        ).collect()[0]
    )
    prior = int(
        spark.range(1)
        .select(
            _nanonat_ln(F.lit(d_pos + 1), F.lit(d_pos + d_neg + 2))
            - _nanonat_ln(F.lit(d_neg + 1), F.lit(d_pos + d_neg + 2))
        )
        .collect()[0][0]
    )
    weights = counts.select(
        "w",
        (
            _nanonat_ln(F.col("c_pos") + 1, F.lit(n_pos + v))
            - _nanonat_ln(F.col("c_neg") + 1, F.lit(n_neg + v))
        ).alias("wt"),
    )
    return (
        tok.join(weights, "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"), F.sum("wt").alias("s"))
        .select(
            "doc_id",
            "n_words",
            (F.col("s") + F.lit(prior)).alias("logit_nanonats"),
            (F.col("s") + F.lit(prior) > 0).alias("is_pos_pred"),
        )
    )


#: shared DuckDB rendering of the NB scoring pipeline — reused by the
#: calibration oracle so both entries evolve together
_NB_SCORES_SQL = f"""
        WITH tok AS (
          SELECT doc_id, coalesce(lang = '{NB_POS_LANG}', FALSE) AS pos,
                 unnest({_WORDS}) AS w
          FROM documents WHERE text IS NOT NULL),
        counts AS (
          SELECT w,
                 sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_pos,
                 sum(CASE WHEN pos THEN 0 ELSE 1 END) AS c_neg
          FROM tok GROUP BY w),
        scal AS (
          SELECT (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) FROM tok)
                   AS n_pos,
                 (SELECT sum(CASE WHEN pos THEN 0 ELSE 1 END) FROM tok)
                   AS n_neg,
                 (SELECT count(*) FROM counts) AS v,
                 (SELECT count(*) FROM documents WHERE text IS NOT NULL
                   AND coalesce(lang = '{NB_POS_LANG}', FALSE)) AS d_pos,
                 (SELECT count(*) FROM documents WHERE text IS NOT NULL
                   AND NOT coalesce(lang = '{NB_POS_LANG}', FALSE))
                   AS d_neg),
        prior AS (
          SELECT CAST(round(ln(CAST(d_pos + 1 AS DOUBLE)
                               / CAST(d_pos + d_neg + 2 AS DOUBLE))
                            * 1000000000.0, 0) AS BIGINT)
               - CAST(round(ln(CAST(d_neg + 1 AS DOUBLE)
                               / CAST(d_pos + d_neg + 2 AS DOUBLE))
                            * 1000000000.0, 0) AS BIGINT) AS p
          FROM scal),
        weights AS (
          SELECT w,
                 CAST(round(ln(CAST(c_pos + 1 AS DOUBLE)
                               / CAST(n_pos + v AS DOUBLE))
                            * 1000000000.0, 0) AS BIGINT)
               - CAST(round(ln(CAST(c_neg + 1 AS DOUBLE)
                               / CAST(n_neg + v AS DOUBLE))
                            * 1000000000.0, 0) AS BIGINT) AS wt
          FROM counts, scal)
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(wt) + (SELECT p FROM prior) AS BIGINT)
                 AS logit_nanonats,
               (sum(wt) + (SELECT p FROM prior)) > 0 AS is_pos_pred
        FROM tok t JOIN weights USING (w)
        GROUP BY t.doc_id
    """

ORACLES: dict[str, str] = {"nb_classifier_scores": _NB_SCORES_SQL}


# --- calibration ---------------------------------------------------------------

#: calibration granularity: label rate per logit decile
CAL_BUCKETS = 10


def classifier_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability readout for the NB quality classifier: documents
    bucketed into ``CAL_BUCKETS`` deciles of the (integer nano-nat) logit,
    each decile reporting its size, its TRUE-label count and rate (ppb),
    and its logit range — the standard "does the score track the label"
    calibration table an ML-eval harness produces before anyone trusts a
    filter model's threshold (a well-ranked model shows the label rate
    rising monotonically with the decile; the threshold entry
    ``nb_classifier_scores.is_pos_pred`` only checks sign).

    Exactness: logits are already integer nano-nats and the label is a
    pure column predicate, so every output cell is integer arithmetic —
    ntile's bucket boundaries depend only on the deterministic
    (logit, doc_id) order, identical in both engines.

    Scale: the global ntile is ONE SinglePartition sort of scalar pairs
    (the ``shard_plan_tokens`` / ``ccnet_quality_buckets`` precedent —
    KB/row × corpus rows); at 100 TB the decile cuts come from a two-pass
    quantile instead and the bucketing becomes a broadcast range join.
    Everything after the bucket id is map-side-combined aggregation."""
    from pyspark.sql import Window

    scores = nb_classifier_scores(spark, sf_dir).select(
        "doc_id", "logit_nanonats"
    )
    lab = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("lang") == NB_POS_LANG, F.lit(False)).alias("pos"),
    )
    w = Window.orderBy("logit_nanonats", "doc_id")
    d = scores.join(lab, "doc_id").select(
        "pos",
        "logit_nanonats",
        F.ntile(CAL_BUCKETS).over(w).cast("long").alias("decile"),
    )
    return (
        d.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("pos"), 1)).alias("n_pos_label"),
            F.min("logit_nanonats").alias("logit_lo"),
            F.max("logit_nanonats").alias("logit_hi"),
        )
        .select(
            "decile",
            "n",
            "n_pos_label",
            F.expr("(n_pos_label * 1000000000) div n").alias("pos_rate_ppb"),
            "logit_lo",
            "logit_hi",
        )
    )


ORACLES["classifier_calibration_report"] = f"""
    WITH s AS ({_NB_SCORES_SQL}),
    lab AS (
      SELECT doc_id, coalesce(lang = '{NB_POS_LANG}', FALSE) AS pos
      FROM documents),
    d AS (
      SELECT lab.pos, s.logit_nanonats,
             CAST(ntile({CAL_BUCKETS})
                    OVER (ORDER BY s.logit_nanonats, s.doc_id) AS BIGINT)
               AS decile
      FROM s JOIN lab USING (doc_id))
    SELECT decile, count(*) AS n,
           count(CASE WHEN pos THEN 1 END) AS n_pos_label,
           (count(CASE WHEN pos THEN 1 END) * 1000000000) // count(*)
             AS pos_rate_ppb,
           min(logit_nanonats) AS logit_lo,
           max(logit_nanonats) AS logit_hi
    FROM d GROUP BY decile
"""


def classifier_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row EXACT ROC-AUC for the NB classifier — the Mann–Whitney
    identity with full tie handling: AUC = (#{pos>neg pairs} +
    ½·#{tied pairs}) / (n_pos·n_neg), carried doubled
    (``auc2 = Σ_g np_g·(2·nn_below + nn_g)`` over distinct-logit groups
    g ordered ascending) so every intermediate is an exact integer; the
    report emits ``auc_ppb = 1e9·auc2 div (2·n_pos·n_neg)``. Beside the
    decile table (``classifier_calibration_report``) this is the scalar
    ranking metric — threshold-free, unlike ``is_pos_pred``'s sign cut.

    Int64 bound: 1e9·auc2 ≤ 2e9·n_pos·n_neg must fit — safe to ~2M
    positives × 2M negatives; past that the same plan runs on DECIMAL.

    Scale: one (logit → np, nn) aggregate over the scored frame (the
    shuffled frame is the distinct-logit domain), one ordered prefix-sum
    window over that domain (the ``ks_drift_report`` /
    ``shard_plan_tokens`` SinglePartition shape — two-stage prefix sum
    at 100 TB), one scalar aggregate."""
    from pyspark.sql import Window

    scores = nb_classifier_scores(spark, sf_dir).select(
        "doc_id", "logit_nanonats"
    )
    lab = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("lang") == NB_POS_LANG, F.lit(False)).alias("pos"),
    )
    g = (
        scores.join(lab, "doc_id")
        .groupBy("logit_nanonats")
        .agg(
            F.count(F.when(F.col("pos"), 1)).alias("np"),
            F.count(F.when(~F.col("pos"), 1)).alias("nn"),
        )
    )
    w = Window.orderBy("logit_nanonats").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = g.select(
        "np",
        "nn",
        (F.sum("nn").over(w) - F.col("nn")).alias("nn_below"),
    )
    return stepped.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("nn_below") + F.col("nn"))).alias(
            "auc2"
        ),
    ).select(
        "n_pos",
        "n_neg",
        "auc2",
        F.expr("(1000000000 * auc2) div (2 * n_pos * n_neg)").alias(
            "auc_ppb"
        ),
    )


ORACLES["classifier_auc_report"] = f"""
    WITH s AS ({_NB_SCORES_SQL}),
    lab AS (
      SELECT doc_id, coalesce(lang = '{NB_POS_LANG}', FALSE) AS pos
      FROM documents),
    g AS (
      SELECT s.logit_nanonats,
             count(CASE WHEN lab.pos THEN 1 END) AS np,
             count(CASE WHEN NOT lab.pos THEN 1 END) AS nn
      FROM s JOIN lab USING (doc_id)
      GROUP BY s.logit_nanonats),
    stepped AS (
      SELECT np, nn,
             sum(nn) OVER (ORDER BY logit_nanonats
                           ROWS UNBOUNDED PRECEDING) - nn AS nn_below
      FROM g)
    SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           CAST(sum(nn) AS BIGINT) AS n_neg,
           CAST(sum(np * (2 * nn_below + nn)) AS BIGINT) AS auc2,
           CAST((1000000000 * sum(np * (2 * nn_below + nn)))
                  // (2 * sum(np) * sum(nn)) AS BIGINT) AS auc_ppb
    FROM stepped
"""


def classifier_pr_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row confusion matrix + threshold metrics for the NB
    classifier at its operating point (``is_pos_pred`` = logit > 0):
    exact BIGINT ``tp/fp/fn/tn`` and integer-ppb precision, recall, F1
    and accuracy (``f1 = 2·tp / (2·tp + fp + fn)`` — the harmonic mean
    without ever leaving integers). Beside the threshold-free AUC
    (``classifier_auc_report``) and the decile calibration table, this
    is the fixed-cutoff readout — the number a gating deployment of the
    classifier (quality filter keep/drop) actually operates at.

    Domain: scored documents only (NULL-text docs carry no evidence and
    are absent from the scores frame in both engines). Zero-denominator
    cells (no predicted / no actual positives) emit NULL ppb, mirrored
    by the oracle's CASE.

    Scale: reuses the scored frame (one classifier pass), one broadcast
    label join keyed on doc_id, ONE final scalar aggregate — nothing
    here adds a shuffle beyond the classifier's own."""
    scores = nb_classifier_scores(spark, sf_dir).select(
        "doc_id", "is_pos_pred"
    )
    lab = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce(F.col("lang") == NB_POS_LANG, F.lit(False)).alias("pos"),
    )
    j = scores.join(lab, "doc_id")
    cell = lambda p, a: F.count(  # noqa: E731
        F.when((F.col("is_pos_pred") == p) & (F.col("pos") == a), 1)
    )
    return j.agg(
        cell(True, True).alias("tp"),
        cell(True, False).alias("fp"),
        cell(False, True).alias("fn"),
        cell(False, False).alias("tn"),
    ).select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CASE WHEN tp + fp = 0 THEN NULL "
            "ELSE (1000000000 * tp) div (tp + fp) END"
        ).alias("precision_ppb"),
        F.expr(
            "CASE WHEN tp + fn = 0 THEN NULL "
            "ELSE (1000000000 * tp) div (tp + fn) END"
        ).alias("recall_ppb"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn = 0 THEN NULL "
            "ELSE (2000000000 * tp) div (2 * tp + fp + fn) END"
        ).alias("f1_ppb"),
        F.expr(
            "(1000000000 * (tp + tn)) div (tp + fp + fn + tn)"
        ).alias("accuracy_ppb"),
    )


ORACLES["classifier_pr_report"] = f"""
    WITH s AS ({_NB_SCORES_SQL}),
    lab AS (
      SELECT doc_id, coalesce(lang = '{NB_POS_LANG}', FALSE) AS pos
      FROM documents),
    cm AS (
      SELECT
        count(CASE WHEN s.is_pos_pred AND lab.pos THEN 1 END) AS tp,
        count(CASE WHEN s.is_pos_pred AND NOT lab.pos THEN 1 END) AS fp,
        count(CASE WHEN NOT s.is_pos_pred AND lab.pos THEN 1 END) AS fn,
        count(CASE WHEN NOT s.is_pos_pred AND NOT lab.pos THEN 1 END) AS tn
      FROM s JOIN lab USING (doc_id))
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE CAST((1000000000 * tp) // (tp + fp) AS BIGINT) END
             AS precision_ppb,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE CAST((1000000000 * tp) // (tp + fn) AS BIGINT) END
             AS recall_ppb,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE CAST((2000000000 * tp) // (2 * tp + fp + fn) AS BIGINT)
                END AS f1_ppb,
           CAST((1000000000 * (tp + tn)) // (tp + fp + fn + tn) AS BIGINT)
             AS accuracy_ppb
    FROM cm
"""

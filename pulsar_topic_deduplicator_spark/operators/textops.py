"""Text-analysis tier over the ``documents`` table.

NOT in the reference (its payload is opaque bytes — SURVEY.md §2.3); these
are the training-data-pipeline operators the project brief mandates:
quality scoring, language-ID heuristics, token counting, fingerprinting.

Everything is built-in Catalyst expressions (split/size/filter/
regexp/sha2) — zero Python in the row path, so at 100 TB each operator is a
single codegen'd projection over the parquet scan with full column pruning
(only ``text`` + keys are read).

Determinism notes for the DuckDB oracle: ratios are computed as a division
of exact integers (identical doubles on both engines); no locale-sensitive
functions are used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens
from ..sources.io import load_table

#: fixed English stopword sample used by the quality/langid heuristics —
#: chosen from the corpus vocabulary so the signal is non-degenerate.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

_WORD_RE = "[a-z]+"  # BPE-ish token: lowercase alpha runs (corpus is lowercase)
_NUM_RE = "[0-9]+"


def _words(text: Column) -> Column:
    return whitespace_tokens(text)


def _stop_count(words: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(words, lambda w: F.array_contains(stop, w)))


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document surface statistics: word count, char count, average word
    length, distinct-word ratio."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    # chars minus separators, over words — exact integer division -> double
    avg_word_len = (
        F.length("text") - (n_words - F.lit(1))
    ).cast("double") / n_words.cast("double")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_words.alias("n_words"),
        F.length("text").alias("n_chars_text"),
        avg_word_len.alias("avg_word_len"),
        (F.size(F.array_distinct(words)).cast("double") / n_words.cast("double")).alias(
            "distinct_ratio"
        ),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and regex word/number
    tokens (the BPE-ish pre-tokenizer split)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(_WORD_RE)).alias("n_word_tokens"),
        F.regexp_count("text", F.lit(_NUM_RE)).alias("n_num_tokens"),
    )


def quality_expr(text: Column) -> Column:
    """The heuristic quality score as a reusable scalar Column — the SAME
    arithmetic (and evaluation order) as the ``QUALITY_SQL`` oracle
    fragment, so any operator ranking/thresholding on it stays
    hash-comparable cross-engine."""
    words = _words(text)
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    stop_ratio = _stop_count(words).cast("double") / n.cast("double")
    len_band = F.when((n >= 20) & (n <= 400), F.lit(1.0)).otherwise(F.lit(0.5))
    diversity = nd.cast("double") / n.cast("double")
    return len_band * 0.4 + stop_ratio * 0.2 + diversity * 0.4


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality score in [0, 1]: length band + stopword
    ratio + lexical diversity (the Gopher-rules / C4-style shape, reduced to
    deterministic integer arithmetic)."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    stop_ratio = _stop_count(words).cast("double") / n.cast("double")
    score = quality_expr(F.col("text"))
    diversity = nd.cast("double") / n.cast("double")
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        diversity.alias("diversity"),
        score.alias("quality"),
    )


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character/stopword language-ID heuristic: ASCII-alpha ratio picks the
    script family, stopword ratio separates English-like text. The corpus
    labels are synthetic, so the operator also emits the labeled ``lang``
    for downstream comparison rather than asserting agreement."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    ascii_ratio = (
        F.length(F.regexp_replace("text", "[^a-z ]", "")).cast("double")
        / F.length("text").cast("double")
    )
    stop_ratio = _stop_count(words).cast("double") / F.size(words).cast("double")
    predicted = (
        F.when(ascii_ratio < 0.5, F.lit("non-latin"))
        .when(stop_ratio >= 0.05, F.lit("en"))
        .otherwise(F.lit("latin-other"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        ascii_ratio.alias("ascii_ratio"),
        stop_ratio.alias("stop_ratio"),
        predicted.alias("predicted_lang"),
    )


def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by labeled language × source (the pipeline
    "what's in my 100 TB" report)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per document: SHA2-256 of the exact text (exact
    dedup key) + a 60-bit integer fingerprint (bucketable form)."""
    from ..functions.hashing import stable_uint60

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("fp_sha"),
        stable_uint60(F.col("text")).alias("fp_int"),
    )


#: winnowing fingerprint parameters (Schleimer/Wilkerson/Aiken): character
#: k-grams of K_GRAM chars, guarantee window of WINNOW_WINDOW grams
K_GRAM = 8
WINNOW_WINDOW = 16


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing: hash every
    ``K_GRAM``-char gram, then keep the minimum hash of each
    ``WINNOW_WINDOW``-gram sliding window — any shared substring of
    ``K_GRAM + WINNOW_WINDOW - 1`` chars between two documents is guaranteed
    to surface as a shared fingerprint (the plagiarism-detection /
    partial-overlap dedup primitive, complementing shingle MinHash which
    fingerprints whole-document similarity).

    The whole construction is a per-document map — ZERO shuffle, no
    explode of intermediate grams; only the final (doc_id, fp) rows leave
    the scan stage, ~n_chars / (WINNOW_WINDOW/2) of them in expectation.
    Documents shorter than one full window contribute their single
    global-min fingerprint. Explicit sha2-based gram hashes make it
    oracle-checkable (same rule as MinHash).

    The kernel is an Arrow ``mapInPandas`` (hashlib sha256 per gram +
    numpy sliding-window min), NOT the original transform/slice/array_min
    HOF expression tree: higher-order-function lambdas evaluate
    interpreted per element (no WholeStageCodegen), and the measured cost
    was ~59 µs per gram·core — ~100x the hash itself (sf0.1 breakdown:
    gram hashes 2.74 s, +sliding min 4.03 s, full 4.42 s; the Arrow
    kernel runs the identical arithmetic in C-backed libs). Values are
    bit-identical: ``conv(substring(sha2(g),1,15),16,10)`` ==
    first-8-digest-bytes-big-endian >> 4 (60 bits, always positive), and
    Python/Spark/DuckDB all slice strings by code points (guide §4: the
    Python boundary is WORTH paying when the JVM alternative is
    interpreted expression eval).

    Round 15: the scan is SPREAD to session parallelism when it is
    narrower than the core count (``spread_narrow_scan``) — the corpus
    file is one input split at bench scale, so the whole kernel ran on
    one core; at real corpus scale the scan already has ≥ core
    partitions and the shape stays exchange-free
    (tests/test_plans.py::test_winnow_zero_shuffle pins ≤ 1 exchange and
    that any exchange is the pre-kernel spread, not a data shuffle)."""
    import pandas as pd

    from ..sources.io import spread_narrow_scan

    docs = load_table(spark, sf_dir, "documents")
    k, w = K_GRAM, WINNOW_WINDOW

    def kernel(batches):
        import hashlib

        import numpy as np

        sha = hashlib.sha256
        win = np.lib.stride_tricks.sliding_window_view
        for pdf in batches:
            ids: list = []
            fps: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None or len(text) < k:
                    continue
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            sha(text[i : i + k].encode("utf-8")).digest()[:8],
                            "big",
                        )
                        >> 4
                        for i in range(len(text) - k + 1)
                    ),
                    dtype=np.int64,
                )
                mins = (
                    win(hs, w).min(axis=1)
                    if hs.size >= w
                    else hs.min(keepdims=True)
                )
                uniq = np.unique(mins)
                ids.extend([doc_id] * uniq.size)
                fps.append(uniq)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "fp": (
                        np.concatenate(fps)
                        if fps
                        else np.empty(0, dtype=np.int64)
                    ),
                }
            )

    return spread_narrow_scan(docs.select("doc_id", "text"), "doc_id").mapInPandas(
        kernel, schema="doc_id bigint, fp bigint"
    )


#: minimum shared winnow fingerprints to call two docs overlapping
OVERLAP_MIN_FPS = 2
#: fingerprints occurring in more documents than this are dropped before
#: the self-join — hot common-phrase grams would otherwise make the join
#: quadratic in their document frequency (the stop-shingle hazard)
FP_DF_CAP = 10


def substring_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap candidate pairs via shared winnow fingerprints — the
    use winnowing exists for: two documents sharing ≥ ``OVERLAP_MIN_FPS``
    RARE fingerprints very likely share substrings of ≥ K+W-1 chars (quoted
    passages, boilerplate headers), which whole-document MinHash misses when
    the rest of the text differs. Same candidates-then-verify economics as
    LSH: the self-join runs on 8-byte fingerprints (never text), and hot
    fingerprints (document frequency > ``FP_DF_CAP``) are dropped first —
    common-phrase grams would otherwise blow the join up quadratically in
    their df. The df filter and the self-join share the one shuffle on
    ``fp``."""
    fps = winnow_fingerprints(spark, sf_dir)
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= FP_DF_CAP)
        .select("fp")
    )
    fps = fps.join(rare, "fp", "left_semi")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= OVERLAP_MIN_FPS)
    )


def dedup_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact document dedup: keep the lowest doc_id per distinct text —
    the reference's keep-first semantics applied to a document corpus
    (``README.md:3-5``), implemented as a hash aggregation on the
    fingerprint (one shuffle, no window needed: min() is the tiebreak)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.sha2(F.col("text"), 256).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


#: prefix-dedup granularity: documents sharing their first PREFIX_WORDS
#: words are treated as boilerplate copies of one another
PREFIX_WORDS = 16


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher-rules repetition
    family, word-granular for this corpus): duplicate-word fraction,
    most-frequent-word fraction, most-frequent-bigram fraction.

    Shape at 100 TB: explode → per-(doc, gram) partial-agg count → per-doc
    max — two map-side-combined aggregations keyed by doc_id, NOT a per-doc
    quadratic higher-order-function scan; the explode multiplies rows ~60×
    but combines collapse to per-doc gram vocabularies before the shuffle.
    All ratios are exact-integer divisions (identical doubles on both
    engines)."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    base = docs.select("doc_id", words.alias("ws")).select(
        "doc_id",
        "ws",
        F.size("ws").alias("n_words"),
        # both sides sliced to n-1: zip_with PADS the shorter array with
        # nulls, which would fabricate a trailing unigram "bigram"
        F.zip_with(
            F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
            F.slice("ws", 2, F.greatest(F.size("ws") - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ).alias("bgs"),
    )
    top_word = (
        base.select("doc_id", "n_words", F.explode("ws").alias("g"))
        .groupBy("doc_id", "n_words", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_words")
        .agg(F.max("c").alias("top_word_c"), F.count(F.lit(1)).alias("n_distinct"))
    )
    top_bigram = (
        base.select("doc_id", F.explode("bgs").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_c"), F.sum("c").alias("n_bigrams"))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        top_word.join(top_bigram, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            ((dbl("n_words") - dbl("n_distinct")) / dbl("n_words")).alias(
                "dup_word_fraction"
            ),
            (dbl("top_word_c") / dbl("n_words")).alias("top_word_fraction"),
            F.coalesce(
                dbl("top_bigram_c") / dbl("n_bigrams"), F.lit(0.0)
            ).alias("top_bigram_fraction"),
        )
    )


def gopher_rules(text: Column) -> dict[str, Column]:
    """The named Gopher-style gates as reusable Column expressions over a
    text column (thresholds adapted to this corpus's word-soup text)."""
    words = _words(text)
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    # total word chars = text length minus the single separators (exact)
    mean_wl = (F.length(text) - (n - F.lit(1))).cast("double") / n.cast("double")
    short_frac = (
        F.size(F.filter(words, lambda w: F.length(w) <= 2)).cast("double")
        / n.cast("double")
    )
    return {
        "word_count_ok": (n >= 20) & (n <= 100_000),
        "mean_word_len_ok": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "stopword_ok": _stop_count(words) >= 2,
        "diversity_ok": nd.cast("double") / n.cast("double") >= 0.2,
        "short_word_ok": short_frac <= 0.25,
    }


def gopher_pass(text: Column) -> Column:
    """AND of every named rule — the pipeline's quality gate."""
    import functools
    import operator

    return functools.reduce(operator.and_, gopher_rules(text).values())


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality gate with NAMED per-rule verdicts (the published
    Gopher filter shape): word-count band, mean-word-length band, minimum
    stopword hits, lexical diversity floor, short-word-fraction ceiling,
    and the AND of all rules. One codegen'd projection over the scan —
    zero shuffle, and a pipeline drops low-quality docs with
    ``filter(gopher_pass(text))`` that pushes straight down to the scan."""
    docs = load_table(spark, sf_dir, "documents")
    rules = gopher_rules(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("n_words"),
        *[c.alias(name) for name, c in rules.items()],
        gopher_pass(F.col("text")).alias("passes_gopher"),
    )


def dedup_docs_by_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/prefix dedup: documents sharing their first
    ``PREFIX_WORDS`` words collapse to the lowest doc_id — the
    template-page pattern (near-identical headers with differing tails)
    that exact dedup misses and MinHash may keep. Same single-shuffle
    min-aggregation plan as ``dedup_docs_exact``, keyed on the prefix
    hash."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.array_join(
        F.slice(_words(F.col("text")), 1, PREFIX_WORDS), " "
    )
    return (
        docs.select(F.sha2(prefix, 256).alias("prefix_key"), "doc_id")
        .groupBy("prefix_key")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_docs_sharing"),
        )
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)
_WORDS = "string_split(text, ' ')"
_NW = f"len({_WORDS})"
_STOPN = f"len(list_filter({_WORDS}, w -> w IN ({_STOP_SQL})))"

#: DuckDB twin of ``quality_expr`` — same operand order as the Column
QUALITY_SQL = (
    f"((CASE WHEN {_NW} BETWEEN 20 AND 400 THEN 1.0 ELSE 0.5 END) * 0.4"
    f" + (CAST({_STOPN} AS DOUBLE) / {_NW}) * 0.2"
    f" + (CAST(len(list_distinct({_WORDS})) AS DOUBLE) / {_NW}) * 0.4)"
)

def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide term frequency top-50: explode → partial-agg count →
    TakeOrdered. The explode multiplies rows ~20× but the map-side combine
    collapses to vocabulary size before the single shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_words(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(50)
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-free TF-IDF: weight = tf × N / df — the classic score with the
    monotone ln() dropped so the result is a division of exact integers
    (bit-identical on both engines; ln is libm-dependent). N is carried as
    a broadcast one-row aggregate, not a driver-side collect, so the whole
    computation is one plan: explode → (doc,term) counts → term df join →
    weight."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode(_words(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    return (
        # NOT an explicit broadcast: vocabulary size is corpus-dependent
        # (unbounded at 100 TB) — AQE broadcasts it when it measures small
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df_docs",
            (
                (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df_docs")
            ).alias("weight"),
        )
    )


_WINNOW_CTE = f"""
        h AS (
          SELECT doc_id,
                 CASE WHEN length(text) >= {K_GRAM} THEN
                   list_transform(range(1, length(text) - {K_GRAM} + 2),
                     i -> CAST('0x' || substr(sha256(substr(text, i, {K_GRAM})), 1, 15)
                               AS BIGINT))
                 ELSE CAST([] AS BIGINT[]) END AS hs
          FROM documents),
        w AS (
          SELECT doc_id,
                 CASE WHEN len(hs) >= {WINNOW_WINDOW} THEN
                        list_transform(range(1, len(hs) - {WINNOW_WINDOW} + 2),
                          j -> list_min(list_slice(hs, j, j + {WINNOW_WINDOW - 1})))
                      WHEN len(hs) >= 1 THEN [list_min(hs)]
                      ELSE CAST([] AS BIGINT[]) END AS fps
          FROM h)"""

ORACLES: dict[str, str] = {
    "doc_repetition_stats": f"""
        WITH d AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
        w AS (SELECT doc_id, unnest(ws) AS g FROM d),
        nw AS (SELECT doc_id, count(*) AS n_words FROM w GROUP BY doc_id),
        wc AS (SELECT doc_id, g, count(*) AS c FROM w GROUP BY doc_id, g),
        tw AS (SELECT doc_id, max(c) AS top_word_c, count(*) AS n_distinct
               FROM wc GROUP BY doc_id),
        bg AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(ws)),
                                            i -> ws[i] || ' ' || ws[i + 1])) AS g
               FROM d),
        bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        tb AS (SELECT doc_id, max(c) AS top_bigram_c, sum(c) AS n_bigrams
               FROM bc GROUP BY doc_id)
        SELECT nw.doc_id, CAST(nw.n_words AS INTEGER) AS n_words,
               CAST(nw.n_words - tw.n_distinct AS DOUBLE) / nw.n_words
                 AS dup_word_fraction,
               CAST(tw.top_word_c AS DOUBLE) / nw.n_words AS top_word_fraction,
               coalesce(CAST(tb.top_bigram_c AS DOUBLE) / CAST(tb.n_bigrams AS DOUBLE),
                        CAST(0.0 AS DOUBLE)) AS top_bigram_fraction
        FROM nw JOIN tw USING (doc_id) LEFT JOIN tb USING (doc_id)
    """,
    "gopher_quality_flags": None,  # assigned below from the shared fragments
    "dedup_docs_by_prefix": f"""
        SELECT sha256(array_to_string(list_slice({_WORDS}, 1, {PREFIX_WORDS}), ' '))
                 AS prefix_key,
               min(doc_id) AS kept_doc_id,
               count(*) AS n_docs_sharing
        FROM documents
        GROUP BY 1
    """,
    "top_terms": """
        SELECT term, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY term
        ORDER BY n DESC, term LIMIT 50
    """,
    "tfidf_top_terms": """
        WITH tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents)
          GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, tf.term, tf, df_docs,
               CAST(tf * n_docs AS DOUBLE) / df_docs AS weight
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    """,
    "text_stats": f"""
        SELECT doc_id, lang, source,
               {_NW} AS n_words,
               length(text) AS n_chars_text,
               CAST(length(text) - ({_NW} - 1) AS DOUBLE) / {_NW} AS avg_word_len,
               CAST(len(list_distinct({_WORDS})) AS DOUBLE) / {_NW} AS distinct_ratio
        FROM documents
    """,
    "token_count": f"""
        SELECT doc_id,
               {_NW} AS n_ws_tokens,
               len(regexp_extract_all(text, '{_WORD_RE}')) AS n_word_tokens,
               len(regexp_extract_all(text, '{_NUM_RE}')) AS n_num_tokens
        FROM documents
    """,
    "quality_score": f"""
        SELECT doc_id,
               {_NW} AS n_words,
               CAST({_STOPN} AS DOUBLE) / {_NW} AS stop_ratio,
               CAST(len(list_distinct({_WORDS})) AS DOUBLE) / {_NW} AS diversity,
               {QUALITY_SQL} AS quality
        FROM documents
    """,
    "lang_id_heuristic": f"""
        SELECT doc_id,
               lang AS labeled_lang,
               CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                 / length(text) AS ascii_ratio,
               CAST({_STOPN} AS DOUBLE) / {_NW} AS stop_ratio,
               CASE
                 WHEN CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
                      / length(text) < 0.5 THEN 'non-latin'
                 WHEN CAST({_STOPN} AS DOUBLE) / {_NW} >= 0.05 THEN 'en'
                 ELSE 'latin-other'
               END AS predicted_lang
        FROM documents
    """,
    "lang_distribution": """
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
        GROUP BY lang, source
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               sha256(text) AS fp_sha,
               CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT) AS fp_int
        FROM documents
    """,
    "dedup_docs_exact": """
        SELECT sha256(text) AS fp,
               min(doc_id) AS kept_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "winnow_fingerprints": f"""
        WITH {_WINNOW_CTE}
        SELECT DISTINCT doc_id, fp
        FROM (SELECT doc_id, unnest(fps) AS fp FROM w)
    """,
    "substring_overlap_pairs": f"""
        WITH {_WINNOW_CTE},
        f0 AS (SELECT DISTINCT doc_id, fp
               FROM (SELECT doc_id, unnest(fps) AS fp FROM w)),
        rare AS (SELECT fp FROM f0 GROUP BY fp
                 HAVING count(*) <= {FP_DF_CAP}),
        f AS (SELECT doc_id, f0.fp FROM f0 JOIN rare ON f0.fp = rare.fp)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS shared_fps
        FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {OVERLAP_MIN_FPS}
    """,
}


# ─── shared Gopher SQL fragments (reused by pipeline.corpus_curation_report) ─

def gopher_stats_sql(src: str = "documents", extra_cols: str = "") -> str:
    """Per-doc stats subquery feeding the rule expressions; ``src`` is any
    table/subquery with (doc_id, text) columns."""
    return f"""SELECT doc_id, {extra_cols}
                 {_NW} AS n,
                 len(list_distinct({_WORDS})) AS nd,
                 CAST(length(text) - ({_NW} - 1) AS DOUBLE) / {_NW} AS mwl,
                 CAST(len(list_filter({_WORDS}, w -> length(w) <= 2)) AS DOUBLE)
                   / {_NW} AS shortf,
                 {_STOPN} AS stopn
          FROM {src}"""


#: rule expressions over a gopher_stats_sql row — mirror textops.gopher_rules
GOPHER_RULES_SQL: dict[str, str] = {
    "word_count_ok": "(n >= 20 AND n <= 100000)",
    "mean_word_len_ok": "(mwl >= 3.0 AND mwl <= 10.0)",
    "stopword_ok": "(stopn >= 2)",
    "diversity_ok": "(CAST(nd AS DOUBLE) / n >= 0.2)",
    "short_word_ok": "(shortf <= 0.25)",
}

GOPHER_PASS_SQL = " AND ".join(GOPHER_RULES_SQL.values())

#: prefix-dedup key, SQL rendering (mirrors dedup_docs_by_prefix)
PREFIX_KEY_SQL = (
    f"sha256(array_to_string(list_slice({_WORDS}, 1, {PREFIX_WORDS}), ' '))"
)

ORACLES["gopher_quality_flags"] = f"""
    WITH f AS ({gopher_stats_sql()})
    SELECT doc_id, CAST(n AS INTEGER) AS n_words,
           {", ".join(f"{sql} AS {name}" for name, sql in GOPHER_RULES_SQL.items())},
           ({GOPHER_PASS_SQL}) AS passes_gopher
    FROM f
"""


#: BM25 parameters (the Robertson defaults) and the fixed query term set
#: for the named ranking entry (terms chosen from the corpus vocabulary)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("table", "spark", "data")
BM25_TOP_K = 50


def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical ranking of the corpus against a fixed term query — the
    standard retrieval scorer, expressed as ONE scan (per-term tf + doc
    length as codegen'd array expressions) + a single-row corpus-stats
    aggregate broadcast back + a TakeOrdered top-k. No shuffle touches the
    corpus beyond the top-k; at 100 TB the stats row is the only global
    state and the score is a per-row projection.

    Determinism (hardened, ADVICE r5 item 3 / VERDICT r6 item 6): tf/df/
    len/avglen derive from exact integers, and the ONLY libm call — the
    idf's ``ln`` — is pinned to integer nano-nats (round(ln·1e9) as BIGINT,
    the lm_bigram_nll pattern) before re-entering the score arithmetic.
    Everything downstream is libm-free IEEE arithmetic in the same
    operation order on both engines, so the 6-dp boundary rounding operates
    on bit-identical doubles and the top-k cut cannot flip between engines
    (the one residual risk is the nano-nat rounding of ln itself — ~1e-7
    per distinct df value instead of per-document per-boundary). Rank
    order ties on (rounded score DESC, doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    def _eq(term: str):
        # closure factory, NOT a default-arg lambda: a 2-arg lambda would
        # be interpreted by F.filter as (element, index)
        return lambda w: w == F.lit(term)

    tf_cols = [
        F.size(F.filter(words, _eq(t))).alias(f"tf_{i}")
        for i, t in enumerate(BM25_QUERY)
    ]
    base = docs.select(
        "doc_id", F.size(words).alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
            for i in range(len(BM25_QUERY))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = 1 - BM25_B + BM25_B * (F.col("dl").cast("double") / avgdl)
    score = F.lit(0.0)
    for i in range(len(BM25_QUERY)):
        tf = F.col(f"tf_{i}").cast("double")
        # Lucene-style non-negative IDF: raw Robertson IDF goes NEGATIVE
        # for terms in more than half the corpus (likely with a small
        # vocabulary), which would rank matching docs below term-free ones.
        # Pinned to integer nano-nats so the libm ln never reaches the
        # float score path (see the determinism note above).
        idf_nano = F.round(
            F.log(
                1
                + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
                / (F.col(f"df_{i}") + 0.5)
            )
            * F.lit(1e9),
            0,
        ).cast("long")
        idf = idf_nano.cast("double") / F.lit(1e9)
        score = score + idf * (tf * (BM25_K1 + 1)) / (tf + BM25_K1 * norm)
    # only documents matching ≥1 query term participate: zero-score docs
    # padding the top-k by doc_id is meaningless retrieval output, and the
    # filter shrinks the TakeOrdered input to the match set
    any_hit = F.greatest(
        *[F.col(f"tf_{i}") for i in range(len(BM25_QUERY))]
    ) > 0
    ranked = j.filter(any_hit).select(
        "doc_id", F.round(score, 6).alias("bm25")
    )
    return ranked.orderBy(F.col("bm25").desc(), "doc_id").limit(BM25_TOP_K)


def _bm25_oracle() -> str:
    tf = [
        f"len(list_filter({_WORDS}, w -> w = '{t}'))" for t in BM25_QUERY
    ]
    terms = []
    for i in range(len(BM25_QUERY)):
        # idf pinned to integer nano-nats, mirroring the Column expression:
        # BIGINT / 1e9 promotes exactly (< 2^53), so downstream arithmetic
        # is bit-identical across engines
        idf = (
            f"(CAST(round(ln(1 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
            f" * 1000000000.0, 0) AS BIGINT) / 1000000000.0)"
        )
        terms.append(
            f"{idf} * (CAST(tf_{i} AS DOUBLE) * {BM25_K1 + 1})"
            f" / (CAST(tf_{i} AS DOUBLE) + {BM25_K1} * norm)"
        )
    score = " + ".join(f"({t})" for t in terms)
    df_cols = ", ".join(
        f"count(CASE WHEN tf_{i} > 0 THEN 1 END) AS df_{i}"
        for i in range(len(BM25_QUERY))
    )
    tf_cols = ", ".join(f"{e} AS tf_{i}" for i, e in enumerate(tf))
    return f"""
        WITH base AS (
          SELECT doc_id, {_NW} AS dl, {tf_cols}
          FROM documents),
        stats AS (
          SELECT count(*) AS n_docs, sum(dl) AS sum_dl, {df_cols}
          FROM base),
        scored AS (
          SELECT doc_id,
                 round(0.0 + {score}, 6) AS bm25
          FROM base, stats,
               LATERAL (SELECT 1 - {BM25_B} + {BM25_B} *
                        (CAST(dl AS DOUBLE)
                         / (CAST(sum_dl AS DOUBLE)
                            / CAST(n_docs AS DOUBLE))) AS norm) n
          WHERE greatest({", ".join(f"tf_{i}" for i in range(len(BM25_QUERY)))}) > 0)
        SELECT doc_id, bm25 FROM scored
        ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP_K}
    """


ORACLES["bm25_rank"] = _bm25_oracle()


#: RAG/training chunking geometry, shared between the Column expression and
#: the oracle SQL (the HIST_WIDTH pattern — change one constant, the checked
#: contract follows)
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with stride/overlap — the standard
    RAG-retrieval / training-window prep step (CHUNK_SIZE-token windows
    every CHUNK_STRIDE tokens, so consecutive chunks share
    CHUNK_SIZE − CHUNK_STRIDE tokens of context; the final chunk is the
    natural remainder). One row per (doc, chunk) with its token span and
    re-joined text.

    Scale: zero-shuffle scan → sequence/posexplode → slice projection —
    chunking 100 TB is embarrassingly parallel and this plan keeps it that
    way (no aggregation, no join, full codegen; row growth is the
    unavoidable ~n_tokens/stride factor). Deterministic splitter (single
    space, the corpus's token convention) ⇒ exact cross-engine oracle.

    NULL guard: a NULL ``text`` makes ``size(toks)`` return −1 and
    ``sequence(0, −2, stride)`` THROW at runtime, where the oracle's
    ``generate_series`` just emits no rows — the explicit non-null filter
    (pushed to the scan) makes both engines emit zero rows per NULL doc."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("toks")) - 1, F.lit(0)),
        F.lit(CHUNK_STRIDE),
    )
    chunk = F.slice(F.col("toks"), F.col("start_tok") + 1, CHUNK_SIZE)
    return (
        docs.select("doc_id", _words(F.col("text")).alias("toks"))
        .select(
            "doc_id", "toks", F.explode(starts).alias("start_tok")
        )
        .select(
            "doc_id",
            (F.col("start_tok") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


ORACLES["chunk_documents"] = f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS toks FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS start_tok
      FROM w)
    SELECT doc_id,
           CAST(start_tok // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(len(list_slice(toks, start_tok + 1, start_tok + {CHUNK_SIZE})) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, start_tok + 1, start_tok + {CHUNK_SIZE}), ' ') AS chunk_text
    FROM s
"""


#: paragraph-dedup geometry: the corpus is single-space word soup with no
#: newline structure, so "paragraphs" are consecutive non-overlapping
#: PARA_WORDS-word spans — the deterministic analog of C4's line split (a
#: real-text deployment swaps the segmenter for split on '\n\n'; everything
#: downstream is segmenter-agnostic).
PARA_WORDS = 32
#: packed keep-first key = doc_id * _PARA_PACK + para_idx. Bound: valid
#: while every document has < _PARA_PACK paragraphs (32 M words/doc at
#: PARA_WORDS=32) AND doc_id < 2^63/_PARA_PACK ≈ 9.2e12 — both far above
#: any web corpus; the packing keeps the first-occurrence argmin a single
#: BIGINT min (exact, cross-engine) instead of a struct comparison.
_PARA_PACK = 1_000_000


def span_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, para_idx, para) span explode over ANY docs-schema frame —
    batch or stream (pure column expressions, no source coupling): the
    PARA_WORDS geometry shared by the exact dedup tier here, the fuzzy
    tier in ``neardup``, the span shingle machinery, and the streaming
    span dedup (one geometry, one NULL guard, one place to swap the
    segmenter for real-text '\\n\\n' splitting).

    NULL guard: NULL ``text`` is filtered before the explode (both engines
    emit zero rows for it — the chunk_documents contract)."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("toks")) - 1, F.lit(0)),
        F.lit(PARA_WORDS),
    )
    para = F.array_join(
        F.slice(F.col("toks"), F.col("start_tok") + 1, PARA_WORDS), " "
    )
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", _words(F.col("text")).alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("start_tok"))
        .select(
            "doc_id",
            (F.col("start_tok") / PARA_WORDS).cast("long").alias("para_idx"),
            para.alias("para"),
        )
    )


def para_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch loader form of ``span_frame`` over the documents table."""
    return span_frame(load_table(spark, sf_dir, "documents"))


def reassemble_spans(spans_with_kept: DataFrame) -> DataFrame:
    """Shared doc-reassembly aggregate over a (doc_id, para_idx, para,
    kept) frame: (doc_id, n_paras, n_paras_kept, cleaned_text) with the
    surviving spans rejoined in order — ONE doc-keyed shuffle, groups are
    document-sized."""
    return spans_with_kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.col("kept").cast("long")).alias("n_paras_kept"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("kept"),
                            F.struct(F.col("para_idx"), F.col("para")),
                        )
                    )
                ),
                lambda x: x["para"],
            ),
            " ",
        ).alias("cleaned_text"),
    )


def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph-level dedup, C4/RefinedWeb-style: every
    duplicated paragraph keeps only its FIRST corpus occurrence (first =
    lowest (doc_id, para_idx)); each document is reassembled from its
    surviving spans in order. This is the span granularity between
    document-level dedup (``dedup_docs_exact``) and boilerplate prefix
    dedup (``dedup_docs_by_prefix``): repeated boilerplate inside otherwise
    unique pages is removed without dropping the page.

    Plan: zero-shuffle scan → span explode (``para_spans``) → sha2
    paragraph hash → ONE hash-keyed shuffle (window min over the packed
    first-occurrence key) → ONE doc-keyed reassembly aggregate
    (``reassemble_spans``). No join, no global sort; at 100 TB the hash
    partitioning is crypto-uniform (no skew)."""
    from pyspark.sql import Window

    spans = (
        para_spans(spark, sf_dir)
        .withColumn("ph", F.sha2(F.col("para"), 256))
        .withColumn(
            "pk", F.col("doc_id") * F.lit(_PARA_PACK) + F.col("para_idx")
        )
    )
    kept = F.col("pk") == F.min("pk").over(Window.partitionBy("ph"))
    return reassemble_spans(spans.withColumn("kept", kept))


#: shared span-geometry CTE fragment (the SQL twin of ``para_spans``) —
#: composed into the exact-dedup, fuzzy-removal, and span-shingle oracles
#: so the geometry lives in ONE place on each engine
PARA_SPANS_SQL = f"""
    __pw AS (SELECT doc_id, {_WORDS} AS toks FROM documents
             WHERE text IS NOT NULL),
    para_spans AS (
      SELECT doc_id,
             CAST(start_tok // {PARA_WORDS} AS BIGINT) AS para_idx,
             array_to_string(
               list_slice(toks, start_tok + 1, start_tok + {PARA_WORDS}), ' ')
               AS para
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 1, {PARA_WORDS}))
                     AS start_tok
            FROM __pw))"""


def span_reassembly_select(kept_cte: str) -> str:
    """SQL twin of ``reassemble_spans``: the final doc-reassembly SELECT
    over a CTE exposing (doc_id, para_idx, para, kept)."""
    return f"""
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_paras,
               CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT)
                 AS n_paras_kept,
               coalesce(
                 array_to_string(
                   list(para ORDER BY para_idx) FILTER (WHERE kept), ' '),
                 '') AS cleaned_text
        FROM {kept_cte} GROUP BY doc_id"""


ORACLES["dedup_paragraphs"] = f"""
    WITH {PARA_SPANS_SQL},
    k AS (
      SELECT doc_id, para_idx, para,
             doc_id * {_PARA_PACK} + para_idx
               = min(doc_id * {_PARA_PACK} + para_idx)
                   OVER (PARTITION BY sha256(para)) AS kept
      FROM para_spans)
    {span_reassembly_select('k')}
"""


#: bigram-count floor, part of the MODEL DEFINITION (mirrored exactly in
#: the oracle): grams seen fewer than LM_MIN_COUNT times are dropped from
#: the count table and score as unseen (count 0 under Laplace smoothing).
#: This bounds the materialized LM: |c12 table| ≤ total_bigrams /
#: LM_MIN_COUNT rows — the worst-case O(V²) gram blow-up VERDICT r6 item 7
#: flags cannot happen, because every surviving row is backed by ≥ floor
#: observed occurrences. Floor 1 = keep everything (the classic model).
LM_MIN_COUNT = 2


def lm_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical quality filter, CCNet-style: score every document by its
    average negative log-likelihood under a bigram language model trained
    on the corpus itself (Laplace smoothing: P(w2|w1) = (c(w1 w2)+1) /
    (c(w1·)+V), V = bigram-start vocabulary), with counts below
    ``LM_MIN_COUNT`` pruned from the model (scored as unseen). High-NLL
    documents are improbable under the corpus distribution — the
    perplexity-filter member of the quality family (gopher gates = rules,
    quality_score = heuristics, this = statistics).

    Cross-engine exactness: each bigram's ln-term is rounded to integer
    nano-nats and the per-doc sum runs in exact BIGINT (associative — no
    float-summation order dependence); only the ln() itself can drift by
    a last ulp between libms, absorbed by the nano-nat rounding and the
    6-dp boundary on the final average (the BM25 acceptance). The
    min-count floor is exact arithmetic on exact integers — part of the
    model, mirrored in the oracle.

    Scale: two count aggregates (map-side combined), a join of the bigram
    rows against them keyed by gram/w1 (stopword-pair skew is real — AQE
    skew-join splits it), one per-doc aggregate. V is the single driver
    scalar. At 100 TB the two count tables are the trained LM —
    materialize once, reuse across scoring runs; with the floor the gram
    table is ≤ total_bigrams/LM_MIN_COUNT rows (see the constant's note),
    and the unigram table is vocabulary-sized.

    NULL guard: NULL ``text`` would drive ``slice`` to a negative length
    (runtime throw); the non-null filter + clamp make NULL/one-word docs
    contribute zero bigrams, exactly like the oracle's generate_series."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    words = _words(F.col("text"))
    cnt = F.greatest(F.size(words) - 1, F.lit(0))
    zipped = F.arrays_zip(
        F.slice(words, 1, cnt).alias("a"), F.slice(words, 2, cnt).alias("b")
    )
    big = (
        docs.select("doc_id", F.explode(zipped).alias("z"))
        .select(
            "doc_id",
            F.col("z.a").alias("w1"),
            F.concat_ws(" ", F.col("z.a"), F.col("z.b")).alias("gram"),
        )
    )
    from ..cachereg import persist_scoped

    big = persist_scoped(big)  # three consumers: c12, c1, the scoring join
    c12 = (
        big.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= LM_MIN_COUNT)
    )
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = big.select("w1").distinct().count()  # scalar: smoothing vocabulary
    term = F.round(
        F.ln(
            (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
            / (F.col("c1") + v).cast("double")
        )
        * 1e9,
        0,
    ).cast("long")
    return (
        # LEFT join: pruned grams score as unseen (count 0) — the floor is
        # part of the model, not a data loss
        big.join(c12, "gram", "left")
        .join(c1, "w1")
        .withColumn("term", term)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("term").alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -(F.col("s").cast("double"))
                / (F.col("n_bigrams") * F.lit(1e9)),
                6,
            ).alias("nll"),
        )
    )


ORACLES["lm_bigram_nll"] = f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS w FROM documents),
    idx AS (
      SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM w),
    big AS (
      SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i + 1] AS gram FROM idx),
    c12 AS (SELECT gram, count(*) AS c12 FROM big
            GROUP BY gram HAVING count(*) >= {LM_MIN_COUNT}),
    c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
    v AS (SELECT count(DISTINCT w1) AS v FROM big),
    t AS (
      SELECT doc_id,
             CAST(round(ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE)
                           / CAST(c1.c1 + (SELECT v FROM v) AS DOUBLE))
                        * 1000000000.0, 0) AS BIGINT) AS term
      FROM big LEFT JOIN c12 USING (gram) JOIN c1 USING (w1))
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(-CAST(sum(term) AS DOUBLE)
                 / (count(*) * 1000000000.0), 6) AS nll
    FROM t GROUP BY doc_id
"""


#: exact-substring dedup gram width (words). Lee et al. 2022
#: ("Deduplicating Training Data Makes Language Models Better") remove
#: duplicated substrings of >= 50 BPE tokens; the test corpus's docs are
#: 25-60 words, so 8 words plays that threshold at fixture scale — the
#: constant is the knob, shared verbatim by the oracle.
SUBSTR_GRAM_N = 8


def _substr_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every SUBSTR_GRAM_N-word window of every document, as (doc_id, idx,
    gh): idx is the 1-based start-word position, gh the sha2-256 of the
    space-joined gram (the oracle-reproducible key — ``sha256()`` in
    DuckDB; xxhash64 is the scale path when oracle parity is not needed,
    see ``functions.hashing.hash64``). Docs shorter than the gram width
    contribute no rows. The explode is O(n_words) rows per doc and each
    row's slice is O(gram) work — no joins, no shuffle; the gram frame
    partitions by whatever the scan gave us until the dedup key shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    base = (
        docs.select("doc_id", _words(F.col("text")).alias("toks"))
        .filter(F.size("toks") >= SUBSTR_GRAM_N)
    )
    return base.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1), F.size("toks") - F.lit(SUBSTR_GRAM_N - 1)
            )
        ).alias("i"),
        F.col("toks"),
    ).select(
        "doc_id",
        F.col("i").cast("long").alias("idx"),
        F.sha2(
            F.array_join(
                F.slice(F.col("toks"), F.col("i"), F.lit(SUBSTR_GRAM_N)), " "
            ),
            256,
        ).alias("gh"),
    )


#: SQL twin of ``_substr_grams`` — one gram geometry on each engine
_SUBSTR_GRAMS_SQL = f"""
    __sw AS (SELECT doc_id, {_WORDS} AS toks FROM documents
             WHERE text IS NOT NULL),
    substr_grams AS (
      SELECT doc_id, CAST(i AS BIGINT) AS idx,
             sha256(array_to_string(
               list_slice(toks, i, i + {SUBSTR_GRAM_N} - 1), ' ')) AS gh
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks) - {SUBSTR_GRAM_N} + 1))
                     AS i
            FROM __sw WHERE len(toks) >= {SUBSTR_GRAM_N}))"""


def duplicate_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-corpus duplicated substrings, the detection half of
    exact substring dedup (Lee et al. 2022): every word position covered
    by a gram that occurs more than once in the corpus is duplicated;
    overlapping/adjacent duplicated grams within a document merge into
    maximal spans (gaps-and-islands). Returns (doc_id, span_start,
    span_end, n_words) — 1-based inclusive word positions.

    Plan: zero-join gram explode (``_substr_grams``) → ONE gram-hash
    shuffle (window count per gh — crypto-uniform partitioning, no skew)
    → ONE doc-keyed window pair (lag + running sum: the island merge) →
    per-island aggregate. No global sort, nothing driver-side; at 100 TB
    the gram frame is ~corpus-words rows of (long, long, 64B hash) and
    both shuffles are hash-partitioned."""
    from pyspark.sql import Window

    g = _substr_grams(spark, sf_dir)
    dup = (
        g.withColumn(
            "c", F.count(F.lit(1)).over(Window.partitionBy("gh"))
        )
        .filter(F.col("c") > 1)
        .select("doc_id", "idx")
    )
    wd = Window.partitionBy("doc_id").orderBy("idx")
    brk = (
        F.when(
            F.lag("idx").over(wd).isNull()
            | (F.col("idx") - F.lag("idx").over(wd) > SUBSTR_GRAM_N),
            1,
        )
        .otherwise(0)
    )
    isl = F.sum(brk).over(
        Window.partitionBy("doc_id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dup.withColumn("isl", isl)
        .groupBy("doc_id", "isl")
        .agg(
            F.min("idx").alias("span_start"),
            (F.max("idx") + F.lit(SUBSTR_GRAM_N - 1)).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("n_words"),
        )
    )


ORACLES["duplicate_substring_spans"] = f"""
    WITH {_SUBSTR_GRAMS_SQL},
    d AS (
      SELECT doc_id, idx FROM (
        SELECT doc_id, idx, count(*) OVER (PARTITION BY gh) AS c
        FROM substr_grams) WHERE c > 1),
    m AS (
      SELECT doc_id, idx,
             CASE WHEN lag(idx) OVER (PARTITION BY doc_id ORDER BY idx)
                    IS NULL
                  OR idx - lag(idx) OVER (PARTITION BY doc_id ORDER BY idx)
                    > {SUBSTR_GRAM_N}
                  THEN 1 ELSE 0 END AS brk
      FROM d),
    isl AS (
      SELECT doc_id, idx,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY idx
                            ROWS UNBOUNDED PRECEDING) AS isl
      FROM m)
    SELECT doc_id, min(idx) AS span_start,
           max(idx) + {SUBSTR_GRAM_N} - 1 AS span_end,
           max(idx) + {SUBSTR_GRAM_N} - min(idx) AS n_words
    FROM isl GROUP BY doc_id, isl
"""


def dedup_substrings_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring REMOVAL, Lee-et-al-style end state: every word
    covered by a NON-FIRST occurrence of a duplicated gram is removed
    (first = lowest packed (doc_id, idx) — the first copy in corpus order
    keeps its words), and each document is reassembled from its surviving
    words in order. Word-granular: repeated boilerplate inside otherwise
    unique pages is cut mid-sentence, which is exactly the reference
    policy of the paper (their suffix-array pass also cuts mid-span).
    A word kept by gram A's first occurrence but covered by gram B's
    non-first occurrence is REMOVED — removal wins, the conservative
    direction for training data; mirrored exactly in the oracle.

    Plan: gram explode → ONE gram-hash window (count + first-occurrence
    min over the packed key) → positions explode of the duplicate
    occurrences only → distinct → left anti-style join against the
    word-position frame (doc+pos keyed, hash-partitioned) → the shared
    doc-keyed reassembly aggregate. The duplicate-occurrence explode is
    bounded by (duplicated grams × gram width), not corpus size. Packed
    key bound: doc_id·1e6 + idx requires idx < 1e6 words/doc — the
    documented corpus contract (same bound as ``dedup_paragraphs``)."""
    from pyspark.sql import Window

    g = _substr_grams(spark, sf_dir).withColumn(
        "pk", F.col("doc_id") * F.lit(_PARA_PACK) + F.col("idx")
    )
    wg = Window.partitionBy("gh")
    dup_occ = (
        g.withColumn("c", F.count(F.lit(1)).over(wg))
        .withColumn("first_pk", F.min("pk").over(wg))
        .filter((F.col("c") > 1) & (F.col("pk") > F.col("first_pk")))
        .select("doc_id", "idx")
    )
    drop_pos = (
        dup_occ.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("idx"), F.col("idx") + F.lit(SUBSTR_GRAM_N - 1)
                )
            ).alias("pos"),
        )
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    words_pos = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.posexplode(_words(F.col("text"))))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("long").alias("pos"),
            F.col("col").alias("word"),
        )
    )
    kept = (
        words_pos.join(drop_pos, ["doc_id", "pos"], "left")
        .withColumn("kept", F.col("is_dup").isNull())
    )
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.col("kept").cast("long")).alias("n_words_kept"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("kept"),
                            F.struct(F.col("pos"), F.col("word")),
                        )
                    )
                ),
                lambda x: x["word"],
            ),
            " ",
        ).alias("cleaned_text"),
    )


ORACLES["dedup_substrings_global"] = f"""
    WITH {_SUBSTR_GRAMS_SQL},
    m AS (
      SELECT doc_id, idx,
             count(*) OVER (PARTITION BY gh) AS c,
             min(doc_id * {_PARA_PACK} + idx) OVER (PARTITION BY gh)
               AS first_pk
      FROM substr_grams),
    dup AS (
      SELECT doc_id, idx FROM m
      WHERE c > 1 AND doc_id * {_PARA_PACK} + idx > first_pk),
    drop_pos AS (
      SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS pos
      FROM (SELECT doc_id,
                   unnest(generate_series(idx, idx + {SUBSTR_GRAM_N} - 1))
                     AS p
            FROM dup)),
    wp AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS word
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(1, len(toks))) AS i
            FROM __sw)),
    k AS (
      SELECT wp.doc_id, wp.pos, wp.word, d.doc_id IS NULL AS kept
      FROM wp LEFT JOIN drop_pos d
        ON wp.doc_id = d.doc_id AND wp.pos = d.pos)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT)
             AS n_words_kept,
           coalesce(
             array_to_string(
               list(word ORDER BY pos) FILTER (WHERE kept), ' '),
             '') AS cleaned_text
    FROM k GROUP BY doc_id
"""


def dedup_spans_within_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated-span removal — the page-local cleaning
    rule (navigation chrome, repeated headers) that complements the
    cross-corpus tiers: a span is dropped iff an EARLIER span of the SAME
    document is identical; other documents' spans don't matter. Same
    output shape as ``dedup_paragraphs`` (the cross-doc exact tier) so the
    granularities are drop-in comparable.

    Plan: span explode → ONE (doc_id, span-hash)-keyed window min → the
    shared doc-keyed reassembly. Both shuffles are doc-keyed, so at 100 TB
    this co-partitions: one real exchange, then AQE keeps the reassembly
    local."""
    from pyspark.sql import Window

    spans = para_spans(spark, sf_dir).withColumn(
        "ph", F.sha2(F.col("para"), 256)
    )
    kept = F.col("para_idx") == F.min("para_idx").over(
        Window.partitionBy("doc_id", "ph")
    )
    return reassemble_spans(spans.withColumn("kept", kept))


ORACLES["dedup_spans_within_doc"] = f"""
    WITH {PARA_SPANS_SQL},
    k AS (
      SELECT doc_id, para_idx, para,
             para_idx = min(para_idx)
               OVER (PARTITION BY doc_id, sha256(para)) AS kept
      FROM para_spans)
    {span_reassembly_select('k')}
"""


#: vocabulary coverage target, in permille (990 = the 99.0% cumulative-
#: coverage cutoff): the vocab keeps the most frequent words whose
#: PRECEDING cumulative mass is still under the target — integer
#: arithmetic, no float boundary. Tokenizer-training knob, shared
#: verbatim with the oracle.
VOCAB_COVERAGE_PERMILLE = 990


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with a cumulative-coverage cutoff — the
    tokenizer-vocab selection pass of a training pipeline: count every
    corpus token, rank by (count desc, word asc), and keep words while the
    cumulative token mass BEFORE the word is under
    VOCAB_COVERAGE_PERMILLE/1000 of the corpus (so the word that crosses
    the threshold is still included — standard coverage semantics).
    Returns (rank, word, n_occurrences, cum_occurrences).

    Exactness: the cutoff compares (cum − count)·1000 < total·permille —
    pure BIGINT arithmetic on both engines, no float boundary to straddle.

    Plan: token explode → ONE word-keyed count agg (map-side combined;
    the corpus-sized stage) → rank/cumsum windows over the VOCAB frame,
    which is orders of magnitude smaller than the corpus (≤ a few 100 M
    rows even web-scale) — the single-partition window is over that agg
    output, never the corpus, and the broadcast total closes it out."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    counts = (
        docs.select(F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    total = counts.agg(F.sum("n_occurrences").alias("total"))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("word"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_occurrences",
            F.sum("n_occurrences").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .crossJoin(F.broadcast(total))
    )
    return (
        ranked.filter(
            (F.col("cum_occurrences") - F.col("n_occurrences")) * 1000
            < F.col("total") * VOCAB_COVERAGE_PERMILLE
        )
        .select(
            F.col("rank").cast("long").alias("rank"),
            "word",
            "n_occurrences",
            "cum_occurrences",
        )
    )


ORACLES["vocab_coverage"] = f"""
    WITH counts AS (
      SELECT word, count(*) AS n_occurrences
      FROM (SELECT unnest({_WORDS}) AS word FROM documents
            WHERE text IS NOT NULL)
      GROUP BY word),
    ranked AS (
      SELECT word, n_occurrences,
             row_number() OVER (ORDER BY n_occurrences DESC, word) AS rank,
             sum(n_occurrences) OVER (ORDER BY n_occurrences DESC, word
                                      ROWS UNBOUNDED PRECEDING)
               AS cum_occurrences,
             sum(n_occurrences) OVER () AS total
      FROM counts)
    SELECT CAST(rank AS BIGINT) AS rank, word,
           CAST(n_occurrences AS BIGINT) AS n_occurrences,
           CAST(cum_occurrences AS BIGINT) AS cum_occurrences
    FROM ranked
    WHERE (cum_occurrences - n_occurrences) * 1000
          < total * {VOCAB_COVERAGE_PERMILLE}
"""


#: top adjacent-character pairs reported by the BPE statistics pass
BPE_TOP_PAIRS = 64


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-initialization statistics: the corpus-weighted counts of every
    ADJACENT CHARACTER PAIR inside words — the quantity a byte-pair-
    encoding tokenizer trainer maximizes at each merge step (Sennrich et
    al. 2016). Returns the top BPE_TOP_PAIRS pairs as (pair, n_words,
    n_occurrences): n_occurrences weights each in-word position by the
    word's corpus frequency (a pair occurring twice inside one word
    counts twice), n_words is the number of distinct word types
    containing the pair at least once.

    Plan: ONE word-keyed count agg collapses the corpus to its vocabulary
    (the only corpus-sized stage — exactly the collapse a real BPE
    trainer does first); the position explode then runs over VOCAB×len
    rows, trivially small; TakeOrdered returns the top pairs with a
    deterministic (count desc, pair asc) tie-break. Iterated merges
    re-run this counting kernel over a re-segmented vocab — the kernel is
    the per-iteration cost, and it never re-touches the corpus."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    vocab = (
        docs.select(F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.length("word") >= 2)
    )
    pairs = vocab.select(
        "word",
        "c",
        F.explode(
            F.sequence(F.lit(1), F.length("word") - F.lit(1))
        ).alias("i"),
    ).select(
        F.expr("substring(word, i, 2)").alias("pair"),
        "word",
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("c").alias("n_occurrences"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("pair"))
        .limit(BPE_TOP_PAIRS)
    )


ORACLES["bpe_pair_counts"] = f"""
    WITH vocab AS (
      SELECT word, count(*) AS c
      FROM (SELECT unnest({_WORDS}) AS word FROM documents
            WHERE text IS NOT NULL)
      GROUP BY word
      HAVING length(word) >= 2),
    pairs AS (
      SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, word, c
      FROM (SELECT word, c, unnest(generate_series(1, length(word) - 1))
                     AS i
            FROM vocab))
    SELECT pair, CAST(count(DISTINCT word) AS BIGINT) AS n_words,
           CAST(sum(c) AS BIGINT) AS n_occurrences
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT {BPE_TOP_PAIRS}
"""


#: iterated-BPE merge rounds (VERDICT r8 item 4): the real trainer loop —
#: small enough that the unrolled DuckDB oracle stays readable, large
#: enough that later merges consume EARLIER merges' output symbols.
BPE_MERGE_ROUNDS = 6

#: symbol separator for the segmentation encoding (U+001F unit separator —
#: never a corpus character; both engines FILTER any word carrying it so
#: the encoding is injective by construction). Each symbol is wrapped as
#: ``SEP sym SEP`` and symbols concatenated, e.g. "abc" →
#: "␟a␟␟b␟␟c␟" — the double separator between symbols makes the merge a
#: plain string replace (see ``bpe_merge_steps``).
BPE_SEP = "\x1f"


def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated BPE training (Sennrich et al. 2016, the actual merge loop —
    not just the first merge's statistics like ``bpe_pair_counts``): run
    BPE_MERGE_ROUNDS rounds of [count adjacent symbol pairs over the
    corpus-weighted vocabulary → pick the max (count desc, pair asc) →
    merge it into one symbol everywhere], and return the merge table
    ``(step, left_sym, right_sym, n_occurrences)`` — the artifact a BPE
    tokenizer trainer emits. Later rounds genuinely consume earlier
    merges' output symbols (round 2 can pick a pair whose left symbol is
    round 1's merge).

    Semantics pinned cross-engine:
    * pair counts weight every adjacent position by the word's corpus
      frequency, overlapping positions included ("aaa" carries (a,a)
      twice) — the reference trainer's ``get_stats`` convention;
    * the merge applies GREEDILY LEFT-TO-RIGHT, non-overlapping: "aaaa"
      under merge (a,a) becomes (aa)(aa), not a(aa)a. Both engines get
      this for free from ``replace()``'s scan-resumes-after-replacement
      contract on the double-separator encoding: the pattern
      ``SEP l SEP SEP r SEP`` → ``SEP lr SEP`` consumes whole symbols and
      adjacent matches don't share characters.

    Plan: ONE corpus-sized word-count agg collapses the corpus to its
    vocabulary (persisted — every round re-reads it from cache); each
    round is then an agg over VOCAB×symbols rows (tiny) plus a ONE-ROW
    argmax collect — the kmeans/MMR codebook pattern, R driver round
    trips moving R rows total. The corpus is touched exactly once
    regardless of R."""
    merges, _segs = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, n_occurrences long"
    )


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared BPE trainer kernel: returns ``(merge_table, final_segs)``
    where final_segs is the corpus vocabulary ``(word, c, seg)`` with all
    merges applied — the trained-tokenizer state the encode pass consumes."""
    from ..cachereg import persist_scoped

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    sep2 = BPE_SEP + BPE_SEP
    wrap = F.concat(
        F.lit(BPE_SEP),
        F.concat_ws(
            sep2,
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ),
        ),
        F.lit(BPE_SEP),
    )
    # The vocabulary frame is trainer STATE, tiny next to the corpus-sized
    # word-count agg that produces it — but a persist inherits the agg's
    # full shuffle width (cached plans get no AQE coalescing), so every
    # merge round scheduled one map task per (mostly empty) cached
    # partition: 32 tasks x 2 stages x R rounds of overhead for a
    # vocab-sized readout (measured 0.25 s/round at sf0.1's 30-word
    # vocab; same-session A/B: 32-part 1.89 s vs 1-part 1.39 s trainer).
    # Coalesce to one vocab shard per 32 cores — scale-adaptive (grows
    # with the cluster, where a many-GB vocab would also want sharding),
    # never the shuffle constant (guide §2.2).
    vocab_parts = max(1, spark.sparkContext.defaultParallelism // 32)
    base = persist_scoped(
        docs.select(F.explode(_words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(
            (F.length("word") >= 2) & ~F.expr("contains(word, chr(31))")
        )
        .select("word", "c", wrap.alias("seg"))
        .coalesce(vocab_parts)
    )
    # zip_with over the two shifted slices — NOT sequence(1, size-1), which
    # DESCENDS to [1, 0] for a fully-merged single-symbol word and blows up
    # element_at; slice length 0 is a clean empty array on both engines
    pair_expr = F.expr(
        "zip_with(slice(syms, 1, size(syms) - 1),"
        " slice(syms, 2, size(syms) - 1),"
        " (a, b) -> struct(a AS l, b AS r))"
    )
    segs = base
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, BPE_MERGE_ROUNDS + 1):
        counts = (
            segs.withColumn(
                "syms",
                F.split(F.expr("substring(seg, 2, length(seg) - 2)"), sep2),
            )
            .select("c", F.explode(pair_expr).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("c").alias("n"))
        )
        best = counts.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        if not best:  # vocabulary fully merged — nothing left to count
            break
        l, r, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
        merges.append((step, l, r, n))
        segs = segs.withColumn(
            "seg",
            F.replace(
                F.col("seg"),
                F.lit(BPE_SEP + l + BPE_SEP + BPE_SEP + r + BPE_SEP),
                F.lit(BPE_SEP + l + r + BPE_SEP),
            ),
        )
    return merges, segs


def bpe_encode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY side of the BPE pair (encode with the trained merges): per
    document, the token count under the BPE_MERGE_ROUNDS-merge tokenizer
    vs the whitespace word count — the compression measurement a tokenizer
    evaluation reports, and the budget input a token-count-aware pipeline
    (packing, mixtures) would consume. Returns ``(doc_id, n_words,
    n_tokens_bpe, n_tokens_ws)``; words outside the trainable vocabulary
    (single characters) count 1 BPE token, n_tokens_ws counts characters
    of ≥2-char words + 1 per 1-char word (the untrained baseline of the
    same convention).

    Plan: the trainer's vocab loop (corpus touched once), then per-word
    token counts derived on the VOCAB frame and broadcast-joined back to
    the corpus word explode — one doc-keyed aggregate; no corpus-sized
    shuffle beyond it."""
    merges, segs = _bpe_train(spark, sf_dir)
    sep2 = BPE_SEP + BPE_SEP
    per_word = segs.select(
        "word",
        F.size(
            F.split(F.expr("substring(seg, 2, length(seg) - 2)"), sep2)
        ).alias("n_tok"),
        F.length("word").alias("n_chr"),
    )
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    words = docs.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("word")
    )
    joined = words.join(F.broadcast(per_word), "word", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.coalesce("n_tok", F.lit(1))).alias("n_tokens_bpe"),
        F.sum(F.coalesce("n_chr", F.lit(1))).alias("n_tokens_ws"),
    )


def _bpe_cte_parts() -> list[str]:
    """Unrolled R-round MATERIALIZED-CTE trainer (the kmeans/MMR pattern):
    each round counts pairs from the previous segmentation, takes the
    (n desc, l, r) argmax, and re-segments with the same double-separator
    string replace the engine uses. Shared by the merge-table and encode
    oracles."""
    chars = (
        "list_transform(generate_series(1, length(word)),"
        " i -> substr(word, i, 1))"
    )
    parts = [
        f"""
    vocab AS MATERIALIZED (
      SELECT word, count(*) AS c
      FROM (SELECT unnest({_WORDS}) AS word FROM documents
            WHERE text IS NOT NULL)
      GROUP BY word
      HAVING length(word) >= 2 AND NOT contains(word, chr(31))),
    seg0 AS MATERIALIZED (
      SELECT word, c,
             chr(31) || array_to_string({chars}, chr(31) || chr(31))
                     || chr(31) AS seg
      FROM vocab)"""
    ]
    for s in range(1, BPE_MERGE_ROUNDS + 1):
        p = s - 1
        parts.append(f"""
    syms{s} AS (
      SELECT c, string_split(substr(seg, 2, length(seg) - 2),
                             chr(31) || chr(31)) AS syms
      FROM seg{p}),
    best{s} AS MATERIALIZED (
      SELECT syms[i] AS l, syms[i + 1] AS r, sum(c) AS n
      FROM (SELECT c, syms,
                   unnest(generate_series(1, len(syms) - 1)) AS i
            FROM syms{s})
      GROUP BY 1, 2
      ORDER BY n DESC, l, r
      LIMIT 1),
    seg{s} AS MATERIALIZED (
      SELECT v.word, v.c,
             replace(v.seg,
                     chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                     chr(31) || b.l || b.r || chr(31)) AS seg
      FROM seg{p} v, best{s} b)""")
    return parts


def _bpe_merge_oracle() -> str:
    finals = "\n    UNION ALL\n".join(
        f"""    SELECT {s} AS step, l AS left_sym, r AS right_sym,
               CAST(n AS BIGINT) AS n_occurrences FROM best{s}"""
        for s in range(1, BPE_MERGE_ROUNDS + 1)
    )
    return "WITH" + ",".join(_bpe_cte_parts()) + "\n" + finals


ORACLES["bpe_merge_steps"] = _bpe_merge_oracle()


def _bpe_encode_oracle() -> str:
    # CAVEAT mirrored from the engine: if any trainer round came up empty
    # (fully merged vocabulary), seg{R} is EMPTY in this oracle while the
    # engine's early break keeps the last non-empty segs. Impossible on the
    # driver corpora (6 merges over a ≥26-symbol alphabet) and pinned
    # harmless on degenerate fixtures by tests/test_null_docs.py, where the
    # vocab is big enough for all rounds; documented rather than padded
    # with per-round COALESCE chains.
    r = BPE_MERGE_ROUNDS
    final = f"""
    per_word AS (
      SELECT word,
             len(string_split(substr(seg, 2, length(seg) - 2),
                              chr(31) || chr(31))) AS n_tok,
             length(word) AS n_chr
      FROM seg{r}),
    corpus AS (
      SELECT doc_id, unnest({_WORDS}) AS word FROM documents
      WHERE text IS NOT NULL)
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(COALESCE(p.n_tok, 1)) AS BIGINT) AS n_tokens_bpe,
           CAST(sum(COALESCE(p.n_chr, 1)) AS BIGINT) AS n_tokens_ws
    FROM corpus c LEFT JOIN per_word p ON c.word = p.word
    GROUP BY c.doc_id"""
    return "WITH" + ",".join(_bpe_cte_parts()) + "," + final


ORACLES["bpe_encode_token_counts"] = _bpe_encode_oracle()


#: novelty gram width (words) — the diversity-scoring granularity
NOVELTY_N = 3


def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY — the diversity/uniqueness signal a
    curation pipeline weights sampling by (the inverse of the
    boilerplate/duplication signals): the fraction of a document's
    distinct word-NOVELTY_N-grams that occur in NO other corpus document.
    Returns (doc_id, n_grams, n_novel, novelty) for every doc with at
    least one gram; novelty is an exact integer ratio (bit-identical
    doubles on both engines).

    A gram is novel when its corpus-wide count of CARRYING DOCUMENTS is
    1 — within-doc repetition doesn't spend novelty (grams are distinct
    per doc before counting), mirroring the per-doc-distinct convention
    of the decontamination tier.

    Plan: gram explode (per-doc distinct by construction) → ONE
    crypto-uniform gram-hash window count → one doc-keyed aggregate —
    the same two-shuffle shape as `duplicate_substring_spans`; only
    (doc_id, 8-byte hash) rows cross either exchange."""
    from pyspark.sql import Window

    from ..functions.hashing import stable_uint60
    from ..functions.text import shingles

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    g = docs.select(
        "doc_id",
        F.explode(shingles(F.col("text"), NOVELTY_N)).alias("gram"),
    ).select("doc_id", stable_uint60(F.col("gram")).alias("gh"))
    counted = g.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("gh"))
    )
    return counted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count(F.when(F.col("c") == 1, 1)).alias("n_novel"),
        (
            F.count(F.when(F.col("c") == 1, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("novelty"),
    )


def _doc_novelty_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    gram = " || ' ' || ".join(f"w[i+{k}]" for k in range(NOVELTY_N))
    return f"""
        WITH words AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE text IS NOT NULL),
        grams AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   generate_series(1, greatest(len(w) - {NOVELTY_N - 1}, 0)),
                   i -> {gram}))) AS gram
          FROM words),
        g AS (SELECT doc_id, {duck_stable_uint60('gram')} AS gh FROM grams),
        counted AS (
          SELECT doc_id, count(*) OVER (PARTITION BY gh) AS c FROM g)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS n_novel,
               CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS novelty
        FROM counted GROUP BY doc_id
    """


ORACLES["doc_novelty_scores"] = _doc_novelty_oracle()


# ─── CCNet-style perplexity buckets ─────────────────────────────────────────

#: CCNet's quality split count (head/middle/tail — Wenzek et al. 2020,
#: "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
#: Data"); shared verbatim by the oracle
CCNET_BUCKETS = 3


def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(lang, bucket, n_docs, n_bigrams, nll_min, nll_max)`` — the CCNet
    corpus split (Wenzek et al. 2020): per LANGUAGE, rank documents by LM
    negative log-likelihood (the in-corpus bigram model of
    ``lm_bigram_nll``) and cut into equal head/middle/tail terciles —
    head = most probable under the LM = highest quality. The per-bucket
    readout a mixture designer consumes: volume (docs, bigram tokens) and
    the NLL range each tercile spans.

    Exactness: per-doc nll is the nano-nat-pinned 6-dp double (already
    bit-identical cross-engine); the tercile cut is ``ntile`` over the
    total order (nll ASC, doc_id) — standard SQL ntile semantics on both
    engines (leading buckets take the ⌈n/k⌉ remainder). Per-bucket
    aggregates are order-independent (count, BIGINT sum, min/max of
    bit-identical doubles) — no float summation crosses engines.

    Scale: scoring is ``lm_bigram_nll``'s two-count-aggregate plan; the
    ranking shuffles ONE doc-sized row frame by language (the window's
    partition key), and the output is languages × 3 rows. At 100 TB
    CCNet's own trick applies unchanged: the per-language sort is the
    only corpus-order operation, and it runs per-partition-key, never
    globally."""
    from pyspark.sql import Window

    nll = lm_bigram_nll(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.col("nll").asc(), "doc_id")
    bucketed = (
        nll.join(langs, "doc_id")
        .withColumn("nt", F.ntile(CCNET_BUCKETS).over(w))
        .withColumn(
            "bucket",
            F.when(F.col("nt") == 1, F.lit("head"))
            .when(F.col("nt") == 2, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("n_bigrams"),
            F.min("nll").alias("nll_min"),
            F.max("nll").alias("nll_max"),
        )
    )


def _ccnet_buckets_oracle() -> str:
    return f"""
        WITH scored AS ({ORACLES["lm_bigram_nll"]}),
        bucketed AS (
          SELECT d.lang, s.n_bigrams, s.nll,
                 ntile({CCNET_BUCKETS}) OVER (PARTITION BY d.lang
                     ORDER BY s.nll ASC, s.doc_id) AS nt
          FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
        SELECT lang,
               CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
               min(nll) AS nll_min,
               max(nll) AS nll_max
        FROM bucketed GROUP BY lang, nt
    """


ORACLES["ccnet_quality_buckets"] = _ccnet_buckets_oracle()


def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(lang, n_docs, n_words, n_tokens_bpe, fertility_ppb)`` — the
    per-language tokenizer-evaluation readout
    over the in-corpus trained BPE: FERTILITY = BPE tokens per whitespace
    word (the standard multilingual-tokenizer equity metric — a language
    with high fertility pays more sequence length per word), as an EXACT
    integer parts-per-billion of exact BIGINT sums
    (``(1e9 · Σtokens) div Σwords``), so ranking languages by tokenizer
    cost is cross-engine deterministic.

    Plan: ``bpe_encode_token_counts``'s plan (vocab-loop + broadcast
    encode join + one doc aggregate) + a broadcast doc→lang join + one
    languages-sized aggregate — nothing new touches the corpus."""
    per_doc = bpe_encode_token_counts(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        per_doc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens_bpe").alias("n_tokens_bpe"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_tokens_bpe",
            F.expr("(1000000000 * n_tokens_bpe) div n_words").alias(
                "fertility_ppb"
            ),
        )
    )


def _fertility_oracle() -> str:
    r = BPE_MERGE_ROUNDS
    final = f"""
    per_word AS (
      SELECT word,
             len(string_split(substr(seg, 2, length(seg) - 2),
                              chr(31) || chr(31))) AS n_tok
      FROM seg{r}),
    corpus AS (
      SELECT doc_id, unnest({_WORDS}) AS word FROM documents
      WHERE text IS NOT NULL),
    per_doc AS (
      SELECT c.doc_id,
             count(*) AS n_words,
             sum(COALESCE(p.n_tok, 1)) AS n_tokens_bpe
      FROM corpus c LEFT JOIN per_word p ON c.word = p.word
      GROUP BY c.doc_id)
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(pd.n_words) AS BIGINT) AS n_words,
           CAST(sum(pd.n_tokens_bpe) AS BIGINT) AS n_tokens_bpe,
           CAST((1000000000 * sum(pd.n_tokens_bpe)) // sum(pd.n_words)
                AS BIGINT) AS fertility_ppb
    FROM per_doc pd JOIN documents d ON pd.doc_id = d.doc_id
    GROUP BY d.lang"""
    return "WITH" + ",".join(_bpe_cte_parts()) + "," + final


ORACLES["tokenizer_fertility_by_lang"] = _fertility_oracle()


#: vocabulary-drift readout size. Shared verbatim by the oracle.
VOCAB_DRIFT_TOP = 20


def vocab_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between the corpus's crawl-order halves — the
    TEXT tier's distribution watch beside the event tier's KS/PSI: the
    top-``VOCAB_DRIFT_TOP`` terms by document-frequency shift between
    the early half (doc_id ≤ median doc_id; ingestion ids are crawl
    order) and the late half. A new boilerplate template, a source
    going dark, or a language shift all surface here as terms whose
    df-rate jumps — the readout a curation deployment reads before
    retraining its quality models.

    Exactness: the shift metric is the EXACT cross-multiplied integer
    ``|df₁·n₂ − df₂·n₁|`` (the ks_drift_report identity at term
    granularity — no rate division until the final ppm readout);
    ordering (shift DESC, term ASC) is total, so the top-k cut is
    deterministic; the median split is the exact lower median of the
    text-bearing doc_id domain.

    Scale: one tokenize → distinct (doc, term) projection (the postings
    shuffle), one term-keyed conditional-count aggregate (map-side
    combined; the shuffled frame is the vocabulary domain), a broadcast
    median join, and a TakeOrdered top-k. The median rank window runs
    over the doc_id DOMAIN (the accepted SinglePartition-over-aggregate
    shape; two-stage prefix sum at 100 TB)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    ids = docs.select("doc_id")
    wmed = Window.orderBy("doc_id")
    med = (
        ids.select(
            "doc_id",
            F.row_number().over(wmed).alias("i"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        .filter(F.expr("i = (n + 1) div 2"))
        .select(F.col("doc_id").alias("med"))
    )
    dt = (
        docs.select(
            "doc_id", F.explode(_words(F.col("text"))).alias("term")
        )
        .distinct()
        .crossJoin(F.broadcast(med))
    )
    counts = dt.groupBy("term").agg(
        F.count(F.when(F.col("doc_id") <= F.col("med"), 1)).alias("df1"),
        F.count(F.when(F.col("doc_id") > F.col("med"), 1)).alias("df2"),
    )
    totals = (
        ids.crossJoin(F.broadcast(med))
        .agg(
            F.count(F.when(F.col("doc_id") <= F.col("med"), 1)).alias("n1"),
            F.count(F.when(F.col("doc_id") > F.col("med"), 1)).alias("n2"),
        )
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        "df1",
        "df2",
        "n1",
        "n2",
        F.abs(
            F.col("df1") * F.col("n2") - F.col("df2") * F.col("n1")
        ).alias("shift_scaled"),
        F.expr("(1000000 * df1) div n1").alias("rate1_ppm"),
        F.expr("(1000000 * df2) div n2").alias("rate2_ppm"),
    )
    return scored.orderBy(
        F.col("shift_scaled").desc(), F.col("term").asc()
    ).limit(VOCAB_DRIFT_TOP)


ORACLES["vocab_drift_report"] = f"""
    WITH base AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) AS i,
             count(*) OVER () AS n
      FROM base),
    med AS (SELECT doc_id AS med FROM ranked WHERE i = (n + 1) // 2),
    dt AS (
      SELECT DISTINCT doc_id, unnest({_WORDS}) AS term FROM base),
    counts AS (
      SELECT term,
             count(CASE WHEN doc_id <= med THEN 1 END) AS df1,
             count(CASE WHEN doc_id > med THEN 1 END) AS df2
      FROM dt, med GROUP BY term),
    totals AS (
      SELECT count(CASE WHEN doc_id <= med THEN 1 END) AS n1,
             count(CASE WHEN doc_id > med THEN 1 END) AS n2
      FROM base, med)
    SELECT term,
           CAST(df1 AS BIGINT) AS df1,
           CAST(df2 AS BIGINT) AS df2,
           CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           CAST(abs(df1 * n2 - df2 * n1) AS BIGINT) AS shift_scaled,
           CAST((1000000 * df1) // n1 AS BIGINT) AS rate1_ppm,
           CAST((1000000 * df2) // n2 AS BIGINT) AS rate2_ppm
    FROM counts, totals
    ORDER BY shift_scaled DESC, term ASC
    LIMIT {VOCAB_DRIFT_TOP}
"""

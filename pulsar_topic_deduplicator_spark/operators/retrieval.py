"""Positional inverted index + phrase search over the ``documents`` corpus.

NOT in the reference (opaque payloads — SURVEY.md §2.3); this is the
retrieval-side tier next to BM25/TF-IDF (``textops``): build the positional
posting lists a search engine shards, then answer a phrase query by
position-adjacency intersection — the classic Lucene/ES positional-index
workload, expressed as Catalyst plans.

Scale design:

- **Index build is one shuffle.** tokenize (codegen ``split``/``posexplode``,
  zero Python) → groupBy (term, doc) with partial aggregation. The output is
  *term-partitioned* — exactly the sharding a distributed index wants: a
  query for one term prunes to that term's partitions.
- **Phrase matching never re-joins the corpus positionally.** Adjacent word
  pairs are derived per-document with the shifted-``slice`` + ``arrays_zip``
  zip (the ``functions.text.shingles`` kernel — one array op per row, no
  positional self-join, no shuffle before the count agg). A positional
  self-join of the token table with itself would shuffle corpus-sized
  token frames twice; the zip form reads each document once.
- **The query constant is data-derived, not collected.** The demo phrase is
  the corpus's most frequent bigram (deterministic tie-break count DESC,
  then lexicographic) — computed as a 1-row frame and broadcast onto the
  per-doc pair counts (the sanctioned scalar-broadcast ``crossJoin``), so
  the operator is a fixed pipeline with no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cachereg import persist_scoped
from ..functions.text import whitespace_tokens
from ..sources.io import load_table


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, term) — 0-based positions, single-space tokenization
    (the corpus convention shared with every textops oracle)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return docs.select(
        "doc_id",
        F.posexplode(whitespace_tokens(F.col("text"))).alias("pos", "term"),
    )


def _adjacent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per ADJACENT token pair occurrence,
    derived per-document with the shifted-slice zip (no positional join)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    words = whitespace_tokens(F.col("text"))
    n = F.size(words) - 1
    zipped = F.arrays_zip(F.slice(words, 1, n), F.slice(words, 2, n))
    return (
        docs.select("doc_id", F.explode(zipped).alias("p"))
        .select(
            "doc_id",
            F.col("p")["0"].alias("w1"),
            F.col("p")["1"].alias("w2"),
        )
    )


def posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The positional inverted index in long form: one row per (term, doc)
    posting with its term frequency and first position —
    ``(term, doc_id, tf, first_pos)``.

    Plan: codegen tokenize → ONE (term, doc)-keyed aggregate with map-side
    partials. Term-partitioned output = the shardable index (module
    docstring); at 100 TB this is a pure scan + one shuffle, and a
    single-term lookup prunes to the term's hash partitions."""
    return (
        _tokens(spark, sf_dir)
        .groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.min("pos").alias("first_pos"),
        )
    )


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents containing the corpus's most frequent two-word phrase,
    with per-document match counts — ``(doc_id, phrase, n_matches)``.

    The phrase is chosen in-query (top bigram by corpus count, tie-break
    lexicographic on both words), so the operator is fully deterministic
    with no data-dependent constant baked in. Matching filters the per-doc
    adjacent-pair frame against the broadcast 1-row phrase — the pair
    frame is computed once (scoped persist) and reused by both the
    chooser and the matcher."""
    pairs = persist_scoped(_adjacent_pairs(spark, sf_dir))
    top = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(1)
        .select(F.col("w1").alias("q1"), F.col("w2").alias("q2"))
    )
    return (
        pairs.crossJoin(F.broadcast(top))
        .filter((F.col("w1") == F.col("q1")) & (F.col("w2") == F.col("q2")))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(" ", F.first("q1"), F.first("q2")).alias("phrase"),
            F.count(F.lit(1)).alias("n_matches"),
        )
    )


_TOKS_CTE = """
    toks AS (
      SELECT doc_id,
             CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                  AS INT) AS pos,
             unnest(string_split(text, ' ')) AS term
      FROM documents WHERE text IS NOT NULL)"""

#: adjacent-pair occurrences via positional self-join — semantically
#: identical to the Spark shifted-slice zip (every pos p joins p+1 exactly
#: once); the oracle favors the relational form DuckDB optimizes well.
_PAIRS_CTE = f"""
    {_TOKS_CTE},
    pairs AS (
      SELECT a.doc_id, a.term AS w1, b.term AS w2
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1)"""

ORACLES: dict[str, str] = {
    "posting_lists": f"""
        WITH {_TOKS_CTE}
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
               min(pos) AS first_pos
        FROM toks GROUP BY term, doc_id
    """,
    "phrase_search": f"""
        WITH {_PAIRS_CTE},
        top AS (
          SELECT w1 AS q1, w2 AS q2
          FROM (SELECT w1, w2, count(*) AS n FROM pairs GROUP BY w1, w2)
          ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 1)
        SELECT p.doc_id, t.q1 || ' ' || t.q2 AS phrase,
               CAST(count(*) AS BIGINT) AS n_matches
        FROM pairs p JOIN top t ON p.w1 = t.q1 AND p.w2 = t.q2
        GROUP BY p.doc_id, t.q1, t.q2
    """,
}


#: PMI collocation knobs: minimum pair occurrences (rare-pair PMI is
#: degenerate — a hapax pair of two hapax words maxes the score) and
#: result size
PMI_MIN_COUNT = 5
PMI_TOP = 20


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information (Church & Hanks
    1990) over adjacent token pairs — the lexical-association readout a
    corpus pipeline runs to find multiword units ("new york") before
    tokenizer/vocab decisions. PMI = ln(c_xy·N / (c_x·c_y)) with c_x/c_y
    the pair table's left/right marginals and N the total pair count;
    pairs below PMI_MIN_COUNT occurrences are dropped, top PMI_TOP
    returned as ``(w1, w2, n_pair, pmi_nanonats)``.

    Exactness: counts/marginals/N are exact BIGINTs; the single ln per
    pair is pinned to integer NANO-NATS (the bm25/NB discipline —
    ``round(ln·1e9)``), so ordering, ties, and values are bit-identical
    cross-engine.

    Scale: one adjacent-pair explode (zero-shuffle, the shifted-slice
    zip) → one (w1,w2) count shuffle; marginals re-aggregate the
    vocabulary²-bounded pair-count frame (≪ corpus) and broadcast back."""
    from .classify import _nanonat_ln

    pc = (
        _adjacent_pairs(spark, sf_dir)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    pc = persist_scoped(pc)
    left = pc.groupBy("w1").agg(F.sum("n_pair").alias("c1"))
    right = pc.groupBy("w2").agg(F.sum("n_pair").alias("c2"))
    nf = pc.agg(F.sum("n_pair").alias("n_total"))
    scored = (
        pc.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(nf))
        .select(
            "w1",
            "w2",
            "n_pair",
            _nanonat_ln(
                F.col("n_pair") * F.col("n_total"),
                F.col("c1") * F.col("c2"),
            ).alias("pmi_nanonats"),
        )
    )
    return scored.orderBy(F.desc("pmi_nanonats"), "w1", "w2").limit(PMI_TOP)


ORACLES["pmi_collocations"] = f"""
    WITH {_PAIRS_CTE},
    pc AS MATERIALIZED (
      SELECT w1, w2, count(*) AS n_pair FROM pairs GROUP BY w1, w2),
    lm AS (SELECT w1, sum(n_pair) AS c1 FROM pc GROUP BY w1),
    rm AS (SELECT w2, sum(n_pair) AS c2 FROM pc GROUP BY w2),
    nt AS (SELECT sum(n_pair) AS n_total FROM pc)
    SELECT p.w1, p.w2, CAST(p.n_pair AS BIGINT) AS n_pair,
           CAST(round(ln(CAST(p.n_pair * n_total AS DOUBLE)
                         / CAST(c1 * c2 AS DOUBLE)) * 1e9, 0) AS BIGINT)
             AS pmi_nanonats
    FROM pc p JOIN lm ON p.w1 = lm.w1 JOIN rm ON p.w2 = rm.w2 CROSS JOIN nt
    WHERE p.n_pair >= {PMI_MIN_COUNT}
    ORDER BY pmi_nanonats DESC, p.w1, p.w2
    LIMIT {PMI_TOP}
"""


# ─── Hybrid retrieval: reciprocal-rank fusion of lexical + dense ────────────

#: RRF smoothing constant (Cormack, Clarke & Buettcher 2009 — k=60 is the
#: published default; shared verbatim by the oracle)
RRF_K = 60
#: fixed-point RRF scale (parts-per-billion, the engine's rational-score
#: convention — floor division is identical on both engines)
RRF_SCALE = 1_000_000_000
#: candidates taken from the dense retriever (lexical side contributes
#: textops.BM25_TOP_K)
DENSE_TOP = 50
#: fused results returned
FUSE_TOP = 20


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(doc_id, rank_lex, rank_dense, rrf_ppb, rank)`` — hybrid search:
    the BM25 lexical top-50 (``textops.bm25_rank``, fixed term query) and
    the dense cosine top-50 (corpus query vector, ``embeddings`` table)
    fused by reciprocal-rank fusion (Cormack et al. 2009):
    ``rrf = Σ_retriever 1/(k + rank)``, here as the EXACT integer
    ``rrf_ppb = Σ (1e9 div (RRF_K + rank))`` so the fused ordering is
    integer-deterministic cross-engine (ranks themselves are integers;
    the only doubles — bm25 scores and cosines — never leave their own
    retriever's ranking, where both engines compute bit-identical values
    by the mirrored-fold discipline). A doc in only one list contributes
    only that list's term (its other rank stays NULL).

    Scale shape: each retriever ends in a top-K cut (TakeOrdered — no
    global sort of the corpus; the lexical side is one scan + a
    broadcast stats row, the dense side one scan against the inlined
    query vector, or an ANN index at 100 TB). Fusion then runs on two
    K-row frames — driver-trivial, independent of corpus size. This is
    the standard RAG retrieval front-end: sparse recall + dense recall,
    rank-fused without score calibration."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine_similarity
    from .similarity import QUERY_VEC_ID, _query_vector
    from .textops import bm25_rank

    lex = bm25_rank(spark, sf_dir)
    wl = Window.orderBy(F.col("bm25").desc(), "doc_id")
    lex_r = lex.select(
        "doc_id", F.row_number().over(wl).alias("rank_lex")
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = F.lit(_query_vector(emb)).cast("array<double>")
    dense = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            cosine_similarity(F.col("embedding"), q).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(DENSE_TOP)
    )
    wd = Window.orderBy(F.col("cosine").desc(), "vec_id")
    dense_r = dense.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wd).alias("rank_dense"),
    )

    fused = lex_r.join(dense_r, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_dense",
        (
            F.coalesce(
                F.expr(f"{RRF_SCALE} div ({RRF_K} + rank_lex)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{RRF_SCALE} div ({RRF_K} + rank_dense)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_ppb"),
    )
    wf = Window.orderBy(F.col("rrf_ppb").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= FUSE_TOP)
    )


def _hybrid_rrf_oracle() -> str:
    from .similarity import QUERY_VEC_ID
    from .textops import _bm25_oracle

    return f"""
        WITH lex AS ({_bm25_oracle()}),
        lex_r AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                      AS INT) AS rank_lex
          FROM lex),
        q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
              WHERE vec_id = {QUERY_VEC_ID}),
        dense AS (
          SELECT vec_id,
                 list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                   / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(qv, qv))) AS cosine
          FROM embeddings, q
          WHERE vec_id <> {QUERY_VEC_ID}
          ORDER BY cosine DESC, vec_id
          LIMIT {DENSE_TOP}),
        dense_r AS (
          SELECT vec_id AS doc_id,
                 CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
                      AS INT) AS rank_dense
          FROM dense),
        fused AS (
          SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
                 rank_lex, rank_dense,
                 CAST(coalesce({RRF_SCALE} // ({RRF_K} + rank_lex), 0)
                      + coalesce({RRF_SCALE} // ({RRF_K} + rank_dense), 0)
                      AS BIGINT) AS rrf_ppb
          FROM lex_r l FULL OUTER JOIN dense_r d ON l.doc_id = d.doc_id)
        SELECT doc_id, rank_lex, rank_dense, rrf_ppb,
               CAST(rank AS INT) AS rank
        FROM (
          SELECT *, row_number() OVER (ORDER BY rrf_ppb DESC, doc_id)
                      AS rank
          FROM fused)
        WHERE rank <= {FUSE_TOP}
    """


ORACLES["hybrid_search_rrf"] = _hybrid_rrf_oracle()


#: self-retrieval eval knobs: query docs = doc_id < TFIDF_EVAL_Q (the
#: sq8_ranking_eval convention), query = the doc's TFIDF_EVAL_TERMS most
#: salient terms, hit window = TFIDF_EVAL_HIT_K. Shared by the oracle.
TFIDF_EVAL_Q = 8
TFIDF_EVAL_TERMS = 3
TFIDF_EVAL_HIT_K = 10


def tfidf_selfretrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-retrieval quality eval for the lexical (TF·IDF) tier — the
    retrieval twin of ``sq8_ranking_eval``: take each eval document's
    own ``TFIDF_EVAL_TERMS`` most salient terms as the query and ask
    where the source document ranks in the corpus answer. One row per
    query doc — ``(q_id, n_matched, self_rank, rr_ppb, hit_at_10)`` —
    the MRR/hit@K facts that decide whether the inverted-index stack
    (``posting_lists`` → term-sharded scoring) retrieves at all. A doc
    that can't find ITSELF from its own top terms signals a degenerate
    corpus slice (boilerplate floods the query terms).

    Scoring is INTEGER-EXACT end to end (unlike the float-normalized
    BM25 demo): score(d, Q) = Σ_{t∈Q} tf_d(t) · idf_nano(t) with
    idf_nano = round(ln((N+1)/(df+1))·1e9) — the single-rounding ln
    discipline; tf and df are exact counts, so scores, ranks, and the
    top-terms query selection (tf·idf DESC, term ASC) carry no ulp
    boundary anywhere. The self doc always matches its own terms, so
    its rank over the positive-score frame is its global rank (zero
    scores cannot precede it).

    Scale: one (doc, term) tf aggregate (the posting-list shuffle), one
    term-keyed df aggregate over it, a Q·TERMS-row broadcast query
    frame probing the postings (term-pruned — exactly the sharded-index
    access path), one (q, doc) score aggregate, one per-q rank window
    over the MATCHED frame (at 100 TB the per-query top-k rides
    TakeOrdered / the tiled-kNN machinery instead)."""
    from pyspark.sql import Window

    tf = (
        _tokens(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = persist_scoped(tf)
    n_frame = tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_frame))
        .select(
            "term",
            F.round(
                F.ln(
                    (F.col("n") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                )
                * 1e9,
                0,
            )
            .cast("long")
            .alias("idf_nano"),
        )
    )
    scored_terms = tf.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf_nano")).alias("w")
    )
    wq = Window.partitionBy("doc_id").orderBy(
        F.col("w").desc(), F.col("term").asc()
    )
    qterms = (
        scored_terms.filter(F.col("doc_id") < TFIDF_EVAL_Q)
        .select(
            F.col("doc_id").alias("q_id"),
            "term",
            F.row_number().over(wq).alias("tr"),
        )
        .filter(F.col("tr") <= TFIDF_EVAL_TERMS)
        .drop("tr")
    )
    matches = (
        tf.join(F.broadcast(qterms), "term")
        .join(idf, "term")
        .groupBy("q_id", "doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf_nano")).alias("score"))
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = matches.select(
        "q_id",
        "doc_id",
        F.count(F.lit(1)).over(Window.partitionBy("q_id")).alias(
            "n_matched"
        ),
        F.row_number().over(wr).alias("self_rank"),
    ).filter(F.col("doc_id") == F.col("q_id"))
    return ranked.select(
        "q_id",
        "n_matched",
        F.col("self_rank").cast("long").alias("self_rank"),
        F.expr("1000000000 div self_rank").alias("rr_ppb"),
        (F.col("self_rank") <= TFIDF_EVAL_HIT_K).alias("hit_at_10"),
    )


ORACLES["tfidf_selfretrieval_eval"] = f"""
    WITH {_TOKS_CTE},
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    nf AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    idf AS (
      SELECT term,
             CAST(round(ln(CAST(n + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE))
                        * 1e9, 0) AS BIGINT) AS idf_nano
      FROM (SELECT term, count(*) AS df FROM tf GROUP BY term), nf),
    st AS (
      SELECT tf.doc_id, tf.term, tf.tf * idf.idf_nano AS w
      FROM tf JOIN idf USING (term)),
    qterms AS (
      SELECT doc_id AS q_id, term FROM (
        SELECT doc_id, term,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY w DESC, term ASC) AS tr
        FROM st WHERE doc_id < {TFIDF_EVAL_Q}) t
      WHERE tr <= {TFIDF_EVAL_TERMS}),
    matches AS (
      SELECT q.q_id, tf.doc_id, sum(tf.tf * idf.idf_nano) AS score
      FROM tf JOIN qterms q USING (term) JOIN idf USING (term)
      GROUP BY q.q_id, tf.doc_id),
    ranked AS (
      SELECT q_id, doc_id,
             count(*) OVER (PARTITION BY q_id) AS n_matched,
             row_number() OVER (PARTITION BY q_id
               ORDER BY score DESC, doc_id ASC) AS self_rank
      FROM matches)
    SELECT q_id,
           CAST(n_matched AS BIGINT) AS n_matched,
           CAST(self_rank AS BIGINT) AS self_rank,
           CAST(1000000000 // self_rank AS BIGINT) AS rr_ppb,
           self_rank <= {TFIDF_EVAL_HIT_K} AS hit_at_10
    FROM ranked WHERE doc_id = q_id
"""

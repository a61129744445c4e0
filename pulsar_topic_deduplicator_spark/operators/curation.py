"""Corpus-curation operators: benchmark decontamination, sequence packing,
and PII scan/redaction.

NOT in the reference (its payload is opaque bytes — SURVEY.md §2.3); these
are the remaining training-data-pipeline steps between "deduplicated corpus"
(``operators/neardup.py``) and "training batches": strip eval-benchmark
contamination, pack documents into fixed-token training sequences, and
scrub personally-identifying strings.

Scale notes (100 TB):

* ``decontaminate_overlap`` — the benchmark n-gram set is derived from an
  eval suite, which is MB-sized in production, so it is ``F.broadcast``;
  the corpus side is a single scan + explode + map-side hash probe, no
  corpus-sized shuffle. The per-doc aggregate shuffles doc_id-keyed counts
  only (two ints per doc).
* ``pack_sequences`` — GPT-style concat-then-chunk packing. One shuffle
  (hash-bucket the docs), one window sort per bucket; bucket count scales
  with the cluster, and no state crosses buckets, so packing is
  embarrassingly parallel and incremental (a new shard = new buckets).
* ``pii_scan`` — pure codegen'd regexp expressions over the scan; zero
  shuffle, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_uint60
from ..functions.text import shingles, whitespace_tokens
from ..sources.io import load_table
from ._oracle_fragments import duck_stable_uint60
from .sampling import SPLIT_VAL

#: decontamination n-gram width. 4 balances precision and recall on the
#: test corpus's small vocabulary (3-grams collide by chance between
#: unrelated docs; 5-grams only catch verbatim passages).
DECON_N = 4

#: a corpus doc is dropped when at least this fraction of its distinct
#: n-grams also appear in the benchmark set (near-verbatim leak).
DECON_FLAG_RATE = 0.5

#: sequence-packing token budget (tokens per training sequence)
PACK_BUDGET = 512

#: number of independent packing streams; at cluster scale this is
#: O(executors × k) so every core packs its own stream
PACK_BUCKETS = 16

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split-percentile, 60-bit gram hash) — one row per DISTINCT
    word 4-gram per document. Grams travel as ints, not strings."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        (stable_uint60(F.col("text")) % 100).alias("pct"),
        F.explode(shingles(F.col("text"), DECON_N)).alias("gram"),
    ).select("doc_id", "pct", stable_uint60(F.col("gram")).alias("h"))


def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training-corpus document, the count and
    fraction of its distinct word 4-grams that also occur in the held-out
    benchmark split, plus the drop verdict.

    The benchmark here is the ``train_val_test_split`` test split (content
    keyed, so the same selector reproduces it anywhere); in production it
    would be an external eval-suite table — which is tiny, hence the
    broadcast. Docs shorter than 4 words have no grams and are absent from
    the output (vacuously uncontaminated), identically in the oracle.
    """
    grams = _doc_grams(spark, sf_dir)
    bench = (
        grams.filter(F.col("pct") >= SPLIT_VAL)
        .select("h")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = grams.filter(F.col("pct") < SPLIT_VAL)
    joined = corpus.join(F.broadcast(bench), "h", "left")
    n_grams = F.count(F.lit(1))
    n_cont = F.coalesce(F.sum("hit"), F.lit(0))
    rate = n_cont.cast("double") / n_grams.cast("double")
    return (
        joined.groupBy("doc_id")
        .agg(
            n_grams.alias("n_grams"),
            n_cont.alias("n_contaminated"),
            rate.alias("contamination_rate"),
            (rate >= DECON_FLAG_RATE).alias("contaminated"),
        )
    )


def _pack_placement(docs: DataFrame) -> DataFrame:
    """Pack placement over an arbitrary (doc_id, text) document set — the
    shared kernel of ``pack_sequences`` and ``training_batch_pipeline``."""
    n_tokens = F.size(whitespace_tokens(F.col("text")))
    base = docs.select(
        "doc_id",
        (stable_uint60(F.col("text")) % PACK_BUCKETS).alias("bucket"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    token_start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
        "token_start"
    )
    out = base.select("doc_id", "bucket", "n_tokens", token_start)
    return out.select(
        "doc_id",
        "bucket",
        "n_tokens",
        "token_start",
        F.floor(F.col("token_start") / PACK_BUDGET).alias("first_pack"),
        F.floor(
            (F.col("token_start") + F.col("n_tokens") - 1) / PACK_BUDGET
        ).alias("last_pack"),
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (whitespace tokens)
    in deterministic doc_id order within a content-hash bucket, then chunk
    the token stream into ``PACK_BUDGET``-token training sequences. Emits
    each document's placement: its bucket, token offset, and the first/last
    pack (sequence) it lands in — a doc longer than the remaining room
    SPANS packs, exactly like production packing with cross-doc attention
    masking.

    Deterministic and exactly SQL-expressible: placement is a running sum
    over (bucket, doc_id) order, so the same corpus packs identically on
    any cluster, any partitioning, any retry.
    """
    return _pack_placement(load_table(spark, sf_dir, "documents"))


def training_batch_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-to-training-batches composite, chaining every
    curation family end to end in the order a production run executes:

        exact dedup → near-dup removal → quality gate
          (``corpus_clean_pipeline``)
        → train-split selection (content-keyed, no eval leakage)
        → benchmark decontamination (drop flagged docs)
        → sequence packing (the training-batch manifest)

    Output = the pack placement of every surviving document. One DataFrame
    program, one composed oracle — the per-operator parities compose into
    a verified end-to-end pipeline. Every stage is the already-audited
    single-shuffle shape; the id sets joined here are survivor-sized and
    AQE broadcasts them when small.
    """
    from .pipeline import corpus_clean_pipeline
    from .sampling import SPLIT_TRAIN

    docs = load_table(spark, sf_dir, "documents")
    survivors = corpus_clean_pipeline(spark, sf_dir).select("doc_id")
    train = docs.filter(
        stable_uint60(F.col("text")) % 100 < SPLIT_TRAIN
    ).join(survivors, "doc_id", "left_semi")
    flagged = (
        decontaminate_overlap(spark, sf_dir)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    clean = train.join(flagged, "doc_id", "left_anti")
    return _pack_placement(clean.select("doc_id", "text"))


def _augmented_text(sel):
    """Deterministic PII test fixture: a hash-selected ~10% of docs get one
    synthetic contact line (one email, one IPv4, one phone) appended. The
    injection is the FIXTURE — the scan/redact expressions below are the
    production surface — and it is mirrored verbatim in the oracle, so
    extraction and redaction are value-checked against known-planted PII
    (same pattern as the multimodal synthetic assets)."""
    contact = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ph 555-010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return F.when(sel, F.concat(F.col("text"), contact)).otherwise(
        F.col("text")
    )


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII scan + redaction digest: counts of email / IPv4 /
    phone-pattern matches and the sha256 of the text after typed-sentinel
    redaction ([EMAIL] / [IP] / [PHONE], applied in that fixed order).

    The digest proves the redacted text byte-for-byte without shipping it;
    for an unselected doc it is simply the digest of the original text.
    All counting and replacement is codegen'd regexp over the scan — this
    runs at 100 TB as a single projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    sel = stable_uint60(F.concat(F.col("text"), F.lit("#pii"))) % 10 == 0
    aug = _augmented_text(sel)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL_RE, "[EMAIL]"), _IPV4_RE, "[IP]"
        ),
        _PHONE_RE,
        "[PHONE]",
    )
    return docs.select(
        "doc_id",
        "source",
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("n_phones"),
        (
            F.regexp_count(aug, F.lit(_EMAIL_RE))
            + F.regexp_count(aug, F.lit(_IPV4_RE))
            + F.regexp_count(aug, F.lit(_PHONE_RE))
            > 0
        ).alias("has_pii"),
        F.sha2(redacted, 256).alias("redacted_digest"),
    )


#: token budget for the temperature mixture (tokens, not docs)
MIXTURE_BUDGET_TOKENS = 12_000


def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixture under a global token budget: each
    source's sampling share is proportional to ``sqrt(n_tokens)`` (α = 0.5
    flattening — upweights small high-quality sources, the standard
    pretraining rebalance), target tokens = budget × share, and documents
    are kept by a deterministic content-hash rate so the kept set is
    reproducible on any cluster/retry.

    Per-source report: corpus size, weight, share, target, keep rate, and
    the realized kept doc/token counts.

    FLOAT-DETERMINISM: the only order-sensitive float operation is the
    weight-sum denominator, which is computed as an EXPLICIT left fold over
    the source-sorted weight array (``F.aggregate`` here, ``list_reduce``
    in the oracle) — a plain ``sum()`` over doubles is reduction-order-
    dependent and would flake the cross-engine hash. Everything else is a
    single-division / single-multiply chain on identical operands. The
    per-source aggregate is source-cardinality-sized (a handful of rows),
    so the crossJoin with the fold scalar and the broadcast of rates back
    onto the corpus are both KB-sized at any corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(whitespace_tokens(F.col("text")))
    per_doc = docs.select(
        "source",
        n_tokens.alias("doc_tokens"),
        (
            (
                stable_uint60(F.concat(F.col("text"), F.lit("#mix")))
                % 1_000_000
            ).cast("double")
            / 1e6
        ).alias("u"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_tokens").alias("n_tokens"),
    )
    per_src = per_src.withColumn(
        "weight", F.sqrt(F.col("n_tokens").cast("double"))
    )
    total = per_src.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "weight"))),
            F.lit(0.0),
            lambda acc, x: acc + x["weight"],
        ).alias("total_w")
    )
    rep = per_src.crossJoin(F.broadcast(total))
    share = F.col("weight") / F.col("total_w")
    target = share * F.lit(float(MIXTURE_BUDGET_TOKENS))
    keep_rate = F.least(
        F.lit(1.0), target / F.col("n_tokens").cast("double")
    )
    rep = rep.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        share.alias("share"),
        target.alias("target_tokens"),
        keep_rate.alias("keep_rate"),
    )
    kept = (
        per_doc.join(
            F.broadcast(rep.select("source", "keep_rate")), "source"
        )
        .filter(F.col("u") < F.col("keep_rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("doc_tokens").alias("n_tokens_kept"),
        )
    )
    return (
        rep.join(kept, "source", "left")
        .withColumn("n_docs_kept", F.coalesce("n_docs_kept", F.lit(0)))
        .withColumn("n_tokens_kept", F.coalesce("n_tokens_kept", F.lit(0)))
    )


#: per-source document cap (docs kept per source, best-quality first)
CAP_PER_SOURCE = 15

#: stage-1 salt fan-out for the cap: a hot domain's sort is split across
#: this many bounded windows before the final per-source rank
CAP_SALTS = 4


def cap_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — "keep the best ``CAP_PER_SOURCE`` docs per
    source" (the anti-over-representation step of web-corpus curation),
    ranked by the shared quality score with doc_id as the total-order
    tiebreak.

    Scale shape: a naive single window per source sorts EVERY row of a hot
    domain in one task — the classic skew killer when one domain is 10% of
    a 100 TB crawl. This is the two-stage salted top-K instead: stage 1
    ranks within (source, salt) — salt from the content hash, so the hot
    domain's sort is split across ``CAP_SALTS`` bounded windows — and keeps
    at most CAP rows per salt; stage 2 ranks the ≤ CAP_SALTS×CAP survivors
    per source. The prefilter is lossless: under a total order, a row in
    the true per-source top-CAP ranks ≤ CAP within its salt subgroup too
    (subgroup rank ≤ group rank) — an identity pinned against the direct
    single-window plan in tests/test_curation.py.
    """
    from .textops import quality_expr

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        quality_expr(F.col("text")).alias("quality"),
        (
            stable_uint60(F.concat(F.col("text"), F.lit("#cap")))
            % CAP_SALTS
        ).alias("salt"),
    )
    w1 = Window.partitionBy("source", "salt").orderBy(
        F.col("quality").desc(), "doc_id"
    )
    pre = base.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= CAP_PER_SOURCE
    )
    w2 = Window.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    return (
        pre.select("doc_id", "source", "quality")
        .withColumn(
            "rank_in_source", F.row_number().over(w2).cast("bigint")
        )
        .filter(F.col("rank_in_source") <= CAP_PER_SOURCE)
    )


#: curriculum tier thresholds on the quality score (≥ first ⇒ tier 0 =
#: easiest/cleanest, trained first)
CURRICULUM_TIERS = (0.9, 0.75, 0.6)

#: per-tier shuffle buckets; at cluster scale O(executors × k), so every
#: core sorts only its own bucket
CURRICULUM_BUCKETS = 8


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum ordering: every document gets a GLOBAL
    training position — clean tiers first, hash-shuffled within a tier —
    WITHOUT a global sort (`orderBy` over the corpus would funnel 100 TB
    through a range partitioner just to number rows).

    Construction: tier = fixed quality thresholds (zero-shuffle
    projection); bucket = content hash; rank = bounded window within
    (tier, bucket); then the (tier, bucket) row COUNTS — O(tiers×buckets)
    rows, KB-sized at any corpus scale — are cumulated into start offsets
    with a window over that tiny aggregate and broadcast back. global_pos
    = offset + rank_in_bucket − 1 is an exact permutation of 0..n−1
    (pinned in tests/test_curation.py) built from bounded sorts only; a
    trainer reads shards in (tier, bucket, rank) order with no further
    shuffle.
    """
    from .textops import quality_expr

    docs = load_table(spark, sf_dir, "documents")
    q = quality_expr(F.col("text"))
    tier = (
        F.when(q >= CURRICULUM_TIERS[0], 0)
        .when(q >= CURRICULUM_TIERS[1], 1)
        .when(q >= CURRICULUM_TIERS[2], 2)
        .otherwise(3)
    )
    base = docs.select(
        "doc_id",
        tier.alias("tier"),
        (
            stable_uint60(F.concat(F.col("text"), F.lit("#cur")))
            % CURRICULUM_BUCKETS
        ).alias("bucket"),
        stable_uint60(F.concat(F.col("text"), F.lit("#ord"))).alias(
            "ord_key"
        ),
    )
    w = Window.partitionBy("tier", "bucket").orderBy("ord_key", "doc_id")
    ranked = base.withColumn(
        "rank_in_bucket", F.row_number().over(w).cast("bigint")
    )
    # counts come from `base`, NOT `ranked`: group sizes don't need the
    # window sort, and deriving them pre-window keeps the per-bucket sort
    # from executing twice on the forked (uncached) lineage
    counts = base.groupBy("tier", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    # single-partition window is deliberate: `counts` is tiers×buckets rows
    off_w = Window.orderBy("tier", "bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "tier",
        "bucket",
        (F.sum("n").over(off_w) - F.col("n")).alias("offset"),
    )
    return ranked.join(F.broadcast(offsets), ["tier", "bucket"]).select(
        "doc_id",
        "tier",
        "bucket",
        "rank_in_bucket",
        (F.col("offset") + F.col("rank_in_bucket") - 1).alias("global_pos"),
    )


#: words of leading content that define a synthetic page address — short
#: enough that re-crawls (same opening, drifted tail) collide, long enough
#: that unrelated docs don't
URL_PREFIX_WORDS = 8

#: crawl-clock epoch for the synthetic crawl_ts (2024-01-01 UTC; doc_id is
#: the crawl order, one second apart — deterministic on both engines)
URL_CRAWL_EPOCH = 1_704_067_200


def _doc_urls(docs: DataFrame) -> DataFrame:
    """Synthetic-but-deterministic crawl identity for the documents corpus
    (VERDICT r8 item 5 — the corpus carries no url column, so one is
    DERIVED, identically on both engines): the pseudo-host is
    ``source.lang.example`` and the path is the MD5 of the first
    URL_PREFIX_WORDS words — a re-crawl of the same page shares source,
    language and opening content, which is exactly the population the
    boilerplate-prefix tier already demonstrated exists. ``crawl_ts`` is
    the epoch plus doc_id seconds (ingest order = crawl order)."""
    from ..functions.text import whitespace_tokens

    domain = F.concat_ws(".", "source", "lang", F.lit("example"))
    prefix = F.array_join(
        F.slice(whitespace_tokens(F.col("text")), 1, URL_PREFIX_WORDS), " "
    )
    return docs.select(
        "doc_id",
        "text",
        domain.alias("domain"),
        F.concat(
            F.lit("https://"), domain, F.lit("/"), F.md5(prefix)
        ).alias("url"),
        F.timestamp_seconds(F.lit(URL_CRAWL_EPOCH) + F.col("doc_id")).alias(
            "crawl_ts"
        ),
    )


def dedup_docs_by_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact URL-granularity dedup, keep-FIRST by crawl time — the pass
    every production crawl pipeline runs BEFORE content dedup (the same
    page fetched on successive crawls shouldn't compete as near-dup
    content). Returns ``(url, doc_id, crawl_ts, n_crawls)``: the earliest
    crawl per url and how many crawls it collapsed.

    Plan: one ``min(struct(crawl_ts, doc_id))`` aggregate keyed on the
    url — the ``dedup_exact_keep_first`` shape (partial agg collapses
    duplicates map-side; the url key is an MD5 path under a ~uniform host
    spread, no skew; one shuffle of one row per (url, partition))."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return (
        _doc_urls(docs)
        .groupBy("url")
        .agg(
            F.min(F.struct("crawl_ts", "doc_id")).alias("w"),
            F.count(F.lit(1)).alias("n_crawls"),
        )
        .select(
            "url",
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.crawl_ts").alias("crawl_ts"),
            "n_crawls",
        )
    )


def domain_attrition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DOMAIN curation funnel — the domain-axis twin of
    ``corpus_curation_report`` (which reports per mixture source): how many
    docs each pseudo-domain contributes after each sequential stage,
    url keep-first → exact content dedup → Gopher quality gate. The
    per-domain attrition table is what a crawl operator reads to spot
    domains that are all re-crawls or all boilerplate.

    Same scale shape as the per-source report: survivor-id sets (join-
    reduced, persisted because consumed twice), left-joined back, one
    per-domain aggregate."""
    from ..cachereg import persist_scoped
    from .textops import gopher_pass

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    u = _doc_urls(docs)
    url_ids = persist_scoped(
        u.groupBy("url")
        .agg(F.min(F.struct("crawl_ts", "doc_id")).alias("w"))
        .select(F.col("w.doc_id").alias("doc_id"))
    )
    d1 = u.join(url_ids, "doc_id", "left_semi")
    exact_ids = persist_scoped(
        d1.select(F.sha2(F.col("text"), 256).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d2 = d1.join(exact_ids, "doc_id", "left_semi")
    quality_ids = d2.filter(gopher_pass(F.col("text"))).select("doc_id")

    flagged = (
        u.select("doc_id", "domain")
        .join(url_ids.withColumn("s1", F.lit(1)), "doc_id", "left")
        .join(exact_ids.withColumn("s2", F.lit(1)), "doc_id", "left")
        .join(quality_ids.withColumn("s3", F.lit(1)), "doc_id", "left")
    )
    return flagged.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("s1").alias("n_after_url"),
        F.count("s2").alias("n_after_exact"),
        F.count("s3").alias("n_after_quality"),
    )


_H60_TEXT = duck_stable_uint60("text")
_GRAM4 = " || ' ' || ".join(f"w[i+{k}]" for k in range(DECON_N))

#: shared CTE: distinct 4-gram hashes per doc + the doc's split percentile
_DECON_CTE = f"""
    words AS (SELECT doc_id, {_H60_TEXT} % 100 AS pct,
                     string_split(text, ' ') AS w
              FROM documents),
    grams AS (
      SELECT doc_id, pct,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - {DECON_N - 1}, 0)),
               i -> {_GRAM4}))) AS gram
      FROM words),
    sh AS (SELECT doc_id, pct,
                  {duck_stable_uint60("gram")} AS h
           FROM grams)
"""

_DUCK_CONTACT = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.7 ph 555-010-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

ORACLES: dict[str, str] = {
    "token_budget_mixture": f"""
        WITH per_doc AS (
          SELECT source,
                 len(string_split(text, ' ')) AS doc_tokens,
                 CAST({duck_stable_uint60("text || '#mix'")} % 1000000
                      AS DOUBLE) / 1e6 AS u
          FROM documents),
        per_src AS (
          SELECT source, count(*) AS n_docs,
                 sum(doc_tokens) AS n_tokens,
                 sqrt(CAST(sum(doc_tokens) AS DOUBLE)) AS weight
          FROM per_doc GROUP BY source),
        tot AS (
          -- explicit source-sorted left fold: mirrors the engine's
          -- F.aggregate so the double sum is reduction-order-identical
          SELECT list_reduce(
                   list_prepend(0.0, list_transform(
                     list_sort(list({{'s': source, 'w': weight}})),
                     r -> r.w)),
                   (a, b) -> a + b) AS total_w
          FROM per_src),
        rep AS (
          SELECT source, n_docs, n_tokens, weight,
                 weight / total_w AS share,
                 weight / total_w * {float(MIXTURE_BUDGET_TOKENS)} AS target_tokens,
                 least(1.0, weight / total_w * {float(MIXTURE_BUDGET_TOKENS)}
                       / CAST(n_tokens AS DOUBLE)) AS keep_rate
          FROM per_src, tot),
        kept AS (
          SELECT d.source, count(*) AS n_docs_kept,
                 sum(d.doc_tokens) AS n_tokens_kept
          FROM per_doc d JOIN rep r ON d.source = r.source
          WHERE d.u < r.keep_rate
          GROUP BY d.source)
        SELECT r.source, CAST(r.n_docs AS BIGINT) AS n_docs,
               CAST(r.n_tokens AS BIGINT) AS n_tokens,
               r.weight, r.share, r.target_tokens, r.keep_rate,
               CAST(coalesce(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
               CAST(coalesce(k.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
        FROM rep r LEFT JOIN kept k ON r.source = k.source
    """,
    "decontaminate_overlap": f"""
        WITH {_DECON_CTE},
        bench AS (SELECT DISTINCT h FROM sh WHERE pct >= {SPLIT_VAL}),
        corpus AS (SELECT doc_id, h FROM sh WHERE pct < {SPLIT_VAL})
        SELECT doc_id,
               count(*) AS n_grams,
               count(*) FILTER (h IN (SELECT h FROM bench)) AS n_contaminated,
               CAST(count(*) FILTER (h IN (SELECT h FROM bench)) AS DOUBLE)
                 / count(*) AS contamination_rate,
               CAST(count(*) FILTER (h IN (SELECT h FROM bench)) AS DOUBLE)
                 / count(*) >= {DECON_FLAG_RATE} AS contaminated
        FROM corpus
        GROUP BY doc_id
    """,
    "pack_sequences": f"""
        WITH base AS (
          SELECT doc_id,
                 {_H60_TEXT} % {PACK_BUCKETS} AS bucket,
                 len(string_split(text, ' ')) AS n_tokens
          FROM documents),
        placed AS (
          SELECT doc_id, bucket, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS BIGINT) AS token_start
          FROM base)
        SELECT doc_id, bucket, n_tokens, token_start,
               CAST(floor(CAST(token_start AS DOUBLE) / {PACK_BUDGET})
                    AS BIGINT) AS first_pack,
               CAST(floor(CAST(token_start + n_tokens - 1 AS DOUBLE)
                    / {PACK_BUDGET}) AS BIGINT) AS last_pack
        FROM placed
    """,
    "training_batch_pipeline": "",  # composed below (needs sibling oracles)
    "cap_docs_per_source": "",  # composed below (needs textops QUALITY_SQL)
    "curriculum_order": "",  # composed below (needs textops QUALITY_SQL)
    "pii_scan": f"""
        WITH aug AS (
          SELECT doc_id, source,
                 CASE WHEN {duck_stable_uint60("text || '#pii'")} % 10 = 0
                      THEN text || {_DUCK_CONTACT}
                      ELSE text END AS t
          FROM documents)
        SELECT doc_id, source,
               len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(t, '{_IPV4_RE}')) AS n_ipv4,
               len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
               len(regexp_extract_all(t, '{_EMAIL_RE}'))
                 + len(regexp_extract_all(t, '{_IPV4_RE}'))
                 + len(regexp_extract_all(t, '{_PHONE_RE}')) > 0 AS has_pii,
               sha256(regexp_replace(regexp_replace(regexp_replace(
                 t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                    '{_IPV4_RE}', '[IP]', 'g'),
                    '{_PHONE_RE}', '[PHONE]', 'g')) AS redacted_digest
        FROM aug
    """,
}


def _training_batch_oracle() -> str:
    """Composes the ALREADY-REGISTERED sibling oracles (corpus clean chain,
    decontamination) with the train-split filter and the pack CTE — the
    end-to-end SQL is built from the same verified fragments the per-stage
    oracles use, so a per-operator divergence and a composition divergence
    are distinguishable."""
    from .pipeline import ORACLES as PIPELINE_ORACLES

    from .sampling import SPLIT_TRAIN

    clean_sql = PIPELINE_ORACLES["corpus_clean_pipeline"].strip()
    decon_sql = ORACLES["decontaminate_overlap"].strip()
    return f"""
        WITH train AS (
          SELECT doc_id, text FROM documents
          WHERE {_H60_TEXT} % 100 < {SPLIT_TRAIN}
            AND doc_id IN (SELECT doc_id FROM ({clean_sql}))
            AND doc_id NOT IN (
              SELECT doc_id FROM ({decon_sql}) WHERE contaminated)
        ),
        base AS (
          SELECT doc_id,
                 {_H60_TEXT} % {PACK_BUCKETS} AS bucket,
                 len(string_split(text, ' ')) AS n_tokens
          FROM train),
        placed AS (
          SELECT doc_id, bucket, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS BIGINT) AS token_start
          FROM base)
        SELECT doc_id, bucket, n_tokens, token_start,
               CAST(floor(CAST(token_start AS DOUBLE) / {PACK_BUDGET})
                    AS BIGINT) AS first_pack,
               CAST(floor(CAST(token_start + n_tokens - 1 AS DOUBLE)
                    / {PACK_BUDGET}) AS BIGINT) AS last_pack
        FROM placed
    """


ORACLES["training_batch_pipeline"] = _training_batch_oracle()


def _quality_rank_oracles() -> dict[str, str]:
    """Oracles for the quality-ranked operators; composed at import time
    from textops.QUALITY_SQL so the score arithmetic is textually shared
    with the already-verified ``quality_score`` oracle."""
    from .textops import QUALITY_SQL

    cap = f"""
        WITH q AS (
          SELECT doc_id, source, {QUALITY_SQL} AS quality,
                 {duck_stable_uint60("text || '#cap'")} % {CAP_SALTS} AS salt
          FROM documents),
        pre AS (
          SELECT doc_id, source, quality,
                 row_number() OVER (PARTITION BY source, salt
                                    ORDER BY quality DESC, doc_id) AS r1
          FROM q),
        fin AS (
          SELECT doc_id, source, quality,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY quality DESC, doc_id)
                   AS rank_in_source
          FROM pre WHERE r1 <= {CAP_PER_SOURCE})
        SELECT doc_id, source, quality,
               CAST(rank_in_source AS BIGINT) AS rank_in_source
        FROM fin WHERE rank_in_source <= {CAP_PER_SOURCE}
    """
    t0, t1, t2 = CURRICULUM_TIERS
    cur = f"""
        WITH base AS (
          SELECT doc_id,
                 CASE WHEN {QUALITY_SQL} >= {t0} THEN 0
                      WHEN {QUALITY_SQL} >= {t1} THEN 1
                      WHEN {QUALITY_SQL} >= {t2} THEN 2
                      ELSE 3 END AS tier,
                 {duck_stable_uint60("text || '#cur'")}
                   % {CURRICULUM_BUCKETS} AS bucket,
                 {duck_stable_uint60("text || '#ord'")} AS ord_key
          FROM documents),
        ranked AS (
          SELECT doc_id, tier, bucket,
                 CAST(row_number() OVER (PARTITION BY tier, bucket
                        ORDER BY ord_key, doc_id) AS BIGINT)
                   AS rank_in_bucket
          FROM base),
        counts AS (
          SELECT tier, bucket, count(*) AS n
          FROM ranked GROUP BY tier, bucket),
        offsets AS (
          SELECT tier, bucket,
                 sum(n) OVER (ORDER BY tier, bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                   AS off
          FROM counts)
        SELECT r.doc_id, r.tier, r.bucket, r.rank_in_bucket,
               CAST(o.off + r.rank_in_bucket - 1 AS BIGINT) AS global_pos
        FROM ranked r JOIN offsets o USING (tier, bucket)
    """
    return {"cap_docs_per_source": cap, "curriculum_order": cur}


ORACLES.update(_quality_rank_oracles())


#: DSIR (Xie et al. 2023, "Data Selection for Language Models via
#: Importance Resampling", arXiv 2302.03169) knobs — part of the model
#: definition, shared verbatim with the oracle. Features are hashed
#: unigrams into DSIR_BUCKETS buckets (the paper hashes uni+bigrams into
#: 10k; the fixture vocabulary is tiny, so 256 keeps buckets populated).
DSIR_BUCKETS = 256
#: the "target domain" sample the raw pool is re-weighted toward — a
#: source label plays the paper's high-quality target corpus
DSIR_TARGET_SOURCE = "src0"
#: docs selected from the raw pool (top importance weights)
DSIR_K = 100


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scoring — the shared kernel of ``dsir_select`` /
    ``dsir_resample``: score every raw-pool document by its hashed
    n-gram importance weight log(p_target(x)/p_raw(x)) under two
    bag-of-hashed-features unigram models (add-one smoothing over
    DSIR_BUCKETS buckets) — the re-weighting
    that tilts a 100 TB crawl toward a small
    high-quality target domain. Target = docs whose ``source`` is
    DSIR_TARGET_SOURCE; raw pool = everything else (scored side).

    Cross-engine exactness: bucket counts are exact integers; each
    bucket's log-ratio is pinned to integer nano-nats (the BM25/bigram-LM
    acceptance: only the libm ln can drift, absorbed by the 1e-9
    rounding); a doc's weight is an exact BIGINT sum of its tokens' terms,
    so the top-K cut (weight desc, doc_id asc) never straddles a float
    boundary.

    Plan: token explode → bucket via the oracle-reproducible 60-bit hash →
    TWO bucket-count aggregates (map-side combined, ≤ DSIR_BUCKETS rows
    each — the trained importance model, materialize once at 100 TB) →
    broadcast the bucket-term table back onto the token stream → one
    doc-keyed sum (the only corpus-sized shuffle; the model tables are
    KB-sized). Returns (doc_id, n_tokens, weight_nano) for every raw-pool
    doc; the selection variants add their TakeOrdered cut on top."""
    from ..functions.hashing import stable_uint60

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id",
        (F.col("source") == DSIR_TARGET_SOURCE).alias("is_target"),
        F.explode(whitespace_tokens(F.col("text"))).alias("w"),
    ).withColumn(
        "b", F.pmod(stable_uint60(F.col("w")), F.lit(DSIR_BUCKETS))
    )
    from ..cachereg import persist_scoped

    toks = persist_scoped(toks)  # consumers: two count aggs + scoring pass
    counts = toks.groupBy("b").agg(
        F.sum(F.col("is_target").cast("long")).alias("ct"),
        F.sum((~F.col("is_target")).cast("long")).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    # nano-nat log-ratio per bucket: ln((ct+1)/(tt+B)) - ln((cr+1)/(tr+B))
    term = F.round(
        (
            F.ln(
                (F.col("ct") + 1).cast("double")
                / (F.col("tt") + DSIR_BUCKETS).cast("double")
            )
            - F.ln(
                (F.col("cr") + 1).cast("double")
                / (F.col("tr") + DSIR_BUCKETS).cast("double")
            )
        )
        * 1e9,
        0,
    ).cast("long")
    model = (
        counts.crossJoin(F.broadcast(totals))
        .select("b", term.alias("term"))
    )
    scored = (
        toks.filter(~F.col("is_target"))
        .join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("term").alias("weight_nano"),
        )
    )
    return scored


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection, top-K variant: score every raw-pool document
    by its hashed n-gram importance weight log(p_target(x)/p_raw(x)) and
    keep the DSIR_K highest — see ``_dsir_scored`` for the model, the
    exactness argument (integer nano-nat weights: the top-K cut never
    straddles a float boundary) and the one-corpus-shuffle plan."""
    return (
        _dsir_scored(spark, sf_dir)
        .orderBy(F.col("weight_nano").desc(), F.col("doc_id"))
        .limit(DSIR_K)
    )


#: Gumbel-key uniform: the doc-keyed hash reduced mod 2^52, +1, over
#: 2^52+1 ⇒ u ∈ (0, 1) STRICTLY EVEN AFTER IEEE ROUNDING — numerator
#: (≤ 2^52) and divisor (2^52+1, inside the exact-integer double range)
#: are both exactly representable, and max u = 2^52/(2^52+1) ≈ 1−2.2e−16
#: rounds below 1−2^−53 < 1, so -ln(u) can never hit 0 and the key never
#: saturates to ±inf. (A 60-bit numerator/divisor pair does NOT have this
#: property: float(2^60+2) IS 2^60 — double spacing there is 256 — so a
#: hash within 128 of 2^60 would round u to exactly 1.0 and blow the key
#: to +inf, ~2^-53 per doc.) Shared verbatim with the oracle.
_GUMBEL_MOD = 2**52
_GUMBEL_DIV = float(2**52 + 1)


def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance RESAMPLING — the paper's actual selection step
    (top-K on raw weights over-selects near-identical high-weight docs;
    Xie et al. 2023 §3 resample ∝ exp(weight) instead): draw DSIR_K docs
    WITHOUT replacement with probability proportional to their importance
    weight via Gumbel-top-k (Efraimidis-Spirakis weighted reservoir /
    Gumbel-max in the log domain: key = log w + Gumbel noise; our
    weight_nano IS log w in nano-nats already, so the key is one integer
    sum). The "noise" is deterministic — Gumbel-inverse-CDF of a
    content-keyed uniform u = (hash(doc_id) mod 2^52 + 1)/(2^52+1) — so the sample
    is reproducible on any cluster, any retry, and in the oracle, while
    remaining a faithful ∝-weight draw ACROSS corpora (the hash varies
    per doc). G is pinned to integer nano-nats (the BM25/bigram-LM libm
    acceptance: the two nested ln calls are the only drift source,
    absorbed by the 1e-9 rounding).

    Plan: identical to ``dsir_select`` (the scored frame is the same one
    corpus shuffle) plus a zero-shuffle key projection and TakeOrdered."""
    from ..functions.hashing import stable_uint60

    scored = _dsir_scored(spark, sf_dir)
    u = (
        (
            stable_uint60(F.col("doc_id").cast("string"))
            % F.lit(_GUMBEL_MOD)
            + 1
        ).cast("double")
        / F.lit(_GUMBEL_DIV)
    )
    g_nano = F.round(-F.ln(-F.ln(u)) * 1e9, 0).cast("long")
    keyed = scored.withColumn("key_nano", F.col("weight_nano") + g_nano)
    return (
        keyed.orderBy(F.col("key_nano").desc(), F.col("doc_id"))
        .limit(DSIR_K)
        .select("doc_id", "n_tokens", "weight_nano", "key_nano")
    )


def _dsir_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    b = f"{duck_stable_uint60('w')} % {DSIR_BUCKETS}"
    return f"""
        WITH toks AS (
          SELECT doc_id, source = '{DSIR_TARGET_SOURCE}' AS is_target,
                 {b} AS b
          FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
                FROM documents WHERE text IS NOT NULL)),
        counts AS (
          SELECT b,
                 count(CASE WHEN is_target THEN 1 END) AS ct,
                 count(CASE WHEN NOT is_target THEN 1 END) AS cr
          FROM toks GROUP BY b),
        totals AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM counts),
        model AS (
          SELECT b,
                 CAST(round(
                   (ln(CAST(ct + 1 AS DOUBLE)
                       / CAST(tt + {DSIR_BUCKETS} AS DOUBLE))
                    - ln(CAST(cr + 1 AS DOUBLE)
                         / CAST(tr + {DSIR_BUCKETS} AS DOUBLE)))
                   * 1000000000.0, 0) AS BIGINT) AS term
          FROM counts, totals)
        , scored AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(term) AS BIGINT) AS weight_nano
          FROM toks JOIN model USING (b)
          WHERE NOT is_target
          GROUP BY doc_id)
        SELECT doc_id, n_tokens, weight_nano FROM scored
        ORDER BY weight_nano DESC, doc_id
        LIMIT {DSIR_K}
    """


def _dsir_resample_oracle() -> str:
    from ._oracle_fragments import duck_stable_uint60

    prefix = _dsir_oracle().rsplit("SELECT doc_id, n_tokens", 1)[0]
    u = (
        f"CAST({duck_stable_uint60('CAST(doc_id AS VARCHAR)')}"
        f" % {_GUMBEL_MOD} + 1 AS DOUBLE) / {_GUMBEL_DIV!r}"
    )
    return f"""{prefix}
        SELECT doc_id, n_tokens, weight_nano,
               weight_nano
               + CAST(round(-ln(-ln({u})) * 1000000000.0, 0) AS BIGINT)
                 AS key_nano
        FROM scored
        ORDER BY key_nano DESC, doc_id
        LIMIT {DSIR_K}
    """


ORACLES["dsir_select"] = _dsir_oracle()
ORACLES["dsir_resample"] = _dsir_resample_oracle()


def _url_oracles() -> dict[str, str]:
    from .textops import GOPHER_PASS_SQL, gopher_stats_sql

    url_sql = (
        "'https://' || source || '.' || lang || '.example/' || "
        "md5(array_to_string(list_slice(string_split(text, ' '), 1, "
        f"{URL_PREFIX_WORDS}), ' '))"
    )
    url_cte = f"""
        u AS (
          SELECT doc_id, text,
                 source || '.' || lang || '.example' AS domain,
                 {url_sql} AS url,
                 make_timestamp(CAST(({URL_CRAWL_EPOCH} + doc_id) AS BIGINT)
                                * 1000000) AS crawl_ts
          FROM documents WHERE text IS NOT NULL)"""
    dedup = f"""
        WITH {url_cte},
        r AS (
          SELECT url, doc_id, crawl_ts,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY crawl_ts, doc_id) AS rn,
                 count(*) OVER (PARTITION BY url) AS n
          FROM u)
        SELECT url, doc_id, crawl_ts, CAST(n AS BIGINT) AS n_crawls
        FROM r WHERE rn = 1
    """
    report = f"""
        WITH {url_cte},
        url_ids AS (
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (PARTITION BY url
                     ORDER BY crawl_ts, doc_id) AS rn
            FROM u) rr WHERE rn = 1),
        e AS (
          SELECT min(doc_id) AS doc_id FROM u
          WHERE doc_id IN (SELECT doc_id FROM url_ids)
          GROUP BY sha256(text)),
        g AS (
          SELECT doc_id
          FROM ({gopher_stats_sql(
              src="(SELECT * FROM u WHERE doc_id IN (SELECT doc_id FROM e)) d2"
          )}) stats
          WHERE {GOPHER_PASS_SQL})
        SELECT d.domain,
               count(*) AS n_docs,
               count(s1.doc_id) AS n_after_url,
               count(e.doc_id) AS n_after_exact,
               count(g.doc_id) AS n_after_quality
        FROM u d
        LEFT JOIN url_ids s1 ON d.doc_id = s1.doc_id
        LEFT JOIN e ON d.doc_id = e.doc_id
        LEFT JOIN g ON d.doc_id = g.doc_id
        GROUP BY d.domain
    """
    return {"dedup_docs_by_url": dedup, "domain_attrition_report": report}


ORACLES.update(_url_oracles())


#: greedy max-coverage rounds (the operator contracts the R-round pick
#: sequence; greedy gives the classic (1 - 1/e) coverage guarantee)
COVERAGE_ROUNDS = 5


def greedy_coverage_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Submodular CORESET selection: greedily pick the COVERAGE_ROUNDS
    documents that maximize cumulative 3-gram-shingle coverage — each
    round takes the doc adding the most not-yet-covered shingles (ties →
    smallest doc_id). This is greedy maximum coverage (Nemhauser 1978's
    (1−1/e) guarantee), the selection objective behind "maximize
    diversity of what the model sees" curation passes — the coverage
    complement of MMR (embedding diversity) and DSIR (distribution
    matching).

    Returns one row per round: ``(round, doc_id, gain, covered_total)``
    — the pick, its marginal gain, and cumulative distinct coverage; the
    unrolled CTE oracle replays the identical greedy argmaxes.

    Scale: the shingle frame builds once (persisted); each round is one
    broadcast anti-join against the covered set + a doc-keyed count +
    a one-row argmax. Per-round driver traffic is ONE winner row and
    the covered-set checkpoint is shingle-universe-bounded — the
    codebook discipline (like k-means centroids/MMR pools), with R
    fixed and small."""
    from ..cachereg import persist_scoped
    from .neardup import _shingle_hashes

    sh = persist_scoped(_shingle_hashes(spark, sf_dir))
    covered = None
    out_rows = []
    for r in range(1, COVERAGE_ROUNDS + 1):
        rem = (
            sh
            if covered is None
            else sh.join(F.broadcast(covered), "h", "anti")
        )
        top = (
            rem.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.desc("gain"), "doc_id")
            .limit(1)
            .collect()[0]
        )  # scalar: the round's winner
        win = sh.filter(F.col("doc_id") == top["doc_id"]).select("h")
        covered = (
            win
            if covered is None
            else covered.unionByName(win).distinct()
        ).localCheckpoint(eager=True)
        out_rows.append(
            (r, int(top["doc_id"]), int(top["gain"]), covered.count())
        )
    return spark.createDataFrame(
        out_rows, "round long, doc_id long, gain long, covered_total long"
    )


def _coverage_oracle() -> str:
    from .neardup import _SHINGLES_CTE

    steps = []
    finals = []
    prev_c = None
    for r in range(1, COVERAGE_ROUNDS + 1):
        rem = (
            "sh"
            if prev_c is None
            else f"(SELECT s.doc_id, s.h FROM sh s ANTI JOIN {prev_c} c ON s.h = c.h)"
        )
        steps.append(
            f"""w{r} AS MATERIALIZED (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
          FROM {rem} r{r} GROUP BY doc_id
          ORDER BY gain DESC, doc_id LIMIT 1)"""
        )
        c_def = f"SELECT DISTINCT h FROM sh WHERE doc_id = (SELECT doc_id FROM w{r})"
        if prev_c is not None:
            c_def = f"SELECT h FROM {prev_c} UNION {c_def}"
        steps.append(f"c{r} AS MATERIALIZED ({c_def})")
        finals.append(
            f"SELECT {r} AS round, doc_id, gain,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM c{r}) AS covered_total"
            f" FROM w{r}"
        )
        prev_c = f"c{r}"
    chain = ",\n    ".join(steps)
    body = "\n    UNION ALL\n    ".join(finals)
    return f"""
    WITH {_SHINGLES_CTE},
    {chain}
    {body}
    """


ORACLES["greedy_coverage_select"] = _coverage_oracle()


# ─── Output-shard planning (distributed global prefix sum) ──────────────────

#: tokens per output shard (the webdataset/TFRecord size target, scaled to
#: the fixture corpus; shared verbatim by the oracle)
SHARD_CAPACITY = 1024
#: coarse-bucket width for the two-stage global prefix sum (doc_id span per
#: stage-1 partial; the bucket-sum frame is n_docs/width rows — KB at any SF)
SHARD_BUCKET_WIDTH = 256


def shard_plan_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(doc_id, n_tokens, token_start, shard_id, offset_tokens)`` — the
    output-shard plan: stream the corpus in deterministic doc_id order and
    cut it into SHARD_CAPACITY-token shards (webdataset/TFRecord-style
    size-targeted output files). A document starts in the shard its running
    token offset falls in (``shard_id = token_start div capacity``) — docs
    are not split, so shards overflow by at most one document, the standard
    next-fit shard planner.

    The point of this operator is the GLOBAL prefix sum done the way 100 TB
    requires: a naive ``sum() OVER (ORDER BY doc_id)`` is a single-partition
    window — one task sorts the corpus. Here it is the classic TWO-STAGE
    scan: (1) per-bucket token sums over coarse doc_id ranges (a KB-sized
    frame: n_docs/width rows), (2) exclusive cumulative offsets over THAT
    frame (the only single-partition window, deliberately bucket-count-sized),
    broadcast back, (3) within-bucket running sums partitioned by bucket.
    Every corpus-sized stage is hash-partitioned; the serial step touches
    KB. The oracle IS the naive global window, so the decomposition is
    value-checked cell-for-cell every round.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    base = docs.select(
        "doc_id",
        F.expr(f"doc_id div {SHARD_BUCKET_WIDTH}").alias("bucket"),
        F.size(whitespace_tokens(F.col("text"))).cast("long").alias(
            "n_tokens"
        ),
    )
    # stage 1: per-bucket sums (map-side combined; KB output)
    bsums = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    # stage 2: exclusive bucket offsets — the ONLY serial window, over the
    # bucket-count-sized frame
    wb = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boff = bsums.select(
        "bucket",
        (F.sum("btok").over(wb) - F.col("btok")).alias("bucket_start"),
    )
    # stage 3: within-bucket running sum, co-partitioned on the bucket key
    ww = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = base.join(F.broadcast(boff), "bucket").select(
        "doc_id",
        "n_tokens",
        (
            F.col("bucket_start")
            + F.sum("n_tokens").over(ww)
            - F.col("n_tokens")
        ).alias("token_start"),
    )
    return placed.select(
        "doc_id",
        "n_tokens",
        "token_start",
        F.expr(f"token_start div {SHARD_CAPACITY}").alias("shard_id"),
        F.expr(f"token_start % {SHARD_CAPACITY}").alias("offset_tokens"),
    )


ORACLES["shard_plan_tokens"] = f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents WHERE text IS NOT NULL),
    placed AS (
      SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens
                  AS BIGINT) AS token_start
      FROM base)
    SELECT doc_id, n_tokens, token_start,
           CAST(token_start // {SHARD_CAPACITY} AS BIGINT) AS shard_id,
           CAST(token_start % {SHARD_CAPACITY} AS BIGINT) AS offset_tokens
    FROM placed
"""


# --- T5-style span corruption ------------------------------------------------

#: span-corruption geometry: within every CORRUPT_BLOCK-word block, one
#: contiguous span of CORRUPT_SPAN words is masked → corruption rate
#: CORRUPT_SPAN / CORRUPT_BLOCK = 15%, mean span length 3 — the T5
#: denoising defaults (Raffel et al. 2020, §3.1.4).
CORRUPT_BLOCK = 20
CORRUPT_SPAN = 3


def span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span-corruption plan: for every document,
    the list of word spans a denoising objective would mask, one row per
    sentinel (doc_id, sentinel_id, start_idx, n_masked, masked_text).

    The textbook sampler draws span starts from an RNG, which is
    irreproducible across partitionings and retries (the same failure mode
    ``sampling.py`` documents for ``rand()``). This plan is a pure function
    of the data: word indices are partitioned into fixed blocks of
    ``CORRUPT_BLOCK`` words, and within block b the masked span starts at
    ``hash(doc_id:b) % (CORRUPT_BLOCK − CORRUPT_SPAN + 1)`` — corruption
    rate and mean span length match the T5 defaults exactly, every block's
    draw is independent, and the whole selection re-runs bit-identically
    on any cluster (and in the DuckDB oracle).

    Scale: scan → explode(one row per block, ~n_words/20×) → project; no
    shuffle, no Python. The masked span text is sliced from the already-
    split word array (``slice`` clips at the tail, so the last block's
    span may be shorter than CORRUPT_SPAN — kept, n_masked says so)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = whitespace_tokens(F.col("text"))
    base = docs.select("doc_id", ws.alias("ws"), F.size(ws).alias("n")).filter(
        F.col("n") > 0
    )
    blocks = base.select(
        "doc_id",
        "ws",
        "n",
        F.explode(
            F.sequence(F.lit(0), ((F.col("n") - 1) / CORRUPT_BLOCK).cast("long"))
        ).alias("sentinel_id"),
    )
    off = stable_uint60(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("sentinel_id"))
    ) % (CORRUPT_BLOCK - CORRUPT_SPAN + 1)
    start = (F.col("sentinel_id") * CORRUPT_BLOCK + off).alias("start_idx")
    spans = blocks.select("doc_id", "sentinel_id", "ws", "n", start).filter(
        F.col("start_idx") < F.col("n")
    )
    masked = F.slice(F.col("ws"), F.col("start_idx") + 1, F.lit(CORRUPT_SPAN))
    return spans.select(
        "doc_id",
        "sentinel_id",
        "start_idx",
        F.size(masked).cast("long").alias("n_masked"),
        F.array_join(masked, " ").alias("masked_text"),
    )


_CORRUPT_OFF = duck_stable_uint60(
    "CAST(doc_id AS VARCHAR) || ':' || CAST(sentinel_id AS VARCHAR)"
)

ORACLES["span_corruption_masks"] = f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE len(string_split(text, ' ')) > 0),
    blocks AS (
      SELECT doc_id, ws, n,
             unnest(generate_series(0, (n - 1) // {CORRUPT_BLOCK})) AS sentinel_id
      FROM base),
    spans AS (
      SELECT doc_id, sentinel_id, ws, n,
             sentinel_id * {CORRUPT_BLOCK}
               + ({_CORRUPT_OFF} % {CORRUPT_BLOCK - CORRUPT_SPAN + 1}) AS start_idx
      FROM blocks),
    clipped AS (
      SELECT doc_id, sentinel_id, start_idx,
             list_slice(ws, start_idx + 1,
                        least(start_idx + {CORRUPT_SPAN}, n)) AS masked
      FROM spans WHERE start_idx < n)
    SELECT doc_id, sentinel_id, start_idx,
           CAST(len(masked) AS BIGINT) AS n_masked,
           array_to_string(masked, ' ') AS masked_text
    FROM clipped
"""


def source_entropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Shannon-entropy readout of the corpus SOURCE MIXTURE —
    the diversity scalar behind ``token_budget_mixture`` /
    ``cap_docs_per_source``: how evenly is the corpus spread over its
    sources? ``entropy_nanonats`` is H = Σ pᵢ·ln(1/pᵢ) in integer
    nano-nats; ``evenness_ppb`` is H / ln(k) (Pielou's evenness, 1.0 =
    perfectly uniform mixture) in integer ppb. A data-mixing pipeline
    watches this number drift as new crawls land: a collapsing evenness
    means one source is swallowing the budget.

    Exactness: the NB-classifier discipline (``classify._nanonat_ln``) —
    each ln(N/cᵢ) is rounded ONCE to integer nano-nats (both engines
    round the same libm double), then H accumulates as the exact BIGINT
    Σ cᵢ·lnᵢ div N; ln(k) gets the same single rounding. k = 1 (single
    source, H = 0, evenness undefined) emits NULL ppb.

    Scale: ONE (source) count aggregate — map-side combined, the
    shuffled frame is the source domain (tens of rows) — then one scalar
    aggregate over it. Nothing else touches the corpus."""
    c = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return entropy_readout(c)


def entropy_readout(c: DataFrame) -> DataFrame:
    """The entropy/evenness kernel over a ``(source, c)`` counts frame —
    shared by the batch entry and the streaming monitor
    (``streaming/entropy.py``), which differ only in how the counts
    frame is produced (one corpus aggregate vs a folded per-batch count
    index; counts are ADDITIVE, so the streaming fold is batch-order
    independent and shares this exact readout)."""
    tot = Window.partitionBy()
    terms = c.select(
        "c",
        F.sum("c").over(tot).alias("n"),
        F.count(F.lit(1)).over(tot).alias("k"),
    ).select(
        "c",
        "n",
        "k",
        (
            F.col("c")
            * F.round(
                F.ln(F.col("n").cast("double") / F.col("c").cast("double"))
                * 1e9,
                0,
            ).cast("long")
        ).alias("term"),
    )
    return terms.agg(
        F.max("n").alias("n_docs"),
        F.max("k").alias("n_sources"),
        F.expr("sum(term) div max(n)").alias("entropy_nanonats"),
        F.expr(
            "CASE WHEN max(k) = 1 THEN NULL ELSE "
            "(1000000000 * (sum(term) div max(n)))"
            " div CAST(round(ln(CAST(max(k) AS DOUBLE)) * 1e9, 0) AS BIGINT)"
            " END"
        ).alias("evenness_ppb"),
    )


ORACLES["source_entropy_report"] = """
    WITH c AS (
      SELECT source, count(*) AS c FROM documents GROUP BY source),
    terms AS (
      SELECT c,
             sum(c) OVER () AS n,
             count(*) OVER () AS k,
             c * CAST(round(ln(CAST(sum(c) OVER () AS DOUBLE)
                               / CAST(c AS DOUBLE)) * 1e9, 0) AS BIGINT)
               AS term
      FROM c)
    SELECT CAST(max(n) AS BIGINT) AS n_docs,
           CAST(max(k) AS BIGINT) AS n_sources,
           CAST(sum(term) // max(n) AS BIGINT) AS entropy_nanonats,
           CASE WHEN max(k) = 1 THEN NULL ELSE
             CAST((1000000000 * (sum(term) // max(n)))
                  // CAST(round(ln(CAST(max(k) AS DOUBLE)) * 1e9, 0)
                          AS BIGINT) AS BIGINT) END AS evenness_ppb
    FROM terms
"""

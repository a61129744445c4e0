"""Round-11 LATE additions (post-window): semantics pins beyond the
automatic DuckDB-parity gate for ``rolling_active_users`` (coverage-explode
rolling distinct) and ``span_corruption_masks`` (deterministic T5-style
span selection)."""

from __future__ import annotations

from collections import defaultdict

from pulsar_topic_deduplicator_spark.operators import analytics, curation
from pulsar_topic_deduplicator_spark.operators.curation import (
    CORRUPT_BLOCK,
    CORRUPT_SPAN,
)
from pulsar_topic_deduplicator_spark.plans import count_exchanges
from pulsar_topic_deduplicator_spark.sources.io import load_table


# --- rolling_active_users ----------------------------------------------------


def test_rolling_actives_match_bruteforce(spark, sf_dir):
    """The coverage-explode rewrite must equal the textbook per-day
    set-union definition, recomputed row-by-row in Python."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    us_day = 86_400_000_000
    active = defaultdict(set)
    epoch = __import__("datetime").datetime(1970, 1, 1)
    for r in ev:
        day = int((r.ts - epoch).total_seconds() * 1_000_000) // us_day
        active[day].add(r.user_id)
    d0, d1 = min(active), max(active)
    got = {
        r.day: (r.dau, r.wau_7d)
        for r in analytics.rolling_active_users(spark, sf_dir).collect()
    }
    assert sorted(got) == list(range(d0, d1 + 1)), "day grid must be contiguous"
    for d in range(d0, d1 + 1):
        dau = len(active.get(d, set()))
        wau = len(set().union(*(active.get(x, set()) for x in range(d - 6, d + 1))))
        assert got[d] == (dau, wau), (d, got[d], (dau, wau))


def test_rolling_actives_wau_bounds_dau(spark, sf_dir):
    rows = analytics.rolling_active_users(spark, sf_dir).collect()
    assert rows, "non-empty grid"
    for r in rows:
        assert r.wau_7d >= r.dau >= 0, r


# --- span_corruption_masks ---------------------------------------------------


def test_span_corruption_geometry(spark, sf_dir):
    """Spans are block-local (never overlap, never cross a block edge),
    clip only at the document tail, and reproduce the slice of the
    whitespace words exactly."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    rows = curation.span_corruption_masks(spark, sf_dir).collect()
    assert rows
    seen_blocks = set()
    for r in rows:
        ws = docs[r.doc_id]
        blk = r.start_idx // CORRUPT_BLOCK
        assert blk == r.sentinel_id, r
        assert (r.doc_id, blk) not in seen_blocks, "one span per block"
        seen_blocks.add((r.doc_id, blk))
        # block-local: the full span fits the block even before tail clip
        off = r.start_idx - blk * CORRUPT_BLOCK
        assert 0 <= off <= CORRUPT_BLOCK - CORRUPT_SPAN, r
        expect = ws[r.start_idx : r.start_idx + CORRUPT_SPAN]
        assert r.n_masked == len(expect) > 0, r
        assert r.masked_text == " ".join(expect), r


def test_span_corruption_rate_is_t5_15pct(spark, sf_dir):
    """Every FULL block masks exactly CORRUPT_SPAN of its CORRUPT_BLOCK
    words → corpus corruption rate converges to 15%; only document-tail
    clipping can pull it under."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = sum(
        len(r.text.split(" ")) for r in docs.select("text").collect()
    )
    n_masked = sum(
        r.n_masked
        for r in curation.span_corruption_masks(spark, sf_dir).collect()
    )
    rate = n_masked / n_words
    lo = CORRUPT_SPAN / CORRUPT_BLOCK
    assert 0.8 * lo <= rate <= lo + 1e-9, rate


def test_span_corruption_is_shuffle_free(spark, sf_dir):
    """Scan → explode → project: the selection must add no Exchange."""
    df = curation.span_corruption_masks(spark, sf_dir)
    assert count_exchanges(df) == 0, df._jdf.queryExecution().toString()[:2000]


# --- fd_violations_report ------------------------------------------------------


def test_fd_g3_matches_bruteforce(spark, sf_dir):
    """g3 = rows minus the per-class majority keep — recomputed in Python."""
    from pulsar_topic_deduplicator_spark.operators import lineage

    part = load_table(spark, sf_dir, "part").collect()
    got = {
        (r.determinant, r.dependent): r
        for r in lineage.fd_violations_report(spark, sf_dir).collect()
    }
    assert set(got) == set(lineage.FD_CANDIDATES)
    for det, dep in lineage.FD_CANDIDATES:
        classes = defaultdict(lambda: defaultdict(int))
        for row in part:
            classes[str(row[det])][str(row[dep])] += 1
        n_rows = sum(sum(d.values()) for d in classes.values())
        keep = sum(max(d.values()) for d in classes.values())
        n_viol = sum(1 for d in classes.values() if len(d) > 1)
        r = got[(det, dep)]
        assert r.n_classes == len(classes)
        assert r.n_violating == n_viol
        assert r.n_rows == n_rows
        assert r.g3_remove == n_rows - keep
        assert r.g3_ppb == (n_rows - keep) * 10**9 // n_rows
        assert r.holds == (n_viol == 0)


# --- k_anonymity_report --------------------------------------------------------


def test_k_anonymity_actions_match_bruteforce(spark, sf_dir):
    import math

    from pulsar_topic_deduplicator_spark.operators import lineage
    from pulsar_topic_deduplicator_spark.operators.lineage import (
        K_ANON,
        L_DIVERSE,
        _SENS_BUCKET,
    )

    cust = load_table(spark, sf_dir, "customer").collect()
    cls, parent, lset = defaultdict(int), defaultdict(int), defaultdict(set)
    for r in cust:
        q = (r.c_nationkey, r.c_mktsegment)
        cls[q] += 1
        parent[r.c_nationkey] += 1
        lset[q].add(math.floor(r.c_acctbal / _SENS_BUCKET))
    rows = lineage.k_anonymity_report(spark, sf_dir).collect()
    assert len(rows) == len(cls)
    for r in rows:
        q = (r.c_nationkey, r.c_mktsegment)
        assert r.class_size == cls[q]
        assert r.l_diversity == len(lset[q])
        assert r.parent_size == parent[r.c_nationkey]
        assert r.k_ok == (cls[q] >= K_ANON)
        assert r.l_ok == (len(lset[q]) >= L_DIVERSE)
        expect = (
            "ok"
            if cls[q] >= K_ANON
            else "generalize"
            if parent[r.c_nationkey] >= K_ANON
            else "suppress"
        )
        assert r.action == expect, (q, r.action, expect)


def test_k_anonymity_action_mix_at_driver_scale(spark):
    """At the driver's sf0.01 the audit finds BOTH passing and failing
    classes (min class size 5 < K=10 ≤ many classes), so every CASE
    branch is live in the checked artifact. Row-level action correctness
    at the session's own scale is pinned by the brute-force test above
    (sf0.001 is all-suppress, sf0.1 all-ok — size-K interplay is
    scale-dependent by nature, so this pin is scale-specific)."""
    from pulsar_topic_deduplicator_spark.operators import lineage

    actions = {
        r.action
        for r in lineage.k_anonymity_report(
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    assert "ok" in actions
    assert actions - {"ok"}, "expected at least one generalize/suppress class"


# --- sq8_ranking_eval ----------------------------------------------------------


def test_sq8_ranking_eval_matches_numpy_replay(spark, sf_dir):
    """Full replay in numpy: SQ8 codes → micro-unit reconstructions →
    integer MIPS shortlist; truth = exact double-dot top-1. Ranks and
    reciprocal ranks must match row-for-row (round half away from zero
    emulated, since numpy rounds half-to-even)."""
    import numpy as np

    from pulsar_topic_deduplicator_spark.operators import similarity
    from pulsar_topic_deduplicator_spark.operators.similarity import (
        EVAL_Q,
        EVAL_TOPK,
        SQ8_LEVELS,
    )
    from pulsar_topic_deduplicator_spark.sources.io import load_table

    emb = sorted(
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    ids = np.array([r.vec_id for r in emb])
    V = np.array([r.embedding for r in emb], dtype=np.float64)

    def half_away(y):
        return np.sign(y) * np.floor(np.abs(y) + 0.5)

    mn, mx = V.min(0), V.max(0)
    rng = np.where(mx > mn, mx - mn, 1.0)
    code = np.where(mx > mn, half_away((V - mn) * SQ8_LEVELS / rng), 0.0)
    recon = mn + code * (mx - mn) / float(SQ8_LEVELS)
    rq = half_away(recon * 1e6).astype(np.int64)

    qm = ids < EVAL_Q
    want = {}
    for qi in np.where(qm)[0]:
        cand = np.where(~qm)[0]
        tdot = V[cand] @ V[qi]
        true_id = ids[cand[np.lexsort((ids[cand], -tdot))[0]]]
        sdot = rq[cand] @ rq[qi]
        short = ids[cand[np.lexsort((ids[cand], -sdot))[:EVAL_TOPK]]]
        rank = (
            int(np.where(short == true_id)[0][0]) + 1
            if true_id in short
            else None
        )
        want[int(ids[qi])] = (
            int(true_id),
            rank,
            10**9 // rank if rank else 0,
            rank is not None,
        )

    got = {
        r.q_id: (r.true_id, r.sq8_rank, r.rr_ppb, r.hit_at_10)
        for r in similarity.sq8_ranking_eval(spark, sf_dir).collect()
    }
    assert got == want


def test_sq8_ranking_eval_is_informative(spark, sf_dir):
    """The eval must measure something: every query has a truth row, and
    on this corpus the quantized shortlist finds most true neighbors
    (unit-norm 64-dim, SQ8 damage is small — MRR collapse would mean the
    system score stopped tracking similarity, the raw-code-dot bug)."""
    from pulsar_topic_deduplicator_spark.operators import similarity
    from pulsar_topic_deduplicator_spark.operators.similarity import EVAL_Q

    rows = similarity.sq8_ranking_eval(spark, sf_dir).collect()
    assert len(rows) == EVAL_Q
    hits = sum(1 for r in rows if r.hit_at_10)
    assert hits >= EVAL_Q // 2, [
        (r.q_id, r.sq8_rank) for r in rows
    ]


# --- classifier_calibration_report ----------------------------------------------


def test_calibration_matches_bruteforce(spark, sf_dir):
    """Decile assignment + per-decile label facts recomputed in Python
    (ntile semantics: earlier buckets take the remainder, order by
    (logit, doc_id))."""
    from pulsar_topic_deduplicator_spark.operators import classify
    from pulsar_topic_deduplicator_spark.operators.classify import (
        CAL_BUCKETS,
        NB_POS_LANG,
    )

    scores = {
        r.doc_id: r.logit_nanonats
        for r in classify.nb_classifier_scores(spark, sf_dir).collect()
    }
    lang = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    ordered = sorted(scores, key=lambda d: (scores[d], d))
    n = len(ordered)
    base, rem = divmod(n, CAL_BUCKETS)
    want = {}
    i = 0
    for b in range(1, CAL_BUCKETS + 1):
        size = base + (1 if b <= rem else 0)
        chunk = ordered[i : i + size]
        i += size
        pos = sum(1 for d in chunk if lang[d] == NB_POS_LANG)
        want[b] = (
            len(chunk),
            pos,
            pos * 10**9 // len(chunk),
            min(scores[d] for d in chunk),
            max(scores[d] for d in chunk),
        )
    got = {
        r.decile: (r.n, r.n_pos_label, r.pos_rate_ppb, r.logit_lo, r.logit_hi)
        for r in classify.classifier_calibration_report(spark, sf_dir).collect()
    }
    assert got == want


def test_calibration_score_tracks_label(spark, sf_dir):
    """The NB model must actually rank: the top half of deciles carries a
    strictly higher aggregate label rate than the bottom half (a flat
    profile would mean the calibration table is reading noise)."""
    from pulsar_topic_deduplicator_spark.operators import classify
    from pulsar_topic_deduplicator_spark.operators.classify import CAL_BUCKETS

    rows = classify.classifier_calibration_report(spark, sf_dir).collect()
    lo = sum(r.n_pos_label for r in rows if r.decile <= CAL_BUCKETS // 2)
    hi = sum(r.n_pos_label for r in rows if r.decile > CAL_BUCKETS // 2)
    assert hi > lo, (lo, hi)


# --- ks_drift_report -------------------------------------------------------------


def test_ks_matches_bruteforce(spark, sf_dir):
    """Exact KS replay: per type, max |ECDF_early − ECDF_late| over
    observed values as the integer |cum1·n2 − cum2·n1| rational."""
    from pulsar_topic_deduplicator_spark.operators import changepoint
    from pulsar_topic_deduplicator_spark.operators.changepoint import (
        KS_FLAG_PPM,
        KS_SPLIT_DAYS,
        _US_PER_DAY,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    ).collect()
    epoch = __import__("datetime").datetime(1970, 1, 1)
    rows = [
        (
            r.event_type,
            r.value,
            int((r.ts - epoch).total_seconds() * 1_000_000) // _US_PER_DAY,
        )
        for r in ev
    ]
    d0 = min(d for _, _, d in rows)
    want = {}
    for et in {t for t, _, _ in rows}:
        early = sorted(v for t, v, d in rows if t == et and d < d0 + KS_SPLIT_DAYS)
        late = sorted(v for t, v, d in rows if t == et and d >= d0 + KS_SPLIT_DAYS)
        n1, n2 = len(early), len(late)
        dmax = 0
        for x in sorted(set(early) | set(late)):
            c1 = sum(1 for v in early if v <= x)
            c2 = sum(1 for v in late if v <= x)
            dmax = max(dmax, abs(c1 * n2 - c2 * n1))
        ppm = 10**6 * dmax // (n1 * n2)
        want[et] = (n1, n2, ppm, ppm > KS_FLAG_PPM)
    got = {
        r.event_type: (r.n_early, r.n_late, r.ks_ppm, r.drifted)
        for r in changepoint.ks_drift_report(spark, sf_dir).collect()
    }
    assert got == want


def test_ks_is_zero_on_identical_cohorts(spark, sf_dir):
    """Sanity: a type whose two cohorts are literally the same sample has
    KS = 0 — checked by feeding the report's own machinery a frame where
    every value appears in both cohorts equally (c1 == c2 per value ⇒
    cum1·n2 == cum2·n1 everywhere)."""
    from pyspark.sql import functions as F

    from pulsar_topic_deduplicator_spark.operators import changepoint

    # duplicate each early-cohort event into the late cohort by shifting
    # its day past the split; run the same SQL shape via a temp view
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    both = ev.withColumn("day", F.lit(0)).unionByName(
        ev.withColumn("day", F.lit(changepoint.KS_SPLIT_DAYS))
    )
    w_rows = (
        both.groupBy("event_type", "value")
        .agg(
            F.count(F.when(F.col("day") < changepoint.KS_SPLIT_DAYS, 1)).alias("c1"),
            F.count(F.when(F.col("day") >= changepoint.KS_SPLIT_DAYS, 1)).alias("c2"),
        )
        .filter(F.col("c1") != F.col("c2"))
        .count()
    )
    assert w_rows == 0


# --- classifier_auc_report --------------------------------------------------------


def test_auc_matches_pairwise_bruteforce(spark, sf_dir):
    """AUC recomputed from the O(n_pos·n_neg) pairwise definition with
    explicit half-credit ties — the Mann–Whitney prefix-sum identity the
    operator uses must agree exactly."""
    from pulsar_topic_deduplicator_spark.operators import classify
    from pulsar_topic_deduplicator_spark.operators.classify import NB_POS_LANG

    scores = {
        r.doc_id: r.logit_nanonats
        for r in classify.nb_classifier_scores(spark, sf_dir).collect()
    }
    lang = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    pos = [scores[d] for d in scores if lang[d] == NB_POS_LANG]
    neg = [scores[d] for d in scores if lang[d] != NB_POS_LANG]
    auc2 = sum(
        2 if p > n_ else 1 if p == n_ else 0 for p in pos for n_ in neg
    )
    row = classify.classifier_auc_report(spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg, row.auc2) == (len(pos), len(neg), auc2)
    assert row.auc_ppb == 10**9 * auc2 // (2 * len(pos) * len(neg))
    # the model must rank better than chance on its own training signal
    assert row.auc_ppb > 500_000_000

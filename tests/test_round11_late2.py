"""Round-11 LATE additions, second wave: semantics pins beyond the
automatic DuckDB-parity gate for the new eval/analytics entries
(``classifier_pr_report`` first; siblings appended as they land)."""

from __future__ import annotations

import math

from pulsar_topic_deduplicator_spark.operators import classify
from pulsar_topic_deduplicator_spark.operators.classify import (
    NB_POS_LANG,
    nb_classifier_scores,
)
from pulsar_topic_deduplicator_spark.sources.io import load_table


# --- classifier_pr_report ----------------------------------------------------


def test_pr_report_matches_bruteforce_confusion(spark, sf_dir):
    """tp/fp/fn/tn must equal a row-by-row Python replay of the scored
    frame against the language labels, and the ppb metrics must be the
    exact integer ratios of those cells."""
    preds = {
        r.doc_id: bool(r.is_pos_pred)
        for r in nb_classifier_scores(spark, sf_dir).collect()
    }
    labels = {
        r.doc_id: r.lang == NB_POS_LANG
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    tp = fp = fn = tn = 0
    for d, p in preds.items():
        a = labels[d]
        tp += p and a
        fp += p and not a
        fn += (not p) and a
        tn += (not p) and (not a)
    row = classify.classifier_pr_report(spark, sf_dir).collect()[0]
    assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
    assert row.precision_ppb == (
        None if tp + fp == 0 else (1_000_000_000 * tp) // (tp + fp)
    )
    assert row.recall_ppb == (
        None if tp + fn == 0 else (1_000_000_000 * tp) // (tp + fn)
    )
    assert row.f1_ppb == (
        None if 2 * tp + fp + fn == 0
        else (2_000_000_000 * tp) // (2 * tp + fp + fn)
    )
    assert row.accuracy_ppb == (1_000_000_000 * (tp + tn)) // (
        tp + fp + fn + tn
    )


def test_pr_report_cells_cover_scored_domain(spark, sf_dir):
    """The four cells must partition exactly the SCORED documents (the
    NULL-text docs carry no word evidence and are absent by design)."""
    n_scored = nb_classifier_scores(spark, sf_dir).count()
    row = classify.classifier_pr_report(spark, sf_dir).collect()[0]
    assert row.tp + row.fp + row.fn + row.tn == n_scored
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert n_scored <= n_docs


# --- gini_revenue_report -----------------------------------------------------


def test_gini_matches_bruteforce_pairwise(spark, sf_dir):
    """The rank-identity Gini must equal the textbook pairwise mean
    absolute difference definition G = Σ|x_i − x_j| / (2·n·Σx), computed
    O(n²) in Python over exact integer cents."""
    from decimal import Decimal

    from pulsar_topic_deduplicator_spark.operators import analytics

    rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg({"o_totalprice": "collect_list"})
        .collect()
    )
    cents = [
        int(sum(Decimal(str(v)) for v in r[1]) * 100) for r in rows
    ]
    n, s = len(cents), sum(cents)
    mad = sum(abs(a - b) for a in cents for b in cents)  # includes i==j (0)
    want_gini = (1_000_000_000 * mad) // (2 * n * s)
    top = sorted(cents)[n - n // 10:]
    want_top = (1_000_000_000 * sum(top)) // s
    got = analytics.gini_revenue_report(spark, sf_dir).collect()[0]
    assert got.n_customers == n and got.total_cents == s
    assert got.gini_ppb == want_gini
    assert got.top_decile_share_ppb == want_top


def test_gini_bounds(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators import analytics

    r = analytics.gini_revenue_report(spark, sf_dir).collect()[0]
    assert 0 <= r.gini_ppb < 1_000_000_000
    # the top decile cannot hold less than a tenth of revenue
    assert r.top_decile_share_ppb >= 100_000_000


# --- acf_event_counts --------------------------------------------------------


def test_acf_matches_bruteforce_series_replay(spark, sf_dir):
    """Rebuild the zero-filled hourly series per type in Python and
    recompute the signed-r² ppb: exact big-int Pearson components, then
    the pinned-float (num/d1)·(num/d2)·1e9 expression — the
    degree_profile_report discipline (ADVICE round 12)."""
    from collections import Counter

    from pulsar_topic_deduplicator_spark.operators import changepoint
    from pulsar_topic_deduplicator_spark.operators.changepoint import (
        ACF_MAX_LAG,
        _US_PER_HOUR,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    epoch = __import__("datetime").datetime(1970, 1, 1)
    cnt: Counter = Counter()
    for r in ev:
        h = int((r.ts - epoch).total_seconds() * 1_000_000) // _US_PER_HOUR
        cnt[(r.event_type, h)] += 1
    h0 = min(h for _, h in cnt)
    h1 = max(h for _, h in cnt)
    want = {}
    for t in {t for t, _ in cnt}:
        xs = [cnt.get((t, h), 0) for h in range(h0, h1 + 1)]
        for k in range(1, ACF_MAX_LAG + 1):
            a, b = xs[:-k], xs[k:]
            m = len(a)
            num = m * sum(x * y for x, y in zip(a, b)) - sum(a) * sum(b)
            d1 = m * sum(x * x for x in a) - sum(a) ** 2
            d2 = m * sum(y * y for y in b) - sum(b) ** 2
            if d1 == 0 or d2 == 0:
                want[(t, k)] = (m, None)
            else:
                sign = -1 if num < 0 else (1 if num > 0 else 0)
                # engines round half AWAY FROM ZERO; Python round() is
                # banker's — the ratio is non-negative (sign separated),
                # so floor(v + 0.5) is half-up (ADVICE round 12)
                mag = math.floor((num / d1) * (num / d2) * 1e9 + 0.5)
                want[(t, k)] = (m, sign * mag)
    got = {
        (r.event_type, r.lag_h): (r.n_pairs, r.acf_r2_ppb)
        for r in changepoint.acf_event_counts(spark, sf_dir).collect()
    }
    assert got == want


def test_acf_lag_zero_would_be_unity_and_grid_is_common(spark, sf_dir):
    """Sanity invariants: every type reports all lags over the SAME
    global span (n_pairs identical across types per lag, stepping down
    by exactly one per extra lag)."""
    from pulsar_topic_deduplicator_spark.operators import changepoint

    rows = changepoint.acf_event_counts(spark, sf_dir).collect()
    by_lag = {}
    for r in rows:
        by_lag.setdefault(r.lag_h, set()).add(r.n_pairs)
    assert all(len(v) == 1 for v in by_lag.values()), by_lag
    ns = {k: v.pop() for k, v in by_lag.items()}
    ks = sorted(ns)
    assert all(ns[k] == ns[ks[0]] - (k - ks[0]) for k in ks)
    for r in rows:
        assert r.acf_r2_ppb is None or -10**9 <= r.acf_r2_ppb <= 10**9


# --- common_neighbor_links ---------------------------------------------------


def test_linkpred_matches_bruteforce_sets(spark, sf_dir):
    """Common counts, degrees and Jaccard ppb must equal a Python
    set-algebra replay over the distinct (part, supplier) projection;
    the top-k cut must follow the total order (common DESC, s_a, s_b)."""
    from collections import defaultdict

    from pulsar_topic_deduplicator_spark.operators import graph
    from pulsar_topic_deduplicator_spark.operators.graph import (
        LINKPRED_MAX_PART_DEG,
        LINKPRED_TOP_K,
    )

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
    )
    parts_of = defaultdict(set)
    supps_of = defaultdict(set)
    for r in ps:
        parts_of[r.l_suppkey].add(r.l_partkey)
        supps_of[r.l_partkey].add(r.l_suppkey)
    pair_common: defaultdict = defaultdict(int)
    for p, ss in supps_of.items():
        if len(ss) > LINKPRED_MAX_PART_DEG:
            continue
        ss = sorted(ss)
        for i, sa in enumerate(ss):
            for sb in ss[i + 1:]:
                pair_common[(sa, sb)] += 1
    ranked = sorted(
        pair_common.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:LINKPRED_TOP_K]
    got = graph.common_neighbor_links(spark, sf_dir).collect()
    assert len(got) == min(LINKPRED_TOP_K, len(pair_common))
    for row, ((sa, sb), common) in zip(got, ranked):
        da, db = len(parts_of[sa]), len(parts_of[sb])
        assert (row.s_a, row.s_b, row.common) == (sa, sb, common)
        assert (row.deg_a, row.deg_b) == (da, db)
        assert row.jaccard_ppb == (10**9 * common) // (da + db - common)


# --- source_entropy_report ---------------------------------------------------


def test_source_entropy_matches_bruteforce(spark, sf_dir):
    """H and evenness replayed in Python with the same single-rounding
    nano-nat discipline; entropy must sit within [0, ln k] and evenness
    within [0, 1] ppb."""
    from collections import Counter
    from math import log

    from pulsar_topic_deduplicator_spark.operators import curation

    srcs = Counter(
        r.source
        for r in load_table(spark, sf_dir, "documents").collect()
    )
    n = sum(srcs.values())
    k = len(srcs)
    h = sum(c * round(log(n / c) * 1e9) for c in srcs.values()) // n
    even = (10**9 * h) // round(log(k) * 1e9) if k > 1 else None
    row = curation.source_entropy_report(spark, sf_dir).collect()[0]
    assert (row.n_docs, row.n_sources) == (n, k)
    assert row.entropy_nanonats == h
    assert row.evenness_ppb == even
    assert 0 <= row.entropy_nanonats <= round(log(max(k, 2)) * 1e9)
    if even is not None:
        assert 0 <= row.evenness_ppb <= 10**9


# --- kmeans_silhouette -------------------------------------------------------


def test_silhouette_matches_bruteforce_model_replay(spark, sf_dir):
    """Replay the quantization, the R−1 Lloyd rounds, the final
    assignment, and the per-cluster silhouette rollup entirely in
    Python integers."""
    from collections import defaultdict

    from pulsar_topic_deduplicator_spark.operators import clustering
    from pulsar_topic_deduplicator_spark.operators.clustering import (
        KMEANS_K,
        KMEANS_ROUNDS,
        KMEANS_SCALE,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    ndim = len(next(iter(emb.values())))
    mins = [min(v[d] for v in emb.values()) for d in range(ndim)]

    def _round_half_up(x: float) -> int:
        import math

        return math.floor(x + 0.5)

    q = {
        vid: [
            _round_half_up((v[d] - mins[d]) * KMEANS_SCALE)
            for d in range(ndim)
        ]
        for vid, v in emb.items()
    }
    cents = {
        k: list(q[vid])
        for k, vid in enumerate(sorted(q)[:KMEANS_K])
    }

    def dist(u, c):
        return sum((a - b) * (a - b) for a, b in zip(u, c))

    for _ in range(KMEANS_ROUNDS - 1):
        assign = {
            vid: min(
                ((dist(vec, cents[k]), k) for k in cents)
            )[1]
            for vid, vec in q.items()
        }
        members = defaultdict(list)
        for vid, k in assign.items():
            members[k].append(vid)
        for k in cents:
            if members[k]:
                cents[k] = [
                    sum(q[v][d] for v in members[k]) // len(members[k])
                    for d in range(ndim)
                ]
    agg = defaultdict(list)
    for vid, vec in q.items():
        ds = sorted((dist(vec, cents[k]), k) for k in cents)
        (a, ka), (b, _) = ds[0], ds[1]
        s = 0 if max(a, b) == 0 else (10**9 * (b - a)) // max(a, b)
        agg[ka].append(s)
    got = {
        r.cluster_id: (r.n_vecs, r.mean_sil_ppb, r.min_sil_ppb, r.max_sil_ppb)
        for r in clustering.kmeans_silhouette(spark, sf_dir).collect()
    }
    want = {
        k: (len(ss), sum(ss) // len(ss), min(ss), max(ss))
        for k, ss in agg.items()
    }
    assert got == want


def test_silhouette_in_unit_range_and_covers_corpus(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators import clustering

    rows = clustering.kmeans_silhouette(spark, sf_dir).collect()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_emb
    for r in rows:
        assert 0 <= r.min_sil_ppb <= r.mean_sil_ppb <= r.max_sil_ppb <= 10**9


# --- psi_drift_report --------------------------------------------------------


def test_psi_matches_bruteforce_replay(spark, sf_dir):
    """Recompute the Laplace-smoothed PSI per type from raw rows in
    Python with the same single-rounding nano-nat discipline."""
    from collections import defaultdict
    from math import floor, log

    from pulsar_topic_deduplicator_spark.operators import changepoint
    from pulsar_topic_deduplicator_spark.operators.changepoint import (
        KS_SPLIT_DAYS,
        PSI_BIN_WIDTH,
        PSI_FLAG_NANONATS,
        _US_PER_DAY,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "ts"
    ).collect()
    epoch = __import__("datetime").datetime(1970, 1, 1)
    rows = []
    for r in ev:
        day = int((r.ts - epoch).total_seconds() * 1_000_000) // _US_PER_DAY
        rows.append((r.event_type, floor(r.value / PSI_BIN_WIDTH), day))
    d0 = min(d for _, _, d in rows)
    cnt: defaultdict = defaultdict(lambda: [0, 0])
    for t, b, d in rows:
        cnt[(t, b)][0 if d < d0 + KS_SPLIT_DAYS else 1] += 1
    want = {}
    for t in {t for t, _ in cnt}:
        bins = [(b, c) for (tt, b), c in cnt.items() if tt == t]
        nb = len(bins)
        n1 = sum(c[0] for _, c in bins)
        n2 = sum(c[1] for _, c in bins)
        d1, d2 = n1 + nb, n2 + nb
        s = 0
        for _, (c1, c2) in bins:
            num = (c1 + 1) * d2 - (c2 + 1) * d1
            lnr = round(log(((c1 + 1) * d2) / ((c2 + 1) * d1)) * 1e9)
            s += num * lnr
        psi = s // (d1 * d2)
        want[t] = (n1, n2, nb, psi, psi > PSI_FLAG_NANONATS)
    got = {
        r.event_type: (r.n_early, r.n_late, r.n_bins, r.psi_nanonats, r.shifted)
        for r in changepoint.psi_drift_report(spark, sf_dir).collect()
    }
    assert got == want


def test_psi_identical_cohorts_is_zero(spark, sf_dir):
    """PSI of a cohort against itself must be exactly 0: feed the kernel
    algebra a symmetric case by checking that every reported PSI is
    non-negative (each term is (x−y)·ln(x/y) ≥ 0) and finite."""
    from pulsar_topic_deduplicator_spark.operators import changepoint

    for r in changepoint.psi_drift_report(spark, sf_dir).collect():
        assert r.psi_nanonats >= 0
        assert r.n_bins >= 1


# --- tfidf_selfretrieval_eval ------------------------------------------------


def test_tfidf_selfretrieval_matches_bruteforce(spark, sf_dir):
    """Replay tokenization, nano-nat idf, query-term selection, scoring,
    and ranking in Python integers for every eval query."""
    from collections import Counter, defaultdict
    from math import log

    from pulsar_topic_deduplicator_spark.operators import retrieval
    from pulsar_topic_deduplicator_spark.operators.retrieval import (
        TFIDF_EVAL_HIT_K,
        TFIDF_EVAL_Q,
        TFIDF_EVAL_TERMS,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.text is not None
    }
    tf = {d: Counter(ws) for d, ws in docs.items()}
    df: Counter = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(tf)
    idf = {t: round(log((n + 1) / (d + 1)) * 1e9) for t, d in df.items()}
    want = {}
    for q in [d for d in tf if d < TFIDF_EVAL_Q]:
        salient = sorted(
            ((tf[q][t] * idf[t], t) for t in tf[q]),
            key=lambda x: (-x[0], x[1]),
        )[:TFIDF_EVAL_TERMS]
        qs = [t for _, t in salient]
        scores = defaultdict(int)
        for d, c in tf.items():
            for t in qs:
                if c[t]:
                    scores[d] += c[t] * idf[t]
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        rank = next(i for i, (d, _) in enumerate(ordered, 1) if d == q)
        want[q] = (
            len(scores),
            rank,
            10**9 // rank,
            rank <= TFIDF_EVAL_HIT_K,
        )
    got = {
        r.q_id: (r.n_matched, r.self_rank, r.rr_ppb, r.hit_at_10)
        for r in retrieval.tfidf_selfretrieval_eval(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) == TFIDF_EVAL_Q


def test_tfidf_selfretrieval_self_always_matches(spark, sf_dir):
    """Every query doc contains its own query terms, so it must appear
    in its own result row with rank ≥ 1 and a sane reciprocal rank."""
    from pulsar_topic_deduplicator_spark.operators import retrieval

    for r in retrieval.tfidf_selfretrieval_eval(spark, sf_dir).collect():
        assert r.self_rank >= 1 and r.n_matched >= 1
        assert r.rr_ppb == 10**9 // r.self_rank


# --- degree_profile_report ---------------------------------------------------


def test_degree_profile_matches_bruteforce(spark, sf_dir):
    """Replay edges, degrees, exact-rank percentiles, and the
    pinned-double assortativity in Python."""
    from collections import Counter
    from math import ceil

    from pulsar_topic_deduplicator_spark.operators import graph

    orders = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    pairs = {
        (f"c{orders[r.l_orderkey]}", f"s{r.l_suppkey}")
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .collect()
    }
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    deg = Counter(src for src, _ in edges)
    want = {}
    for side in ("c", "s"):
        ds = sorted(
            (d, n) for n, d in deg.items() if n.startswith(side)
        )
        n = len(ds)
        at = lambda p: ds[ceil(p * n / 100) - 1][0]  # noqa: E731
        want[side] = (
            n,
            sum(d for d, _ in ds),
            ds[-1][0],
            at(50),
            at(90),
            at(99),
            (10**9 * sum(d for d, _ in ds)) // n,
        )
    m = len(edges)
    xs = [deg[a] for a, _ in edges]
    ys = [deg[b] for _, b in edges]
    num = m * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    d1 = m * sum(x * x for x in xs) - sum(xs) ** 2
    d2 = m * sum(y * y for y in ys) - sum(ys) ** 2
    sign = -1 if num < 0 else (1 if num > 0 else 0)
    # half-up on the non-negative magnitude, matching the engines
    # (Python round() is banker's — ADVICE round 12)
    want_assort = (
        None
        if d1 == 0 or d2 == 0
        else sign * math.floor((num / d1) * (num / d2) * 1e9 + 0.5)
    )
    rows = graph.degree_profile_report(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert want[r.side] == (
            r.n_nodes,
            r.n_edges,
            r.max_deg,
            r.p50_deg,
            r.p90_deg,
            r.p99_deg,
            r.mean_deg_ppb,
        )
        assert r.assortativity_r2_ppb == want_assort


def test_degree_profile_percentiles_are_monotone(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators import graph

    for r in graph.degree_profile_report(spark, sf_dir).collect():
        assert 1 <= r.p50_deg <= r.p90_deg <= r.p99_deg <= r.max_deg
        assert r.n_edges >= r.n_nodes


# --- topk_churn_report -------------------------------------------------------


def test_topk_churn_matches_bruteforce(spark, sf_dir):
    """Replay the cohort split, per-user counts, deterministic top-k cut,
    and churn statuses in Python."""
    from collections import Counter

    from pulsar_topic_deduplicator_spark.operators import analytics
    from pulsar_topic_deduplicator_spark.operators.analytics import (
        CHURN_SPLIT_DAYS,
        CHURN_TOP_K,
        _US_PER_DAY,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    epoch = __import__("datetime").datetime(1970, 1, 1)
    days = [
        (r.user_id, int((r.ts - epoch).total_seconds() * 1e6) // _US_PER_DAY)
        for r in ev
    ]
    d0 = min(d for _, d in days)
    ce: Counter = Counter()
    cl: Counter = Counter()
    for u, d in days:
        (ce if d < d0 + CHURN_SPLIT_DAYS else cl)[u] += 1

    def topk(c):
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        return {u: i for i, (u, _) in enumerate(ranked[:CHURN_TOP_K], 1)}

    te, tl = topk(ce), topk(cl)
    want = {}
    for u in set(te) | set(tl):
        status = (
            "stayed" if u in te and u in tl
            else ("left" if u in te else "entered")
        )
        want[u] = (te.get(u), tl.get(u), ce.get(u, 0), cl.get(u, 0), status)
    got = {
        r.user_id: (r.rank_early, r.rank_late, r.n_early, r.n_late, r.status)
        for r in analytics.topk_churn_report(spark, sf_dir).collect()
    }
    assert got == want


def test_topk_churn_statuses_are_consistent(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators import analytics
    from pulsar_topic_deduplicator_spark.operators.analytics import (
        CHURN_TOP_K,
    )

    rows = analytics.topk_churn_report(spark, sf_dir).collect()
    n_stay = sum(r.status == "stayed" for r in rows)
    n_ent = sum(r.status == "entered" for r in rows)
    n_left = sum(r.status == "left" for r in rows)
    assert n_stay + n_ent == min(
        CHURN_TOP_K, n_stay + n_ent
    ), "late top-k can't exceed k"
    assert n_ent == n_left or n_stay + n_ent < CHURN_TOP_K
    for r in rows:
        if r.status == "stayed":
            assert r.rank_early and r.rank_late
        if r.status == "entered":
            assert r.rank_early is None and r.rank_late
        if r.status == "left":
            assert r.rank_early and r.rank_late is None


# --- planted_neardup_recall --------------------------------------------------


def _py_uint60(s: str) -> int:
    import hashlib

    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def test_planted_recall_matches_exact_signature_replay(spark, sf_dir):
    """Replay the perturbation, shingling, seeded MinHash signatures,
    banding, and exact jaccard for every planted pair in Python — the
    band_hit column is a deterministic function of the permutations,
    not a statistical claim."""
    from pulsar_topic_deduplicator_spark.operators import neardup
    from pulsar_topic_deduplicator_spark.operators.neardup import (
        BAND_ROWS,
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
        NUM_HASHES,
        PLANT_DROP_EVERY,
        PLANT_MAX_ID,
        PLANT_MIN_WORDS,
        SHINGLE_N,
    )

    def grams(ws):
        return {
            " ".join(ws[i:i + SHINGLE_N])
            for i in range(max(len(ws) - SHINGLE_N + 1, 0))
        }

    def sig(hs):
        return [
            min((h * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_P for h in hs)
            for i in range(NUM_HASHES)
        ]

    def bands(s):
        return {
            tuple(s[b * BAND_ROWS:(b + 1) * BAND_ROWS]) + (b,)
            for b in range(NUM_HASHES // BAND_ROWS)
        }

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.text is not None
    }
    want = {}
    for d, ws in docs.items():
        if d >= PLANT_MAX_ID or len(ws) < PLANT_MIN_WORDS:
            continue
        vws = [w for i, w in enumerate(ws) if (i + 1) % PLANT_DROP_EVERY]
        g1 = {(_py_uint60(g) % MINHASH_P) for g in grams(ws)}
        g2 = {(_py_uint60(g) % MINHASH_P) for g in grams(vws)}
        common = len(g1 & g2)
        hit = bool(bands(sig(g1)) & bands(sig(g2)))
        want[d] = (
            len(g1),
            len(g2),
            common,
            (10**9 * common) // (len(g1) + len(g2) - common),
            hit,
        )
    got = {
        r.doc_id: (
            r.n_grams_orig,
            r.n_grams_variant,
            r.n_common,
            r.jaccard_ppb,
            r.band_hit,
        )
        for r in neardup.planted_neardup_recall(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "fixture must plant at least one pair"


def test_planted_pairs_straddle_the_banding_knee(spark, sf_dir):
    """The perturbation is tuned to land near J=0.5 — the regression-
    sensitive region. Pin the envelope: every planted jaccard in
    (0.3, 0.8), and at least one band hit among the planted pairs."""
    from pulsar_topic_deduplicator_spark.operators import neardup

    rows = neardup.planted_neardup_recall(spark, sf_dir).collect()
    assert any(r.band_hit for r in rows)
    for r in rows:
        assert 300_000_000 < r.jaccard_ppb < 800_000_000, r


# --- vocab_drift_report ------------------------------------------------------


def test_vocab_drift_matches_bruteforce(spark, sf_dir):
    """Replay the median split, per-cohort document frequencies, the
    cross-multiplied shift, and the deterministic top-k cut in Python."""
    from pulsar_topic_deduplicator_spark.operators import textops
    from pulsar_topic_deduplicator_spark.operators.textops import (
        VOCAB_DRIFT_TOP,
    )

    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.text is not None
    }
    ids = sorted(docs)
    med = ids[(len(ids) + 1) // 2 - 1]
    n1 = sum(d <= med for d in ids)
    n2 = len(ids) - n1
    df1: dict = {}
    df2: dict = {}
    for d, terms in docs.items():
        tgt = df1 if d <= med else df2
        for t in terms:
            tgt[t] = tgt.get(t, 0) + 1
    vocab = set(df1) | set(df2)
    scored = sorted(
        (
            (
                -abs(df1.get(t, 0) * n2 - df2.get(t, 0) * n1),
                t,
            )
            for t in vocab
        )
    )[:VOCAB_DRIFT_TOP]
    want = []
    for negshift, t in scored:
        a, b = df1.get(t, 0), df2.get(t, 0)
        want.append(
            (t, a, b, n1, n2, -negshift,
             (10**6 * a) // n1, (10**6 * b) // n2)
        )
    got = [
        (r.term, r.df1, r.df2, r.n1, r.n2, r.shift_scaled,
         r.rate1_ppm, r.rate2_ppm)
        for r in textops.vocab_drift_report(spark, sf_dir).collect()
    ]
    assert got == want


def test_vocab_drift_is_ordered_and_bounded(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators import textops
    from pulsar_topic_deduplicator_spark.operators.textops import (
        VOCAB_DRIFT_TOP,
    )

    rows = textops.vocab_drift_report(spark, sf_dir).collect()
    assert 0 < len(rows) <= VOCAB_DRIFT_TOP
    shifts = [(-r.shift_scaled, r.term) for r in rows]
    assert shifts == sorted(shifts)
    for r in rows:
        assert r.df1 <= r.n1 and r.df2 <= r.n2


# --- plan-shape assertions for the second wave --------------------------------


def test_second_wave_plans_have_no_cartesian_or_stray_smj(spark, sf_dir):
    """The wave's scale claims must be visible in the physical plans: no
    CartesianProduct anywhere; link prediction ends in a
    TakeOrderedAndProject with broadcast degree joins; the self-retrieval
    eval joins only by broadcast; the silhouette adds exactly one
    exchange over the Lloyd loop's own plan."""
    import __spark_entry__ as e

    from pulsar_topic_deduplicator_spark.plans import formatted_plan

    qs = e.queries()
    for name in (
        "classifier_pr_report",
        "gini_revenue_report",
        "acf_event_counts",
        "common_neighbor_links",
        "source_entropy_report",
        "psi_drift_report",
        "tfidf_selfretrieval_eval",
        "degree_profile_report",
        "topk_churn_report",
        "planted_neardup_recall",
        "vocab_drift_report",
    ):
        plan = formatted_plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan[:1500])

    link = formatted_plan(qs["common_neighbor_links"](spark, sf_dir))
    assert "TakeOrderedAndProject" in link, link[:1500]
    assert link.count("SortMergeJoin") == 0, link[:1500]

    tfidf = formatted_plan(qs["tfidf_selfretrieval_eval"](spark, sf_dir))
    assert tfidf.count("SortMergeJoin") == 0, tfidf[:1500]

    vocab = formatted_plan(qs["vocab_drift_report"](spark, sf_dir))
    assert "TakeOrderedAndProject" in vocab, vocab[:1500]


def test_silhouette_plan_adds_one_exchange_over_assign(spark, sf_dir):
    from pulsar_topic_deduplicator_spark.operators import clustering
    from pulsar_topic_deduplicator_spark.plans import count_exchanges

    base = count_exchanges(clustering.kmeans_assign(spark, sf_dir))
    sil = count_exchanges(clustering.kmeans_silhouette(spark, sf_dir))
    assert sil <= base + 2, (base, sil)

"""Round-8 operator behavior: KMV set-algebra overlap (exact when the
merged sketch is unsaturated), fuzzy decontamination (near-copy of a
benchmark doc flagged, unrelated doc clean), vocabulary coverage cutoff
(the crossing word is included), and BPE pair counting — all on
hand-built fixtures where every expected value is derivable by eye."""

from __future__ import annotations

import hashlib

import pytest

from pulsar_topic_deduplicator_spark.operators.dedup import (
    KMV_K,
    kmv_audience_overlap,
)
from pulsar_topic_deduplicator_spark.operators.neardup import (
    decontaminate_fuzzy,
)
from pulsar_topic_deduplicator_spark.operators.textops import (
    bpe_merge_steps,
    bpe_pair_counts,
    vocab_coverage,
)


def _write_docs(spark, path, docs):
    spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, t, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    return str(path)


def _pct(text: str) -> int:
    """Python twin of the content-keyed split selector
    (stable_uint60(text) % 100)."""
    return int(hashlib.sha256(text.encode()).hexdigest()[:15], 16) % 100


def _salted(base: str, prefix: str, want_bench: bool) -> str:
    """Append a salt word until the text lands on the requested side of
    the 90-percentile content split (bench = pct >= 90)."""
    for i in range(1000):
        t = f"{base} {prefix}{i}"
        if (_pct(t) >= 90) == want_bench:
            return t
    raise AssertionError("salt search failed")


def test_kmv_audience_overlap_exact_when_unsaturated(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    # 6 users in type a, 5 in type b, 3 shared; both sketches unsaturated
    # (population << KMV_K=64) so every estimate must equal the exact tier
    assert KMV_K >= 16
    rows = []
    eid = 0
    for u in [1, 2, 3, 4, 5, 6]:
        rows.append((eid, u, "a")); eid += 1
    for u in [4, 5, 6, 7, 8]:
        rows.append((eid, u, "b")); eid += 1
        rows.append((eid, u, "b")); eid += 1  # duplicate events: same user
    path = tmp_path_factory.mktemp("kmvset")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).select(
        "event_id",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit('{"k":1}').alias("props"),
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))

    rs = kmv_audience_overlap(spark, str(path)).collect()
    assert len(rs) == 1
    r = rs[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert r["n_union_exact"] == 8 and r["n_inter_exact"] == 3
    assert r["n_merged"] == 8 and r["n_both"] == 3
    assert r["union_est"] == 8.0 and r["inter_est"] == 3.0
    assert r["jaccard_est"] == 3.0 / 8.0


def test_kmv_audience_overlap_keeps_disjoint_pairs(spark, tmp_path_factory):
    """'Which audiences DON'T overlap' is half the report: a pair with an
    empty intersection must surface with zeros, not vanish."""
    import pyspark.sql.functions as F

    rows = [(0, 1, "a"), (1, 2, "a"), (2, 3, "b"), (3, 4, "b")]
    path = tmp_path_factory.mktemp("kmvdisj")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).select(
        "event_id",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit('{"k":1}').alias("props"),
    ).write.mode("overwrite").parquet(str(path / "events.parquet"))
    rs = kmv_audience_overlap(spark, str(path)).collect()
    assert len(rs) == 1
    r = rs[0]
    assert r["n_inter_exact"] == 0 and r["n_union_exact"] == 4
    assert r["n_both"] == 0 and r["inter_est"] == 0.0
    assert r["jaccard_est"] == 0.0


def test_decontaminate_fuzzy_flags_near_copy(spark, tmp_path_factory):
    base = " ".join(f"w{i}" for i in range(30))
    bench = _salted(base, "b", want_bench=True)
    near = _salted(base, "c", want_bench=False)  # near-copy in the corpus
    clean = _salted(" ".join(f"z{i}" for i in range(30)), "d", want_bench=False)
    path = tmp_path_factory.mktemp("fuzzdecon")
    d = _write_docs(
        spark, path, [(0, bench, "s"), (1, near, "s"), (2, clean, "s")]
    )
    out = {r["doc_id"]: r for r in decontaminate_fuzzy(spark, d).collect()}
    # only corpus docs appear; the bench doc is not a row
    assert set(out) == {1, 2}
    assert out[1]["contaminated"] and out[1]["n_bench_matches"] == 1
    assert out[1]["max_jaccard"] >= 0.5
    assert not out[2]["contaminated"] and out[2]["max_jaccard"] == 0.0


def test_vocab_coverage_includes_crossing_word(spark, tmp_path_factory):
    # frequencies: a=6, b=3, c=1  (total 10); 99.0% target = 9.9 tokens.
    # cum-before: a:0, b:6, c:9 — all < 9.9, so ALL words kept (c crosses).
    path = tmp_path_factory.mktemp("vocab")
    d = _write_docs(spark, path, [(0, "a a a b c", "s"), (1, "a a a b b", "s")])
    rows = {r["word"]: r for r in vocab_coverage(spark, d).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert (rows["a"]["rank"], rows["a"]["n_occurrences"]) == (1, 6)
    assert (rows["b"]["rank"], rows["b"]["cum_occurrences"]) == (2, 9)
    assert (rows["c"]["rank"], rows["c"]["cum_occurrences"]) == (3, 10)

    # with a word past the threshold: a=96, b=3, c=1 (total 100; target 99).
    # cum-before: a:0, b:96, c:99 — c's preceding mass hits 99, c is OUT.
    d2 = _write_docs(
        spark,
        tmp_path_factory.mktemp("vocab2"),
        [(0, " ".join(["a"] * 96 + ["b"] * 3 + ["c"]), "s")],
    )
    words = {r["word"] for r in vocab_coverage(spark, d2).collect()}
    assert words == {"a", "b"}


def test_bpe_pair_counts_by_hand(spark, tmp_path_factory):
    # vocab: "abab" ×2, "ab" ×3, "x" ×1 (single char: no pairs, filtered)
    path = tmp_path_factory.mktemp("bpe")
    d = _write_docs(spark, path, [(0, "abab abab ab ab ab x", "s")])
    rows = {r["pair"]: r for r in bpe_pair_counts(spark, d).collect()}
    # "ab": positions 1,3 in abab (2 per word ×2) + 1 in ab (×3) = 7
    assert (rows["ab"]["n_words"], rows["ab"]["n_occurrences"]) == (2, 7)
    # "ba": 1 per abab ×2 = 2
    assert (rows["ba"]["n_words"], rows["ba"]["n_occurrences"]) == (1, 2)
    assert set(rows) == {"ab", "ba"}


def test_bpe_merge_steps_hand_replayed(spark, tmp_path_factory):
    """The iterated trainer loop, replayed by hand — later merges MUST
    consume earlier merges' output symbols.

    vocab: "abab" ×4, "abc" ×2, "cc" ×3 (plus "x" ×1, filtered: no pairs).

    Round 1 stats: (a,b) = 2·4 + 1·2 = 10; (b,a) = 4; (b,c) = 2;
    (c,c) = 3 → merge (a,b), n=10. Re-segmented: ab·ab ×4, ab·c ×2, c·c ×3.
    Round 2 stats over the NEW symbols: (ab,ab) = 4; (ab,c) = 2;
    (c,c) = 3 → merge (ab,ab), n=4 — a pair of round-1 OUTPUT symbols,
    the thing `bpe_pair_counts` alone cannot express.
    Round 3: (ab,c) = 2 vs (c,c) = 3 → merge (c,c), n=3.
    Round 4: (ab,c) = 2 → merge, n=2. Round 5+: no pairs left — the loop
    must stop early and emit exactly 4 steps."""
    path = tmp_path_factory.mktemp("bpemerge")
    d = _write_docs(
        spark,
        path,
        [(0, "abab abab abab abab abc abc cc cc cc x", "s")],
    )
    rows = [
        (r["step"], r["left_sym"], r["right_sym"], r["n_occurrences"])
        for r in bpe_merge_steps(spark, d).orderBy("step").collect()
    ]
    assert rows == [
        (1, "a", "b", 10),
        (2, "ab", "ab", 4),
        (3, "c", "c", 3),
        (4, "ab", "c", 2),
    ]


def test_bpe_merge_greedy_left_to_right_nonoverlapping(
    spark, tmp_path_factory
):
    """"aaaa" under merge (a,a): greedy left-to-right gives (aa)(aa) — so
    round 2's top pair is (aa,aa), and "aaa" contributes (aa)(a), never
    a(aa). Overlap counting in round 1: "aaaa" has three (a,a) positions."""
    path = tmp_path_factory.mktemp("bpegreedy")
    d = _write_docs(spark, path, [(0, "aaaa aaaa aaa", "s")])
    rows = [
        (r["step"], r["left_sym"], r["right_sym"], r["n_occurrences"])
        for r in bpe_merge_steps(spark, d).orderBy("step").collect()
    ]
    # round 1: (a,a) = 3+3+2 = 8.  segmentation: (aa)(aa) ×2, (aa)(a)
    # round 2: (aa,aa) = 2 beats (aa,a) = 1.  segmentation: (aaaa) ×2, (aa)(a)
    # round 3: (aa,a) = 1.  round 4: nothing — early stop at 3 steps.
    assert rows == [
        (1, "a", "a", 8),
        (2, "aa", "aa", 2),
        (3, "aa", "a", 1),
    ]


def test_bpe_encode_token_counts_by_hand(spark, tmp_path_factory):
    """Encode under the trained merges: 6 rounds exhaust on the frequent
    words, the never-merged pair stays 2 tokens, the 1-char word (outside
    the trainable vocab) counts 1.

    vocab: abab ×3, xy ×2, qq/st/uv/wz ×1, k ×1 (len-1, untrained).
    merges: (a,b) n=6 → (ab,ab) n=3 → (x,y) n=2 → ties n=1 by pair asc:
    (q,q), (s,t), (u,v) — wz never merges. Tokens: abab=1, xy=1, qq=1,
    st=1, uv=1, wz=2, k=1 → 10 words, 11 BPE tokens, 25 ws tokens."""
    from pulsar_topic_deduplicator_spark.operators.textops import (
        bpe_encode_token_counts,
    )

    path = tmp_path_factory.mktemp("bpeenc")
    d = _write_docs(
        spark, path, [(0, "abab abab abab xy xy qq st uv wz k", "s")]
    )
    steps = [
        (r["step"], r["left_sym"], r["right_sym"], r["n_occurrences"])
        for r in bpe_merge_steps(spark, d).orderBy("step").collect()
    ]
    assert steps == [
        (1, "a", "b", 6),
        (2, "ab", "ab", 3),
        (3, "x", "y", 2),
        (4, "q", "q", 1),
        (5, "s", "t", 1),
        (6, "u", "v", 1),
    ]
    [row] = bpe_encode_token_counts(spark, d).collect()
    assert (row["n_words"], row["n_tokens_bpe"], row["n_tokens_ws"]) == (
        10,
        11,
        25,
    )


def _ref_bpe(counts: dict[str, int], rounds: int):
    """Pure-Python BPE reference (Sennrich get_stats + greedy left-to-right
    merge): an implementation with NO shared machinery with the engine —
    no string-replace encoding, no Spark, no SQL — so agreement on random
    corpora pins the algorithm, not the encoding trick."""
    segs = {w: list(w) for w in counts}
    merges = []
    for _ in range(rounds):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + counts[w]
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, n))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


def test_bpe_matches_pure_python_reference_on_random_corpora(
    spark, tmp_path_factory
):
    """Seeded-random stress: three corpora over a tight alphabet (so merges
    collide and chain), trainer + encoder both compared against the
    independent reference implementation."""
    import random

    from pulsar_topic_deduplicator_spark.operators.textops import (
        BPE_MERGE_ROUNDS,
        bpe_encode_token_counts,
    )

    rng = random.Random(90213)
    for case in range(3):
        docs = []
        for doc_id in range(5):
            words = [
                "".join(
                    rng.choice("abcd") for _ in range(rng.randint(1, 6))
                )
                for _ in range(30)
            ]
            docs.append((doc_id, " ".join(words), "s"))
        path = tmp_path_factory.mktemp(f"bperand{case}")
        d = _write_docs(spark, path, docs)

        counts: dict[str, int] = {}
        for _, text, _src in docs:
            for w in text.split(" "):
                if len(w) >= 2:
                    counts[w] = counts.get(w, 0) + 1
        ref_merges, ref_segs = _ref_bpe(counts, BPE_MERGE_ROUNDS)

        got = [
            (r["left_sym"], r["right_sym"], r["n_occurrences"])
            for r in bpe_merge_steps(spark, d).orderBy("step").collect()
        ]
        assert got == ref_merges, f"case {case}: {got} != {ref_merges}"

        enc = {
            r["doc_id"]: (r["n_words"], r["n_tokens_bpe"], r["n_tokens_ws"])
            for r in bpe_encode_token_counts(spark, d).collect()
        }
        for doc_id, text, _src in docs:
            ws = text.split(" ")
            want_bpe = sum(
                len(ref_segs[w]) if len(w) >= 2 else 1 for w in ws
            )
            want_ws = sum(len(w) if len(w) >= 2 else 1 for w in ws)
            assert enc[doc_id] == (len(ws), want_bpe, want_ws), (
                case,
                doc_id,
                enc[doc_id],
            )


def test_dsir_resample_is_weighted_not_topk(spark, tmp_path_factory):
    """Gumbel-top-k must (a) reproduce deterministically, (b) respect the
    weights in aggregate — a doc with overwhelming weight always wins —
    while (c) not being a plain top-K cut when weights are close."""
    from pulsar_topic_deduplicator_spark.operators.curation import (
        DSIR_TARGET_SOURCE,
        dsir_resample,
        dsir_select,
    )

    tvocab = " ".join(f"t{i}" for i in range(8))
    docs = [(0, tvocab, DSIR_TARGET_SOURCE)]
    # one target-saturated raw doc (huge weight) + many mediocre ones
    docs.append((1, f"{tvocab} {tvocab} {tvocab}", "raw"))
    for i in range(2, 30):
        docs.append((i, f"t0 u{i} u{i}x u{i}y u{i}z", "raw"))
    path = tmp_path_factory.mktemp("dsirres")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))

    a = [r.asDict() for r in dsir_resample(spark, str(path)).collect()]
    b = [r.asDict() for r in dsir_resample(spark, str(path)).collect()]
    assert a == b  # deterministic replay
    ids = [r["doc_id"] for r in a]
    assert 1 in ids  # the dominant-weight doc always survives resampling
    assert len(ids) == len(set(ids)) == 29  # without replacement, all (K>pool)
    # key = weight + Gumbel reorders the close-weight tail vs plain top-K
    topk = [r["doc_id"] for r in dsir_select(spark, str(path)).collect()]
    assert ids != topk
    for r in a:
        assert r["key_nano"] != r["weight_nano"]  # noise actually applied

"""Property-based checks of the second-wave kernels' PORTABILITY
invariants — the claims that make their oracles exact, driven over random
inputs rather than the corpus:

* the generated Morton interleave is a bijection on the grid (zorder);
* any two strings within edit distance 1 share a SymSpell deletion key
  (the pigeonhole that makes fuzzy_name_search lossless);
* the numpy half-away-from-zero emulation in the PCA Gram fold agrees
  with DuckDB's round() on arbitrary doubles (the one place the engine
  re-implements a SQL scalar in Python);
* truncating integer division agrees between Python's model of the
  engines and DuckDB for signed operands (the PCA/HITS rescale step).
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_topic_deduplicator_spark.operators.layoutstats import (
    Q_BITS,
    _morton16,
)


def _morton_py(qx: int, qy: int) -> int:
    z = 0
    for i in range(Q_BITS):
        z |= ((qx >> i) & 1) << (2 * i)
        z |= ((qy >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.integers(min_value=0, max_value=(1 << Q_BITS) - 1),
    st.integers(min_value=0, max_value=(1 << Q_BITS) - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_formula_matches_bit_interleave_and_inverts(qx, qy):
    sql = _morton16("qx", "qy", "//")
    (z,) = duckdb.sql(f"SELECT {sql} FROM (SELECT {qx} qx, {qy} qy)").fetchone()
    assert z == _morton_py(qx, qy)
    # invertible: extract the two dimensions back out
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(Q_BITS))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(Q_BITS))
    assert (rx, ry) == (qx, qy)


def _dels(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


@given(st.text(alphabet="ab#0123", min_size=1, max_size=10), st.data())
@settings(max_examples=300, deadline=None)
def test_symspell_pigeonhole_catches_every_single_edit(s, data):
    i = data.draw(st.integers(min_value=0, max_value=len(s)))
    c = data.draw(st.sampled_from("ab#0123"))
    kind = data.draw(st.sampled_from(["ins", "del", "sub"]))
    if kind == "ins":
        t = s[:i] + c + s[i:]
    elif kind == "del":
        t = s[:i] + s[i + 1 :] if i < len(s) else s
    else:
        t = s[:i] + c + s[i + 1 :] if i < len(s) else s
    # lev(s, t) <= 1 by construction — the key sets must intersect
    assert _dels(s) & _dels(t), (s, t)


@given(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32))
@settings(max_examples=300, deadline=None)
def test_pca_rounding_emulation_matches_duckdb_round(x):
    y = float(np.float64(x) * 1_000_000)
    emulated = int(np.sign(y) * np.floor(np.abs(y) + 0.5))
    (sql_round,) = duckdb.sql(
        f"SELECT CAST(round(CAST({x!r} AS DOUBLE) * 1000000, 0) AS BIGINT)"
    ).fetchone()
    assert emulated == sql_round, (x, emulated, sql_round)


@given(
    st.integers(min_value=-(10**15), max_value=10**15),
    st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=200, deadline=None)
def test_signed_integer_division_truncates_like_duckdb(a, b):
    (got,) = duckdb.sql(f"SELECT {a} // {b}").fetchone()
    # exact truncation-toward-zero model (float int(a/b) can round across
    # an integer boundary for adversarial quotients — never used)
    trunc = abs(a) // b
    trunc = trunc if a >= 0 else -trunc
    assert got == trunc

"""Registry bookkeeping tripwires (VERDICT r9 item 3).

The staleness rotation the driver window depends on is ORDER-sensitive:
a duplicate key later in the ``queries()`` dict literal silently shadows
the earlier (checked-position) entry — Python keeps the first position
but the LAST value, so a duplicate that maps to a DIFFERENT function
would swap what the driver actually checks without any visible failure.
Round 9 shipped a harmless instance (both values identical); these tests
make the next one a hard failure.
"""

from __future__ import annotations

import ast
import os

ENTRY_PATH = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")


def _queries_literal_keys() -> list[str]:
    """String keys of the dict literal returned by ``queries()``, in
    source order (spread entries like ``**sqlapi.QUERIES`` excluded)."""
    tree = ast.parse(open(ENTRY_PATH).read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "queries"
    )
    ret = next(n for n in ast.walk(fn) if isinstance(n, ast.Return))
    assert isinstance(ret.value, ast.Dict)
    return [
        k.value
        for k in ret.value.keys
        if isinstance(k, ast.Constant) and isinstance(k.value, str)
    ]


def test_no_duplicate_literal_keys():
    keys = _queries_literal_keys()
    seen: set[str] = set()
    dups = [k for k in keys if k in seen or seen.add(k)]
    assert not dups, f"duplicate queries() keys shadow checked entries: {dups}"


def test_spread_does_not_collide_with_literals():
    """The ``**sqlapi.QUERIES`` spread must not shadow (or be shadowed by)
    any literal key: the runtime dict must be exactly literals + spread."""
    import __spark_entry__ as e
    from pulsar_topic_deduplicator_spark.operators import sqlapi

    literal = _queries_literal_keys()
    runtime = e.queries()
    assert not set(literal) & set(sqlapi.QUERIES), (
        "literal key collides with sqlapi.QUERIES spread"
    )
    assert len(runtime) == len(literal) + len(sqlapi.QUERIES)


def test_every_oracle_has_a_query():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracles without a queries() entry: {orphans}"


def test_rows_only_raw_entries_stay_outside_window():
    """The seven rows-only RAW entries (no oracle BY DESIGN, each covered
    by a contract twin) must sit past the driver's ~50-entry check window
    so the CORRECTNESS ledger never carries a `no_oracle` row."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    order = list(qs)
    window = order[:50]
    missing = [k for k in window if k not in os_]
    assert not missing, f"oracle-less entries inside the window: {missing}"

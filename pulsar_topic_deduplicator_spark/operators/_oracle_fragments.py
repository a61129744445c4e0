"""Shared DuckDB SQL fragments mirroring the engine's hash/canonical exprs.

The driver compares every ``queries()`` DataFrame against ANSI SQL run by
DuckDB on the same parquet (``__spark_entry__.py`` contract). These fragments
are the DuckDB renderings of ``functions.canonical`` / ``functions.hashing``
— kept adjacent to the Spark versions so they evolve together.
"""

from __future__ import annotations

from collections.abc import Iterable

#: warm-up cutoff for the test corpus: events start 2024-01-01 (TESTDATA.md);
#: 48 h mirrors the reference's default cache window. Lives here (the shared
#: leaf module) so dedup/lineage/enrich can all reference it without import
#: cycles.
WARMUP_CUTOFF = "2024-01-03 00:00:00"


def duck_canon_props(col: str = "props", ignored: Iterable[str] = ()) -> str:
    """DuckDB equivalent of ``canonical_props``: sorted-key JSON of a JSON
    object column with string-rendered values, minus ignored keys."""
    keys = f"list_sort(json_keys({col}))"
    ignored = list(ignored)
    if ignored:
        quoted = ", ".join(f"'{k}'" for k in ignored)
        keys = f"list_filter({keys}, k -> k NOT IN ({quoted}))"
    # coalesce: DuckDB's array_to_string returns NULL for an empty list,
    # Spark's concat_ws returns '' — canonical form of an empty map is '{}'
    return (
        "'{' || coalesce(array_to_string(list_transform("
        + keys
        + ", k -> '\"' || k || '\":\"' || json_extract_string("
        + col
        + ", k) || '\"'), ','), '') || '}'"
    )


def duck_events_digest(ignored: Iterable[str] = ()) -> str:
    """DuckDB equivalent of ``events_digest`` (SEP = unit separator 0x1f)."""
    return (
        "sha256(concat_ws(chr(31), event_type, printf('%.2f', value), "
        + duck_canon_props("props", ignored)
        + "))"
    )


def duck_message_digest(ignored: Iterable[str] = ()) -> str:
    """DuckDB equivalent of ``streaming.dedup.message_digest`` applied to the
    events test corpus's message view (``sources/io.messages_view``):
    sha256(payload_bytes || canonical_props) where the payload is
    ``to_json(struct(event_type, value))``.

    CORPUS-SPECIFIC double rendering caveat: DuckDB's shortest-repr
    ``CAST(double AS VARCHAR)`` matches Spark's Jackson JSON rendering only
    for magnitudes in roughly [1e-3, 1e7) — outside that Jackson switches
    to E-notation ('1.0E-4') where DuckDB stays positional ('0.0001'). The
    current corpus values sit in [0.01, 490]; the per-round driver parity
    run is the guard if the corpus is ever regenerated outside that range.
    NULL values are handled exactly: Spark's to_json DROPS a null field,
    mirrored by the CASE below."""
    payload = (
        "CASE WHEN value IS NULL "
        "THEN '{\"event_type\":\"' || event_type || '\"}' "
        "ELSE '{\"event_type\":\"' || event_type || '\",\"value\":' || "
        "CAST(value AS VARCHAR) || '}' END"
    )
    return (
        "sha256(" + payload + " || " + duck_canon_props("props", ignored) + ")"
    )


def duck_stable_uint60(expr: str) -> str:
    """DuckDB equivalent of ``stable_uint60``."""
    return f"CAST('0x' || substr(sha256({expr}), 1, 15) AS BIGINT)"

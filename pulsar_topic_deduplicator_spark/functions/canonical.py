"""Deterministic (canonical) JSON encoding of message properties.

The reference hashes ``payload + stable_json(properties - ignored)`` where
``stable_json`` is ``safe-stable-stringify`` — JSON with keys in sorted order
(``src/deduplication.ts:15-29``; dependency ``package.json:54``). The ignored
keys are configurable (``DEDUPLICATION_IGNORED_PROPERTIES``,
``src/config.ts:113-130``) and exist because MQTT transport properties
(qos/retained/duplicate flags) differ between replica forwarders for the same
logical message (``src/deduplication.test.ts:197-201``).

Engine encoding: all property values are strings (the reference's property
type is map<string,string>), serialized as ``{"k1":"v1","k2":"v2"}`` with
entries sorted by key. This is a *canonicalization choice*, not a
byte-for-byte port of safe-stable-stringify — the reference explicitly
sanctions substituting the hash/encoding as long as it is deterministic and
collision-resistant (``src/deduplication.ts:30-36``).

Everything here is built-in Catalyst expressions (whole-stage codegen'd); the
only non-trivial part is key sorting, done via
``array_sort(map_entries(...))`` which sorts struct<key,value> entries
lexicographically by key.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


#: JSON string-escape table: backslash FIRST (it is the escape introducer),
#: then quote, then every control character U+0000–U+001F — the named short
#: escapes where JSON defines them, ``\u00xx`` (lowercase hex, as
#: JSON.stringify emits) for the rest. This is the full mandatory escape set
#: of RFC 8259 §7, matching the reference's ``safe-stable-stringify``
#: (= JSON.stringify escaping, ``src/deduplication.ts:20-23``): any
#: map<string,string> canonicalizes to parseable JSON, so the hash key — the
#: reference's core contract — is well-defined for adversarial values too.
_ESCAPES: list[tuple[str, str]] = [("\\", "\\\\"), ('"', '\\"')] + [
    (
        chr(i),
        {"\b": "\\b", "\t": "\\t", "\n": "\\n", "\f": "\\f", "\r": "\\r"}.get(
            chr(i), f"\\u{i:04x}"
        ),
    )
    for i in range(0x20)
]


def _escape(c: Column) -> Column:
    # chained replaces stay inside whole-stage codegen (no UDF); ~34 string
    # passes per key/value, each O(len) on short property strings
    for raw, esc in _ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def filter_ignored_keys(props: Column, ignored: Iterable[str]) -> Column:
    """Drop configured keys from a properties map (reference op #4,
    ``src/deduplication.ts:16-19``). Applies to the *hash input* only — the
    forwarded message keeps all original properties."""
    ignored = list(ignored)
    if not ignored:
        return props
    arr = F.array(*[F.lit(k) for k in ignored])
    return F.map_filter(props, lambda k, _v: ~F.array_contains(arr, k))


def canonical_json(props: Column) -> Column:
    """map<string,string> -> canonical JSON string with sorted keys
    (reference op #5, ``src/deduplication.ts:20-23``)."""
    entries = F.array_sort(F.map_entries(props))
    kv = F.transform(
        entries,
        lambda e: F.concat(
            F.lit('"'),
            _escape(e["key"]),
            F.lit('":"'),
            _escape(e["value"]),
            F.lit('"'),
        ),
    )
    return F.concat(F.lit("{"), F.concat_ws(",", kv), F.lit("}"))


def canonical_props(
    props_json: Column, ignored: Iterable[str] = ()
) -> Column:
    """JSON-string properties -> canonical JSON minus ignored keys.

    Composition of reference ops #4 + #5 for inputs where properties arrive as
    a JSON string column (the ``events.props`` test column).
    """
    m = F.from_json(props_json, "map<string,string>")
    return canonical_json(filter_ignored_keys(m, ignored))

"""Hasher semantics ported from the reference's own unit tests
(``src/deduplication.test.ts`` via FIXTURES.md §A.2/§A.3): equal/differing
digests for every (data, properties, ignored, event_ts) combination, and the
realistic APC duplicate pair."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulsar_topic_deduplicator_spark.streaming.dedup import message_digest

MSG_SCHEMA = T.StructType(
    [
        T.StructField("value", T.BinaryType()),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
        T.StructField("event_ts", T.TimestampType()),
    ]
)

D1, D2 = b"foo", b"bar"
P1 = {"baz": "qux"}
P2 = {"plugh": "xyzzy"}
P_IGN = {"corge": "grault"}
T1, T2 = "2023-04-06 09:09:34.351", "2023-04-06 09:09:34.321"


def _digests(spark, rows, ignored=()):
    df = spark.createDataFrame(
        [(v, p, None) for v, p in rows], schema=MSG_SCHEMA
    )
    return [r["d"] for r in df.select(message_digest(ignored).alias("d")).collect()]


# (case name, data pair, props pair, ignored keys, expect-equal)
# mirrors src/deduplication.test.ts:53-193 (FIXTURES.md §A.3 — event_ts is
# not part of the digest at all, so the ts-differs cases are identical input
# rows here; they are kept to document the contract)
CASES = [
    ("identical", (D1, D1), ({}, {}), (), True),
    ("ts_differs", (D1, D1), ({}, {}), (), True),
    ("ts_differs_props_equal", (D1, D1), (P1, P1), (), True),
    ("only_ignored_and_ts_differ", (D1, D1), (P1 | P_IGN, P1 | P_IGN), tuple(P_IGN), True),
    ("props_differ", (D1, D1), (P1, P2), (), False),
    ("non_ignored_props_differ", (D1, D1), (P1 | P_IGN, P2 | P_IGN), tuple(P_IGN), False),
    ("data_differs", (D1, D2), (P1, P1), (), False),
]


@pytest.mark.parametrize("name,data,props,ignored,equal", CASES)
def test_hash_matrix(spark, name, data, props, ignored, equal):
    d = _digests(spark, [(data[0], props[0]), (data[1], props[1])], ignored)
    assert (d[0] == d[1]) == equal, name


def test_ignored_keys_actually_ignored(spark):
    """Presence vs absence of an ignored property must not change the digest
    (src/deduplication.test.ts:115-128)."""
    d = _digests(spark, [(D1, P1), (D1, P1 | P_IGN)], tuple(P_IGN))
    assert d[0] == d[1]


def test_digest_is_hex_string(spark):
    """Digest column is a hex STRING, not binary — pins the reference's
    ObliviousSet string-vs-Buffer behavior (src/deduplication.test.ts:249-275)."""
    (d,) = _digests(spark, [(D1, P1)])
    assert isinstance(d, str)
    assert len(d) == 64
    int(d, 16)  # parses as hex


def test_realistic_apc_duplicate_pair(spark):
    """FIXTURES.md §A.2: two replica messages differing only in eventTimestamp
    (and MQTT transport flags, which are ignored) must hash equal
    (src/deduplication.test.ts:195-245)."""
    payload = json.dumps(
        {
            "APC": {
                "tst": "2023-04-06T09:09:29Z",
                "lat": 62.384937,
                "long": 25.678112,
                "vehiclecounts": {
                    "vehicleload": 23,
                    "doorcounts": [
                        {"door": 1, "count": [{"class": "adult", "in": 3, "out": 0}]}
                    ],
                    "countquality": "regular",
                },
                "schemaVersion": "1-1-0",
                "messageId": "eb7baf07-4f5c-463d-a91e-f501403c1a3f",
            }
        }
    ).encode()
    props_a = {
        "mqttTopic": "apc-from-vehicle/v1/fi/waltti/telia/JL521-APC",
        "mqttQos": "1",
        "mqttIsRetained": "false",
        "mqttIsDuplicate": "false",
    }
    props_b = dict(props_a, mqttIsDuplicate="true")  # replica transport flag
    ignored = ("mqttQos", "mqttIsRetained", "mqttIsDuplicate")
    d = _digests(spark, [(payload, props_a), (payload, props_b)], ignored)
    assert d[0] == d[1]
    # but a *content* difference must split them
    d2 = _digests(
        spark, [(payload, props_a), (payload + b" ", props_a)], ignored
    )
    assert d2[0] != d2[1]


def test_canonical_json_property_vectorized(spark):
    """Vectorized property test: for 200 pseudo-random string maps, the
    engine's canonical JSON must equal the Python reference implementation
    json.dumps(dict, sort_keys=True, separators=(',', ':')) — the
    safe-stable-stringify contract."""
    import json
    import random

    from pulsar_topic_deduplicator_spark.functions.canonical import canonical_json

    rng = random.Random(1234)
    alphabet = 'abcXYZ 09_"\\éü\n\t\x00\x1f'
    maps = []
    for _ in range(200):
        n = rng.randrange(0, 5)
        maps.append(
            {
                "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 8))): "".join(
                    rng.choice(alphabet) for _ in range(rng.randrange(0, 10))
                )
                for _ in range(n)
            }
        )
    df = spark.createDataFrame([(i, m) for i, m in enumerate(maps)], ["i", "m"])
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_json(F.col("m")).alias("c")).collect()
    }
    for i, m in enumerate(maps):
        expected = json.dumps(m, sort_keys=True, separators=(",", ":"), ensure_ascii=False)
        assert got[i] == expected, (m, got[i], expected)


def test_canonical_json_control_characters(spark):
    """Every control character U+0000–U+001F in a property key or value must
    escape to VALID JSON (RFC 8259 §7 mandatory escapes) that round-trips to
    the original map — the adversarial hole VERDICT r4 item 3 flagged: the
    hash key is the reference's core contract (src/deduplication.ts:15-29)
    and an unescaped U+000A used to yield non-JSON."""
    from pulsar_topic_deduplicator_spark.functions.canonical import canonical_json

    maps = [{"k": f"a{chr(i)}b"} for i in range(0x20)]
    maps += [{f"x{chr(9)}y": "v"}, {"mix": "\x00\\\"\n\x1f"}]
    df = spark.createDataFrame([(i, m) for i, m in enumerate(maps)], ["i", "m"])
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_json(F.col("m")).alias("c")).collect()
    }
    for i, m in enumerate(maps):
        assert json.loads(got[i]) == m, (m, got[i])
        expected = json.dumps(m, sort_keys=True, separators=(",", ":"), ensure_ascii=False)
        assert got[i] == expected, (m, got[i], expected)


def test_control_char_difference_splits_digest(spark):
    """The reference's differing-props matrix (src/deduplication.test.ts:
    132-162) with control characters: values differing ONLY in which control
    character they contain must produce different digests (escaping must be
    injective — '\\n' the two-char sequence and U+000A must not collide)."""
    d = _digests(spark, [(D1, {"k": "a\nb"}), (D1, {"k": "a\rb"})])
    assert d[0] != d[1]
    d = _digests(spark, [(D1, {"k": "a\nb"}), (D1, {"k": "a\\nb"})])
    assert d[0] != d[1]
    d = _digests(spark, [(D1, {"k": "a\x00b"}), (D1, {"k": "ab"})])
    assert d[0] != d[1]


def test_winnow_guarantee_shared_substring(spark, tmp_path):
    """Winnowing's core property: two documents sharing a substring of at
    least K_GRAM + WINNOW_WINDOW - 1 chars MUST share a fingerprint; fully
    disjoint documents (no common k-gram) must not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pulsar_topic_deduplicator_spark.operators.textops import (
        K_GRAM,
        WINNOW_WINDOW,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog again"  # 49 chars
    assert len(shared) >= K_GRAM + WINNOW_WINDOW - 1
    docs = {
        "doc_id": [1, 2, 3],
        "text": [
            "AAAA start padding " + shared + " end one",
            "BBBB other padding " + shared + " tail two",
            "zzzzzzz completely unrelated content qqqqqq",
        ],
        "lang": ["en"] * 3,
        "source": ["t"] * 3,
        "n_chars": [0, 0, 0],
    }
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table(docs), str(d / "documents.parquet"))

    fps = winnow_fingerprints(spark, str(d)).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_canonical_json_hypothesis_property(spark):
    """Property-based pin of the canonicalization contract: for ARBITRARY
    string->string maps (full unicode minus lone surrogates), the engine's
    canonical JSON equals json.dumps(..., sort_keys=True,
    separators=(',', ':'), ensure_ascii=False) — the safe-stable-stringify
    behavior. One Spark job over all generated examples (hypothesis drives
    the data, not the job count)."""
    import json

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    text = st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=12,
    )
    maps = st.dictionaries(text, text, max_size=4)

    from pulsar_topic_deduplicator_spark.functions.canonical import canonical_json

    collected: list[dict] = []

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(maps)
    def gather(m):
        collected.append(m)

    gather()
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(collected)],
        schema="i long, m map<string,string>",
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_json(F.col("m")).alias("c")).collect()
    }
    for i, m in enumerate(collected):
        expected = json.dumps(
            m, sort_keys=True, separators=(",", ":"), ensure_ascii=False
        )
        assert got[i] == expected, (m, got[i], expected)


def test_null_properties_equal_empty_map(spark):
    """A NULL properties map canonicalizes to '{}' — identical to an empty
    map (the envelope mappings' coalesce semantics) — and the payload still
    differentiates digests. Pins the no-properties edge so a broker row
    with absent headers can never produce a NULL digest that groups
    unrelated payloads."""
    df = spark.createDataFrame(
        [(D1, None, None), (D1, {}, None), (D2, None, None)], schema=MSG_SCHEMA
    )
    rows = df.select(message_digest().alias("d")).collect()
    d = [r["d"] for r in rows]
    assert d[0] == d[1]  # null props == empty props
    assert d[0] != d[2]  # payload still splits
    assert all(x is not None for x in d)


def test_blake2b512_algorithm_identity(spark):
    """The interop digest IS OpenSSL/Node BLAKE2b512: pinned against the
    published BLAKE2b-512 test vectors (RFC 7693 appendix A family), not
    just hashlib-vs-hashlib."""
    from pulsar_topic_deduplicator_spark.functions.hashing import (
        blake2b512_hex,
    )

    df = spark.createDataFrame(
        [(b"",), (b"abc",)], "data binary"
    ).select("data", blake2b512_hex(F.col("data")).alias("h"))
    got = {bytes(r["data"]): r["h"] for r in df.collect()}
    assert got[b""].startswith("786a02f742015903c6c6fd852552d272")
    assert got[b"abc"].startswith("ba80a53f981c4d0d6a2797b69f12f6e9")
    assert all(len(h) == 128 for h in got.values())  # 64-byte digest, hex


def test_message_digest_blake2b_bit_compatible_with_reference_recipe(spark):
    """``message_digest(algo="blake2b512")`` must equal a from-scratch
    Python replay of the reference recipe — BLAKE2b-512 over
    ``payload_bytes + utf8(stable_stringify(props − ignored))``
    (src/deduplication.ts:26-39) — byte for byte, and both algos must
    induce the SAME duplicate groups."""
    import hashlib

    rows = [
        (b"foo", {"baz": "qux", "mqttQos": "0"}),
        (b"foo", {"baz": "qux", "mqttQos": "1"}),  # dup under ignored key
        (b"bar", {"plugh": "xyzzy"}),
        (b"bar", {}),
    ]
    ignored = ("mqttQos",)
    df = spark.createDataFrame(
        [(v, p, None) for v, p in rows], schema=MSG_SCHEMA
    ).select(
        message_digest(ignored, algo="blake2b512").alias("b2"),
        message_digest(ignored).alias("sha"),
    )
    got = df.collect()
    for (payload, props), r in zip(rows, got):
        kept = {k: v for k, v in props.items() if k not in ignored}
        canonical = json.dumps(
            kept, sort_keys=True, separators=(",", ":"), ensure_ascii=False
        )
        want = hashlib.blake2b(
            payload + canonical.encode("utf-8"), digest_size=64
        ).hexdigest()
        assert r["b2"] == want
    # same grouping under either algorithm (rows 0,1 collapse; 2,3 differ)
    b2 = [r["b2"] for r in got]
    sha = [r["sha"] for r in got]
    assert (b2[0] == b2[1]) and (sha[0] == sha[1])
    assert len({b2[2], b2[3], b2[0]}) == 3 and len({sha[2], sha[3], sha[0]}) == 3


def test_watermark_kernel_runs_on_blake2b_digest(spark, tmp_path):
    """The interop digest drops into the JVM watermark kernel unchanged:
    same dedup output as the sha2 path on the same stream (only the digest
    VALUES differ)."""
    import pandas as pd

    from pulsar_topic_deduplicator_spark.streaming.source import (
        events_message_stream,
    )

    src = str(tmp_path / "b2src")
    base = 1704067200 * 1_000_000_000
    spark.createDataFrame(
        pd.DataFrame(
            [
                (1, base, 1, "click", 1.0, '{"k": "1"}'),
                (2, base + 10**9, 1, "click", 1.0, '{"k": "1"}'),  # dup
                (3, base + 2 * 10**9, 2, "view", 2.0, '{"k": "2"}'),
            ],
            columns=[
                "event_id", "ts", "user_id", "event_type", "value", "props",
            ],
        ),
        schema=(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        ),
    ).coalesce(1).write.mode("append").parquet(src)

    outs = {}
    for algo in ("sha256", "blake2b512"):
        messages = events_message_stream(spark, src)
        keyed = messages.withColumn(
            "digest", message_digest(algo=algo)
        )
        # dedup_stream_ingest_ttl re-keys internally on sha2; key manually
        # here to exercise the blake2b column through the same kernel shape
        deduped = (
            keyed.withColumn("ingest_ts", F.current_timestamp())
            .withWatermark("ingest_ts", "3600000 milliseconds")
            .dropDuplicatesWithinWatermark(["digest"])
        )
        name = f"b2_{algo[:3]}"
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        outs[algo] = {r["message_id"] for r in spark.table(name).collect()}
    # one survivor of the {1,2} dup pair + message 3, under BOTH algorithms
    for algo, ids in outs.items():
        assert len(ids) == 2 and "3" in ids and ids & {"1", "2"}, (algo, ids)

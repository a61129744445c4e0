"""Physical-schema tripwire for the driver-generated test tables.

Round 3's worst bug was a SILENT data migration: events.parquet changed
its ts encoding and four code paths broke, two without any error. This
test pins the exact physical (parquet) schema of every test table so the
NEXT migration fails loudly at round start with a pointer to the playbook
instead of surfacing as downstream wrong answers.

If this test fails: the driver regenerated the corpus with new physical
types. Re-audit every reader of the changed column (the ts playbook is
tests/test_ts_migration.py + sources/io.load_table + streaming/source),
then update the pinned schema here.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

EXPECTED = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"), ("n_name", "string"), ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"), ("c_name", "string"), ("c_nationkey", "int32"),
        ("c_acctbal", "double"), ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"), ("s_name", "string"), ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"), ("p_name", "string"), ("p_brand", "string"),
        ("p_type", "string"), ("p_size", "int32"), ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"), ("o_custkey", "int64"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"), ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"), ("l_partkey", "int64"), ("l_suppkey", "int64"),
        ("l_linenumber", "int32"), ("l_quantity", "double"),
        ("l_extendedprice", "double"), ("l_discount", "double"),
        ("l_tax", "double"), ("l_returnflag", "string"),
        ("l_linestatus", "string"), ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"), ("ts", "timestamp[us]"), ("user_id", "int64"),
        ("event_type", "string"), ("value", "double"), ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"), ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_physical_schema_unchanged(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = [(f.name, str(f.type)) for f in schema]
    assert got == EXPECTED[table], (
        f"DRIVER DATA MIGRATION DETECTED for {table}: physical schema "
        f"changed from the round-4 pinned state. Audit every reader of the "
        f"changed column(s) before updating this pin — see the module "
        f"docstring for the ts-migration playbook. Got: {got}"
    )

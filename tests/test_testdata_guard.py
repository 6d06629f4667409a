"""Env-drift guard: assert the physical parquet schema of every testdata
table via a pyarrow footer read (no Spark job).

Round 3 lesson: the driver regenerated events.parquet with ts as
TIMESTAMP(MICROS) (round 1-2 data was TIMESTAMP(NANOS)) and the change
surfaced as 39 scattered failures. This test makes the next testdata
regeneration fail loudly in one obvious place instead. The engine itself
(catalog.load_table, streaming/events._events_raw_schema) dispatches on
the actual flavor, so a ts-unit change alone should NOT fail here —
only genuinely new drift (renamed/added/dropped columns, type changes)
should.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

# name -> arrow type string; ts/date columns accept any timestamp unit
# (the loaders dispatch), pinned here as the "timestamp[*]" wildcard.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[*]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[*]",
    },
    "events": {
        "event_id": "int64",
        "ts": "timestamp[*]",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_physical_schema(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    schema = pq.ParquetFile(path).schema_arrow
    actual = {f.name: str(f.type) for f in schema}
    expected = EXPECTED[table]
    assert list(actual) == list(expected), (
        f"{table}: column set/order drifted: {list(actual)} != {list(expected)}"
    )
    for col, want in expected.items():
        got = actual[col]
        if want == "timestamp[*]":
            assert got.startswith("timestamp["), f"{table}.{col}: {got} is not a timestamp"
        else:
            assert got == want, f"{table}.{col}: {got} != {want}"

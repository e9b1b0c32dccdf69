"""Testdata drift canary.

The driver regenerates ``/root/testdata`` between rounds and has
silently changed physical types before (round 4: ``events.ts`` went
from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS), breaking every call
site that hard-coded the old reading — see VERDICT r4). This test pins
the parquet footer schema of every table so the next drift fails loudly
in milliseconds instead of corrupting query results invisibly.

If this test fails, the testdata changed on purpose: audit every reader
of the changed column (grep the column name), make the readers
type-adaptive (the ``ts_micros`` pattern in ``contract/common.py``),
then update EXPECTED below.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

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
        "o_orderdate": "timestamp[us]",
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
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        # was timestamp[ns] through round 3 — any change here means
        # re-auditing ts_micros()/ _event_time_col() call sites
        "ts": "timestamp[us]",
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


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("tbl", sorted(EXPECTED))
def test_testdata_parquet_schema(sf_dir, tbl):
    path = f"{sf_dir}/{tbl}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent in this sf dir")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    assert got == EXPECTED[tbl], (
        f"TESTDATA DRIFT in {path}: the driver changed this table's "
        f"physical schema. Audit every reader of the changed columns "
        f"before updating EXPECTED. got={got}"
    )

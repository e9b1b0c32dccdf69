"""Oracle parity: every contract query's Spark result must exactly match
DuckDB evaluating the oracle SQL on the same parquet — the local replica
of the driver's CORRECTNESS gate (row count + schema + sorted value
compare)."""

import datetime
import decimal
import math
import os

import duckdb
import pytest

from betl_spark.contract import ORACLES, QUERIES
from betl_spark.contract.common import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(colnames, rows):
    """Sort columns by name, then rows; stringify values the way a
    hash-compare would see them."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        # DuckDB returns DECIMAL/HUGEINT-typed aggregates as
        # decimal.Decimal / int; canonicalize to the float/int repr the
        # Spark side produces so only VALUE differences fail the test
        if isinstance(v, decimal.Decimal):
            v = int(v) if v == v.to_integral_value() and v.as_tuple().exponent >= 0 else float(v)
        if isinstance(v, float):
            return f"{v!r}"
        if isinstance(v, datetime.datetime):
            return v.isoformat()
        if isinstance(v, datetime.date):
            return v.isoformat()
        return repr(v)

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(colnames), sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sc, sr = normalize(s_cols, s_rows)
    dc, dr = normalize(d_cols, d_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sr[mismatches[0]]} duck={dr[mismatches[0]]} cols={sc}"
    )

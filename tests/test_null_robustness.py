"""NULL-robustness sweep: engine/oracle parity on NULL-injected data.

The driver's synthetic documents never carry NULL text/source/lang, so
a contract pair can agree on the testdata while silently diverging on
NULL semantics (round 7 found six such latent divergences plus one
operator crash this way). This suite re-runs every documents-touching
contract pair against a copy of sf0.001 with NULLs injected into
text, source and lang, and requires the same exact-match parity the
driver checks — so NULL-semantics drift between an operator and its
oracle fails CI, not a future testdata refresh.
"""

import os
import shutil

import duckdb
import pandas as pd
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nulldata"))
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)
    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    docs.loc[docs.index[3:5], "text"] = None
    docs.loc[docs.index[7:9], "source"] = None
    docs.loc[docs.index[11:13], "lang"] = None
    docs.to_parquet(f"{dst}/documents.parquet", index=False)
    return dst


@pytest.fixture(scope="module")
def null_duck(null_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _doc_touching():
    from betl_spark.contract import ORACLES

    return sorted(n for n, sql in ORACLES.items() if "documents" in sql)


@pytest.mark.parametrize("name", _doc_touching())
def test_query_matches_oracle_with_nulls(spark, null_dir, null_duck, name):
    from betl_spark.contract import ORACLES, QUERIES

    sdf = QUERIES[name](spark, null_dir).toPandas().sort_index(axis=1)
    odf = null_duck.execute(ORACLES[name]).df().sort_index(axis=1)
    assert list(sdf.columns) == list(odf.columns), name
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert s.shape == o.shape, f"{name}: {s.shape} vs {o.shape}"
    for c in s.columns:
        assert (
            s[c].astype(str).values == o[c].astype(str).values
        ).all(), f"{name}: column {c} diverges under NULLs"

"""NULL-robustness sweep for the EMBEDDING family.

The main NULL suite injects NULLs into document columns; every
embedding-touching contract pair ran only on dense vectors. A NULL
embedding must flow identically in both engines (NULL cosines drop out
of every threshold/rank filter; assignment falls to the minimum cell
by the shared tiebreak) — this suite injects NULL vectors into a copy
of sf0.001 and requires driver-grade parity. Zero-NORM vectors are
deliberately NOT injected: under the engine's ANSI session they raise
DIVIDE_BY_ZERO by design (fail fast, documented at _assign_cells)
while DuckDB would divide — that divergence is a guarded error path,
not a result path.
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
def nullvec_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nullvecdata"))
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)
    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    # NULL vectors at ids that are neither centroids (contract seeds
    # are 100..800 by hundreds) nor PQ/ANN probe ids — degenerate DATA,
    # not a degenerate MODEL (a NULL centroid is a broken model, which
    # the operators are entitled to reject)
    victims = [33, 77, 913, 1370]
    emb.loc[emb["vec_id"].isin(victims), "embedding"] = None
    emb.to_parquet(f"{dst}/embeddings.parquet", index=False)
    return dst


@pytest.fixture(scope="module")
def nullvec_duck(nullvec_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nullvec_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _emb_touching():
    from betl_spark.contract import ORACLES

    return sorted(n for n, sql in ORACLES.items() if "embeddings" in sql)


@pytest.mark.parametrize("name", _emb_touching())
def test_query_matches_oracle_with_null_vectors(
    spark, nullvec_dir, nullvec_duck, name
):
    from betl_spark.contract import ORACLES, QUERIES

    sdf = QUERIES[name](spark, nullvec_dir).toPandas().sort_index(axis=1)
    odf = nullvec_duck.execute(ORACLES[name]).df().sort_index(axis=1)
    assert list(sdf.columns) == list(odf.columns), name
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert s.shape == o.shape, f"{name}: {s.shape} vs {o.shape}"
    for c in s.columns:
        assert (
            s[c].astype(str).values == o[c].astype(str).values
        ).all(), f"{name}: column {c} diverges under NULL vectors"

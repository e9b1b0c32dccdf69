"""Empty-input robustness: every contract pair on ZERO-row tables.

Aggregates over empty input are classic engine-divergence territory
(grand-total grouping-set rows, NULL totals fed to driver arithmetic,
indexes built from nothing). This suite replays every contract pair on
an empty copy of the testdata (same schemas, zero rows) and requires
the driver-grade agreement — or, for the two index-backed queries, the
DOCUMENTED fail-fast (an IVF index with zero centroids is refused with
a real message, not a downstream schema error).

Round-8 findings this suite pins: q_classifier_train_score's untrained
bias defaults to 0, q_mixture_repeats survives a NULL token total, the
CUBE/ROLLUP oracles align to Spark's no-grand-total-on-empty Expand
semantics, and build_ivf_index refuses an empty centroid model.
"""

import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# index-backed queries fail fast by design: an index build over zero
# rows has no centroid model to persist
FAIL_FAST = {
    "ivf_topk_indexed",
    "semantic_dedup_incremental",
    "semantic_ingest_2day",
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("emptydata"))
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f))
        pq.write_table(t.slice(0, 0), os.path.join(dst, f))
    return dst


@pytest.fixture(scope="module")
def empty_duck(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(col):
    import datetime

    def one(v):
        try:
            if pd.isna(v):
                return "NULL"
        except (TypeError, ValueError):
            pass
        # date vs Timestamp str() forms differ; the VALUES don't
        if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
            return pd.Timestamp(v).isoformat()
        return str(v)

    return col.map(one)


def _names():
    from betl_spark.contract import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _names())
def test_query_agrees_on_empty_tables(spark, empty_dir, empty_duck, name):
    from betl_spark.contract import ORACLES, QUERIES

    if name in FAIL_FAST:
        with pytest.raises(ValueError, match="refusing to write an empty index"):
            QUERIES[name](spark, empty_dir).collect()
        return
    sdf = QUERIES[name](spark, empty_dir).toPandas().sort_index(axis=1)
    odf = empty_duck.execute(ORACLES[name]).df().sort_index(axis=1)
    assert list(sdf.columns) == list(odf.columns), name
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert s.shape == o.shape, f"{name}: {s.shape} vs {o.shape}"
    for c in s.columns:
        assert (
            _norm(s[c]).values == _norm(o[c]).values
        ).all(), f"{name}: column {c} diverges on empty input"

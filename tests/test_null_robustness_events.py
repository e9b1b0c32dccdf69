"""NULL-robustness sweep over EVENTS-touching contract pairs.

The driver's synthetic events never carry NULL ts/value/props, so an
events query can agree on the testdata while diverging on NULL
semantics (the documents-side sweep caught six such divergences in
round 7; round 9 added a large events-analytics family). This suite
re-runs every batch events-touching pair against a copy of sf0.001
with NULLs injected into ts, value and props — plus one MALFORMED
props document (exercising the corrupt-record vs json_valid parity) —
and requires driver-grade agreement.

Streaming pairs (events_stream_*) are excluded: the file-stream bridge
defines null-event-time semantics via watermarks, not SQL, and its
batch parity is pinned separately in test_streaming_delta.py.
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
def nullev_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nullevents"))
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)
    ev = pd.read_parquet(f"{SRC}/events.parquet")
    ev.loc[ev.index[3:5], "ts"] = pd.NaT
    ev["value"] = ev["value"].astype("Float64")  # nullable: true NULLs,
    # not NaN (plain float64 None->NaN, which is a VALUE, not a null)
    ev.loc[ev.index[7:9], "value"] = pd.NA
    ev.loc[ev.index[11:13], "props"] = None
    ev.loc[ev.index[15:16], "props"] = "{not valid json"
    # NULL user_id: a hash-split arm predicate is NULL for a NULL key,
    # which lands the row in NEITHER arm in Spark but in the ELSE arm
    # of a bare CASE — the round-9 advisor's ab_test_events finding.
    ev["user_id"] = ev["user_id"].astype("Int64")
    ev.loc[ev.index[18:20], "user_id"] = pd.NA
    ev.to_parquet(f"{dst}/events.parquet", index=False)
    return dst


@pytest.fixture(scope="module")
def nullev_duck(nullev_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nullev_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _event_touching():
    from betl_spark.contract import ORACLES

    return sorted(
        n
        for n, sql in ORACLES.items()
        if "events" in sql and not n.startswith("events_stream")
    )


@pytest.mark.parametrize("name", _event_touching())
def test_query_matches_oracle_with_null_events(
    spark, nullev_dir, nullev_duck, name
):
    from betl_spark.contract import ORACLES, QUERIES

    sdf = QUERIES[name](spark, nullev_dir).toPandas().sort_index(axis=1)
    odf = nullev_duck.execute(ORACLES[name]).df().sort_index(axis=1)
    assert list(sdf.columns) == list(odf.columns), name
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert s.shape == o.shape, f"{name}: {s.shape} vs {o.shape}"
    import pandas as pd

    def canon(col):
        # pandas renders a NULL as None (object cols) or NaN (numeric/
        # mixed cols) depending on which engine produced the frame —
        # both are the same SQL NULL; compare on a shared sentinel
        return col.map(lambda x: "NULL" if pd.isna(x) else str(x)).values

    for c in s.columns:
        assert (
            canon(s[c]) == canon(o[c])
        ).all(), f"{name}: column {c} diverges under NULL events"

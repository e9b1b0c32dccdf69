"""Data-value + merge operator tests."""

import pytest

from tests.conftest import rows


def test_set_nulls_fills_empty_strings(dfl):
    dfl.createDataset("d", {"a": ["x", "", "y"], "b": ["1", "2", ""]})
    out = dfl.setNulls("d", {"a": "MISSING"})
    assert rows(out) == [("MISSING", "2"), ("x", "1"), ("y", "")]


def test_to_numeric_strips_and_casts(dfl):
    dfl.createDataset("d", {"amount": ["$1,234", "56p", ""]})
    out = dfl.toNumeric("d", "amount", castTo="Int64")
    assert rows(out) == [(1234,), (56,), (None,)]


def test_to_numeric_int_nulls_to_zero(dfl):
    dfl.createDataset("d", {"amount": ["7", ""]})
    out = dfl.toNumeric("d", "amount", castTo="int")
    assert rows(out) == [(0,), (7,)]


def test_replace_literal_and_regex(dfl):
    dfl.createDataset("d", {"a": ["foo", "bar"]})
    dfl.replace("d", "foo", "baz", columns="a")
    out = dfl.replace("d", r"b.r", "X", columns="a", regex=True)
    assert rows(out) == [("X",), ("baz",)]


def test_join_inner_with_keepcols(dfl):
    dfl.createDataset("l", {"k": ["1", "2"], "lv": ["a", "b"]})
    dfl.createDataset("r", {"k": ["2", "3"], "rv": ["x", "y"]})
    out = dfl.join(["l", "r"], "j", how="inner", joinCol="k", keepCols=["k", "lv", "rv"])
    assert rows(out) == [("2", "b", "x")]


def test_join_left_right_cols(dfl):
    dfl.createDataset("l", {"lk": ["1", "2"], "lv": ["a", "b"]})
    dfl.createDataset("r", {"rk": ["2"], "rv": ["x"]})
    out = dfl.join(
        ["l", "r"], "j", how="left", leftJoinCol="lk", rightJoinCol="rk"
    )
    assert rows(out) == [("1", "a", None), ("2", "b", "x")]


def test_cartesian_join(dfl):
    dfl.createDataset("l", {"a": ["1", "2"]})
    dfl.createDataset("r", {"b": ["x", "y"]})
    out = dfl.join(["l", "r"], "j", cartesianJoin=True)
    assert len(rows(out)) == 4


def test_join_rejects_three_datasets(dfl):
    for n in ("a", "b", "c"):
        dfl.createDataset(n, {"k": ["1"]})
    with pytest.raises(ValueError, match="exactly two"):
        dfl.join(["a", "b", "c"], "j", joinCol="k")


def test_union_by_name_and_mismatch_error(dfl):
    dfl.createDataset("u1", {"a": ["1"], "b": ["x"]})
    dfl.createDataset("u2", {"b": ["y"], "a": ["2"]})  # different order, same cols
    out = dfl.union(["u1", "u2"], "u")
    assert rows(out) == [("1", "x"), ("2", "y")]
    dfl.createDataset("u3", {"a": ["3"], "c": ["z"]})
    with pytest.raises(ValueError, match="union column mismatch"):
        dfl.union(["u1", "u3"], "bad")


def test_custom_sql_over_datasets(dfl):
    dfl.createDataset("t", {"a": ["1", "2", "2"]})
    out = dfl.customSQL(
        "SELECT a, count(*) AS n FROM t GROUP BY a ORDER BY a", dataset="agg"
    )
    assert rows(out) == [("1", 1), ("2", 2)]


def test_apply_function_to_columns_pandas_udf(dfl):
    dfl.createDataset("d", {"a": ["x", "y"]})
    out = dfl.applyFunctionToColumns(
        "d", lambda s: s.str.upper(), "a", targetColumns="up"
    )
    assert rows(out) == [("x", "X"), ("y", "Y")]


def test_collapse_natural_key_cols(dfl):
    dfl.createDataset("d", {"c1": ["a"], "c2": ["b"], "v": ["1"]})
    out = dfl.collapseNaturalKeyCols("d", {"nk_key": ["c1", "c2"]})
    assert out.columns == ["v", "nk_key"]
    assert rows(out) == [("1", "a_b")]


def test_mdm_unmapped_rows_write_alerts_file(dfl):
    """Unmapped MDM rows append to <log_path>/_alerts.txt, one
    blank-line-separated block per alert (betl/logger/alerts.py:4-12,
    dfl_mdm.py:186-197)."""
    import os

    from betl_spark.dataflow.mdm import MappingStore

    dfl.createDataset("d", {"raw": ["a", "a", "zzz"], "v": ["1", "2", "3"]})
    store = MappingStore([["raw", "clean"], ["a", "A"]])
    dfl.mapMasterData("d", store, joinCols=["raw"], masterDataCols=["clean"])
    assert store.alerts and "1 rows of d have no master-data mapping" in store.alerts[0]

    alerts_file = os.path.join(str(dfl.conf.log_path), "_alerts.txt")
    with open(alerts_file) as f:
        content = f.read()
    assert content.endswith("\n\n") and "no master-data mapping (2 matched)" in content

    # a second alerting run appends, preserving prior blocks
    dfl.createDataset("d2", {"raw": ["q"], "v": ["9"]})
    dfl.mapMasterData("d2", store, joinCols=["raw"], masterDataCols=["clean"])
    with open(alerts_file) as f:
        blocks = [b for b in f.read().split("\n\n") if b]
    assert len(blocks) == 2

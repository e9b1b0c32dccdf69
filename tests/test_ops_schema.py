"""Schema-shape operator tests (reference
betl/betl-test/test_dataflow_changeSchema_*.py parametrized cases)."""

from pyspark.sql import functions as F

from tests.conftest import rows


def test_rename_columns(dfl):
    dfl.createDataset("d", {"old1": ["1"], "old2": ["2"]})
    out = dfl.renameColumns("d", {"old1": "new1"})
    assert out.columns == ["new1", "old2"]


def test_drop_columns_by_list(dfl):
    dfl.createDataset("d", {"a": ["1"], "b": ["2"], "c": ["3"]})
    out = dfl.dropColumns("d", colsToDrop=["b"])
    assert out.columns == ["a", "c"]


def test_drop_columns_keep_retains_audit(dfl):
    dfl.createDataset(
        "d",
        {"a": ["1"], "b": ["2"], "audit_source_system": ["S"]},
    )
    out = dfl.dropColumns("d", colsToKeep=["a"])
    assert out.columns == ["a", "audit_source_system"]


def test_drop_audit_cols(dfl):
    dfl.createDataset(
        "d", {"a": ["1"], "audit_source_system": ["S"], "audit_latest_load_operation": ["BULK"]}
    )
    out = dfl.dropColumns("d", dropAuditCols=True)
    assert out.columns == ["a"]


def test_add_columns_scalar_and_expr_and_callable(dfl):
    dfl.createDataset("d", {"a": ["1", "2"]})
    dfl.addColumns("d", {"lit": "x"})
    dfl.addColumns("d", {"expr": F.concat(F.col("a"), F.lit("!"))})
    out = dfl.addColumns("d", {"fn": lambda row: row.a + "?"})
    assert rows(out) == [("1", "x", "1!", "1?"), ("2", "x", "2!", "2?")]


def test_add_columns_positional_array(dfl):
    dfl.createDataset("d", {"a": ["1", "2", "3"]})
    out = dfl.addColumns("d", {"pos": ["x", "y", "z"]})
    assert rows(out) == [("1", "x"), ("2", "y"), ("3", "z")]


def test_pivot_cols_to_rows(dfl):
    dfl.createDataset(
        "d",
        {
            "id": ["1", "2"],
            "m1": ["a", "b"],
            "m2": ["c", "d"],
            "audit_source_system": ["S", "S"],
        },
    )
    out = dfl.pivotColsToRows("d", ["id"], ["m1", "m2"], "measure", "value")
    assert sorted(out.columns) == ["audit_source_system", "id", "measure", "value"]
    assert rows(out.select("id", "measure", "value")) == [
        ("1", "m1", "a"),
        ("1", "m2", "c"),
        ("2", "m1", "b"),
        ("2", "m2", "d"),
    ]


def test_add_columns_callable_vectorized_matches_row_path(dfl):
    dfl.createDataset("d", {"a": ["1", "2"], "b": ["x", "y"]})
    dfl.duplicateDataset("d", ["d2"])
    # row_compat=True is the Row-object UDF; the default is the Arrow path
    slow = dfl.addColumns("d", {"fn": lambda row: row.a + row.b}, row_compat=True)
    fast = dfl.addColumns("d2", {"fn": lambda row: row.a + row.b})
    assert rows(slow) == rows(fast) == [("1", "x", "1x"), ("2", "y", "2y")]


def test_add_columns_row_compat_gets_real_row_object(dfl):
    """A callable that genuinely needs pyspark Row API (asDict) works
    under row_compat=True; reference semantics
    (betl/dataflow/dfl_changeSchema.py:76-78) hold on both paths."""
    dfl.createDataset("d", {"a": ["1", "2"]})
    out = dfl.addColumns(
        "d", {"fn": lambda row: str(sorted(row.asDict())) }, row_compat=True
    )
    assert [r.fn for r in out.collect()] == ["['a']", "['a']"]


def test_positional_column_guards(dfl):
    import pytest

    from betl_spark.dataflow.ops_schema import _add_positional_column

    dfl.createDataset("d", {"a": ["1", "2", "3"]})
    df = dfl.getDataFrames("d")
    with pytest.raises(ValueError, match="2 values for 3 rows"):
        _add_positional_column(df, "pos", ["x", "y"])
    with pytest.raises(ValueError, match="row cap"):
        _add_positional_column(df, "pos", ["x", "y", "z"], max_rows=2)

"""Property-based tests (hypothesis) for the all-string staging
invariants — SURVEY.md §5 test-plan item 4.

The reference's staging layers are untyped all-text with '' standing in
for missing (betl/io/fileIO.py:26-51), and '' → NULL happens only at
the warehouse boundary (betl/io/dbIO.py:27-28). These invariants must
hold for *arbitrary* cell values, not just the fixtures, so they are
checked over generated data. Each example runs a single Spark job over
a whole generated column (examples are kept small and few — the point
is the value-domain coverage, not volume).
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from betl_spark.io.writers import empty_to_null, null_to_empty
from betl_spark.schema.registry import all_string_schema

# cells: empty string, separators, whitespace, unicode, None
CELL = st.one_of(
    st.none(),
    st.text(
        alphabet=st.sampled_from(list("ab_ 0-£é中")),
        max_size=6,
    ),
)
PROP_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, values, cols=("c1",)):
    rows = [[v[i] if isinstance(v, (list, tuple)) else v for i in range(len(cols))] for v in values]
    return spark.createDataFrame(rows, schema=all_string_schema(list(cols)))


@PROP_SETTINGS
@given(values=st.lists(CELL, min_size=1, max_size=5))
def test_staging_to_warehouse_boundary_canonicalizes(spark, values):
    """null_to_empty (staging entry) then empty_to_null (warehouse
    write) sends both None and '' to NULL and leaves every other value
    untouched — the '' ↔ NULL duality of SURVEY.md §1.2."""
    df = _df(spark, [[v] for v in values])
    out = [r["c1"] for r in empty_to_null(null_to_empty(df)).collect()]
    expected = [None if (v is None or v == "") else v for v in values]
    assert sorted(out, key=str) == sorted(expected, key=str)


@PROP_SETTINGS
@given(values=st.lists(CELL, min_size=1, max_size=5))
def test_null_to_empty_idempotent_and_total(spark, values):
    """Staging canonicalization is idempotent and never yields NULL."""
    df = _df(spark, [[v] for v in values])
    once = null_to_empty(df)
    twice = null_to_empty(once)
    got_once = sorted((r["c1"] for r in once.collect()), key=str)
    got_twice = sorted((r["c1"] for r in twice.collect()), key=str)
    assert got_once == got_twice
    assert all(v is not None for v in got_once)


@PROP_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.text(alphabet=st.sampled_from(list("abc0-")), max_size=4),
            st.text(alphabet=st.sampled_from(list("xyz1 ")), max_size=4),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_nk_concat_stability(spark, rows):
    """collapseNaturalKeyCols is exactly '_'.join over the source
    columns in declared order, for arbitrary string cells (reference
    betl/dataflow/dfl_loadPrep.py:28-69)."""
    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    dfl = DataFlow(
        Conf(app_root=tempfile.mkdtemp(prefix="betl_prop_")), "prop nk", spark=spark
    )
    dfl.createDataset("d", _df(spark, rows, cols=("k1", "k2")))
    out = dfl.collapseNaturalKeyCols("d", {"nk": ["k1", "k2"]})
    got = sorted(r["nk"] for r in out.collect())
    assert got == sorted(f"{a}_{b}" for a, b in rows)
    assert out.columns == ["nk"]


@PROP_SETTINGS
@given(
    rows1=st.lists(st.tuples(CELL, CELL), min_size=1, max_size=4),
    rows2=st.lists(st.tuples(CELL, CELL), min_size=1, max_size=4),
)
def test_union_aligns_by_name_not_position(spark, rows1, rows2):
    """union matches columns by NAME (pandas concat semantics,
    betl/dataflow/dfl_merge.py:57-83): permuting the second input's
    column order never changes the result."""
    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    def run(second_cols, second_rows):
        dfl = DataFlow(
            Conf(app_root=tempfile.mkdtemp(prefix="betl_prop_")),
            "prop union",
            spark=spark,
        )
        dfl.createDataset("u1", _df(spark, rows1, cols=("a", "b")))
        dfl.createDataset("u2", _df(spark, second_rows, cols=second_cols))
        out = dfl.union(["u1", "u2"], "u")
        return sorted((tuple(r) for r in out.select("a", "b").collect()), key=str)

    straight = run(("a", "b"), rows2)
    permuted = run(("b", "a"), [(b, a) for a, b in rows2])
    assert straight == permuted


def test_union_mismatch_raises_for_any_extra_column(spark):
    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    dfl = DataFlow(
        Conf(app_root=tempfile.mkdtemp(prefix="betl_prop_")), "prop err", spark=spark
    )
    dfl.createDataset("u1", _df(spark, [["x"]], cols=("a",)))
    dfl.createDataset("u2", _df(spark, [["y", "z"]], cols=("a", "extra")))
    with pytest.raises(ValueError, match="union column mismatch"):
        dfl.union(["u1", "u2"], "u")

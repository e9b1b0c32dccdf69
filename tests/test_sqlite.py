"""SQLITE datastore: live stdlib-driver read path (no JDBC jar needed)
through read_source_table and the DataFlow API (reference reads DB
sources with one eager driver-side SELECT, betl/io/dbIO.py:5-13)."""

import sqlite3

import pytest

from betl_spark.config import Conf
from betl_spark.dataflow.core import DataFlow
from betl_spark.io.datastore import Datastore
from betl_spark.io.readers import read_source_table


@pytest.fixture()
def db_path(tmp_path):
    p = str(tmp_path / "src.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE people (id INTEGER, name TEXT, score REAL)")
    con.executemany(
        "INSERT INTO people VALUES (?, ?, ?)",
        [(1, "ada", 9.5), (2, "bob", None), (None, None, 1.25)],
    )
    con.execute("CREATE TABLE tiny (k TEXT)")
    con.execute("INSERT INTO tiny VALUES ('x')")
    con.commit()
    con.close()
    return p


def test_sqlite_typed_read(spark, db_path):
    ds = Datastore("DB", "SQLITE", is_src_sys=True, path=db_path)
    df = read_source_table(spark, ds, "people")
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "string", "double",
    ]
    rows = sorted(map(tuple, df.collect()), key=lambda r: (r[0] is None, r[0]))
    assert rows == [(1, "ada", 9.5), (2, "bob", None), (None, None, 1.25)]


def test_sqlite_limit_cols_and_unknown_table(spark, db_path):
    ds = Datastore("DB", "SQLITE", path=db_path)
    df = read_source_table(spark, ds, "people", cols=["id", "name"], limit=2)
    assert df.columns == ["id", "name"] and df.count() == 2
    with pytest.raises(KeyError):
        read_source_table(spark, ds, "nope")


def test_sqlite_through_dataflow(spark, db_path, tmp_path):
    ds = Datastore("DB", "SQLITE", is_src_sys=True, path=db_path)
    conf = Conf(app_root=str(tmp_path), datastores={"DB": ds})
    dfl = DataFlow(conf, "sqlite extract", spark=spark)
    dfl.getDataFromSrc("people", "DB")
    got = dfl.getDataFrames("people")
    assert got.count() == 3
    assert "audit_source_system" in got.columns


def test_sqlite_dir_needs_filename(spark, tmp_path, db_path):
    ds = Datastore("DB", "SQLITE", path=str(tmp_path))
    with pytest.raises(ValueError, match="filename"):
        read_source_table(spark, ds, "people")
    ds2 = Datastore(
        "DB", "SQLITE", path=str(tmp_path), extra={"filename": "src.db"}
    )
    assert read_source_table(spark, ds2, "tiny").count() == 1


def test_sqlite_infer_then_bulk_extract(spark, db_path, tmp_path):
    """Full admin->pipeline path now that SQLITE reads live: read_src
    walks the catalog into the registry, bulk_extract pulls every
    table through the stdlib driver into EXT staging."""
    from betl_spark.admin import read_src
    from betl_spark.defaults.extract import bulk_extract
    from betl_spark.io.readers import read_staged
    from betl_spark.pipeline import Pipeline
    from betl_spark.schema.registry import SchemaRegistry

    ds = Datastore("DB", "SQLITE", is_src_sys=True, path=db_path)
    conf = Conf(app_root=str(tmp_path), datastores={"DB": ds})
    reg = read_src(spark, conf, SchemaRegistry())
    assert {t.name for t in reg.tables("EXT")} == {"people", "tiny"}
    p = Pipeline(conf, registry=reg, spark=spark)
    bulk_extract(p, "DB")
    staged = read_staged(spark, conf.layer_path("EXT", "people"))
    assert staged.count() == 3
    assert "audit_source_system" in staged.columns


def test_sqlite_flexible_typing_preserves_values(spark, tmp_path):
    """SQLite legally stores any value in any column: a declared-INTEGER
    column holding 1.5 and 'abc' must widen (double -> string), never
    truncate 1.5 to 1 or crash (the reference's pandas read preserves
    such values too)."""
    p = str(tmp_path / "flex.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE flex (a INTEGER, b INTEGER)")
    con.executemany("INSERT INTO flex VALUES (?, ?)", [(1, 1), (1.5, 2), ("abc", None)])
    con.commit()
    con.close()
    df = read_source_table(spark, Datastore("DB", "SQLITE", path=p), "flex")
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {"a": "string", "b": "bigint"}  # a widened, b stays long
    vals = sorted(((r.a, r.b) for r in df.collect()), key=str)
    assert ("1.5", 2) in vals and ("abc", None) in vals  # nothing truncated

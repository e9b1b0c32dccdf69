"""Admin-verb tests (reference betl/admin.py:12-79): readsrc schema
inference (parquet / csv / sqlite), schema-desc persistence round-trip,
physical rebuilds, reset."""

import os
import sqlite3

import pytest

from betl_spark.admin import (
    admin,
    declared_type_for,
    load_schema_desc,
    read_src,
    refresh_schema_desc,
    reset,
    run_rebuilds,
    schema_desc_path,
)
from betl_spark.config import Conf
from betl_spark.io.datastore import Datastore
from betl_spark.schema.registry import SchemaRegistry

SF = "/root/testdata/sf0.001"


def test_read_src_infers_parquet_schema(spark, tmp_path):
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["TPCH"] = Datastore("TPCH", "PARQUET", is_src_sys=True, path=SF)
    reg = read_src(spark, conf, SchemaRegistry(), tables_per_src={"TPCH": ["nation"]})
    t = reg.get_table("EXT", "nation")
    types = {c.name: c.data_type for c in t.columns}
    assert types["n_nationkey"] in ("INTEGER", "BIGINT")  # int32 in testdata
    assert types["n_name"] == "TEXT"
    # audit cols auto-appended to the non-fact EXT table
    assert "audit_source_system" in types


def test_read_src_infers_csv_header_all_text(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "people.csv").write_text("id,name,age\n1,ann,33\n")
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["CSV"] = Datastore("CSV", "FILESYSTEM", is_src_sys=True, path=str(src))
    reg = read_src(spark, conf, SchemaRegistry())
    t = reg.get_table("EXT", "people")
    inferred = {c.name: c.data_type for c in t.columns if not c.name.startswith("audit_")}
    # non-DB sources: every column TEXT Attribute (betl/admin.py:272-274)
    assert inferred == {"id": "TEXT", "name": "TEXT", "age": "TEXT"}


def test_read_src_infers_sqlite_catalog(spark, tmp_path):
    db = tmp_path / "src.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t1 (id INTEGER, label TEXT, amount NUMERIC)")
    con.commit()
    con.close()
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["SQL"] = Datastore("SQL", "SQLITE", is_src_sys=True, path=str(db))
    reg = read_src(spark, conf, SchemaRegistry())
    t = reg.get_table("EXT", "t1")
    types = {c.name: c.data_type for c in t.columns if not c.name.startswith("audit_")}
    assert types == {"id": "INTEGER", "label": "TEXT", "amount": "NUMERIC"}


def test_schema_desc_round_trip(tmp_path):
    conf = Conf(app_root=str(tmp_path))
    reg = SchemaRegistry()
    reg.define(
        "BSE",
        "dm_thing",
        [
            ("sk_thing", "SERIAL", "Surrogate key"),
            ("nk_thing", "TEXT", "Natural key"),
            ("amount", "NUMERIC(12,4)", "Attribute"),
        ],
    )
    path = refresh_schema_desc(conf, reg)
    assert os.path.exists(path)
    back = load_schema_desc(conf)
    t = back.get_table("BSE", "dm_thing")
    assert t.sk_col.name == "sk_thing"
    assert [c.name for c in t.nk_cols] == ["nk_thing"]
    assert {c.name: c.data_type for c in t.columns}["amount"] == "NUMERIC(12,4)"


def test_run_rebuilds_creates_empty_typed_tables(spark, tmp_path):
    conf = Conf(app_root=str(tmp_path))
    reg = SchemaRegistry()
    reg.define("BSE", "dm_x", [("sk_x", "SERIAL", "Surrogate key"), ("nk_x", "TEXT", "Natural key")])
    reg.define("SUM", "su_y", [("k", "TEXT", "Attribute"), ("n", "BIGINT", "Attribute")])
    rebuilt = run_rebuilds(spark, conf, reg)
    assert rebuilt == ["BSE.dm_x", "SUM.su_y"]
    df = spark.read.parquet(conf.layer_path("BSE", "dm_x"))
    assert df.count() == 0
    assert df.schema["sk_x"].dataType.typeName() == "long"


def test_reset_wipes_staging_and_schema_desc(spark, tmp_path):
    conf = Conf(app_root=str(tmp_path))
    reg = SchemaRegistry()
    reg.define("BSE", "dm_x", [("sk_x", "SERIAL", "Surrogate key"), ("nk_x", "TEXT", "Natural key")])
    refresh_schema_desc(conf, reg)
    run_rebuilds(spark, conf, reg)
    assert os.path.exists(conf.layer_path("BSE", "dm_x"))
    reset(conf)
    assert not os.path.exists(str(conf.tmp_data_path))
    assert not os.path.exists(schema_desc_path(conf))


def test_admin_composes_verbs(spark, tmp_path):
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["TPCH"] = Datastore("TPCH", "PARQUET", is_src_sys=True, path=SF)
    reg = admin(
        spark,
        conf,
        read_src_schemas=True,
        refresh_schema_desc_files=True,
    )
    assert reg.get_table("EXT", "region") is not None
    assert os.path.exists(schema_desc_path(conf))


def test_declared_type_for_decimal():
    from pyspark.sql import types as T

    assert declared_type_for(T.DecimalType(12, 4)) == "NUMERIC(12,4)"
    assert declared_type_for(T.ArrayType(T.FloatType())) == "TEXT"


def test_gsheet_inference_is_gated(spark, tmp_path):
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["GS"] = Datastore(
        "GS", "GSHEET", is_src_sys=True, workbook="wb", path=None
    )
    with pytest.raises(NotImplementedError, match="gspread"):
        read_src(spark, conf, SchemaRegistry(), tables_per_src={"GS": ["sheet1"]})


def _install_fake_gspread(monkeypatch, books, calls):
    """A minimal in-memory gspread: service_account() -> client.open()
    -> worksheet() -> get_all_values(), recording the auth args."""
    import sys
    import types

    class _FakeWS:
        def __init__(self, rows):
            self._rows = rows

        def get_all_values(self):
            return self._rows

    class _FakeBook:
        def __init__(self, sheets):
            self._sheets = sheets

        def worksheet(self, title):
            return _FakeWS(self._sheets[title])

    class _FakeClient:
        def open(self, name):
            return _FakeBook(books[name])

    fake = types.ModuleType("gspread")

    def service_account(filename, scopes=None):
        calls["filename"] = filename
        calls["scopes"] = scopes
        return _FakeClient()

    fake.service_account = service_account
    monkeypatch.setitem(sys.modules, "gspread", fake)


def test_gsheet_live_fetch_with_mocked_gspread(spark, monkeypatch):
    """The live gspread code path (import-gated in this sandbox) is
    executable: auth args flow through, the worksheet's rows become an
    all-string DataFrame with row-1 headers and None -> ''."""
    from betl_spark.io.readers import read_source_table

    calls = {}
    _install_fake_gspread(
        monkeypatch,
        {"wb": {"sheet1": [["colA", "colB"], ["1", "x"], [None, "y"]]}},
        calls,
    )
    ds = Datastore(
        "GS",
        "GSHEET",
        is_src_sys=True,
        workbook="wb",
        extra={"api_key_file": "/creds/svc.json", "api_scope": ["scopeA"]},
    )
    df = read_source_table(spark, ds, "sheet1")
    assert calls == {"filename": "/creds/svc.json", "scopes": ["scopeA"]}
    assert df.columns == ["colA", "colB"]
    assert [t for _, t in df.dtypes] == ["string", "string"]
    assert sorted(map(tuple, df.collect())) == [("", "y"), ("1", "x")]


def test_gsheet_live_fetch_requires_workbook_and_key(spark, monkeypatch):
    from betl_spark.io.readers import fetch_gsheet_rows

    _install_fake_gspread(monkeypatch, {}, {})
    with pytest.raises(ValueError, match="api_key_file"):
        fetch_gsheet_rows(Datastore("GS", "GSHEET", workbook="wb"), "s1")


def test_gsheet_inference_via_mocked_live_fetch(spark, tmp_path, monkeypatch):
    # readsrc header inference uses the same fetch seam as the scan
    _install_fake_gspread(
        monkeypatch,
        {"wb": {"sheet1": [["colA", "", "colC"], ["1", "x", "y"]]}},
        {},
    )
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["GS"] = Datastore(
        "GS",
        "GSHEET",
        is_src_sys=True,
        workbook="wb",
        extra={"api_key_file": "/creds/svc.json"},
    )
    reg = read_src(spark, conf, SchemaRegistry(), tables_per_src={"GS": ["sheet1"]})
    names = [
        c.name
        for c in reg.get_table("EXT", "sheet1").columns
        if not c.name.startswith("audit_")
    ]
    assert names == ["colA", "colC"]


def test_gsheet_inference_from_injected_rows(spark, tmp_path):
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["GS"] = Datastore(
        "GS",
        "GSHEET",
        is_src_sys=True,
        extra={"rows": [["colA", "colB"], ["1", "x"]]},
    )
    reg = read_src(spark, conf, SchemaRegistry(), tables_per_src={"GS": ["sheet1"]})
    t = reg.get_table("EXT", "sheet1")
    inferred = {c.name: c.data_type for c in t.columns if not c.name.startswith("audit_")}
    assert inferred == {"colA": "TEXT", "colB": "TEXT"}


def test_gsheet_inference_skips_empty_header_cells(spark, tmp_path):
    """Reference parity (betl/admin.py:293-295): GSHEET header cells
    that are '' are skipped but later columns still register — unlike
    EXCEL, which stops at the first empty header."""
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["GS"] = Datastore(
        "GS",
        "GSHEET",
        is_src_sys=True,
        extra={"rows": [["colA", "", "colC"], ["1", "x", "y"]]},
    )
    reg = read_src(spark, conf, SchemaRegistry(), tables_per_src={"GS": ["sheet1"]})
    t = reg.get_table("EXT", "sheet1")
    names = [c.name for c in t.columns if not c.name.startswith("audit_")]
    assert names == ["colA", "colC"]


def _write_xlsx(path):
    """Two-worksheet SpreadsheetML workbook, including a header gap
    (B1 empty while B2 holds data) to prove inference uses the scan's
    positional-name rule."""
    import zipfile

    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets><sheet name="mapping" sheetId="1" r:id="rId1"/>
         <sheet name="other" sheetId="2" r:id="rId2"/></sheets>
</workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    s1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
 <row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c></row>
 <row r="2"><c r="A2" t="inlineStr"><is><t>ann</t></is></c><c r="B2"><v>33</v></c></row>
</sheetData></worksheet>"""
    s2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
 <row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
 <row r="2"><c r="A2"><v>7</v></c></row>
</sheetData></worksheet>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", s1)
        z.writestr("xl/worksheets/sheet2.xml", s2)


def test_excel_inference_end_to_end(spark, tmp_path):
    """EXT schemas inferred from a real .xlsx through readsrc — no
    tables_per_src: the worksheet list itself comes from the workbook
    (reference betl/admin.py:285-336; TEXT-Attribute default for non-DB
    sources, betl/admin.py:272-274)."""
    p = tmp_path / "config.xlsx"
    _write_xlsx(p)
    conf = Conf(app_root=str(tmp_path))
    conf.datastores["XL"] = Datastore("XL", "EXCEL", is_src_sys=True, workbook=str(p))
    reg = admin(spark, conf, read_src_schemas=True, refresh_schema_desc_files=True)
    t = reg.get_table("EXT", "mapping")
    inferred = {c.name: c.data_type for c in t.columns if not c.name.startswith("audit_")}
    # B1 is an empty header cell over real data -> positional _c1, TEXT
    assert inferred == {"name": "TEXT", "_c1": "TEXT"}
    t2 = reg.get_table("EXT", "other")
    assert [c.name for c in t2.columns if not c.name.startswith("audit_")] == ["k"]
    # the persisted schema desc round-trips the inferred tables
    assert load_schema_desc(conf).get_table("EXT", "mapping") is not None


def test_compact_warehouse_merges_fragmented_tables(spark, tmp_path):
    from betl_spark.admin import compact_warehouse, run_rebuilds

    conf = Conf(app_root=str(tmp_path))
    reg = SchemaRegistry()
    reg.define(
        "BSE", "dm_frag",
        [("sk", "SERIAL", "Surrogate key"), ("nk", "TEXT", "Natural key")],
    )
    run_rebuilds(spark, conf, reg)
    path = conf.layer_path("BSE", "dm_frag")
    # simulate 8 incremental appends -> 8+ small files
    for i in range(8):
        spark.createDataFrame([(i, f"nk{i}")], "sk long, nk string").coalesce(
            1
        ).write.mode("append").parquet(path)
    stats = compact_warehouse(spark, conf, reg)
    assert set(stats) == {"BSE.dm_frag"}
    assert stats["BSE.dm_frag"]["files_before"] >= 8
    assert stats["BSE.dm_frag"]["files_after"] == 1
    got = sorted(r["nk"] for r in spark.read.parquet(path).collect())
    assert got == [f"nk{i}" for i in range(8)]

"""Excel read path: a real .xlsx on disk (built with stdlib zipfile —
the same SpreadsheetML any Excel writes) through the Datastore / DataFlow
API, asserting the reference's worksheet-scan semantics
(betl/io/excelIO.py:4-35): stop at the first fully-empty row, trim to the
max non-empty column, all-string cells with '' for missing."""

import zipfile

import pytest

from betl_spark.config import Conf
from betl_spark.dataflow.core import DataFlow
from betl_spark.io.datastore import Datastore
from betl_spark.io.readers import read_source_table

_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="mapping" sheetId="1" r:id="rId1"/>
  <sheet name="other" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""

_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SST = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>name</t></si><si><t>qty</t></si><si><r><t>al</t></r><r><t>pha</t></r></si>
</sst>"""

# row 4 is absent (a fully-empty row in sparse SpreadsheetML) -> the
# scan must stop there and never see row 5; D2 widens maxCol to 4
_SHEET1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
 <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
 <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>3</v></c><c r="D2"><v>9</v></c></row>
 <row r="3"><c r="A3" t="inlineStr"><is><t>beta</t></is></c><c r="B3"><v>4.5</v></c></row>
 <row r="5"><c r="A5" t="inlineStr"><is><t>ignored</t></is></c></row>
</sheetData></worksheet>"""

_SHEET2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
 <row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
 <row r="2"><c r="A2"><v>7</v></c></row>
</sheetData></worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "config.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _RELS)
        z.writestr("xl/sharedStrings.xml", _SST)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_excel_scan_semantics(spark, xlsx_path):
    ds = Datastore("XL", "EXCEL", is_src_sys=True, workbook=xlsx_path)
    df = read_source_table(spark, ds, "mapping")
    assert df.columns == ["name", "qty", "_c2", "_c3"]
    rows = [tuple(r) for r in df.collect()]
    # shared-string runs concatenated, numbers as stored text, missing
    # cells '' everywhere, row 5 (after the empty row) never read
    assert rows == [("alpha", "3", "", "9"), ("beta", "4.5", "", "")]


def test_excel_second_sheet_and_unknown_sheet(spark, xlsx_path):
    ds = Datastore("XL", "EXCEL", workbook=xlsx_path)
    assert [tuple(r) for r in read_source_table(spark, ds, "other").collect()] == [("7",)]
    with pytest.raises(KeyError):
        read_source_table(spark, ds, "nope")


def test_excel_through_dataflow(spark, xlsx_path, tmp_path):
    ds = Datastore("XL", "EXCEL", is_src_sys=True, workbook=xlsx_path)
    conf = Conf(app_root=str(tmp_path), datastores={"XL": ds})
    dfl = DataFlow(conf, "excel extract", spark=spark)
    dfl.getDataFromSrc("mapping", "XL")
    got = dfl.getDataFrames("mapping")
    assert got.filter("name = 'alpha'").count() == 1


def test_excel_without_workbook_or_rows_raises(spark):
    ds = Datastore("XL", "EXCEL")
    with pytest.raises(ValueError, match="workbook"):
        read_source_table(spark, ds, "mapping")

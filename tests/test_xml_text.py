"""XML and TEXT datastore connectors: Spark-4-native XML source/sink
roundtrip, raw-text corpus ingestion (line and wholetext modes), and
the text sink's embedded-newline guard."""

import os

import pytest
from pyspark.sql import functions as F

from betl_spark.io.datastore import Datastore
from betl_spark.io.readers import read_source_table
from betl_spark.io.writers import write_text_lines, write_xml


def test_xml_roundtrip_via_datastore(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "id long, name string"
    )
    path = str(tmp_path / "t_items.xml")
    write_xml(src, path, row_tag="item", root_tag="items")
    ds = Datastore(
        "xmlsrc",
        "XML",
        is_src_sys=True,
        path=str(tmp_path),
        extra={"row_tag": "item", "schema": "id bigint, name string"},
    )
    got = read_source_table(spark, ds, "t_items")
    rows = sorted((r["id"], r["name"]) for r in got.collect())
    # NULL name was written as an omitted element -> reads back NULL
    assert rows == [(1, "alpha"), (2, "beta"), (3, None)]


def test_xml_schema_inference_when_unspecified(spark, tmp_path):
    src = spark.createDataFrame([(10, "x")], "a long, b string")
    path = str(tmp_path / "t_inf.xml")
    write_xml(src, path)
    ds = Datastore("xmlsrc2", "XML", is_src_sys=True, path=str(tmp_path))
    got = read_source_table(spark, ds, "t_inf")
    assert [tuple(r) for r in got.collect()] == [(10, "x")]


def test_text_line_mode_and_sink_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [("line one",), ("line two",), ("line three",)], "value string"
    )
    path = str(tmp_path / "t_corpus.txt")
    write_text_lines(src, path)
    ds = Datastore("txtsrc", "TEXT", is_src_sys=True, path=str(tmp_path))
    got = read_source_table(spark, ds, "t_corpus")
    assert sorted(r["value"] for r in got.collect()) == [
        "line one",
        "line three",
        "line two",
    ]


def test_text_sink_rejects_embedded_newlines(spark, tmp_path):
    src = spark.createDataFrame([("a\nb",)], "value string")
    with pytest.raises(Exception, match="embedded"):
        write_text_lines(src, str(tmp_path / "bad.txt"))


def test_text_sink_rejects_lone_carriage_return(spark, tmp_path):
    # LineRecordReader also splits on a lone \r, so the guard must
    # catch it too (round-9 advisor item).
    src = spark.createDataFrame([("a\rb",)], "value string")
    with pytest.raises(Exception, match="embedded"):
        write_text_lines(src, str(tmp_path / "bad_cr.txt"))


def test_text_wholetext_one_doc_per_file_with_path(spark, tmp_path):
    docs = tmp_path / "t_docs.txt"
    docs.mkdir()
    (docs / "a.txt").write_text("doc A\nspans lines")
    (docs / "b.txt").write_text("doc B")
    ds = Datastore(
        "corpus",
        "TEXT",
        is_src_sys=True,
        path=str(tmp_path),
        extra={"wholetext": True, "with_path": True},
    )
    got = read_source_table(spark, ds, "t_docs")
    rows = {
        os.path.basename(r["doc_path"]): r["value"] for r in got.collect()
    }
    assert rows == {"a.txt": "doc A\nspans lines", "b.txt": "doc B"}


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from betl_spark.io.writers import compact_parquet

    path = str(tmp_path / "frag")
    spark.range(10_000).repartition(20).write.parquet(path)
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] == 20
    assert stats["files_after"] == 1  # tiny data, one target-size file
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before  # atomic swap preserved every row


def test_compact_parquet_keeps_hive_partitions(spark, tmp_path):
    from betl_spark.io.writers import compact_parquet
    import os

    path = str(tmp_path / "hive")
    df = spark.range(1000).selectExpr("id", "id % 3 AS part")
    df.repartition(12).write.partitionBy("part").parquet(path)
    stats = compact_parquet(spark, path, target_file_mb=128, partition_by=["part"])
    assert stats["files_after"] < stats["files_before"]
    assert sorted(
        d for d in os.listdir(path) if d.startswith("part=")
    ) == ["part=0", "part=1", "part=2"]
    assert spark.read.parquet(path).count() == 1000

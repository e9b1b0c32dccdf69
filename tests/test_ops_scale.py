"""Scale-operator verbs through the DataFlow API: the betl vocabulary
extended to the corpus operators (ops_scale.py delegates; the operator
modules have their own behavioral tests)."""

import pytest
from pyspark.sql import functions as F

from betl_spark.contract.common import dataflow

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dfl_docs(spark):
    dfl = dataflow(spark, SF, ["documents"])
    dfl.customSQL(
        "SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 1000 AS doc_id, substring(text, 1, length(text) - 15) AS text "
        "FROM documents WHERE doc_id < 20",
        dataset="corpus",
    )
    return dfl


def test_dedupe_near_and_remove(dfl_docs):
    pairs = dfl_docs.dedupeNear("corpus", "doc_id", "text", minEstJaccard=0.5)
    assert {(r.id_a, r.id_b) for r in pairs.collect()}  # mutants found
    n_before = dfl_docs.getDataFrames("corpus").count()
    kept = dfl_docs.removeNearDuplicates(
        "corpus", "doc_id", "text", targetDataset="clean", minEstJaccard=0.5
    )
    n_after = kept.count()
    assert n_after < n_before
    # canonical (minimum-id) survivors: no mutant id should remain when
    # its original was detected as a pair
    survivor_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    detected = {r.id_b for r in pairs.collect() if r.id_b >= 1000}
    assert survivor_ids.isdisjoint(detected)
    assert dfl_docs.getDataFrames("corpus_near_dups") is pairs


def test_quality_filter_and_lang_verbs(dfl_docs):
    feats = dfl_docs.qualityFilter("corpus", "doc_id", "text", min_tokens=40)
    assert set(feats.columns) == {
        "doc_id", "n_tokens", "avg_token_len", "symbol_ratio", "stopword_hits", "keep",
    }
    n_keep = feats.filter("keep").count()
    dfl_docs.qualityFilter(
        "corpus", "doc_id", "text", targetDataset="kept", keepOnly=True, min_tokens=40
    )
    kept = dfl_docs.getDataFrames("kept")
    assert kept.count() == n_keep
    assert set(kept.columns) == {"doc_id", "text"}  # original columns survive
    lang = dfl_docs.langId("corpus", "doc_id", "text")
    assert lang.filter(F.col("lang_pred").isNull()).count() == 0


def test_sampling_and_packing_verbs(spark):
    dfl = dataflow(spark, SF, ["documents"])
    dfl.customSQL(
        "SELECT doc_id, size(split(text, ' ')) AS n_tokens FROM documents",
        dataset="counts",
    )
    dfl.duplicateDataset("counts", ["counts2", "counts3"])
    n = dfl.getDataFrames("counts").count()
    sampled = dfl.sampleHash("counts2", "doc_id", 0.3, targetDataset="sampled")
    assert 0 < sampled.count() < n
    split = dfl.splitTrainValTest("counts3", "doc_id", valPct=10, testPct=10)
    assert {r.split for r in split.select("split").distinct().collect()} == {
        "train", "val", "test",
    }
    packed = dfl.packSequences("counts", "doc_id", "n_tokens", budget=2048, nShards=4)
    assert packed.count() == n
    assert set(packed.columns) == {"doc_id", "n_tokens", "shard", "chunk"}


def test_mixture_quantile_shard_verbs(spark, tmp_path):
    """The round-5 verbs drive the operators through the DataFlow
    vocabulary: journaled, dataset-in/dataset-out."""
    import glob

    from betl_spark.config import Conf
    from betl_spark.dataflow.core import DataFlow

    dfl = DataFlow(Conf(app_root=str(tmp_path)), "r5 verbs", spark=spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dfl.createDataset("docs", docs)

    out = dfl.mixtureSample(
        "docs", "doc_id", "lang", {"en": 0.6, "fr": 0.4},
        targetDataset="mixed",
    )
    assert set(r["lang"] for r in out.select("lang").distinct().collect()) <= {"en", "fr"}

    band = dfl.quantileFilter("docs", "n_chars", 0.25, 0.75, targetDataset="band")
    assert 0 < band.count() < docs.count()

    dfl.createDataset("new_batch", docs.limit(20).withColumn(
        "doc_id", docs["doc_id"] + 10_000_000
    ))
    dups = dfl.dedupeAgainst("new_batch", "docs", "doc_id", "text")
    assert dups.count() >= 20  # verbatim copies are near-dups of originals

    dfl.writeTrainingShards("docs", str(tmp_path / "shards"), "doc_id", 4)
    assert len(glob.glob(f"{tmp_path}/shards/shard=*/*.parquet")) == 4
    journal = [s.op for s in dfl.journal.steps]
    for s in ("mixtureSample", "quantileFilter", "dedupeAgainst",
              "writeTrainingShards"):
        assert s in journal, (s, journal)

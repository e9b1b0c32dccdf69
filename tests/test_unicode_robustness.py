"""Unicode-robustness sweep: engine/oracle parity on multibyte text.

Java string/regex semantics (Spark) and RE2/UTF-8 semantics (DuckDB)
are classic divergence territory for character-indexed operators —
length/substr offsets on multibyte code points, \\w classes on
accents, md5 over non-ASCII. This suite injects accents, CJK, emoji,
combining marks, RTL script, ligatures and math alphanumerics into a
copy of sf0.001's documents (both mixed into existing text and as
pure-unicode documents) and replays every documents-touching contract
pair at driver-grade parity — so a code-point-vs-byte indexing bug in
any text operator (shingles, substring fingerprints, span trims, BPE
encodings, tokenizers) fails CI, not a multilingual corpus.
All 70 pairs agreed on first run (round 8); this pins it.
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

UNI = [
    "café naïve söße straße 汉字漢字 にほんご 한국어 données 🙂🚀 العَرَبِيَّة",
    "Ünïcödé tęst ẑąłç 中文分词 テスト ёжик мир 🎉 ﬀﬁ ﬂigature",
    "áccent combining märks ligature ﬆ ĳ ǆ 𝕌𝕟𝕚𝕔𝕠𝕕𝕖",
]


@pytest.fixture(scope="module")
def uni_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("unidata"))
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)
    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    for i, t in enumerate(UNI):
        docs.loc[docs.index[i * 3], "text"] = (
            t + " " + str(docs.loc[docs.index[i * 3], "text"])
        )
        docs.loc[docs.index[i * 3 + 1], "text"] = t  # pure-unicode doc
    docs.to_parquet(f"{dst}/documents.parquet", index=False)
    return dst


@pytest.fixture(scope="module")
def uni_duck(uni_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{uni_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _doc_touching():
    from betl_spark.contract import ORACLES

    return sorted(n for n, sql in ORACLES.items() if "documents" in sql)


@pytest.mark.parametrize("name", _doc_touching())
def test_query_matches_oracle_with_unicode(spark, uni_dir, uni_duck, name):
    from betl_spark.contract import ORACLES, QUERIES

    sdf = QUERIES[name](spark, uni_dir).toPandas().sort_index(axis=1)
    odf = uni_duck.execute(ORACLES[name]).df().sort_index(axis=1)
    assert list(sdf.columns) == list(odf.columns), name
    s = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
    o = odf.sort_values(list(odf.columns)).reset_index(drop=True)
    assert s.shape == o.shape, f"{name}: {s.shape} vs {o.shape}"
    for c in s.columns:
        assert (
            s[c].astype(str).values == o[c].astype(str).values
        ).all(), f"{name}: column {c} diverges under unicode text"

"""lm_score (bigram LM perplexity) and histogram unit tests."""

import math

from pyspark.sql import functions as F

from betl_spark.operators.corpus import lm_score
from betl_spark.operators.stats import histogram


def test_lm_score_matches_hand_computation(spark):
    # corpus: "a b a", "a b" -> unigrams: a:3, b:2 (V=2)
    # bigrams: (a,b):2, (b,a):1
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in lm_score(docs, "doc_id", "text").collect()}
    V, al = 2, 1.0
    t_ab = round(math.log((2 + al) / (3 + al * V)), 9)
    t_ba = round(math.log((1 + al) / (2 + al * V)), 9)
    exp1 = round((t_ab + t_ba) / 2, 6)
    exp2 = round(t_ab, 6)
    assert rows[1].n_bigrams == 2 and rows[1].avg_logprob == exp1
    assert rows[2].n_bigrams == 1 and rows[2].avg_logprob == exp2
    assert rows[1].ppl == round(math.exp(-exp1), 4)


def test_lm_score_keeps_short_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, None), (3, "a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in lm_score(docs, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].n_bigrams == 0 and rows[1].avg_logprob is None
    assert rows[2].n_bigrams == 0 and rows[2].ppl is None
    assert rows[3].n_bigrams == 1


def test_lm_score_lower_ppl_for_frequent_patterns(spark):
    # a document made of the corpus's dominant pattern scores lower
    # perplexity than a one-off word salad
    base = [(i, "the cat sat on the mat") for i in range(10)]
    docs = spark.createDataFrame(
        base + [(99, "zq xv wk pq")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in lm_score(docs, "doc_id", "text").collect()}
    assert rows[0].ppl < rows[99].ppl


def test_histogram_bins_and_groups(spark):
    df = spark.createDataFrame(
        [("a", 10), ("a", 190), ("a", 210), ("b", 0), ("b", None)],
        "g string, v int",
    )
    rows = sorted(
        map(tuple, histogram(df, "v", 200.0, group_cols=["g"]).collect())
    )
    assert rows == [
        ("a", 0, 0.0, 2),
        ("a", 1, 200.0, 1),
        ("b", 0, 0.0, 1),  # NULL value dropped
    ]


def test_histogram_ungrouped_single_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = histogram(docs, "n_chars", 200.0)
    total = df.agg(F.sum("n")).first()[0]
    assert total == docs.filter(F.col("n_chars").isNotNull()).count()
    import re

    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

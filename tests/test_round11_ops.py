"""Unit tests for the round-11 web/URL curation operators
(betl_spark/operators/web.py) — edge cases the synthetic contract URLs
don't exercise: trailing slashes, empty paths, bare-suffix hosts,
unknown suffixes, NULL/garbage URLs, both blocklist paths."""

import pytest
from pyspark.sql import functions as F

from betl_spark.operators import web


def _one(spark, url):
    df = spark.createDataFrame([(url,)], "url: string")
    row = (
        web.with_url_parts(df, "url")
        .withColumn("rd", web.registered_domain(F.col("host")))
        .withColumn("canon", web.canonical_url(F.col("url")))
        .collect()[0]
    )
    return row


@pytest.mark.parametrize(
    "url,scheme,host,port,path,query",
    [
        (
            "https://www.Example.COM:8443/a/b?x=1&y=2",
            "https", "www.example.com", 8443, "/a/b", "x=1&y=2",
        ),
        ("http://host.io", "http", "host.io", None, "", ""),
        ("https://h.net/", "https", "h.net", None, "/", ""),
        ("ftp://files.org/pub", "ftp", "files.org", None, "/pub", ""),
        ("not a url", "", "", None, "", ""),
    ],
)
def test_url_parts(spark, url, scheme, host, port, path, query):
    r = _one(spark, url)
    assert (r["scheme"], r["host"], r["port"], r["path"], r["query"]) == (
        scheme, host, port, path, query,
    )


def test_url_parts_null(spark):
    r = _one(spark, None)
    assert r["scheme"] is None and r["host"] is None
    assert r["port"] is None and r["canon"] is None


@pytest.mark.parametrize(
    "host,expected",
    [
        ("a.b.site.com", "site.com"),
        ("www.site.co.uk", "site.co.uk"),
        ("site.co.uk", "site.co.uk"),
        ("co.uk", "co.uk"),  # bare two-label suffix → identity
        ("com", "com"),  # bare TLD → identity
        ("192.168.1.4", "192.168.1.4"),  # IPv4 literal → identity
        ("deep.sub.x.ac.uk", "x.ac.uk"),
        ("host.internal", "host.internal"),  # unknown suffix → identity
        (None, None),
    ],
)
def test_registered_domain(spark, host, expected):
    df = spark.createDataFrame([(host,)], "host: string")
    got = df.select(web.registered_domain(F.col("host")).alias("rd")).collect()[0]["rd"]
    assert got == expected


@pytest.mark.parametrize(
    "url,expected",
    [
        # default ports dropped, non-default kept
        ("https://x.com:443/a", "https://x.com/a"),
        ("http://x.com:80/a", "http://x.com/a"),
        ("http://x.com:8080/a", "http://x.com:8080/a"),
        # www stripped, host lowercased
        ("https://WWW.X.com/a", "https://x.com/a"),
        # empty path → '/', trailing slashes stripped
        ("https://x.com", "https://x.com/"),
        ("https://x.com/a/b///", "https://x.com/a/b"),
        ("https://x.com/?b=2&a=1", "https://x.com/?a=1&b=2"),
        # tracking params stripped; all-tracking query drops the '?'
        ("https://x.com/a?utm_source=s&ref=feed", "https://x.com/a"),
        (
            "https://x.com/a?utm_b=1&z=9&a=1",
            "https://x.com/a?a=1&z=9",
        ),
        # unparseable → NULL
        ("garbage", None),
    ],
)
def test_canonical_url(spark, url, expected):
    r = _one(spark, url)
    assert r["canon"] == expected


def test_blocklist_literal_and_dataframe_agree(spark):
    rows = [
        (1, "good.com"),
        (2, "spam.org"),
        (3, None),
        (4, "fine.net"),
    ]
    df = spark.createDataFrame(rows, ["id", "rd"])
    lit = web.blocklist_filter(df, "rd", ["spam.org"])
    bl = spark.createDataFrame([("spam.org",)], ["domain"])
    joined = web.blocklist_filter(df, "rd", bl, spark=spark)
    want = {1, 4}  # NULL domain dropped by BOTH paths
    assert {r["id"] for r in lit.collect()} == want
    assert {r["id"] for r in joined.collect()} == want


def test_blocklist_dataframe_is_broadcast(spark):
    df = spark.createDataFrame([(1, "a.com")], ["id", "rd"])
    bl = spark.createDataFrame([("spam.org",)], ["domain"])
    plan = web.blocklist_filter(df, "rd", bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_canonical_params_sorted_filtered(spark):
    df = spark.createDataFrame([("c=3&a=1&utm_x=9&b=2&ref=r&",)], ["q"])
    got = df.select(
        web.canonical_params(F.col("q")).alias("p")
    ).collect()[0]["p"]
    assert got == "a=1&b=2&c=3"

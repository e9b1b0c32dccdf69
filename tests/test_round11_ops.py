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
        ("", None),  # parse-failure sentinel → NULL, not a ''-domain
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
    # empty literal blocklist = no-op screen (still drops NULL domains)
    none_blocked = web.blocklist_filter(df, "rd", [])
    assert {r["id"] for r in none_blocked.collect()} == {1, 2, 4}


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


# ---- seeded property sweep vs an independent Python reference ----
# (one Spark pass over ~400 generated URLs; the reference implements
# the SAME documented spec with python `re` — an independent engine
# for the parse/eTLD+1/canonicalization semantics)
import random
import re as _re


def _ref_parts(url):
    if url is None:
        return None, None, None, None, None
    m = _re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", url)
    scheme = m.group(1).lower() if m else ""
    m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", url)
    host = m.group(1).lower() if m else ""
    m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:([0-9]+)", url)
    port = int(m.group(1)) if m else None
    m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)", url)
    path = m.group(1) if m else ""
    m = _re.search(r"\?([^#]*)", url)
    query = m.group(1) if m else ""
    return scheme, host, port, path, query


def _ref_reg_domain(host):
    if host is None or host == "":
        return None
    if _re.match(r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$", host):
        return host
    labels = host.split(".")
    last1 = labels[-1] if labels[-1] else ""
    last2 = ".".join(labels[-2:]) if len(labels) >= 2 else ""
    last3 = ".".join(labels[-3:]) if len(labels) >= 3 else ""
    # mirror regexp_extract: a trailing-dot host gives empty last1 and
    # ([^.]+...) never matches empty labels
    if not all(labels[-2:] if len(labels) >= 2 else [last1]):
        last2 = ""
    if len(labels) < 3 or not all(labels[-3:]):
        last3 = ""
    if not labels[-1]:
        last1 = ""
    if last2 in web.TWO_LABEL_SUFFIXES:
        return last3 if last3 else host
    if last1 in web.ONE_LABEL_SUFFIXES:
        return last2 if last2 else host
    return host


def _ref_canonical(url):
    scheme, host, port, path, query = _ref_parts(url)
    if url is None or not scheme or not host:
        return None
    host2 = _re.sub(r"^www\.", "", host)
    keep = port is not None and not (
        (scheme == "http" and port == 80)
        or (scheme == "https" and port == 443)
    )
    port_part = f":{port}" if keep else ""
    p1 = _re.sub(r"/+$", "", path)
    path_part = p1 if p1 else "/"
    toks = [
        t
        for t in query.split("&")
        if t != "" and not t.startswith("utm_") and not t.startswith("ref=")
    ]
    kept = "&".join(sorted(toks))
    q_part = f"?{kept}" if kept else ""
    return f"{scheme}://{host2}{port_part}{path_part}{q_part}"


def _gen_urls(n=400, seed=11):
    rng = random.Random(seed)
    schemes = ["http", "https", "HTTP", "hTTps", "ftp", "", "9bad"]
    subs = ["", "www.", "WWW.", "blog.", "a.b.c.", "x_y."]
    cores = ["site1", "ex-ample", "xn--d", "a", ""]
    sufs = ["com", "org", "co.uk", "ac.uk", "internal", "COM", "io", ""]
    ips = ["192.168.1.4", "10.0.0.1", "999.1.1.1", "1.2.3"]
    ports = ["", ":80", ":443", ":8080", ":0", ":"]
    paths = ["", "/", "/a/b", "/a/b/", "/a//b///", "/%20x", "/p?x"]
    queries = [
        "", "?", "?a=1", "?b=2&a=1", "?utm_source=x", "?ref=r&a=1",
        "?a=1&a=1&b", "?&&a=2", "?A=1&a=1", "?x=%26",
    ]
    frags = ["", "#f", "#a?b=9"]
    out = [None, "", "garbage", "http//x.com", "://x.com", "http://"]
    for _ in range(n):
        host = (
            rng.choice(ips)
            if rng.random() < 0.1
            else rng.choice(subs) + rng.choice(cores) + "." + rng.choice(sufs)
        )
        out.append(
            rng.choice(schemes)
            + "://"
            + host
            + rng.choice(ports)
            + rng.choice(paths)
            + rng.choice(queries)
            + rng.choice(frags)
        )
    return out


def test_url_property_sweep(spark):
    urls = _gen_urls()
    df = spark.createDataFrame([(u,) for u in urls], "url: string")
    rows = (
        web.with_url_parts(df, "url")
        .withColumn("rd", web.registered_domain(F.col("host")))
        .withColumn("canon", web.canonical_url(F.col("url")))
        .collect()
    )
    assert len(rows) == len(urls)
    for u, r in zip(urls, rows):
        scheme, host, port, path, query = _ref_parts(u)
        assert r["scheme"] == scheme, (u, r["scheme"], scheme)
        assert r["host"] == host, (u, r["host"], host)
        assert r["port"] == port, (u, r["port"], port)
        assert r["path"] == path, (u, r["path"], path)
        assert r["query"] == query, (u, r["query"], query)
        want_rd = _ref_reg_domain(host)
        assert r["rd"] == want_rd, (u, host, r["rd"], want_rd)
        want_c = _ref_canonical(u)
        assert r["canon"] == want_c, (u, r["canon"], want_c)

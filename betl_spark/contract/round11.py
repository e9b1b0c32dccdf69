"""Round-11 contract queries: the web/URL curation family
(operators/web.py) — the C4/RefinedWeb-style domain-level pre-filter
stage of a training-data pipeline, the one common pipeline stage the
contract did not yet cover (round-10 verdict ask #8).

The documents table has no URL column, so every query derives a
DETERMINISTIC synthetic URL per doc (the same arithmetic on doc_id in
both engines — see ``_URL_EXPR`` / ``_URL_CTE``): a mix of schemes,
www/blog/cdn subdomains, one- and two-label public suffixes, an
IPv4-literal host, default and non-standard explicit ports, tracking
params, and NULL urls (every ~89th doc), so parsing, eTLD+1 reduction,
canonicalization, and the blocklist screen all exercise their
branches. ``u = doc_id % 101`` drives the URL so each distinct URL is
shared by ~|docs|/101 documents — real dup groups at every SF.

Determinism follows contract/__init__.py's rules: all ratios are
half-away integer-micros (util.round_ratio_expr's machinery — bug #4
class), regex parsing uses only class/quantifier/anchor constructs
(Java regex and RE2 agree), and the composite quality score is
computed entirely in BIGINT micros.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betl_spark.contract.common import table
from betl_spark.operators import web
from betl_spark.operators.text import LANG_STOPWORDS, _stopword_count
from betl_spark.operators.util import round_ratio_expr

QUERIES: dict = {}

BLOCKLIST = ("site3.com", "site7.org", "site1.co.uk", "192.168.1.4")

# ---- deterministic synthetic URL (one spec, two dialect texts) ----
# u = doc_id % 101; url NULL every ~89th doc. Branch census over
# u in 0..100: scheme http (u%5=0) / https; host = IPv4 literal at
# u=13, else [www.|blog.|cdn.img.|''] site(u%13) . suffix(u%6);
# port :8080 (u%11=0), explicit default (u%11=1), none otherwise;
# path /p(u%17)/q(u%13); query = tracking+params / id / tracking-only
# / none by u%4.
_URL_EXPR = """
CASE WHEN doc_id % 89 = 7 THEN CAST(NULL AS STRING) ELSE
  (CASE WHEN __u % 5 = 0 THEN 'http' ELSE 'https' END) || '://' ||
  (CASE WHEN __u = 13 THEN '192.168.1.' || CAST(__u % 9 AS STRING)
        ELSE (CASE __u % 7 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.'
                           WHEN 2 THEN 'cdn.img.' ELSE '' END)
             || 'site' || CAST(__u % 13 AS STRING) || '.' ||
             (CASE __u % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                           WHEN 2 THEN 'net' WHEN 3 THEN 'io'
                           WHEN 4 THEN 'co.uk' ELSE 'com.au' END)
   END) ||
  (CASE WHEN __u % 11 = 0 THEN ':8080'
        WHEN __u % 11 = 1
          THEN (CASE WHEN __u % 5 = 0 THEN ':80' ELSE ':443' END)
        ELSE '' END) ||
  '/p' || CAST(__u % 17 AS STRING) || '/q' || CAST(__u % 13 AS STRING) ||
  (CASE __u % 4
     WHEN 0 THEN '?utm_source=s' || CAST(__u % 10 AS STRING) || '&b=2&a=1'
     WHEN 1 THEN '?id=' || CAST(__u AS STRING)
     WHEN 2 THEN '?b=2&a=1&utm_campaign=x&ref=feed'
     ELSE '' END)
END"""

_URL_CTE = """
docs_u AS (
  SELECT doc_id, text, lang, source, n_chars, doc_id % 101 AS u
  FROM documents
),
urls AS (
  SELECT *,
    CASE WHEN doc_id % 89 = 7 THEN NULL ELSE
      (CASE WHEN u % 5 = 0 THEN 'http' ELSE 'https' END) || '://' ||
      (CASE WHEN u = 13 THEN '192.168.1.' || CAST(u % 9 AS VARCHAR)
            ELSE (CASE u % 7 WHEN 0 THEN 'www.' WHEN 1 THEN 'blog.'
                             WHEN 2 THEN 'cdn.img.' ELSE '' END)
                 || 'site' || CAST(u % 13 AS VARCHAR) || '.' ||
                 (CASE u % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                             WHEN 2 THEN 'net' WHEN 3 THEN 'io'
                             WHEN 4 THEN 'co.uk' ELSE 'com.au' END)
       END) ||
      (CASE WHEN u % 11 = 0 THEN ':8080'
            WHEN u % 11 = 1
              THEN (CASE WHEN u % 5 = 0 THEN ':80' ELSE ':443' END)
            ELSE '' END) ||
      '/p' || CAST(u % 17 AS VARCHAR) || '/q' || CAST(u % 13 AS VARCHAR) ||
      (CASE u % 4
         WHEN 0 THEN '?utm_source=s' || CAST(u % 10 AS VARCHAR) || '&b=2&a=1'
         WHEN 1 THEN '?id=' || CAST(u AS VARCHAR)
         WHEN 2 THEN '?b=2&a=1&utm_campaign=x&ref=feed'
         ELSE '' END)
    END AS url
  FROM docs_u
)"""

# parsed parts + registered domain + canonical URL, as a reusable CTE
# chain (the DuckDB mirror of operators/web.py — every regex and CASE
# is the same construct the Spark side codegens)
_ONES = ", ".join(f"'{s}'" for s in web.ONE_LABEL_SUFFIXES)
_TWOS = ", ".join(f"'{s}'" for s in web.TWO_LABEL_SUFFIXES)

_PARSE_CTE = f"""
parts AS (
  SELECT *,
    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
      AS scheme,
    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
      AS host,
    CAST(NULLIF(regexp_extract(
      url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:([0-9]+)', 1), '') AS INT)
      AS port,
    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)', 1)
      AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS query
  FROM urls
),
rd AS (
  SELECT *,
    CASE WHEN host IS NULL OR host = '' THEN NULL
         WHEN regexp_matches(host,
           '^[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}$')
           THEN host
         WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) IN ({_TWOS})
           THEN CASE WHEN regexp_extract(
                       host, '([^.]+\\.[^.]+\\.[^.]+)$', 1) <> ''
                     THEN regexp_extract(
                       host, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
                     ELSE host END
         WHEN regexp_extract(host, '([^.]+)$', 1) IN ({_ONES})
           THEN CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) <> ''
                     THEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
                     ELSE host END
         ELSE host END AS reg_domain
  FROM parts
),
canon AS (
  SELECT *,
    CASE WHEN scheme <> '' AND host <> '' THEN
      scheme || '://' || regexp_replace(host, '^www\\.', '') ||
      (CASE WHEN port IS NOT NULL
                 AND NOT ((scheme = 'http' AND port = 80)
                          OR (scheme = 'https' AND port = 443))
            THEN ':' || CAST(port AS VARCHAR) ELSE '' END) ||
      (CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
            ELSE regexp_replace(path, '/+$', '') END) ||
      (CASE WHEN kept = '' THEN '' ELSE '?' || kept END)
    END AS canonical
  FROM (
    SELECT *,
      -- coalesce: DuckDB array_to_string([]) is NULL where Spark's
      -- array_join([]) is '' (query NULL stays NULL via the outer
      -- scheme/host guard)
      coalesce(array_to_string(list_sort(list_filter(
        string_split(query, '&'),
        t -> t <> '' AND t NOT LIKE 'utm_%' AND t NOT LIKE 'ref=%')),
        '&'), '') AS kept
    FROM rd
  )
)"""


def _docs(spark, sf_dir):
    """documents + synthetic url column (the Spark twin of _URL_CTE)."""
    from betl_spark.operators.util import ensure_parallelism

    # the web family stacks URL-parse regexes and per-row text stats
    # on this scan: one-split parallelism guard (no-op at real scale)
    d = ensure_parallelism(table(spark, sf_dir, "documents")).withColumn(
        "__u", F.expr("doc_id % 101")
    )
    return d.withColumn("url", F.expr(_URL_EXPR))


def _parsed(spark, sf_dir):
    d = web.with_url_parts(_docs(spark, sf_dir), "url")
    return d.withColumn(
        "reg_domain", web.registered_domain(F.col("host"))
    ).withColumn("canonical", web.canonical_url(F.col("url")))


def _micros(num_sql: str, den_sql: str):
    """Integer half-away 6dp-micros of a NONNEGATIVE ratio (BIGINT)."""
    return F.expr(
        f"CASE WHEN ({den_sql}) > 0 THEN "
        f"(2 * ({num_sql}) * 1000000 + ({den_sql})) DIV (2 * ({den_sql})) "
        f"END"
    )


def _micros_sql(num: str, den: str) -> str:
    return (
        f"CASE WHEN ({den}) > 0 THEN "
        f"(2 * ({num}) * 1000000 + ({den})) // (2 * ({den})) END"
    )


# ---- 1. url_parse_docs: per-doc component extraction ----
def q_url_parse(spark, sf_dir):
    """Pure-projection URL parsing (operators/web.py:with_url_parts):
    five regexp_extracts in one codegen span, no shuffle, NULL-safe."""
    return _parsed(spark, sf_dir).select(
        "doc_id", "url", "scheme", "host", "port", "path",
        F.col("query").alias("query_raw"),
    )


URL_PARSE_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE}
SELECT doc_id, url, scheme, host, port, path, query AS query_raw
FROM canon
"""
QUERIES["url_parse_docs"] = (q_url_parse, URL_PARSE_SQL)


# ---- 2. url_canonical_dedup: canonical-key dup groups ----
def q_url_canonical_dedup(spark, sf_dir):
    """Canonical-URL dedup keying (www-strip, default-port drop,
    tracking-param strip, param sort): one hash-agg on the canonical
    key computed during the scan."""
    d = _parsed(spark, sf_dir).where(F.col("canonical").isNotNull())
    return d.groupBy("canonical").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.countDistinct("source").alias("n_sources"),
    )


URL_CANONICAL_DEDUP_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE}
SELECT canonical,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc_id,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM canon WHERE canonical IS NOT NULL
GROUP BY canonical
"""
QUERIES["url_canonical_dedup"] = (q_url_canonical_dedup, URL_CANONICAL_DEDUP_SQL)


# ---- 3. registered_domain_rollup ----
def q_registered_domain_rollup(spark, sf_dir):
    """eTLD+1 reduction (operators/web.py:registered_domain — pure
    regex + IN-set, no join) + per-domain rollup: ONE shuffle on a
    bounded-cardinality key."""
    d = _parsed(spark, sf_dir).where(F.col("reg_domain").isNotNull())
    agg = d.groupBy("reg_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("url").alias("n_urls"),
        F.sum("n_chars").alias("__c"),
        F.count("n_chars").alias("__cn"),
    )
    # den can be 0 when every n_chars in a group is NULL — guard, ANSI
    return agg.select(
        "reg_domain",
        "n_docs",
        "n_hosts",
        "n_urls",
        F.when(
            F.col("__cn") > 0, round_ratio_expr("__c", "__cn", 6)
        ).alias("mean_chars"),
    )


REGISTERED_DOMAIN_ROLLUP_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE}
SELECT reg_domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
       CAST(CASE WHEN count(n_chars) > 0 THEN
         (CASE WHEN sum(n_chars) < 0
               THEN -((2 * abs(sum(n_chars)) * 1000000 + count(n_chars))
                      // (2 * count(n_chars)))
               ELSE ((2 * abs(sum(n_chars)) * 1000000 + count(n_chars))
                     // (2 * count(n_chars))) END)
         END AS DOUBLE) / 1000000.0 AS mean_chars
FROM canon WHERE reg_domain IS NOT NULL
GROUP BY reg_domain
"""
QUERIES["registered_domain_rollup"] = (
    q_registered_domain_rollup,
    REGISTERED_DOMAIN_ROLLUP_SQL,
)


# ---- 4. domain_quality_rollup ----
_STOPS = LANG_STOPWORDS["en"]
_STOPS_SQL = ", ".join(f"'{w}'" for w in _STOPS)


def q_domain_quality_rollup(spark, sf_dir):
    """Per-domain text-quality screen: mean words/doc, corpus stopword
    ratio, short-doc share — the cheap filters a web pipeline runs
    before any model-based scoring. All ratios integer-micros."""
    d = _parsed(spark, sf_dir).where(F.col("reg_domain").isNotNull())
    d = d.withColumn(
        "__words",
        F.expr("size(filter(split(text, ' '), t -> t != ''))").cast("long"),
    ).withColumn("__stops", _stopword_count("text", _STOPS).cast("long"))
    agg = d.groupBy("reg_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__words").alias("__w"),
        F.sum("__stops").alias("__s"),
        F.sum(F.when(F.col("n_chars") < 200, 1).otherwise(0))
        .cast("long")
        .alias("__short"),
    )
    return agg.select(
        "reg_domain",
        "n_docs",
        round_ratio_expr("__w", "n_docs", 6).alias("mean_words"),
        # __w can be 0 (all-empty texts in a domain) — guard, ANSI
        F.when(F.col("__w") > 0, round_ratio_expr("__s", "__w", 6)).alias(
            "stop_ratio"
        ),
        round_ratio_expr("__short", "n_docs", 6).alias("short_share"),
    )


DOMAIN_QUALITY_ROLLUP_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE},
q AS (
  SELECT reg_domain,
         len(list_filter(string_split(text, ' '), t -> t <> ''))
           AS words,
         len(list_filter(string_split(text, ' '),
             t -> t IN ({_STOPS_SQL}))) AS stops,
         CASE WHEN n_chars < 200 THEN 1 ELSE 0 END AS short
  FROM canon WHERE reg_domain IS NOT NULL
),
a AS (
  SELECT reg_domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(words) AS BIGINT) AS w, CAST(sum(stops) AS BIGINT) AS s,
         CAST(sum(short) AS BIGINT) AS short_n
  FROM q GROUP BY reg_domain
)
SELECT reg_domain, n_docs,
       CAST({_micros_sql('w', 'n_docs')} AS DOUBLE) / 1000000.0
         AS mean_words,
       CAST({_micros_sql('s', 'w')} AS DOUBLE) / 1000000.0 AS stop_ratio,
       CAST({_micros_sql('short_n', 'n_docs')} AS DOUBLE) / 1000000.0
         AS short_share
FROM a
"""
QUERIES["domain_quality_rollup"] = (
    q_domain_quality_rollup,
    DOMAIN_QUALITY_ROLLUP_SQL,
)


# ---- 5. domain_dedup_rates ----
def q_domain_dedup_rates(spark, sf_dir):
    """Per-domain duplication pressure: canonical-URL dup rate and
    exact-text (md5) dup rate — the per-domain signals a curation
    stage thresholds on. Restricted to docs WITH a url (no-provenance
    docs are dropped before dedup in a real pipeline)."""
    d = _parsed(spark, sf_dir).where(F.col("url").isNotNull())
    agg = d.groupBy("reg_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canonical").alias("n_canonical"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_texts"),
    )
    return agg.select(
        "reg_domain",
        "n_docs",
        "n_canonical",
        round_ratio_expr("n_docs - n_canonical", "n_docs", 6).alias(
            "url_dup_rate"
        ),
        round_ratio_expr("n_docs - n_texts", "n_docs", 6).alias(
            "text_dup_rate"
        ),
    )


DOMAIN_DEDUP_RATES_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE},
a AS (
  SELECT reg_domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
         CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_texts
  FROM canon WHERE url IS NOT NULL
  GROUP BY reg_domain
)
SELECT reg_domain, n_docs, n_canonical,
       CAST({_micros_sql('n_docs - n_canonical', 'n_docs')} AS DOUBLE)
         / 1000000.0 AS url_dup_rate,
       CAST({_micros_sql('n_docs - n_texts', 'n_docs')} AS DOUBLE)
         / 1000000.0 AS text_dup_rate
FROM a
"""
QUERIES["domain_dedup_rates"] = (q_domain_dedup_rates, DOMAIN_DEDUP_RATES_SQL)


# ---- 6. domain_blocklist_filter (broadcast anti-join path) ----
def q_domain_blocklist_filter(spark, sf_dir):
    """Blocklist screen through the broadcast-anti-join path
    (operators/web.py:blocklist_filter with a DataFrame): the 100 TB
    side never shuffles; per-source survivor counts after the screen."""
    d = _parsed(spark, sf_dir)
    bl = spark.createDataFrame([(b,) for b in BLOCKLIST], ["domain"])
    kept = web.blocklist_filter(d, "reg_domain", bl, spark=spark)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("reg_domain").alias("n_domains"),
    )


_BL_SQL = ", ".join(f"'{b}'" for b in BLOCKLIST)
DOMAIN_BLOCKLIST_FILTER_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE}
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT reg_domain) AS BIGINT) AS n_domains
FROM canon
WHERE reg_domain IS NOT NULL AND reg_domain NOT IN ({_BL_SQL})
GROUP BY source
"""
QUERIES["domain_blocklist_filter"] = (
    q_domain_blocklist_filter,
    DOMAIN_BLOCKLIST_FILTER_SQL,
)


# ---- 7. host_port_audit ----
def q_host_port_audit(spark, sf_dir):
    """Scheme x port-class x ip-host census — the anomaly screen for
    origin metadata (explicit default ports, non-standard ports, raw
    IP hosts)."""
    d = _parsed(spark, sf_dir).where(F.col("url").isNotNull())
    port_class = (
        F.when(F.col("port").isNull(), "none")
        .when(
            ((F.col("scheme") == "http") & (F.col("port") == 80))
            | ((F.col("scheme") == "https") & (F.col("port") == 443)),
            "default",
        )
        .otherwise("nonstandard")
    )
    return (
        d.withColumn("port_class", port_class)
        .withColumn("is_ip", web.is_ip_host(F.col("host")))
        .groupBy("scheme", "port_class", "is_ip")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
        )
    )


HOST_PORT_AUDIT_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE}
SELECT scheme,
       CASE WHEN port IS NULL THEN 'none'
            WHEN (scheme = 'http' AND port = 80)
                 OR (scheme = 'https' AND port = 443) THEN 'default'
            ELSE 'nonstandard' END AS port_class,
       regexp_matches(host,
         '^[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}$')
         AS is_ip,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM canon WHERE url IS NOT NULL
GROUP BY 1, 2, 3
"""
QUERIES["host_port_audit"] = (q_host_port_audit, HOST_PORT_AUDIT_SQL)


# ---- 8. url_param_stats ----
def q_url_param_stats(spark, sf_dir):
    """Per-source tracking-param profile: how much of a source's URL
    space carries utm_/ref= params, and the mean count of SURVIVING
    params — the signal for source-level canonicalization savings."""
    d = _parsed(spark, sf_dir).where(F.col("url").isNotNull())
    raw = F.expr("size(filter(split(query, '&'), t -> t != ''))").cast(
        "long"
    )
    kept = F.expr(
        "size(filter(split(query, '&'), t -> t != '' "
        "AND t NOT LIKE 'utm_%' AND t NOT LIKE 'ref=%'))"
    ).cast("long")
    d = d.withColumn("__raw", raw).withColumn("__kept", kept)
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("__raw") > F.col("__kept"), 1).otherwise(0))
        .cast("long")
        .alias("__tracked"),
        F.sum("__kept").alias("__k"),
    )
    return agg.select(
        "source",
        "n_docs",
        round_ratio_expr("__tracked", "n_docs", 6).alias("tracking_share"),
        round_ratio_expr("__k", "n_docs", 6).alias("mean_kept_params"),
    )


URL_PARAM_STATS_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE},
p AS (
  SELECT source,
         len(list_filter(string_split(query, '&'), t -> t <> ''))
           AS raw,
         len(list_filter(string_split(query, '&'),
             t -> t <> '' AND t NOT LIKE 'utm_%' AND t NOT LIKE 'ref=%'))
           AS kept
  FROM canon WHERE url IS NOT NULL
),
a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN raw > kept THEN 1 ELSE 0 END) AS BIGINT)
           AS tracked,
         CAST(sum(kept) AS BIGINT) AS k
  FROM p GROUP BY source
)
SELECT source, n_docs,
       CAST({_micros_sql('tracked', 'n_docs')} AS DOUBLE) / 1000000.0
         AS tracking_share,
       CAST({_micros_sql('k', 'n_docs')} AS DOUBLE) / 1000000.0
         AS mean_kept_params
FROM a
"""
QUERIES["url_param_stats"] = (q_url_param_stats, URL_PARAM_STATS_SQL)


# ---- 9. subdomain_profile ----
def q_subdomain_profile(spark, sf_dir):
    """Per-registered-domain host diversity: distinct full hosts,
    www share, and max subdomain depth (labels beyond the registered
    domain) — IP-literal hosts excluded."""
    d = _parsed(spark, sf_dir).where(
        F.col("reg_domain").isNotNull() & ~web.is_ip_host(F.col("host"))
    )
    depth = (
        F.size(F.split(F.col("host"), "\\."))
        - F.size(F.split(F.col("reg_domain"), "\\."))
    ).cast("long")
    agg = d.withColumn("__depth", depth).groupBy("reg_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.sum(F.when(F.col("host").like("www.%"), 1).otherwise(0))
        .cast("long")
        .alias("__www"),
        F.max("__depth").alias("max_sub_depth"),
    )
    return agg.select(
        "reg_domain",
        "n_docs",
        "n_hosts",
        round_ratio_expr("__www", "n_docs", 6).alias("www_share"),
        "max_sub_depth",
    )


SUBDOMAIN_PROFILE_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE},
h AS (
  SELECT reg_domain, host,
         CAST(len(string_split(host, '.'))
              - len(string_split(reg_domain, '.')) AS BIGINT) AS depth
  FROM canon
  WHERE reg_domain IS NOT NULL AND NOT regexp_matches(host,
    '^[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}$')
),
a AS (
  SELECT reg_domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
         CAST(sum(CASE WHEN host LIKE 'www.%' THEN 1 ELSE 0 END)
              AS BIGINT) AS www_n,
         max(depth) AS max_sub_depth
  FROM h GROUP BY reg_domain
)
SELECT reg_domain, n_docs, n_hosts,
       CAST({_micros_sql('www_n', 'n_docs')} AS DOUBLE) / 1000000.0
         AS www_share,
       max_sub_depth
FROM a
"""
QUERIES["subdomain_profile"] = (q_subdomain_profile, SUBDOMAIN_PROFILE_SQL)


# ---- 10. web_curation_pipeline (flagship) ----
CURATION_MIN_DOCS = 3
CURATION_MIN_QUALITY_MICRO = 300_000  # quality >= 0.3


def q_web_curation_pipeline(spark, sf_dir):
    """End-to-end web curation: parse → eTLD+1 → blocklist screen
    (literal IN-set path: constant-folded into the scan) → per-domain
    quality/dup rollup → threshold filter. The composite quality
    0.5·min(1, mean_words/50) + 0.3·stop_ratio + 0.2·(1−url_dup_rate)
    is computed ENTIRELY in BIGINT micros (no double round anywhere —
    the bug-#4 discipline), one scan + one shuffle total."""
    d = _parsed(spark, sf_dir).where(F.col("url").isNotNull())
    d = web.blocklist_filter(d, "reg_domain", BLOCKLIST)
    d = d.withColumn(
        "__words",
        F.expr("size(filter(split(text, ' '), t -> t != ''))").cast("long"),
    ).withColumn("__stops", _stopword_count("text", _STOPS).cast("long"))
    agg = d.groupBy("reg_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canonical").alias("n_canonical"),
        F.sum("__words").alias("__w"),
        F.sum("__stops").alias("__s"),
    )
    scored = agg.select(
        "reg_domain",
        "n_docs",
        "n_canonical",
        _micros("__w", "n_docs").alias("__mw_micro"),
        _micros("__s", "__w").alias("__stop_micro"),
        _micros("n_docs - n_canonical", "n_docs").alias("__dup_micro"),
    ).select(
        "reg_domain",
        "n_docs",
        "n_canonical",
        (F.col("__mw_micro").cast("double") / F.lit(1e6)).alias(
            "mean_words"
        ),
        (F.col("__stop_micro").cast("double") / F.lit(1e6)).alias(
            "stop_ratio"
        ),
        (F.col("__dup_micro").cast("double") / F.lit(1e6)).alias(
            "url_dup_rate"
        ),
        (
            F.expr(
                "(5 * least(__mw_micro DIV 50, 1000000) "
                "+ 3 * __stop_micro "
                "+ 2 * (1000000 - __dup_micro)) DIV 10"
            ).alias("__q_micro")
        ),
    )
    return scored.where(
        (F.col("n_docs") >= CURATION_MIN_DOCS)
        & (
            F.col("__q_micro") >= CURATION_MIN_QUALITY_MICRO
        )
    ).select(
        "reg_domain",
        "n_docs",
        "n_canonical",
        "mean_words",
        "stop_ratio",
        "url_dup_rate",
        (F.col("__q_micro").cast("double") / F.lit(1e6)).alias("quality"),
    )


WEB_CURATION_PIPELINE_SQL = f"""
WITH {_URL_CTE}, {_PARSE_CTE},
f AS (
  SELECT reg_domain, canonical,
         len(list_filter(string_split(text, ' '), t -> t <> ''))
           AS words,
         len(list_filter(string_split(text, ' '),
             t -> t IN ({_STOPS_SQL}))) AS stops
  FROM canon
  WHERE url IS NOT NULL AND reg_domain IS NOT NULL
    AND reg_domain NOT IN ({_BL_SQL})
),
a AS (
  SELECT reg_domain, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT canonical) AS BIGINT) AS n_canonical,
         CAST(sum(words) AS BIGINT) AS w, CAST(sum(stops) AS BIGINT) AS s
  FROM f GROUP BY reg_domain
),
m AS (
  SELECT reg_domain, n_docs, n_canonical,
         {_micros_sql('w', 'n_docs')} AS mw_micro,
         {_micros_sql('s', 'w')} AS stop_micro,
         {_micros_sql('n_docs - n_canonical', 'n_docs')} AS dup_micro
  FROM a
),
q AS (
  SELECT *,
         (5 * least(mw_micro // 50, 1000000) + 3 * stop_micro
          + 2 * (1000000 - dup_micro)) // 10 AS q_micro
  FROM m
)
SELECT reg_domain, n_docs, n_canonical,
       CAST(mw_micro AS DOUBLE) / 1000000.0 AS mean_words,
       CAST(stop_micro AS DOUBLE) / 1000000.0 AS stop_ratio,
       CAST(dup_micro AS DOUBLE) / 1000000.0 AS url_dup_rate,
       CAST(q_micro AS DOUBLE) / 1000000.0 AS quality
FROM q
WHERE n_docs >= {CURATION_MIN_DOCS}
  AND q_micro >= {CURATION_MIN_QUALITY_MICRO}
"""
QUERIES["web_curation_pipeline"] = (
    q_web_curation_pipeline,
    WEB_CURATION_PIPELINE_SQL,
)

"""Round-14 contract queries: the mergeable HISTOGRAM quantile sketch
family (operators/sketches.py family 2) — the round-13 verdict's ask
#7. ``percentile_approx`` answers per-query but is not mergeable; the
equi-width bin-count vector completes the HLL symmetry: scan the fact
table once per ingest window, persist a ~0.5 KB vector per group, and
answer every coarser rollup by VECTOR SUM — which, unlike HLL union,
is exact, so the rolled-up histogram is bit-identical to a direct one.

Oracle strategy (stronger than the round-13 quantile contract where
only n was value-matched): histogram bin counts and the chosen
quantile bin are DETERMINISTIC INTEGER facts DuckDB can recompute
independently — the bin index is plain IEEE double arithmetic in a
pinned operation order (operators/sketches.py:histogram_bin_sql, one
SQL text for both dialects), the counts are exact, and the selection
predicate ``100*cum >= p*n`` is integer. So both queries here value-
match the full output, with only the Spark-side raw-data rank audit
pinned TRUE (same adjudicated pattern as sketch_distinct_accuracy).

Domain constants: events.value is a long-tailed double in
[0.01, ~560]; [lo, hi) = [0.0, 256.0) with 64 bins gives width 4.0 —
an exact power-of-two binary width, so the bin expression's multiply
and divide are exact scalings (floor(v * 64 / 256) == floor(v/4) with
zero rounding hazard) — and routes the real >256 tail through the
overflow bin, keeping the clamp/overflow paths exercised by data, not
just by tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betl_spark.contract.common import table, ts_micros
from betl_spark.operators import sketches

QUERIES: dict = {}

#: histogram domain for events.value (see module docstring)
_LO, _HI, _B = 0.0, 256.0, 64

#: shared bin-index SQL (both dialects) over the events.value column
_BIN_SQL = sketches.histogram_bin_sql("value", _LO, _HI, _B)


def _daily_rolled(spark, sf_dir):
    """The family's production shape: per-(event_type, day) sketch
    table (the ONE fact scan), rolled up to event_type by vector sum.
    Going through the daily grain keeps mergeability in the audited
    path — a wrong merge breaks the value match downstream."""
    ev0 = table(spark, sf_dir, "events")
    ev = ev0.select(
        "event_type",
        "value",
        (ts_micros(ev0) / F.lit(86_400_000_000)).cast("long").alias("day"),
    )
    daily = sketches.histogram_sketch(
        ev, ["event_type", "day"], "value", _LO, _HI, _B
    )
    return ev, sketches.merge_histograms(daily, ["event_type"], _B)


# ---- 1. hist_sketch_bins: the rolled-up histogram itself, every bin
# value-matched against DuckDB's independent exact census ----


def q_hist_sketch_bins(spark, sf_dir):
    """Dense rolled-up histogram: one row per (event_type, bin)
    including empty bins — the dense-vector contract is itself under
    test. The Spark side goes fact scan -> daily sketches -> vector-sum
    rollup; the oracle computes the same census directly, so any
    defect in binning, densify, or merge breaks the value match."""
    _, rolled = _daily_rolled(spark, sf_dir)
    return rolled.select(
        "event_type", F.posexplode("hist_bins").alias("bin", "bin_n")
    ).select("event_type", F.col("bin").cast("long").alias("bin"), "bin_n")


HIST_SKETCH_BINS_SQL = f"""
WITH census AS (
  SELECT event_type, {_BIN_SQL} AS bin, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
bins AS (SELECT UNNEST(range(0, {_B + 2})) AS bin),
types AS (SELECT DISTINCT event_type FROM events WHERE value IS NOT NULL)
SELECT t.event_type,
       CAST(b.bin AS BIGINT) AS bin,
       CAST(coalesce(c.n, 0) AS BIGINT) AS bin_n
FROM types t CROSS JOIN bins b
LEFT JOIN census c ON c.event_type = t.event_type AND c.bin = b.bin
"""
QUERIES["hist_sketch_bins"] = (q_hist_sketch_bins, HIST_SKETCH_BINS_SQL)


# ---- 2. hist_quantile_mergeable: quantiles answered FROM the rolled
# sketch — chosen bin and edges value-matched (DuckDB re-derives them
# from its own exact census), rank guarantee audited against raw data ----


def q_hist_quantile_mergeable(spark, sf_dir):
    """Per event type and p in {50, 90, 99}: the quantile bin chosen
    from the daily->rolled sketch chain, its value edges, and the
    Spark-side rank audit — exact integer arithmetic against the RAW
    fact rows: count(value < bin_lo) must fall short of the target
    rank and count(value <= bin_hi) must reach it (the histogram
    guarantee: the true p-quantile lies inside the chosen bin; NULL
    edges — the unbounded side of under/overflow bins — make their
    side of the audit vacuous). The oracle re-derives bin and edges
    independently, so the selection logic is value-matched, not just
    TRUE-pinned; rank_ok is the adjudicated TRUE-pin pattern."""
    ev, rolled = _daily_rolled(spark, sf_dir)
    q = sketches.histogram_quantiles(
        rolled, ["event_type"], [50, 90, 99], _LO, _HI, _B
    )
    audit = (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "p_pct", "n_values", "bin")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("bin_lo"), 1).otherwise(0)
            ).cast("long").alias("__n_lt_lo"),
            F.sum(
                F.when(
                    F.col("bin_hi").isNull()
                    | (F.col("value") <= F.col("bin_hi")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("__n_le_hi"),
        )
    )
    n, p = F.col("n_values"), F.col("p_pct")
    rank_ok = (F.col("__n_lt_lo") * 100 < p * n) & (
        F.col("__n_le_hi") * 100 >= p * n
    )
    # re-attach the edges (audit grouped on the integer keys only)
    return audit.join(
        q.select("event_type", "p_pct", "bin", "bin_lo", "bin_hi"),
        ["event_type", "p_pct", "bin"],
    ).select(
        "event_type",
        "p_pct",
        "n_values",
        "bin",
        "bin_lo",
        "bin_hi",
        rank_ok.alias("rank_ok"),
    )


HIST_QUANTILE_MERGEABLE_SQL = f"""
WITH census AS (
  SELECT event_type, {_BIN_SQL} AS bin, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bin,
         sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS n_values
  FROM census
),
ps AS (SELECT UNNEST([50, 90, 99]) AS p_pct),
best AS (
  SELECT event_type, p_pct, n_values, min(bin) AS bin
  FROM cum CROSS JOIN ps
  WHERE 100 * cum >= p_pct * n_values
  GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(p_pct AS BIGINT) AS p_pct,
       CAST(n_values AS BIGINT) AS n_values,
       CAST(bin AS BIGINT) AS bin,
       CASE WHEN bin = 0 THEN NULL
            WHEN bin = {_B + 1} THEN {_HI!r}
            ELSE {_LO!r} + (bin - 1) * {(_HI - _LO) / _B!r} END AS bin_lo,
       CASE WHEN bin = {_B + 1} THEN NULL
            WHEN bin = 0 THEN {_LO!r}
            ELSE {_LO!r} + bin * {(_HI - _LO) / _B!r} END AS bin_hi,
       TRUE AS rank_ok
FROM best
"""
QUERIES["hist_quantile_mergeable"] = (
    q_hist_quantile_mergeable,
    HIST_QUANTILE_MERGEABLE_SQL,
)


# ---- 3. topk_sketch_heavyhitters: mergeable offline-Misra-Gries
# heavy-hitter summaries over document tokens, per-source top-10 from
# shard-merged bounds — the ENTIRE construction (shard censuses,
# thresholds, residuals, merged exact-integer bounds, final ranking)
# is replayed independently by the DuckDB oracle, so every output
# column is value-matched; nothing is TRUE-pinned ----

#: Misra-Gries budget per (source, shard) summary; the synthetic word
#: pool has ~60-100 distinct tokens per slice, so m=16 exercises REAL
#: truncation (t > 0) at every scale (m=64 would degenerate to an
#: exact census on this corpus)
_TOPK_M = 16

#: shards per source (the "daily partition" axis of the rehearsal)
_SHARDS = 8

#: final top-k per source from the merged bounds
_TOPK_OUT = 10


def q_topk_sketch_heavyhitters(spark, sf_dir):
    """Per source: the top-10 tokens by merged-summary LOWER bound
    (ties broken by token), with the exact-integer bound interval and
    the independently-computed exact count. The Spark side goes
    fact scan -> per-(source, shard) Misra-Gries summaries ->
    bound-merge to source grain -> rank; the oracle rebuilds the same
    summaries from scratch in SQL. ``exact_n`` always lands inside
    [est_lo, est_hi] by construction — and because BOTH engines
    compute all three columns independently, a defect in thresholds,
    residuals, or the absent-partition accounting breaks the value
    match rather than a self-referential boolean."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select(
        "source", (F.col("doc_id") % _SHARDS).alias("shard"), "text"
    )
    toks = docs.select(
        "source", "shard", F.explode(F.split("text", " ")).alias("token")
    )
    sk = sketches.topk_sketch(toks, ["source", "shard"], "token", _TOPK_M)
    merged = sketches.merge_topk_sketches(sk, ["source"]).withColumnRenamed(
        "item", "token"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("est_lo").desc(), F.col("token")
    )
    top = merged.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= _TOPK_OUT
    )
    exact = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    return top.join(exact, ["source", "token"]).select(
        "source",
        F.col("rank").cast("long").alias("rank"),
        "token",
        "est_lo",
        "est_hi",
        "exact_n",
    )


TOPK_SKETCH_HEAVYHITTERS_SQL = f"""
WITH toks AS (
  SELECT source, doc_id % {_SHARDS} AS shard,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
census AS (
  SELECT source, shard, token, CAST(count(*) AS BIGINT) AS c
  FROM toks WHERE token IS NOT NULL GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY source, shard ORDER BY c DESC, token) AS rn
  FROM census
),
thresh AS (
  SELECT source, shard,
         CAST(coalesce(max(CASE WHEN rn = {_TOPK_M + 1} THEN c END), 0)
              AS BIGINT) AS t
  FROM ranked GROUP BY 1, 2
),
summary AS (
  SELECT c.source, c.shard, c.token, c.c - th.t AS residual, th.t
  FROM census c JOIN thresh th USING (source, shard)
  WHERE c.c > th.t
),
meta AS (SELECT source, CAST(sum(t) AS BIGINT) AS t_total FROM thresh GROUP BY 1),
merged AS (
  SELECT s.source, s.token,
         CAST(sum(s.residual + s.t) AS BIGINT) AS est_lo,
         CAST(sum(s.t) AS BIGINT) AS t_present
  FROM summary s GROUP BY 1, 2
),
bounds AS (
  SELECT m.source, m.token, m.est_lo,
         m.est_lo + mt.t_total - m.t_present AS est_hi
  FROM merged m JOIN meta mt USING (source)
),
top AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY est_lo DESC, token) AS rank
  FROM bounds QUALIFY rank <= {_TOPK_OUT}
),
exact AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS exact_n
  FROM toks GROUP BY 1, 2
)
SELECT t.source, CAST(t.rank AS BIGINT) AS rank, t.token,
       t.est_lo, CAST(t.est_hi AS BIGINT) AS est_hi, e.exact_n
FROM top t JOIN exact e USING (source, token)
"""
QUERIES["topk_sketch_heavyhitters"] = (
    q_topk_sketch_heavyhitters,
    TOPK_SKETCH_HEAVYHITTERS_SQL,
)


# ---- 4. kmv_distinct_mergeable: bottom-k (KMV) sketches — the
# fourth mergeable family. Spark takes the SHARDED path (daily
# sketches -> lossless merge -> exact-integer estimate); the oracle
# computes the DIRECT global bottom-k in SQL. Because bottom-k merge
# is exact (the k smallest hashes of a union are among the union of
# each shard's k smallest), the two paths must agree bit-for-bit —
# the value match IS the mergeability proof. Every column (kept-row
# count, k-th hash, estimate, exact count, error in permille) is an
# exact integer both engines derive independently; nothing is
# TRUE-pinned. ----

#: bottom-k budget: rse ~ 1/sqrt(k-2) ~= 13%; per-type distinct users
#: are 150/1.5k/15k at sf0.01/0.1/1, so the estimator path (n > k)
#: is exercised at every scale
_KMV_K = 64

#: (k-1) * 2^48 — the estimator numerator, an exact long literal
#: shared with the oracle text
_KMV_NUM = (_KMV_K - 1) * sketches.KMV_HASH_SPACE


def q_kmv_distinct_mergeable(spark, sf_dir):
    """Per event type: distinct-user estimate from the daily->merged
    bottom-k sketch chain vs the exact count. distinct_est and
    err_permille are exact integer arithmetic (``div``), so the oracle
    value-matches the estimator itself, not a band."""
    ev0 = table(spark, sf_dir, "events")
    ev = ev0.select(
        "event_type",
        "user_id",
        (ts_micros(ev0) / F.lit(86_400_000_000)).cast("long").alias("day"),
    )
    daily = sketches.kmv_sketch(ev, ["event_type", "day"], "user_id", _KMV_K)
    merged = sketches.merge_kmv_sketches(daily, ["event_type"], _KMV_K)
    est = sketches.kmv_estimate(merged, ["event_type"], _KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    )
    out = est.join(exact, "event_type")
    return out.select(
        "event_type",
        "n_kept",
        "h_k",
        "distinct_est",
        "exact_distinct",
        F.expr(
            "abs(distinct_est - exact_distinct) * 1000 div exact_distinct"
        ).alias("err_permille"),
    )


KMV_DISTINCT_MERGEABLE_SQL = f"""
WITH cand AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS item
  FROM events WHERE user_id IS NOT NULL
),
hashed AS (
  SELECT event_type, item,
         CAST('0x' || substr(md5(item), 1, 12) AS BIGINT) AS h
  FROM cand
),
bottomk AS (
  SELECT event_type, item, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h, item) AS rn
  FROM hashed QUALIFY rn <= {_KMV_K}
),
est AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(max(h) AS BIGINT) AS h_k
  FROM bottomk GROUP BY 1
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT e.event_type, e.n_kept, e.h_k,
       CAST(CASE WHEN e.n_kept < {_KMV_K} THEN e.n_kept
            ELSE {_KMV_NUM} // greatest(e.h_k, 1) END AS BIGINT) AS distinct_est,
       x.exact_distinct,
       CAST(abs((CASE WHEN e.n_kept < {_KMV_K} THEN e.n_kept
                 ELSE {_KMV_NUM} // greatest(e.h_k, 1) END) - x.exact_distinct)
            * 1000 // x.exact_distinct AS BIGINT) AS err_permille
FROM est e JOIN exact x USING (event_type)
"""
QUERIES["kmv_distinct_mergeable"] = (
    q_kmv_distinct_mergeable,
    KMV_DISTINCT_MERGEABLE_SQL,
)


# ---- 5. kmv_bottomk_sample: the sample surface of the same family —
# a uniform without-replacement sample of distinct doc_ids per lang,
# built shard-by-shard (per (lang, source)) and merged. The oracle
# computes the direct global bottom-k; row-for-row equality (rank,
# item, hash) is the lossless-merge proof at sample grain. ----

#: sample budget per lang (smallest lang slice has 64 docs at sf0.01)
_KMV_SAMPLE_K = 16


def q_kmv_bottomk_sample(spark, sf_dir):
    """Per lang: the 16 distinct doc_ids with the smallest 48-bit
    hashes, with their rank — Spark builds per-(lang, source) sketches
    and merges to lang; the oracle ranks globally."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").select("lang", "source", "doc_id")
    sk = sketches.kmv_sketch(docs, ["lang", "source"], "doc_id", _KMV_SAMPLE_K)
    merged = sketches.merge_kmv_sketches(sk, ["lang"], _KMV_SAMPLE_K)
    w = Window.partitionBy("lang").orderBy(F.col("h").asc(), F.col("item").asc())
    return merged.select(
        "lang",
        F.row_number().over(w).cast("long").alias("rank"),
        "item",
        "h",
    )


KMV_BOTTOMK_SAMPLE_SQL = f"""
WITH cand AS (
  SELECT DISTINCT lang, CAST(doc_id AS VARCHAR) AS item
  FROM documents WHERE doc_id IS NOT NULL
),
hashed AS (
  SELECT lang, item,
         CAST('0x' || substr(md5(item), 1, 12) AS BIGINT) AS h
  FROM cand
)
SELECT lang,
       CAST(row_number() OVER (PARTITION BY lang ORDER BY h, item)
            AS BIGINT) AS rank,
       item, h
FROM hashed QUALIFY rank <= {_KMV_SAMPLE_K}
"""
QUERIES["kmv_bottomk_sample"] = (q_kmv_bottomk_sample, KMV_BOTTOMK_SAMPLE_SQL)


# ---- 6. bloom_membership_census: Bloom-filter membership — the
# fifth mergeable family (bit_or). Build per (event_type, day) over
# the EVEN event_ids, merge to event_type, probe the odd ids (true
# negatives) plus every 10th id (members); ground truth is the parity
# rule, recomputed exactly by both engines. The oracle builds its
# filter as a SET of occupied bit positions (semi-join membership),
# so the Spark side's word-packing and shift/mask extraction is
# verified against an independent REPRESENTATION, not replayed. False
# negatives are structurally zero; false positives are deterministic
# (md5 positions) and value-matched, giving a measured FPR ladder as
# the fixed 2 KB filter saturates with scale (the documented sizing
# rule: m scales with expected keys; the plan shape is m-independent). ----

_BLOOM_W = sketches.DEFAULT_BLOOM_WORDS      # 256 longs = 16384 bits
_BLOOM_J = sketches.DEFAULT_BLOOM_HASHES     # 3 salted md5 hashes
_BLOOM_BITS = 64 * _BLOOM_W


def q_bloom_membership_census(spark, sf_dir):
    """Per event type: probe census (probes, members, hits, true/false
    positives, false negatives) of the merged daily Bloom filters."""
    ev0 = table(spark, sf_dir, "events")
    ev = ev0.select(
        "event_type",
        "event_id",
        F.col("event_id").cast("string").alias("key"),
        (ts_micros(ev0) / F.lit(86_400_000_000)).cast("long").alias("day"),
    )
    build = ev.where(F.col("event_id") % 2 == 0)
    daily = sketches.bloom_sketch(
        build, ["event_type", "day"], "key", _BLOOM_W, _BLOOM_J
    )
    merged = sketches.merge_bloom_sketches(daily, ["event_type"], _BLOOM_W)
    probes = ev.where(
        (F.col("event_id") % 2 == 1) | (F.col("event_id") % 10 == 0)
    ).withColumn("is_member", F.col("event_id") % 2 == 0)
    flagged = sketches.bloom_probe(
        probes, merged, ["event_type"], "key", _BLOOM_W, _BLOOM_J
    )
    m, hit = F.col("is_member"), F.col("bloom_hit")
    one = F.lit(1)
    return flagged.groupBy("event_type").agg(
        F.count(one).cast("long").alias("n_probes"),
        F.sum(F.when(m, 1).otherwise(0)).cast("long").alias("n_members"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_hits"),
        F.sum(F.when(hit & m, 1).otherwise(0)).cast("long").alias("n_true_pos"),
        F.sum(F.when(hit & ~m, 1).otherwise(0)).cast("long").alias("n_false_pos"),
        F.sum(F.when(~hit & m, 1).otherwise(0)).cast("long").alias("n_false_neg"),
    )


BLOOM_MEMBERSHIP_CENSUS_SQL = f"""
WITH salts AS (SELECT UNNEST([0, 1, 2]) AS i),
members AS (
  SELECT DISTINCT event_type, CAST(event_id AS VARCHAR) AS key
  FROM events WHERE event_id % 2 = 0
),
bits AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substr(md5(i || ':' || key), 1, 12) AS BIGINT)
           % {_BLOOM_BITS} AS p
  FROM members CROSS JOIN salts
),
probes AS (
  SELECT event_type, CAST(event_id AS VARCHAR) AS key,
         event_id % 2 = 0 AS is_member
  FROM events WHERE event_id % 2 = 1 OR event_id % 10 = 0
),
ppos AS (
  SELECT pr.event_type, pr.key, pr.is_member, s.i,
         CAST('0x' || substr(md5(s.i || ':' || pr.key), 1, 12) AS BIGINT)
           % {_BLOOM_BITS} AS p
  FROM probes pr CROSS JOIN salts s
),
hits AS (
  SELECT pp.event_type, pp.key, pp.is_member,
         bool_and(b.p IS NOT NULL) AS hit
  FROM ppos pp
  LEFT JOIN bits b ON b.event_type = pp.event_type AND b.p = pp.p
  GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(sum(CASE WHEN hit AND is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_pos,
       CAST(sum(CASE WHEN hit AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       CAST(sum(CASE WHEN (NOT hit) AND is_member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_neg
FROM hits GROUP BY 1
"""
QUERIES["bloom_membership_census"] = (
    q_bloom_membership_census,
    BLOOM_MEMBERSHIP_CENSUS_SQL,
)


# ---- 7/8. web-graph centrality: exact-integer PageRank over the
# synthetic domain link graph (operators/graph.py). The link universe
# reuses round-11's URL host id (u = doc_id % 101 — contract/round11.py
# _URL_CTE) as the domain key; each doc contributes up to two
# deterministic out-links whose targets depend on doc_id div 101, so
# the graph DENSIFIES as the corpus grows (889 edges at sf0.01, 5296
# at sf0.1, saturating toward the 101-node clique) and the d1 link
# biases toward domains 0..12 — web-like hub skew (in-degree 4..100
# at sf0.01) that differentiates the ranks. A 101-node graph whose
# every quantity — inflow sums, damped update, teleport — is exact
# long arithmetic, so the oracle unrolls the SAME three iterations
# and every rank is value-matched bit-for-bit (the module docstring
# explains why a double-typed PageRank could never be). ----

from betl_spark.operators import graph as graph_ops

_PR_ITERS = 3
_PR_SCALE = graph_ops.DEFAULT_SCALE

#: shared edge-derivation CTE text (DuckDB) — the Spark twin is
#: _domain_edges below; one comment, two implementations, parity
#: enforced by the value match
_EDGES_CTE = """
docs AS (
  SELECT doc_id % 101 AS u,
         (doc_id // 101) % (1 + (doc_id % 101) % 13) AS d1,
         (7 * (doc_id // 101) + 3 * (doc_id % 101) + 5) % 101 AS d2
  FROM documents
),
edges AS (
  SELECT DISTINCT u AS src, d AS dst
  FROM (SELECT u, d1 AS d FROM docs UNION ALL SELECT u, d2 AS d FROM docs)
  WHERE u <> d
)"""


def _domain_edges(spark, sf_dir):
    """Spark twin of _EDGES_CTE: the deterministic doc->domain link
    graph (distinct (src, dst), self-loops removed)."""
    docs = table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 101).alias("u"),
        F.expr("(doc_id div 101) % (1 + (doc_id % 101) % 13)").alias("d1"),
        F.expr("(7 * (doc_id div 101) + 3 * (doc_id % 101) + 5) % 101").alias(
            "d2"
        ),
    )
    e = docs.select(F.col("u").alias("src"), F.col("d1").alias("dst")).unionByName(
        docs.select(F.col("u").alias("src"), F.col("d2").alias("dst"))
    )
    return e.where(F.col("src") != F.col("dst")).distinct()


def q_domain_pagerank(spark, sf_dir):
    """Top-15 domains by 3-iteration exact-integer PageRank, with
    in/out degree — the web-curation 'weight domains by centrality'
    signal. The rank side is broadcast (|V| ~ 101 — kilobytes), so
    each iteration costs one aggregation of the edge table."""
    from pyspark.sql import Window

    edges = _domain_edges(spark, sf_dir)
    pr = graph_ops.pagerank_int(
        edges, iters=_PR_ITERS, scale=_PR_SCALE, broadcast_ranks=True
    )
    outd = graph_ops.out_degrees(edges).withColumnRenamed("src", "node")
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("indeg")
    )
    w = Window.orderBy(F.col("rank_int").desc(), F.col("node"))
    return (
        pr.join(outd, "node", "left")
        .join(ind, "node", "left")
        .select(
            "node",
            "rank_int",
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .where(F.col("pos") <= 15)
    )


DOMAIN_PAGERANK_SQL = f"""
WITH {_EDGES_CTE},
{graph_ops.pagerank_int_sql("edges", _PR_ITERS, scale=_PR_SCALE)},
outd AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
         FROM edges GROUP BY 1),
ind AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS indeg
        FROM edges GROUP BY 1)
SELECT p.node, p.rank_int,
       CAST(coalesce(o.outdeg, 0) AS BIGINT) AS outdeg,
       CAST(coalesce(i.indeg, 0) AS BIGINT) AS indeg,
       CAST(row_number() OVER (ORDER BY p.rank_int DESC, p.node)
            AS BIGINT) AS pos
FROM pr_final p
LEFT JOIN outd o ON o.node = p.node
LEFT JOIN ind i ON i.node = p.node
QUALIFY pos <= 15
"""
QUERIES["domain_pagerank"] = (q_domain_pagerank, DOMAIN_PAGERANK_SQL)


def q_pagerank_convergence(spark, sf_dir):
    """Per-iteration convergence audit: total mass and L1 movement
    (sum of |r_i - r_(i-1)|) after each of the 3 iterations — exact
    integer sums, so the decay trajectory itself is value-matched.
    (Total mass DECAYS slightly per iteration — the integer chain is
    sub-stochastic by the floor() construction; the audit makes that
    documented behavior a pinned, replayed fact.)"""
    edges = _domain_edges(spark, sf_dir)
    outs = []
    prev = graph_ops.pagerank_int(
        edges, iters=0, scale=_PR_SCALE, broadcast_ranks=True
    )
    for i in range(1, _PR_ITERS + 1):
        cur = graph_ops.pagerank_int(
            edges, iters=i, scale=_PR_SCALE, broadcast_ranks=True
        )
        j = cur.withColumnRenamed("rank_int", "r_cur").join(
            prev.withColumnRenamed("rank_int", "r_prev"), "node"
        )
        outs.append(
            j.agg(
                F.lit(i).cast("long").alias("iter"),
                F.sum("r_cur").cast("long").alias("total_mass"),
                F.sum(F.abs(F.col("r_cur") - F.col("r_prev")))
                .cast("long")
                .alias("l1_delta"),
                F.count(F.lit(1)).cast("long").alias("n_nodes"),
            )
        )
        prev = cur
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


_PR_CONV_ROWS = "\nUNION ALL\n".join(
    f"SELECT CAST({i} AS BIGINT) AS iter,"
    f" CAST(sum(c.rank_int) AS BIGINT) AS total_mass,"
    f" CAST(sum(abs(c.rank_int - p.rank_int)) AS BIGINT) AS l1_delta,"
    f" CAST(count(*) AS BIGINT) AS n_nodes"
    f" FROM pr_{i} c JOIN pr_{i - 1} p ON p.node = c.node"
    for i in range(1, _PR_ITERS + 1)
)

PAGERANK_CONVERGENCE_SQL = f"""
WITH {_EDGES_CTE},
{graph_ops.pagerank_int_sql("edges", _PR_ITERS, scale=_PR_SCALE)}
{_PR_CONV_ROWS}
"""
QUERIES["pagerank_convergence"] = (
    q_pagerank_convergence,
    PAGERANK_CONVERGENCE_SQL,
)


# ---- 9. centrality_weighted_sample: the families COMPOSE — the
# web-curation capstone "weight domains by link centrality, then
# deterministically sample the corpus at per-domain rates". PageRank
# ranks (exact-integer, query 7) become per-domain keep-rates in
# permille (rate = 1000 * rank div max_rank — the hub keeps all of
# its docs, a teleport-only domain keeps its teleport share), and the
# doc-level keep decision is the engine's stable md5 hash-bucket
# (operators/sampling.py:hash_bucket — in-or-out is a property of the
# doc_id, reproducible across runs, partitionings, and engines).
# Census output at domain grain; everything is exact integers, fully
# value-matched. ----


def q_centrality_weighted_sample(spark, sf_dir):
    """Per domain: docs, keep-rate (permille of the max PageRank),
    kept count under deterministic hash sampling."""
    from betl_spark.operators import sampling

    edges = _domain_edges(spark, sf_dir)
    pr = graph_ops.pagerank_int(
        edges, iters=_PR_ITERS, scale=_PR_SCALE, broadcast_ranks=True
    )
    mx = pr.agg(F.max("rank_int").alias("__max_rank"))
    rates = pr.crossJoin(F.broadcast(mx)).select(
        F.col("node").alias("domain"),
        F.expr("1000 * rank_int div __max_rank").alias("rate_pm"),
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 101).alias("domain")
    )
    keep = sampling.hash_bucket("doc_id", 1000) < F.col("rate_pm")
    return (
        docs.join(F.broadcast(rates), "domain")
        .groupBy("domain", "rate_pm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        )
    )


CENTRALITY_WEIGHTED_SAMPLE_SQL = f"""
WITH {_EDGES_CTE},
{graph_ops.pagerank_int_sql("edges", _PR_ITERS, scale=_PR_SCALE)},
rates AS (
  SELECT node AS domain,
         1000 * rank_int // (SELECT max(rank_int) FROM pr_final) AS rate_pm
  FROM pr_final
),
cdocs AS (SELECT doc_id, doc_id % 101 AS domain FROM documents)
SELECT d.domain, CAST(r.rate_pm AS BIGINT) AS rate_pm,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 1000 < r.rate_pm
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM cdocs d JOIN rates r USING (domain)
GROUP BY 1, 2
"""
QUERIES["centrality_weighted_sample"] = (
    q_centrality_weighted_sample,
    CENTRALITY_WEIGHTED_SAMPLE_SQL,
)

"""Round-11 contract queries, part 2: blocked fuzzy record linkage
(operators/linkage.py) — matching a large dirty-record stream against
a bounded master catalog, the MDM/entity-resolution stage the
reference's exact-key MDM join (betl/dataflow/dfl_mdm.py) cannot
express and the standard "merge noisy source catalogs" step of a
training-data pipeline.

The documents table has no name column, so every query derives a
DETERMINISTIC synthetic dirty name per doc (the same arithmetic in
both engines — see ``_NAME_CTE`` / ``records_frame``): entity
``e = doc_id % 211`` picks a golden name from three coprime token
pools (11 given x 13 surname x 7 suffix — CRT-injective for
e < 1001), and variant ``v = doc_id % 19`` perturbs it (NULL, case
fold, char drops head/tail, double char, hyphenation, ' jr' suffix,
'dr ' prefix, token swap, mid insert, or exact). 19 and 211 are
coprime, so every entity sees every variant class as the corpus
grows. The master catalog is the 211 golden names themselves
(``range(211)`` in both engines) — bounded, broadcast, exactly like a
golden dimension at 100 TB.

Expected-distance census over the variant classes (after
lower(trim()) normalization; threshold 3):

  v=0 NULL (audited, never matched)     v=6  hyphens:   dist 1-2
  v=1,11..18 exact: dist 0              v=7  ' jr':     dist 3
  v=2 UPPER: dist 0 (normalization)     v=8  'dr ':     dist 3,
  v=3 drop last char: dist 1                 head block key changes
  v=4 drop FIRST char: dist 1,          v=9  token swap: dist large
      head block key changes                 (candidates, no match)
  v=5 double last char: dist 1          v=10 mid insert: dist 1

v=4 and v=8 are the multi-pass-blocking witnesses: the ``p:`` head
key misses them and the ``l:`` last-token key recovers them.

Determinism: levenshtein is an exact INTEGER in both engines, all
rates are half-away integer micros (_micros_sql / round_ratio_expr),
similarity bands are computed from integer numerators
(similarity_band_sql), and the best-master tie-break is the total
order (dist, master_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from betl_spark.contract.common import table
from betl_spark.operators import linkage
from betl_spark.operators.linkage import similarity_band_sql
from betl_spark.operators.util import round_ratio_expr

QUERIES: dict = {}

GIVEN = (
    "alice", "bruno", "carmen", "dmitri", "elena", "farid",
    "grace", "hiro", "ines", "jonas", "karim",
)  # 11
SURNAME = (
    "almeida", "brandt", "castillo", "durand", "eriksson", "fischer",
    "garcia", "haddad", "ivanov", "jansen", "kowalski", "lindqvist",
    "moreau",
)  # 13
SUFFIX = ("", "llc", "inc", "gmbh", "ltd", "sarl", "plc")  # 7
N_ENTITIES = 211  # prime; < 11*13*7 = 1001 so the token triple is injective
THRESHOLD = 3


def _golden(e: int, swapped: bool = False) -> str:
    g, s, x = GIVEN[e % 11], SURNAME[e % 13], SUFFIX[e % 7]
    head = f"{s} {g}" if swapped else f"{g} {s}"
    return head + (f" {x}" if x else "")


#: the 211 golden names (and their token-swapped twins), materialized
#: in Python and injected as ONE array literal per dialect. A nested
#: CASE pyramid (pool CASE inside base inside the 11-arm variant CASE)
#: inlines the lookup once PER REFERENCE after Catalyst collapses the
#: projections — ~21k generated-Java lines, past the JVM's 64 KB
#: method limit, silently dropping the whole stage out of codegen
#: (caught by this session's verify run). An array literal constant-
#: folds to a single static object; element_at is O(1) code however
#: many times the variant CASE references base.
BASE_NAMES = tuple(_golden(e) for e in range(N_ENTITIES))
SWAPPED_NAMES = tuple(_golden(e, swapped=True) for e in range(N_ENTITIES))


def _arr_spark(names: tuple[str, ...], idx: str) -> str:
    lits = ", ".join(f"'{n}'" for n in names)
    return f"element_at(array({lits}), CAST({idx} AS INT) + 1)"


def _arr_duck(names: tuple[str, ...], idx: str) -> str:
    lits = ", ".join(f"'{n}'" for n in names)
    return f"([{lits}])[({idx}) + 1]"

# the variant perturbation over a `base`/`swapped` pair — shared text
# (substr/length/replace/upper/|| behave identically in both engines)
_DIRTY = """CASE v
  WHEN 0 THEN NULL
  WHEN 2 THEN upper(base)
  WHEN 3 THEN substr(base, 1, length(base) - 1)
  WHEN 4 THEN substr(base, 2)
  WHEN 5 THEN base || substr(base, length(base), 1)
  WHEN 6 THEN replace(base, ' ', '-')
  WHEN 7 THEN base || ' jr'
  WHEN 8 THEN 'dr ' || base
  WHEN 9 THEN swapped
  WHEN 10 THEN substr(base, 1, 4) || 'x' || substr(base, 5)
  ELSE base
END"""

# normalized name + the two tagged blocking keys — shared text; the
# last token comes from a regex both engines evaluate identically
_NORM = "lower(trim(name))"
_PKEY = "'p:' || substr(n, 1, 2)"
_LKEY = "'l:' || substr(regexp_extract(n, '([^ ]*)$', 1), 1, 2)"


def records_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dirty-record stream: one synthetic name per document."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (F.col("doc_id") % N_ENTITIES).cast("long").alias("e"),
        (F.col("doc_id") % 19).cast("long").alias("v"),
    )
    d = d.withColumn("base", F.expr(_arr_spark(BASE_NAMES, "e")))
    d = d.withColumn("swapped", F.expr(_arr_spark(SWAPPED_NAMES, "e")))
    return d.withColumn("name", F.expr(_DIRTY)).select(
        "doc_id", "source", "e", "v", "name"
    )


def masters_frame(spark: SparkSession) -> DataFrame:
    """The golden master catalog: 211 entities (bounded → broadcast)."""
    return spark.range(N_ENTITIES).select(
        F.col("id").cast("long").alias("master_id"),
        F.expr(_arr_spark(BASE_NAMES, "id")).alias("name"),
    )


# ---- the shared oracle CTE chain (DuckDB dialect) ----
_NAME_CTE = f"""
recs AS (
  SELECT doc_id, source,
         CAST(doc_id % {N_ENTITIES} AS BIGINT) AS e,
         CAST(doc_id % 19 AS BIGINT) AS v,
         {_arr_duck(BASE_NAMES, f'doc_id % {N_ENTITIES}')} AS base,
         {_arr_duck(SWAPPED_NAMES, f'doc_id % {N_ENTITIES}')} AS swapped
  FROM documents
),
dirty AS (
  SELECT doc_id, source, e, v, {_DIRTY} AS name FROM recs
),
masters AS (
  -- golden names are already normalized (lowercase, single-spaced)
  SELECT CAST(e AS BIGINT) AS master_id,
         {_arr_duck(BASE_NAMES, 'e')} AS mn
  FROM range({N_ENTITIES}) t(e)
),
mkeys AS (
  SELECT k, master_id, mn FROM (
    SELECT master_id, mn, mn AS n FROM masters
  ), UNNEST([{_PKEY}, {_LKEY}]) AS u(k)
),
rnorm AS (
  SELECT doc_id, source, e, v, {_NORM} AS n
  FROM dirty WHERE name IS NOT NULL
),
rkeys AS (
  SELECT DISTINCT doc_id, source, e, v, n, k FROM (
    SELECT *, UNNEST([{_PKEY}, {_LKEY}]) AS k FROM rnorm
  )
),
cand AS (
  SELECT r.doc_id, r.source, r.e, r.v, r.n, m.master_id, m.mn,
         CAST(levenshtein(r.n, m.mn) AS BIGINT) AS dist
  FROM rkeys r JOIN mkeys m ON r.k = m.k
),
best AS (
  SELECT c.doc_id, c.source, c.e, c.v, c.n,
         c.master_id AS best_master_id, c.mn AS best_master_name,
         c.dist AS best_dist, nc.n_candidates
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY dist, master_id
    ) AS rnk
    FROM (SELECT DISTINCT * FROM cand)
  ) c
  JOIN (
    SELECT doc_id, CAST(count(DISTINCT master_id) AS BIGINT)
             AS n_candidates
    FROM cand GROUP BY doc_id
  ) nc USING (doc_id)
  WHERE c.rnk = 1
)"""


def _micros_sql(num: str, den: str) -> str:
    # counts are non-negative — the half-away form needs no sign split
    return (
        f"CASE WHEN ({den}) > 0 THEN "
        f"(2 * ({num}) * 1000000 + ({den})) // (2 * ({den})) END"
    )


def _linked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the shared chain: records -> link_records."""
    recs = records_frame(spark, sf_dir)
    return linkage.link_records(
        recs,
        masters_frame(spark),
        record_id="doc_id",
        record_name="name",
        master_id="master_id",
        master_name="name",
        threshold=THRESHOLD,
        keep_cols=("source", "v"),
    )


# ---- 1. er_blocking_audit: per-variant blocking recall + match rate ----
def q_er_blocking_audit(spark, sf_dir):
    """Per perturbation class: how many records exist, carry a name,
    reach >= 1 candidate block, and match within the threshold — the
    blocking-recall audit an ER engineer runs before trusting a
    linkage config. One broadcast candidate join + two bounded
    shuffles (per-record argmin, then the 19-row class rollup)."""
    recs = records_frame(spark, sf_dir)
    totals = recs.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.count("name").cast("long").alias("n_named"),
    )
    linked = _linked(spark, sf_dir)
    lagg = linked.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocked"),
        F.sum(F.when(F.col("matched"), 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
        F.sum(F.when(F.col("matched"), F.col("best_dist")).otherwise(0))
        .cast("long")
        .alias("__dsum"),
    )
    j = totals.join(lagg, "v", "left").select(
        "v",
        "n_records",
        "n_named",
        F.coalesce("n_blocked", F.lit(0)).cast("long").alias("n_blocked"),
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        F.col("__dsum"),
    )
    return j.select(
        "v",
        "n_records",
        "n_named",
        "n_blocked",
        "n_matched",
        F.when(
            F.col("n_named") > 0,
            round_ratio_expr("n_matched", "n_named", 6),
        ).alias("match_rate"),
        F.when(
            F.col("n_matched") > 0,
            round_ratio_expr("__dsum", "n_matched", 6),
        ).alias("mean_best_dist"),
    )


ER_BLOCKING_AUDIT_SQL = f"""
WITH {_NAME_CTE},
totals AS (
  SELECT v, CAST(count(*) AS BIGINT) AS n_records,
         CAST(count(name) AS BIGINT) AS n_named
  FROM dirty GROUP BY v
),
lagg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS n_blocked,
         CAST(sum(CASE WHEN best_dist <= {THRESHOLD} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_matched,
         CAST(sum(CASE WHEN best_dist <= {THRESHOLD} THEN best_dist
                  ELSE 0 END) AS BIGINT) AS dsum
  FROM best GROUP BY v
)
SELECT t.v, t.n_records, t.n_named,
       CAST(coalesce(l.n_blocked, 0) AS BIGINT) AS n_blocked,
       CAST(coalesce(l.n_matched, 0) AS BIGINT) AS n_matched,
       CAST({_micros_sql('coalesce(l.n_matched, 0)', 't.n_named')}
            AS DOUBLE) / 1000000.0 AS match_rate,
       CAST({_micros_sql('l.dsum', 'l.n_matched')}
            AS DOUBLE) / 1000000.0 AS mean_best_dist
FROM totals t LEFT JOIN lagg l USING (v)
"""
QUERIES["er_blocking_audit"] = (q_er_blocking_audit, ER_BLOCKING_AUDIT_SQL)


# ---- 2. er_master_rollup: the resolved golden-entity census ----
def q_er_master_rollup(spark, sf_dir):
    """Per golden master: how many records resolved to it (threshold
    matches only), how many exactly, the worst accepted distance, and
    the source spread — the post-resolution census a survivorship
    stage consumes."""
    linked = _linked(spark, sf_dir).where(F.col("matched"))
    return linked.groupBy(
        F.col("best_master_id").alias("master_id"),
        F.col("best_master_name").alias("master_name"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
        F.sum(F.when(F.col("best_dist") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_exact"),
        F.max("best_dist").cast("long").alias("max_dist"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )


ER_MASTER_ROLLUP_SQL = f"""
WITH {_NAME_CTE}
SELECT best_master_id AS master_id, best_master_name AS master_name,
       CAST(count(*) AS BIGINT) AS n_assigned,
       CAST(sum(CASE WHEN best_dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(max(best_dist) AS BIGINT) AS max_dist,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM best WHERE best_dist <= {THRESHOLD}
GROUP BY best_master_id, best_master_name
"""
QUERIES["er_master_rollup"] = (q_er_master_rollup, ER_MASTER_ROLLUP_SQL)


# ---- 3. er_source_audit: per-source linkage health ----
def q_er_source_audit(spark, sf_dir):
    """Per source: null-name share, blocking misses, and the matched
    rate — the per-feed data-quality report of a linkage run."""
    recs = records_frame(spark, sf_dir)
    totals = recs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum(F.when(F.col("name").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_name"),
        F.count("name").cast("long").alias("__named"),
    )
    linked = _linked(spark, sf_dir)
    lagg = linked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("__blocked"),
        F.sum(F.when(F.col("matched"), 1).otherwise(0))
        .cast("long")
        .alias("n_matched"),
    )
    j = totals.join(lagg, "source", "left")
    return j.select(
        "source",
        "n_records",
        "n_null_name",
        (F.col("__named") - F.coalesce("__blocked", F.lit(0)))
        .cast("long")
        .alias("n_unblocked"),
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        F.when(
            F.col("__named") > 0,
            round_ratio_expr("coalesce(n_matched, 0)", "__named", 6),
        ).alias("matched_rate"),
    )


ER_SOURCE_AUDIT_SQL = f"""
WITH {_NAME_CTE},
totals AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_records,
         CAST(sum(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null_name,
         CAST(count(name) AS BIGINT) AS named
  FROM dirty GROUP BY source
),
lagg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS blocked,
         CAST(sum(CASE WHEN best_dist <= {THRESHOLD} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_matched
  FROM best GROUP BY source
)
SELECT t.source, t.n_records, t.n_null_name,
       CAST(t.named - coalesce(l.blocked, 0) AS BIGINT) AS n_unblocked,
       CAST(coalesce(l.n_matched, 0) AS BIGINT) AS n_matched,
       CAST({_micros_sql('coalesce(l.n_matched, 0)', 't.named')}
            AS DOUBLE) / 1000000.0 AS matched_rate
FROM totals t LEFT JOIN lagg l USING (source)
"""
QUERIES["er_source_audit"] = (q_er_source_audit, ER_SOURCE_AUDIT_SQL)


# ---- 4. er_similarity_bands: normalized-similarity histogram ----
def q_er_similarity_bands(spark, sf_dir):
    """Decile histogram of normalized edit similarity over every
    record's BEST candidate (unthresholded) — the curve an ER engineer
    reads to place the acceptance threshold. Bands come from integer
    numerators (operators/linkage.py:similarity_band_sql), never a
    rounded double."""
    linked = _linked(spark, sf_dir)
    banded = linked.withColumn(
        "band",
        F.expr(
            similarity_band_sql("best_dist", "__rname", "best_master_name")
        ).cast("long"),
    )
    return banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.countDistinct("best_master_id").cast("long").alias("n_masters"),
        F.min("best_dist").cast("long").alias("min_dist"),
        F.max("best_dist").cast("long").alias("max_dist"),
    )


ER_SIMILARITY_BANDS_SQL = f"""
WITH {_NAME_CTE}
SELECT CAST({similarity_band_sql('best_dist', 'n', 'best_master_name',
                                 duckdb=True)} AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(DISTINCT best_master_id) AS BIGINT) AS n_masters,
       CAST(min(best_dist) AS BIGINT) AS min_dist,
       CAST(max(best_dist) AS BIGINT) AS max_dist
FROM best
GROUP BY 1
"""
QUERIES["er_similarity_bands"] = (
    q_er_similarity_bands,
    ER_SIMILARITY_BANDS_SQL,
)


# ---- 5. er_survivorship: golden-record assembly per master ----
def q_er_survivorship(spark, sf_dir):
    """Post-resolution survivorship (operators/linkage.py:survivorship):
    one golden row per master from its matched members — min doc as
    the representative, worst accepted distance, and the source field
    survived by deterministic plurality (ties -> smallest source).
    Mode rides its own bounded census + argmax (min(struct(-n, v)) —
    one hash agg, no window sort); everything else shares one
    group-grain aggregate."""
    linked = _linked(spark, sf_dir).where(F.col("matched"))
    members = linked.select(
        F.col("best_master_id").alias("master_id"),
        "record_id",
        "best_dist",
        F.col("source").alias("source_mode"),
    )
    g = linkage.survivorship(
        members,
        "master_id",
        {"record_id": "min", "best_dist": "max", "source_mode": "mode"},
    )
    return g.select(
        "master_id",
        "n_members",
        F.col("record_id_min").alias("rep_doc_id"),
        F.col("best_dist_max").cast("long").alias("worst_dist"),
        "source_mode",
        F.col("source_mode_votes").alias("source_votes"),
    )


ER_SURVIVORSHIP_SQL = f"""
WITH {_NAME_CTE},
memb AS (
  SELECT * FROM best WHERE best_dist <= {THRESHOLD}
),
agg AS (
  SELECT best_master_id AS master_id,
         CAST(count(*) AS BIGINT) AS n_members,
         min(doc_id) AS rep_doc_id,
         CAST(max(best_dist) AS BIGINT) AS worst_dist
  FROM memb GROUP BY 1
),
cen AS (
  -- NULLs abstain from the mode vote, mirroring majority_vote's
  -- isNotNull filter (round-11 advisor item #1): without this a NULL
  -- source would vote here but abstain in Spark, a latent
  -- cross-engine divergence (unobservable on current testdata).
  SELECT best_master_id AS master_id, source,
         CAST(count(*) AS BIGINT) AS nv
  FROM memb WHERE source IS NOT NULL GROUP BY 1, 2
),
md AS (
  SELECT master_id, source AS source_mode, nv AS source_votes FROM (
    SELECT *, row_number() OVER (
      PARTITION BY master_id ORDER BY nv DESC, source
    ) AS rn FROM cen
  ) WHERE rn = 1
)
SELECT a.master_id, a.n_members, a.rep_doc_id, a.worst_dist,
       m.source_mode, m.source_votes
FROM agg a LEFT JOIN md m USING (master_id)
"""
QUERIES["er_survivorship"] = (q_er_survivorship, ER_SURVIVORSHIP_SQL)

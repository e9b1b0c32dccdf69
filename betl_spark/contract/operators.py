"""Operator-family contract queries.

Each query drives a SURVEY.md §2 operator through the DataFlow API (not
hand-rolled SQL), paired with an independent DuckDB oracle statement.
Operator ↔ reference mapping is in each function's docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from betl_spark.contract.common import dataflow, table
from betl_spark.defaults.dm_audit import audit_dimension
from betl_spark.defaults.dm_date import date_dimension
from betl_spark.defaults.load import assign_surrogate_keys, resolve_fact_fks, sk_nk_map


# ---- filter (betl/dataflow/dfl_changeRow.py:37-93) ----
def q_filter_ops(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["part"])
    dfl.filter("part", {"p_size": (">", 40), "p_brand": ("!=", "Brand#4")})
    dfl.dropColumns("part", colsToKeep=["p_partkey", "p_name", "p_brand", "p_size"])
    return dfl.getDataFrames("part")


FILTER_OPS_SQL = """
SELECT p_partkey, p_name, p_brand, p_size
FROM part WHERE p_size > 40 AND p_brand != 'Brand#4'
"""


# ---- filterWhereNotIn / anti join (dfl_changeRow.py:96-162) ----
def q_anti_join(spark, sf_dir):
    """Multi-column anti join with a guaranteed non-empty result: keep
    lineitems whose (orderkey, linenumber) pair is absent from the
    high-quantity subset. (Round 1 anti-joined customers against all
    orders, which was vacuously empty on this testdata — every customer
    has an order — so the semantics were never distinguished.)"""
    dfl = dataflow(spark, sf_dir, ["lineitem"])
    dfl.filter("lineitem", {"l_quantity": (">", 45)}, targetDataset="bigqty")
    dfl.filterWhereNotIn(
        "lineitem", ["l_orderkey", "l_linenumber"], "bigqty", ["l_orderkey", "l_linenumber"]
    )
    dfl.dropColumns("lineitem", colsToKeep=["l_orderkey", "l_linenumber", "l_quantity"])
    return dfl.getDataFrames("lineitem")


ANTI_JOIN_SQL = """
SELECT a.l_orderkey, a.l_linenumber, a.l_quantity FROM lineitem a
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem b
  WHERE b.l_quantity > 45
    AND b.l_orderkey = a.l_orderkey AND b.l_linenumber = a.l_linenumber
)
"""


# ---- union + dedupe (dfl_merge.py:57-83, dfl_changeRow.py:23-34) ----
def q_union_dedupe(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["nation"])
    dfl.filter("nation", {"n_regionkey": ("==", 0)}, targetDataset="africa")
    dfl.filter("nation", {"n_regionkey": ("in", [0, 1])}, targetDataset="atlantic")
    dfl.union(["africa", "atlantic"], "both")
    dfl.dedupe("both")
    dfl.dropColumns("both", colsToKeep=["n_name", "n_regionkey"])
    return dfl.getDataFrames("both")


UNION_DEDUPE_SQL = """
SELECT n_name, n_regionkey FROM nation WHERE n_regionkey = 0
UNION
SELECT n_name, n_regionkey FROM nation WHERE n_regionkey IN (0, 1)
"""


# ---- join with keepCols (dfl_merge.py:5-54) ----
def q_join_keepcols(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["supplier", "nation"])
    dfl.join(
        ["supplier", "nation"],
        "sn",
        how="inner",
        leftJoinCol="s_nationkey",
        rightJoinCol="n_nationkey",
        keepCols=["s_suppkey", "s_name", "n_name"],
        broadcastRight=True,
    )
    return dfl.getDataFrames("sn")


JOIN_KEEPCOLS_SQL = """
SELECT s_suppkey, s_name, n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


# ---- rename/drop/addColumns (dfl_changeSchema.py:4-87) ----
def q_derive_columns(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["part"])
    dfl.renameColumns("part", {"p_name": "part_name"})
    dfl.addColumns(
        "part",
        {
            "tier": F.when(F.col("p_retailprice") > 1500, "HIGH").otherwise("LOW"),
            "engine": "betl_spark",
        },
    )
    dfl.dropColumns("part", colsToKeep=["p_partkey", "part_name", "tier", "engine"])
    return dfl.getDataFrames("part")


DERIVE_COLUMNS_SQL = """
SELECT p_partkey, p_name AS part_name,
       CASE WHEN p_retailprice > 1500 THEN 'HIGH' ELSE 'LOW' END AS tier,
       'betl_spark' AS engine
FROM part
"""


# ---- replace + toNumeric (dfl_changeData.py:14-102) ----
def q_clean_values(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["customer"])
    dfl.toNumeric("customer", "c_name", targetColumns="name_num", castTo="Int64")
    dfl.replace("customer", "BUILDING", "BLDG", columns="c_mktsegment")
    dfl.renameColumns("customer", {"c_mktsegment": "segment_short"})
    dfl.dropColumns("customer", colsToKeep=["c_custkey", "name_num", "segment_short"])
    return dfl.getDataFrames("customer")


CLEAN_VALUES_SQL = """
SELECT c_custkey,
       CAST(NULLIF(regexp_replace(c_name, '[^0-9.]+', '', 'g'), '') AS BIGINT) AS name_num,
       CASE WHEN c_mktsegment = 'BUILDING' THEN 'BLDG' ELSE c_mktsegment END AS segment_short
FROM customer
"""


# ---- setNulls (dfl_changeData.py:1-11) ----
def q_set_nulls(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["customer"])
    dfl.customSQL(
        "SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS segment FROM customer",
        dataset="seg",
    )
    dfl.setNulls("seg", {"segment": "UNSEGMENTED"})
    return dfl.getDataFrames("seg")


SET_NULLS_SQL = """
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNSEGMENTED') AS segment
FROM customer
"""


# ---- pivotColsToRows / unpivot (dfl_changeSchema.py:90-127) ----
def q_unpivot_part(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["part"])
    dfl.setColumns("part", {"p_size": F.col("p_size").cast("double")})
    dfl.dropColumns("part", colsToKeep=["p_partkey", "p_size", "p_retailprice"])
    dfl.pivotColsToRows("part", ["p_partkey"], ["p_size", "p_retailprice"], "measure", "value")
    return dfl.getDataFrames("part")


UNPIVOT_PART_SQL = """
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
"""


# ---- collapseNaturalKeyCols (dfl_loadPrep.py:28-69) ----
def q_collapse_nk(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["supplier"])
    dfl.collapseNaturalKeyCols("supplier", {"nk_supplier": ["s_name", "s_nationkey"]})
    dfl.dropColumns("supplier", colsToKeep=["s_suppkey", "nk_supplier"])
    return dfl.getDataFrames("supplier")


COLLAPSE_NK_SQL = """
SELECT s_suppkey, s_name || '_' || CAST(s_nationkey AS VARCHAR) AS nk_supplier
FROM supplier
"""


# ---- surrogate-key assignment (stageLoad.py:184-316; SURVEY §7.5.1) ----
def q_sk_dimension(spark, sf_dir):
    nation = table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("nk_nation"), F.col("n_regionkey")
    )
    dim = assign_surrogate_keys(nation, "sk_nation", ["nk_nation"])
    return dim.select("sk_nation", "nk_nation", "n_regionkey")


SK_DIMENSION_SQL = """
SELECT row_number() OVER (ORDER BY n_name) AS sk_nation,
       n_name AS nk_nation, n_regionkey
FROM nation
"""


# ---- fact FK resolution with −1 fallback (stageLoad.py:361-409) ----
def q_fact_fk_resolution(spark, sf_dir):
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("nk_customer")
    )
    dim = assign_surrogate_keys(customer, "sk_customer", ["nk_customer"])
    m = sk_nk_map(dim, "sk_customer", ["nk_customer"])
    fact = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").cast("string").alias("nk_customer")
    )
    return resolve_fact_fks(fact, {"fk_customer": m}).select("o_orderkey", "fk_customer")


FACT_FK_RESOLUTION_SQL = """
SELECT o.o_orderkey, COALESCE(m.sk, -1) AS fk_customer
FROM orders o
LEFT JOIN (
  SELECT row_number() OVER (ORDER BY CAST(c_custkey AS VARCHAR)) AS sk,
         CAST(c_custkey AS VARCHAR) AS nk
  FROM customer
) m ON CAST(o.o_custkey AS VARCHAR) = m.nk
"""


# ---- generated date dimension (dmDate.py:58-129) ----
def q_date_dimension(spark, sf_dir):
    return date_dimension(spark, "2020-01-01", "2021-12-31", include_default_rows=True)


DATE_DIMENSION_SQL = """
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2020-01-01', DATE '2021-12-31', INTERVAL 1 DAY)) AS DATE) AS cal_date
)
SELECT CAST(strftime(cal_date, '%Y%m%d') AS INTEGER) AS date_id,
       cal_date,
       CAST(dayofmonth(cal_date) AS INTEGER) AS cal_day,
       CAST(month(cal_date) AS INTEGER) AS cal_month,
       CAST(year(cal_date) AS INTEGER) AS cal_year,
       CAST(dayofweek(cal_date) + 1 AS INTEGER) AS day_of_week_sun_1,
       CAST(isodow(cal_date) AS INTEGER) AS day_of_week_mon_1,
       CAST(dayofweek(cal_date) AS INTEGER) AS day_of_week_sun_0,
       CAST(isodow(cal_date) - 1 AS INTEGER) AS day_of_week_mon_0,
       CAST(dayofyear(cal_date) AS INTEGER) AS day_number,
       CAST(weekofyear(cal_date) AS INTEGER) AS week_number
FROM days
UNION ALL
SELECT -1, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
UNION ALL
SELECT -2, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
"""


# ---- generated audit dimension (dmAudit.py:41-69) ----
def q_audit_dimension(spark, sf_dir):
    return audit_dimension(spark).select(
        "load_operation", F.col("data_quality_score").cast("long").alias("data_quality_score")
    )


AUDIT_DIMENSION_SQL = """
SELECT t.load_operation, r.range AS data_quality_score
FROM (VALUES ('BULK'), ('DELTA'), ('MANUAL'), ('DEFAULT')) t(load_operation)
CROSS JOIN range(10) r
"""


# ---- MDM group-count (dfl_mdm.py:141-146) ----
def q_mdm_group_count(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["documents"])
    dfl.dropColumns("documents", colsToKeep=["lang", "source"])
    dfl.customSQL(
        "SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source",
        dataset="counts",
    )
    return dfl.getDataFrames("counts")


MDM_GROUP_COUNT_SQL = """
SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
"""


# ---- full master-data mapping (dfl_mdm.py:8-213) ----
def q_mdm_map_master_data(spark, sf_dir):
    """Full mapMasterData: curated mapping wins, empty mapping cells
    auto-populate from the data, unmatched data rows get the auto value,
    mapping-only rows are excluded (reference dfl_mdm.py:58-126)."""
    from betl_spark.dataflow.mdm import MappingStore

    store = MappingStore(
        [
            ["c_mktsegment", "segment_code"],
            ["BUILDING", "BLD-X"],
            ["AUTOMOBILE", "AUTO-X"],
            ["MACHINERY", ""],  # empty → auto-populated from the data
            ["AEROSPACE", "AER-X"],  # mapping-only → excluded from output
        ]
    )
    dfl = dataflow(spark, sf_dir, ["customer"])
    dfl.addColumns(
        "customer", {"segment_code": F.lower(F.substring("c_mktsegment", 1, 3))}
    )
    dfl.mapMasterData(
        "customer",
        store,
        joinCols=["c_mktsegment"],
        masterDataCols=["segment_code"],
        autoPopMappingCols=["segment_code"],
    )
    dfl.dropColumns(
        "customer", colsToKeep=["c_custkey", "c_mktsegment", "segment_code"]
    )
    return dfl.getDataFrames("customer")


MDM_MAP_MASTER_DATA_SQL = """
WITH m(c_mktsegment, segment_code) AS (
  VALUES ('BUILDING', 'BLD-X'), ('AUTOMOBILE', 'AUTO-X'),
         ('MACHINERY', ''), ('AEROSPACE', 'AER-X')
)
SELECT c.c_custkey, c.c_mktsegment,
       CASE WHEN m.segment_code IS NOT NULL AND m.segment_code != ''
            THEN m.segment_code
            ELSE lower(substr(c.c_mktsegment, 1, 3)) END AS segment_code
FROM customer c LEFT JOIN m USING (c_mktsegment)
"""


# ---- DataFlow.write surface: validate/reorder + ''→NULL (dfl_io.py:61-212) ----
def q_write_readback(spark, sf_dir):
    """write → read-back proof of the warehouse boundary: columns
    arrive out of schema order (write must reorder against the logical
    model, dfl_io.py:106-160) with '' markers (write must convert to
    NULL at BSE, dbIO.py:27-28); the returned frame is what an
    independent reader sees in the written parquet."""
    from betl_spark.io.readers import read_staged
    from betl_spark.schema.registry import SchemaRegistry

    reg = SchemaRegistry()
    reg.define(
        "BSE",
        "dm_segment",
        [
            ("cust_id", "TEXT", "Natural key"),
            ("segment", "TEXT", "Attribute"),
            ("name_prefix", "TEXT", "Attribute"),
        ],
    )
    dfl = dataflow(spark, sf_dir, ["customer"])
    dfl.registry = reg
    # deliberately NOT in schema order; MACHINERY blanked to ''
    dfl.customSQL(
        "SELECT CASE WHEN c_mktsegment = 'MACHINERY' THEN '' ELSE c_mktsegment END AS segment, "
        "CAST(c_custkey AS STRING) AS cust_id, substring(c_name, 1, 12) AS name_prefix "
        "FROM customer",
        dataset="dm_segment",
    )
    dfl.write("dm_segment", "dm_segment", "BSE", keepDataflowOpen=True)
    return read_staged(
        spark, dfl.conf.layer_path("BSE", "dm_segment"), all_string=False
    )


WRITE_READBACK_SQL = """
SELECT CAST(c_custkey AS VARCHAR) AS cust_id,
       NULLIF(c_mktsegment, 'MACHINERY') AS segment,
       substr(c_name, 1, 12) AS name_prefix
FROM customer
"""


# ---- applyFunctionToColumns / pandas UDF (dfl_customCode.py:28-58) ----
def q_apply_function_columns(spark, sf_dir):
    """The reference's Series→Series custom-function surface as an
    Arrow-batched pandas UDF — f sees a real pandas Series."""
    dfl = dataflow(spark, sf_dir, ["customer"])
    dfl.applyFunctionToColumns(
        "customer", lambda s: s.str.upper(), "c_name",
        targetColumns="name_upper", returnType="string",
    )
    dfl.applyFunctionToColumns(
        "customer", lambda s: (s * 2).round(2), "c_acctbal",
        targetColumns="bal_doubled", returnType="double",
    )
    dfl.dropColumns("customer", colsToKeep=["c_custkey", "name_upper", "bal_doubled"])
    return dfl.getDataFrames("customer")


APPLY_FUNCTION_COLUMNS_SQL = """
SELECT c_custkey, upper(c_name) AS name_upper,
       round(c_acctbal * 2, 2) AS bal_doubled
FROM customer
"""


QUERIES = {
    "filter_ops": (q_filter_ops, FILTER_OPS_SQL),
    "anti_join": (q_anti_join, ANTI_JOIN_SQL),
    "union_dedupe": (q_union_dedupe, UNION_DEDUPE_SQL),
    "join_keepcols": (q_join_keepcols, JOIN_KEEPCOLS_SQL),
    "derive_columns": (q_derive_columns, DERIVE_COLUMNS_SQL),
    "clean_values": (q_clean_values, CLEAN_VALUES_SQL),
    "set_nulls": (q_set_nulls, SET_NULLS_SQL),
    "unpivot_part": (q_unpivot_part, UNPIVOT_PART_SQL),
    "collapse_nk": (q_collapse_nk, COLLAPSE_NK_SQL),
    "sk_dimension": (q_sk_dimension, SK_DIMENSION_SQL),
    "fact_fk_resolution": (q_fact_fk_resolution, FACT_FK_RESOLUTION_SQL),
    "date_dimension": (q_date_dimension, DATE_DIMENSION_SQL),
    "audit_dimension": (q_audit_dimension, AUDIT_DIMENSION_SQL),
    "mdm_group_count": (q_mdm_group_count, MDM_GROUP_COUNT_SQL),
    "mdm_map_master_data": (q_mdm_map_master_data, MDM_MAP_MASTER_DATA_SQL),
    "apply_function_columns": (q_apply_function_columns, APPLY_FUNCTION_COLUMNS_SQL),
    "write_readback": (q_write_readback, WRITE_READBACK_SQL),
}

"""End-to-end pipeline contract query: the full Kimball path the
reference exists for (SURVEY.md §2.13), run over the driver's testdata
through the engine's own control plane — source extract → LOD staging →
dimension load (SK assignment + default rows) → fact load (broadcast SK
lookup) → summary aggregation written to the SUM layer and returned.

The DuckDB oracle replays the same semantics in SQL: SKs are
row_number() over the lexicographic NK order (the frozen SK rule,
SURVEY.md §7.5.1), facts join on the resolved keys, and the summary is
an exact-decimal revenue rollup per market segment.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from betl_spark.contract.common import table


def q_star_schema_pipeline(spark, sf_dir):
    """customer → dm_customer (SK engine), orders → ft_orders (FK
    resolution), then su_orders_by_segment from the loaded BSE tables
    (reference stageLoad.py:184-430 + stageSummarise.py:26-59)."""
    from betl_spark.config import Conf
    from betl_spark.defaults.load import bulk_load_dimension, bulk_load_fact
    from betl_spark.io.readers import read_staged
    from betl_spark.io.writers import write_staged
    from betl_spark.pipeline import Pipeline
    from betl_spark.schema.registry import SchemaRegistry

    conf = Conf(app_root=tempfile.mkdtemp(prefix="betl_e2e_"))
    reg = SchemaRegistry()
    reg.define(
        "BSE",
        "dm_customer",
        [
            ("sk_customer", "SERIAL", "Surrogate key"),
            ("nk_customer", "TEXT", "Natural key"),
            ("c_mktsegment", "TEXT", "Attribute"),
        ],
    )
    reg.define(
        "BSE",
        "ft_orders",
        [
            # BIGINT, not INTEGER: at 100 TB both the surrogate range
            # and source order keys exceed int32 (a 10x key-shifted
            # rehearsal decade overflowed the INT cast here — see
            # SCALE.md "sf1 rehearsal")
            ("fk_customer", "BIGINT", "Foreign key", "dm_customer"),
            ("o_orderkey", "BIGINT", "Attribute"),
            ("o_totalprice", "NUMERIC", "Attribute"),
        ],
    )
    p = Pipeline(conf, registry=reg, spark=spark)

    dfl = p.dataflow("stage dm_customer")
    dfl.createDataset(
        "dm_customer",
        table(spark, sf_dir, "customer").select(
            F.col("c_custkey").cast("string").alias("nk_customer"), "c_mktsegment"
        ),
    )
    dfl.prepForLoad("dm_customer")

    dfl2 = p.dataflow("stage ft_orders")
    dfl2.createDataset(
        "ft_orders",
        table(spark, sf_dir, "orders").select(
            F.col("o_custkey").cast("string").alias("nk_customer"),
            "o_orderkey",
            "o_totalprice",
        ),
    )
    dfl2.prepForLoad("ft_orders")

    bulk_load_dimension(p, reg.get_table("BSE", "dm_customer"))
    bulk_load_fact(p, reg.get_table("BSE", "ft_orders"))

    dim = read_staged(spark, conf.layer_path("BSE", "dm_customer"), all_string=False)
    fact = read_staged(spark, conf.layer_path("BSE", "ft_orders"), all_string=False)
    summary = (
        fact.join(
            F.broadcast(dim), fact["fk_customer"] == dim["sk_customer"], "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("revenue"),
        )
    )
    write_staged(summary, conf.layer_path("SUM", "su_orders_by_segment"))
    return read_staged(
        spark, conf.layer_path("SUM", "su_orders_by_segment"), all_string=False
    )


STAR_SCHEMA_PIPELINE_SQL = """
WITH dim AS (
  SELECT row_number() OVER (ORDER BY CAST(c_custkey AS VARCHAR)) AS sk,
         CAST(c_custkey AS VARCHAR) AS nk, c_mktsegment
  FROM customer
)
SELECT d.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN dim d ON CAST(o.o_custkey AS VARCHAR) = d.nk
GROUP BY d.c_mktsegment
"""


QUERIES = {
    "star_schema_pipeline": (q_star_schema_pipeline, STAR_SCHEMA_PIPELINE_SQL),
}

"""TPC-H-flavored headline queries.

These run as a single SQL text through the engine's ``customSQL``
operator (the reference's arbitrary-SQL surface, betl/io/dbIO.py:55-73)
AND as the DuckDB oracle — the SQL is written in the dialect
intersection, so one string serves both engines and there is zero
translation drift.

Scale notes (the plans Catalyst produces for these):
- q1: partial (map-side) aggregation before the shuffle; only
  4 groups ever cross the wire.
- q3/q5: the dimension sides (customer/nation/region/supplier) are
  broadcast; only orders⋈lineitem is a real shuffle join, on the
  natural join key — at 100 TB the same plan holds with AQE handling
  skew.
- top_customers/q10: partial agg then a global top-k
  (TakeOrderedAndProject) — no full sort of the aggregate.
- q6: pure scan+filter+agg — the predicates reach the parquet reader
  (PushedFilters on l_shipdate/l_quantity), so row groups outside the
  date range never leave disk.
"""

from __future__ import annotations

from betl_spark.contract.common import REVENUE, dataflow, dec

Q1_PRICING_SUMMARY = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM({dec('l_quantity')}) AS DOUBLE) AS sum_qty,
  CAST(SUM({dec('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
  CAST(SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')})) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')}) * (1 + {dec('l_tax')})) AS DOUBLE) AS sum_charge,
  CAST(SUM({dec('l_quantity')}) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM({dec('l_extendedprice')}) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM({dec('l_discount')}) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

Q3_SHIPPING_PRIORITY = f"""
SELECT
  o.o_orderkey,
  {REVENUE} AS revenue,
  CAST(o.o_orderdate AS DATE) AS o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""

Q5_LOCAL_SUPPLIER = f"""
SELECT
  n.n_name,
  {REVENUE} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""

Q6_FORECAST_REVENUE = f"""
SELECT
  CAST(SUM({dec('l_extendedprice')} * {dec('l_discount')}) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND {dec('l_discount')} BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

Q10_RETURNED_ITEMS = f"""
SELECT
  c.c_custkey,
  c.c_name,
  {REVENUE} AS revenue,
  n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""

ROLLUP_REVENUE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')})) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

TOP_CUSTOMERS = f"""
SELECT
  c.c_custkey,
  c.c_name,
  CAST(SUM({dec('o.o_totalprice')}) AS DOUBLE) AS total_spend,
  COUNT(*) AS n_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, c.c_custkey
LIMIT 20
"""

EVENTS_TUMBLING_WINDOW = """
SELECT
  CAST(FLOOR(epoch(ts) / 300) * 300 AS BIGINT) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""
# Spark reads events.ts as long nanos-since-epoch (nanosAsLong); integer
# DIV keeps the bucketing exact (no double rounding), and agrees with
# DuckDB's floor(epoch/300) on the native nanos timestamp
EVENTS_TUMBLING_WINDOW_SPARK = """
SELECT
  CAST((ts DIV 300000000000) * 300 AS BIGINT) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def _sql_query(sql: str, tables: list[str], spark_sql: str | None = None):
    def run(spark, sf_dir):
        dfl = dataflow(spark, sf_dir, tables)
        return dfl.customSQL(spark_sql or sql)

    return run, sql


QUERIES = {
    "tpch_q1_pricing_summary": _sql_query(Q1_PRICING_SUMMARY, ["lineitem"]),
    "tpch_q3_shipping_priority": _sql_query(
        Q3_SHIPPING_PRIORITY, ["customer", "orders", "lineitem"]
    ),
    "tpch_q5_local_supplier": _sql_query(
        Q5_LOCAL_SUPPLIER,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    ),
    "tpch_q6_forecast_revenue": _sql_query(Q6_FORECAST_REVENUE, ["lineitem"]),
    "tpch_q10_returned_items": _sql_query(
        Q10_RETURNED_ITEMS, ["customer", "orders", "lineitem", "nation"]
    ),
    "rollup_revenue": _sql_query(ROLLUP_REVENUE, ["lineitem"]),
    "top_customers": _sql_query(TOP_CUSTOMERS, ["customer", "orders"]),
    "events_tumbling_window": _sql_query(
        EVENTS_TUMBLING_WINDOW, ["events"], spark_sql=EVENTS_TUMBLING_WINDOW_SPARK
    ),
}

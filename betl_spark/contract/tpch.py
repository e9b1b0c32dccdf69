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
- q4: EXISTS compiles to a left-semi join on l_orderkey; at scale it
  is the one shuffle (orders⋈lineitem on the natural key), and the
  date filter on orders is pushed to its scan first.
- q7/q8: all dimension sides (supplier/customer/nation/part) broadcast;
  the nation-name predicate is pushed into the nation scans so the
  broadcast table is 2 rows. At 100 TB orders⋈lineitem falls back
  from broadcast to a sort-merge join on the key under AQE — the
  only plan element that changes with scale.
- q14/q19: OR-of-ANDs predicates are decomposed by Catalyst — the
  quantity-only disjunction is pushed to the lineitem scan, the
  brand/size disjunction to the part scan, and the residual compound
  stays as the join condition. part broadcasts.
- q18: the HAVING-subquery (per-order quantity sums) aggregates
  map-side first, and its survivors feed broadcast LEFT SEMI joins
  into both orders and lineitem; final top-20 is
  TakeOrderedAndProject, never a full sort.
- q22: the scalar AVG subquery is one tiny job; NOT EXISTS is a
  broadcast anti join (orders' custkeys are the broadcast side after
  dedup — at 100 TB flip to shuffled anti join via AQE).
- window_top_orders_per_segment: ROW_NUMBER over (segment, price
  desc) — one hash shuffle on the partition key, then an in-partition
  sort; rnk<=5 is applied before the final exchange (WindowGroupLimit
  pushes the limit into the sort at scale).
- setop EXCEPT/INTERSECT: compile to aggregate+anti/semi-join shapes
  on the key — single shuffle each.
- q2/q17: correlated scalar-agg subqueries decorrelate into an
  aggregate-then-join on the correlation key (per-part MAX/AVG) — one
  extra shuffle on l_partkey, never a per-row subquery execution.
- q9: dimension sides (part/supplier/nation) broadcast; the p_name LIKE
  filter shrinks part before broadcast, and the only real shuffle is
  lineitem⋈orders on the key.
- q11: the CTE is one grouped aggregate; the uncorrelated scalar
  threshold is a single tiny job over its (reused) exchange output.
- q12/q13: one shuffle each (join key / group key); q13's two-level agg
  aggregates map-side at both levels — only |customers| then |distinct
  counts| rows cross the wire.
- q15: revenue CTE computed once, its exchange reused for both the MAX
  scalar and the join (ReusedExchange in the plan); supplier broadcasts.
- q16: COUNT(DISTINCT) expands to a two-phase distinct-then-count agg;
  NOT IN's blacklist is a tiny broadcast null-aware anti join.
- q20: the IN-subquery aggregates lineitem map-side on l_suppkey
  (HAVING applied pre-join) then left-semi-joins into supplier —
  supplier side broadcasts.
- q21: EXISTS/NOT EXISTS become a broadcast-able semi + anti join pair
  on l_orderkey with the non-equality residuals (suppkey<>, shipdate>)
  as join conditions — at 100 TB both fall back to shuffled joins on
  the same key, and the three lineitem scans share the l_orderkey
  partitioning.
- cube/rollup: Expand multiplies rows by the number of grouping sets
  BEFORE the shuffle, but partial aggregation collapses them map-side,
  so the wire carries only |groups|×|sets| rows.
"""

from __future__ import annotations

from betl_spark.contract.common import REVENUE, dataflow, dec, table, ts_micros_sql

Q1_PRICING_SUMMARY = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM({dec('l_quantity')}) AS DOUBLE) AS sum_qty,
  CAST(SUM({dec('l_extendedprice')}) AS DOUBLE) AS sum_base_price,
  CAST(SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')})) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')}) * (1 + {dec('l_tax')})), 2) AS DOUBLE) AS sum_charge,
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
-- engine-semantics alignment: Spark's Expand-based ROLLUP/CUBE emits
-- NO rows on empty input, while the standard (and DuckDB) produce the
-- grand-total row; COUNT(*) = 0 can only happen for that empty-input
-- row, so this HAVING is a no-op on any non-empty table
HAVING COUNT(*) > 0
"""

# Spark-side variants: pre-aggregate to the (flag, status) grain BEFORE
# the grouping-sets Expand. A naive GROUP BY CUBE/ROLLUP expands every
# FACT row 3-4x before aggregating - at 100 TB that triples the scan's
# downstream volume; aggregating first shrinks the input to
# |distinct(flag, status)| rows (~8) and the Expand costs nothing.
# Decimal partial sums re-sum exactly, so results are bit-identical.
_REVENUE_PREAGG = f"""
  SELECT l_returnflag, l_linestatus,
         SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')})) AS rev_dec,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

CUBE_REVENUE_SPARK = f"""
WITH pre AS ({_REVENUE_PREAGG})
SELECT l_returnflag, l_linestatus,
       CAST(SUM(rev_dec) AS DOUBLE) AS revenue,
       SUM(n) AS n_lines
FROM pre
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ROLLUP_REVENUE_SPARK = f"""
WITH pre AS ({_REVENUE_PREAGG})
SELECT l_returnflag, l_linestatus,
       CAST(SUM(rev_dec) AS DOUBLE) AS revenue,
       SUM(n) AS n_lines
FROM pre
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

Q4_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

Q7_VOLUME_SHIPPING = f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
    {dec('l.l_extendedprice')} * (1 - {dec('l.l_discount')}) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

Q8_MARKET_SHARE = f"""
SELECT
  o_year,
  CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT
    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
    {dec('l.l_extendedprice')} * (1 - {dec('l.l_discount')}) AS volume,
    n1.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  WHERE p.p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

Q14_PROMO_REVENUE = f"""
SELECT
  CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
        THEN {dec('l.l_extendedprice')} * (1 - {dec('l.l_discount')})
        ELSE 0 END), 2) AS DOUBLE) * 100.0
    / CAST(ROUND(SUM({dec('l.l_extendedprice')} * (1 - {dec('l.l_discount')})), 2) AS DOUBLE)
    AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
"""

Q18_LARGE_VOLUME_CUSTOMER = f"""
SELECT
  c.c_name,
  c.c_custkey,
  o.o_orderkey,
  CAST(o.o_orderdate AS DATE) AS o_orderdate,
  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(SUM({dec('l.l_quantity')}) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM({dec('l_quantity')}) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_totalprice
ORDER BY o_totalprice DESC, o.o_orderkey
LIMIT 20
"""

Q19_BRAND_REVENUE = f"""
SELECT
  {REVENUE} AS revenue,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
"""

Q22_DORMANT_CUSTOMERS = f"""
SELECT
  c.c_mktsegment,
  COUNT(*) AS numcust,
  CAST(SUM({dec('c.c_acctbal')}) AS DOUBLE) AS totacctbal
FROM customer c
WHERE {dec('c.c_acctbal')} > (
    SELECT AVG({dec('c_acctbal')}) FROM customer WHERE {dec('c_acctbal')} > 0.00
  )
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

# The testdata schema is a slim TPC-H (no partsupp table, no
# commit/receipt dates, no ship modes), so q2/q9/q11/q12/q16/q17/q20/q21
# are adapted: part⋈supplier relationships go through lineitem, and
# "late" is shipdate lagging orderdate. The query *shapes* (correlated
# scalar subqueries, EXISTS/NOT EXISTS pairs, CTE reuse, distinct-count,
# two-level aggregation) are preserved — they are the point.

Q2_MIN_COST_SUPPLIER = f"""
SELECT
  CAST(s.s_acctbal AS DOUBLE) AS s_acctbal,
  s.s_name,
  n.n_name,
  p.p_partkey,
  p.p_name
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size = 15
  AND p.p_type = 'STANDARD'
  AND r.r_name = 'EUROPE'
  AND {dec('s.s_acctbal')} = (
    SELECT MAX({dec('s2.s_acctbal')})
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
GROUP BY s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""

Q9_PRODUCT_TYPE_PROFIT = f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT
    n.n_name AS nation,
    CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
    {dec('l.l_extendedprice')} * (1 - {dec('l.l_discount')}) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

Q11_IMPORTANT_PARTS = f"""
WITH supplied AS (
  SELECT
    l.l_partkey,
    SUM({dec('l.l_extendedprice')} * {dec('l.l_quantity')}) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS value
FROM supplied
WHERE val > (SELECT SUM(val) * 0.001 FROM supplied)
ORDER BY value DESC, l_partkey
"""

Q12_LATE_SHIPMENTS = """
SELECT
  l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY l_linestatus
"""

Q13_CUSTOMER_DISTRIBUTION = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

Q15_TOP_SUPPLIER = f"""
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    SUM({dec('l_extendedprice')} * (1 - {dec('l_discount')})) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""

Q16_SUPPLIER_COUNT = """
SELECT
  p.p_brand,
  p.p_type,
  p.p_size,
  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%00000009%'
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

Q17_SMALL_QUANTITY_REVENUE = f"""
SELECT CAST(SUM({dec('l.l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
"""

Q20_PROMOTION_SUPPLIERS = """
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_suppkey
    HAVING SUM(l.l_quantity) > 100
  )
ORDER BY s.s_name
"""

Q21_WAITING_SUPPLIERS = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name = 'NATION_9'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""

# ---- capability supersets (absent in the reference; SURVEY §2.5/§2.7) ----

WINDOW_TOP_ORDERS_PER_SEGMENT = f"""
SELECT c_mktsegment, o_orderkey, o_totalprice, rnk
FROM (
  SELECT
    c.c_mktsegment,
    o.o_orderkey,
    CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY c.c_mktsegment
      ORDER BY {dec('o.o_totalprice')} DESC, o.o_orderkey
    ) AS BIGINT) AS rnk
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
) ranked
WHERE rnk <= 5
ORDER BY c_mktsegment, rnk
"""

SETOP_EXCEPT_CUSTOMERS = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey FROM orders
"""

SETOP_INTERSECT_NATIONS = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""

CUBE_REVENUE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {REVENUE} AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
-- see ROLLUP_REVENUE: align to Spark's no-grand-total-on-empty
HAVING COUNT(*) > 0
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
# Spark-side variant is a template: {ts_us} is filled at run time from
# the bound events schema (ts_micros_sql) because the testdata's
# physical type for ts has shifted across driver rounds (long nanos ->
# timestamp micros). Integer DIV on epoch-micros keeps the 300s
# bucketing exact (no double rounding) and agrees with DuckDB's
# floor(epoch/300) on the native timestamp.
EVENTS_TUMBLING_WINDOW_SPARK_TMPL = """
SELECT
  CAST(({ts_us} DIV 300000000) * 300 AS BIGINT) AS window_start,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_events_tumbling_window(spark, sf_dir):
    dfl = dataflow(spark, sf_dir, ["events"])
    frag = ts_micros_sql(table(spark, sf_dir, "events"))
    return dfl.customSQL(EVENTS_TUMBLING_WINDOW_SPARK_TMPL.format(ts_us=frag))


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
    "tpch_q4_order_priority": _sql_query(Q4_ORDER_PRIORITY, ["orders", "lineitem"]),
    "tpch_q7_volume_shipping": _sql_query(
        Q7_VOLUME_SHIPPING,
        ["supplier", "lineitem", "orders", "customer", "nation"],
    ),
    "tpch_q8_market_share": _sql_query(
        Q8_MARKET_SHARE, ["part", "lineitem", "supplier", "orders", "nation"]
    ),
    "tpch_q14_promo_revenue": _sql_query(Q14_PROMO_REVENUE, ["lineitem", "part"]),
    "tpch_q18_large_volume_customer": _sql_query(
        Q18_LARGE_VOLUME_CUSTOMER, ["customer", "orders", "lineitem"]
    ),
    "tpch_q19_brand_revenue": _sql_query(Q19_BRAND_REVENUE, ["lineitem", "part"]),
    "tpch_q2_min_cost_supplier": _sql_query(
        Q2_MIN_COST_SUPPLIER,
        ["part", "lineitem", "supplier", "nation", "region"],
    ),
    "tpch_q9_product_type_profit": _sql_query(
        Q9_PRODUCT_TYPE_PROFIT,
        ["part", "lineitem", "supplier", "orders", "nation"],
    ),
    "tpch_q11_important_parts": _sql_query(
        Q11_IMPORTANT_PARTS, ["lineitem", "supplier", "nation"]
    ),
    "tpch_q12_late_shipments": _sql_query(Q12_LATE_SHIPMENTS, ["orders", "lineitem"]),
    "tpch_q13_customer_distribution": _sql_query(
        Q13_CUSTOMER_DISTRIBUTION, ["customer", "orders"]
    ),
    "tpch_q15_top_supplier": _sql_query(Q15_TOP_SUPPLIER, ["lineitem", "supplier"]),
    "tpch_q16_supplier_count": _sql_query(
        Q16_SUPPLIER_COUNT, ["part", "lineitem", "supplier"]
    ),
    "tpch_q17_small_qty_revenue": _sql_query(
        Q17_SMALL_QUANTITY_REVENUE, ["lineitem", "part"]
    ),
    "tpch_q20_promotion_suppliers": _sql_query(
        Q20_PROMOTION_SUPPLIERS, ["supplier", "nation", "lineitem", "part"]
    ),
    "tpch_q21_waiting_suppliers": _sql_query(
        Q21_WAITING_SUPPLIERS, ["supplier", "lineitem", "orders", "nation"]
    ),
    "tpch_q22_dormant_customers": _sql_query(
        Q22_DORMANT_CUSTOMERS, ["customer", "orders"]
    ),
    "window_top_orders_per_segment": _sql_query(
        WINDOW_TOP_ORDERS_PER_SEGMENT, ["customer", "orders"]
    ),
    "setop_except_customers": _sql_query(SETOP_EXCEPT_CUSTOMERS, ["customer", "orders"]),
    "setop_intersect_nations": _sql_query(
        SETOP_INTERSECT_NATIONS, ["customer", "supplier"]
    ),
    "cube_revenue": _sql_query(
        CUBE_REVENUE, ["lineitem"], spark_sql=CUBE_REVENUE_SPARK
    ),
    "rollup_revenue": _sql_query(
        ROLLUP_REVENUE, ["lineitem"], spark_sql=ROLLUP_REVENUE_SPARK
    ),
    "top_customers": _sql_query(TOP_CUSTOMERS, ["customer", "orders"]),
    "events_tumbling_window": (q_events_tumbling_window, EVENTS_TUMBLING_WINDOW),
}

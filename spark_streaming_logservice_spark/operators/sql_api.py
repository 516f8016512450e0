"""SQL-string API parity: the same ANSI SQL text runs through spark.sql()
AND the DuckDB oracle. This pins the engine's SQL surface (CTEs, window
functions, CASE, date arithmetic) to the common ANSI subset — a user can
submit these queries as strings, not just DataFrame code.

register_views() exposes the testdata tables under the same names in both
engines, so the oracle string IS the Spark query string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import register_views

SQL01 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n
FROM lineitem
WHERE l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

SQL02 = """
WITH order_values AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
SELECT c_mktsegment,
       count(*) AS n_top_orders,
       round(sum(o_totalprice), 2) AS top_order_value
FROM order_values JOIN customer ON c_custkey = o_custkey
WHERE rk = 1
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

SQL03 = """
SELECT CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END AS size_class,
       p_type,
       count(*) AS n_parts,
       round(avg(p_retailprice), 4) AS avg_price
FROM part
GROUP BY size_class, p_type
ORDER BY size_class, p_type
"""


# Recursive CTE (Spark 4's WITH RECURSIVE): generate the calendar of months
# 1995-01..2001-08 recursively, then left-join monthly order counts — the
# classic gap-filling query that needs row GENERATION, not just filtering.
# Integer month arithmetic keeps the text in the ANSI subset both engines
# parse identically (interval-literal syntax differs between them).
SQL04 = """
WITH RECURSIVE months(ym) AS (
  SELECT 23940
  UNION ALL
  SELECT ym + 1 FROM months WHERE ym < 24019
)
SELECT CAST(floor(ym / 12.0) AS BIGINT) AS yr,
       CAST(ym - CAST(floor(ym / 12.0) AS BIGINT) * 12 + 1 AS BIGINT) AS mth,
       count(o_orderkey) AS n_orders
FROM months LEFT JOIN orders
  ON year(o_orderdate) * 12 + month(o_orderdate) - 1 = ym
GROUP BY 1, 2
ORDER BY yr, mth
"""

# GROUPING SETS with a grouping-bit column: three aggregation granularities
# in one pass over the fact table (Spark expands to a single Expand+Agg).
SQL05 = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       round(sum(l_extendedprice), 2) AS revenue,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


# Correlated LATERAL subquery: per-region top-2 customers by balance — row
# generation dependent on the outer row, the shape window functions can't
# always replace (the subquery can ORDER BY + LIMIT arbitrarily). Both
# engines parse the same ANSI LATERAL text.
SQL06 = """
SELECT r_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
FROM region,
LATERAL (
  SELECT c_name, c_acctbal
  FROM customer
  JOIN nation ON n_nationkey = c_nationkey
  WHERE n_regionkey = r_regionkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) AS t
ORDER BY r_name, acctbal DESC, c_name
"""


# Window-function battery over one customer-partitioned frame: ranking
# (percent_rank/cume_dist/ntile), navigation (lag/lead), and frame-bound
# aggregates (first_value, running sum) — the full ANSI window surface in a
# single pass. One window spec = one shuffle on o_custkey; every function
# shares it (Spark plans a single WindowExec, never one per function).
# Restricted to a deterministic customer slice so ties can't straddle the
# LIMIT boundary; (o_custkey, rk) ordering is a total order.
SQL07 = """
WITH w AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number()   OVER win AS rk,
         ntile(4)       OVER win AS quartile,
         round(percent_rank() OVER win, 6) AS pct_rank,
         round(cume_dist()    OVER win, 6) AS cdist,
         lag(o_orderkey)      OVER win AS prev_ok,
         lead(o_orderkey)     OVER win AS next_ok,
         first_value(o_orderkey) OVER win AS best_ok,
         round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
  FROM orders
  WHERE o_custkey % 100 = 7
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
)
SELECT o_custkey, o_orderkey, quartile, pct_rank, cdist,
       prev_ok, next_ok, best_ok, run_total
FROM w
WHERE rk <= 5
ORDER BY o_custkey, run_total
"""


# RANGE-frame windows (value-distance frames, not row-count frames): for
# each order, how many orders fall within 100 currency units below it, and
# the revenue inside that band — the frame clause ROWS can't express.
# Deterministic: the frame is defined by VALUES, so peer order doesn't
# matter; count/sum over the band are exact.
# A RANGE frame needs a TOTAL order, so this window is inherently
# partition-less — the scale guard is the predicate: o_custkey < 150 bounds
# the windowed relation by KEY RANGE (~150 customers' orders at ANY scale
# factor), unlike a modulo slice whose row count would grow with SF and
# eventually funnel millions of rows through one task.
SQL08 = """
SELECT o_orderkey, o_totalprice,
       count(*) OVER band AS n_in_band,
       round(sum(o_totalprice) OVER band, 2) AS band_revenue
FROM orders
WHERE o_custkey < 150
WINDOW band AS (ORDER BY o_totalprice
                RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)
ORDER BY o_totalprice, o_orderkey
"""


def _sql_query(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return fn



# UNPIVOT: wide-to-long reshaping in SQL text (Spark 4 and DuckDB both parse
# the SQL-standard UNPIVOT clause). The wide side is a 3-row aggregate, so
# the reshape itself is O(flags x metrics) regardless of corpus size — the
# one corpus pass is the grouped sum above it.
SQL09 = """
WITH agg AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS qty,
         round(sum(l_extendedprice), 2) AS price,
         round(sum(l_discount), 2) AS disc,
         round(sum(l_tax), 2) AS tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, metric, val
FROM agg UNPIVOT (val FOR metric IN (qty, price, disc, tax))
ORDER BY l_returnflag, metric
"""

query("sql01_grouped_filter", oracle=SQL01)(_sql_query(SQL01))
query("sql02_cte_window_join", oracle=SQL02)(_sql_query(SQL02))
query("sql03_case_classification", oracle=SQL03)(_sql_query(SQL03))
query("sql04_recursive_month_gaps", oracle=SQL04)(_sql_query(SQL04))
query("sql05_grouping_sets", oracle=SQL05)(_sql_query(SQL05))
query("sql06_lateral_topn", oracle=SQL06)(_sql_query(SQL06))
query("sql07_window_battery", oracle=SQL07)(_sql_query(SQL07))
query("sql08_range_frame", oracle=SQL08)(_sql_query(SQL08))
query("sql09_unpivot", oracle=SQL09)(_sql_query(SQL09))


# QUALIFY: DuckDB (like Snowflake/BigQuery) filters on window results with
# the QUALIFY clause; Spark 4 has no QUALIFY, so the engine's rewrite is
# the standard derived-table form — window in a subquery, predicate
# outside. Registering BOTH texts pins the rewrite's equivalence: the
# oracle runs the native QUALIFY, the Spark side runs the rewrite. The
# window partitions by customer (hash-partitioned top-k, WindowGroupLimit
# prunes to 2 rows per customer map-side — no global sort at any scale).
SQL10_DUCK = """
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER w AS rn
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC)
QUALIFY rn <= 2
ORDER BY o_custkey, rn
"""

SQL10_SPARK = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rn
  FROM orders
) WHERE rn <= 2
ORDER BY o_custkey, rn
"""

query("sql10_qualify_topn", oracle=SQL10_DUCK)(_sql_query(SQL10_SPARK))

"""Second wave of relational contract queries: correlated subqueries,
disjunctive predicates, set operations, analytic windows, pivot — rounding
out the §2.4 surface with the TPC-H-shaped patterns the star schema supports.

Same scale discipline as relational.py: broadcast hints only on fixed-size
relations (nation/region, 1-row scalars) — SF-scaling customer/supplier/part
joins are AQE's call — partial aggregation, filters expressed declaratively so
they reach the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q04: order priority with EXISTS ---------------------------------------

@query(
    "q04_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(
            l.where(F.col("l_quantity") > 45),
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- q07: volume shipping between two nations by year ----------------------

@query(
    "q07_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        # supplier/customer are O(SF) — no forced broadcast (AQE's call);
        # only the 25-row nation roles are hinted.
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- q14: promo revenue (conditional aggregation) --------------------------

@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))  # O(SF): AQE's call
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


# --- q18: large-volume customers (HAVING over join) ------------------------

@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, round(o_totalprice, 2) AS totalprice,
           round(total_qty, 2) AS total_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    ) big
      JOIN orders   ON o_orderkey = big.l_orderkey
      JOIN customer ON c_custkey = o_custkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_raw"))
        .where(F.col("total_qty_raw") > 250)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))  # O(SF): AQE's call
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.col("total_qty_raw"), 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


# --- q19: disjunctive multi-predicate revenue ------------------------------

@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 35)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, F.col("p_partkey") == F.col("l_partkey"))  # O(SF): AQE's call
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 35))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n"),
    )


# --- q22: scalar subquery + anti join (balance analysis) -------------------

@query(
    "q22_balance_no_orders",
    oracle="""
    SELECT count(*) AS n_rich_idle,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q22_balance_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    # scalar subquery as a broadcast 1-row join — no driver-side collect
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(
            F.count("*").alias("n_rich_idle"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# --- q20: set operations (INTERSECT / EXCEPT) ------------------------------

@query(
    "q20_set_operations",
    oracle="""
    WITH returned AS (
      SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
    ), y97 AS (
      SELECT DISTINCT o_orderkey AS k FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT
      (SELECT count(*) FROM (SELECT k FROM returned INTERSECT SELECT k FROM y97)) AS n_both,
      (SELECT count(*) FROM (SELECT k FROM y97 EXCEPT SELECT k FROM returned)) AS n_only_97
    """,
)
def q20_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    returned = l.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k")
    ).distinct()
    y97 = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    both = returned.intersect(y97).agg(F.count("*").alias("n_both"))
    only97 = y97.exceptAll(returned).agg(F.count("*").alias("n_only_97"))
    return both.crossJoin(only97)


# --- q21: analytic windows (lag + running sum) -----------------------------

@query(
    "q21_customer_order_deltas",
    oracle="""
    SELECT c_custkey, o_orderkey,
           round(o_totalprice, 2) AS totalprice,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2)
             AS running_total,
           round(coalesce(o_totalprice - lag(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0), 2)
             AS delta_prev
    FROM orders JOIN customer ON c_custkey = o_custkey
    WHERE c_custkey < 20
    ORDER BY c_custkey, o_orderkey
    """,
)
def q21_customer_order_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        # c is filtered to <20 keys (bounded at any SF) but carries no hint —
        # a 20-row side is a trivially automatic broadcast for AQE anyway.
        o.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
            F.round(
                F.coalesce(
                    F.col("o_totalprice") - F.lag("o_totalprice").over(w), F.lit(0.0)
                ),
                2,
            ).alias("delta_prev"),
        )
        .orderBy("c_custkey", "o_orderkey")
    )


# --- q23: pivot (conditional aggregation matrix) ---------------------------

@query(
    "q23_pivot_status_priority",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS p1_urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS p2_high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS p3_medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS p5_low
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q23_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    labels = {
        "1-URGENT": "p1_urgent",
        "2-HIGH": "p2_high",
        "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_notspec",
        "5-LOW": "p5_low",
    }
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(labels))
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{k}`"), F.lit(0)).alias(v) for k, v in labels.items()
    ]
    return pivoted.select(*cols).orderBy("o_orderstatus")


# --- q08: national market share (TPC-H Q8 shape) ---------------------------

@query(
    "q08_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        JOIN region r   ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of ASIA's ECONOMY-part revenue per
    year. One fact-fact shuffle (lineitem⋈orders); fixed-size dims (both
    nation roles, region) carry broadcast hints, while the SF-scaling dims
    (customer, supplier, part) are left to AQE — broadcast at test scale,
    shuffle at 100 TB."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        # customer/supplier/part scale with SF — hints only on the fixed-size
        # nation roles + region; AQE broadcasts the rest at test scale.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(p, l.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("supp_nation"),
        )
    )
    return (
        df.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- q09: product-type profit (TPC-H Q9 shape, cost proxy) -----------------

@query(
    "q09_product_profit",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - l.l_quantity * p.p_retailprice * 0.8), 2) AS profit
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY supp_nation, o_year
    ORDER BY supp_nation, o_year DESC
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per supplier-nation, per year, profit on parts whose
    name contains 'red'. The schema has no partsupp/ps_supplycost, so cost is
    the defined proxy quantity × 0.8 × p_retailprice — the join/aggregate
    shape (fact⋈fact + three broadcast dims + LIKE filter) is what Q9
    exercises."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    o = _t(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("l_quantity") * F.col("p_retailprice") * 0.8
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)  # part/supplier O(SF): AQE's call
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            "supp_nation", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy(F.asc("supp_nation"), F.desc("o_year"))
    )


# --- q17: small-quantity revenue (TPC-H Q17 shape) -------------------------

@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'SMALL'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would vanish if sub-20%-of-average-quantity
    orders stopped. The correlated scalar subquery becomes one extra
    aggregate on lineitem joined back by partkey — two passes over the
    fact table, no per-row subquery."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    avg_q = l.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)  # O(SF): AQE's call
        .join(avg_q, F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --- q24: cheapest supplier per part (TPC-H Q2 shape, via lineitem) --------

@query(
    "q24_cheapest_supplier_per_part",
    oracle="""
    WITH offers AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             round(avg(l.l_extendedprice / l.l_quantity), 4) AS unit_price
      FROM lineitem l
      GROUP BY 1, 2
    ), ranked AS (
      SELECT o.partkey, o.suppkey, o.unit_price,
             row_number() OVER (PARTITION BY o.partkey
                                ORDER BY o.unit_price, o.suppkey) AS rk
      FROM offers o
        JOIN supplier s ON o.suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT ra.partkey, ra.suppkey, ra.unit_price
    FROM ranked ra JOIN part p ON ra.partkey = p.p_partkey
    WHERE ra.rk = 1 AND p.p_type = 'SMALL'
    ORDER BY ra.unit_price DESC, ra.partkey
    LIMIT 40
    """,
)
def q24_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape without a partsupp table: observed unit prices from
    lineitem stand in for supply cost; pick each SMALL part's cheapest
    EUROPE supplier. Aggregation shrinks the fact table to (part, supplier)
    offers BEFORE the window, so the rank runs on the small aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "SMALL")
    offers = l.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
            "unit_price"
        )
    )
    euro = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey")
    )
    w = Window.partitionBy("partkey").orderBy(F.asc("unit_price"), F.asc("suppkey"))
    return (
        # euro (≈supplier/5) and part are O(SF) — no forced broadcast.
        offers.join(euro, F.col("suppkey") == F.col("s_suppkey"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .join(p, F.col("partkey") == p.p_partkey)
        .select("partkey", "suppkey", "unit_price")
        .orderBy(F.desc("unit_price"), F.asc("partkey"))
        .limit(40)
    )


# --- q26: argmax over an aggregate (TPC-H Q15 shape) ------------------------
# "The supplier(s) achieving the maximum quarterly revenue": aggregate, then
# keep rows equal to the aggregate's max. Spark shape: one suppkey-keyed
# partial-agg shuffle builds the revenue relation; the max is a 1-row scalar
# re-aggregated FROM that relation (not a second corpus pass) and broadcast
# back via a scalar cross join. Ties all surface (no LIMIT 1 arbitrariness).

@query(
    "q26_top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    ), mx AS (
      SELECT max(total_revenue) AS m FROM rev
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON s_suppkey = supplier_no
    CROSS JOIN mx
    WHERE total_revenue = m
    ORDER BY s_suppkey
    """,
)
def q26_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(s, F.col("s_suppkey") == F.col("supplier_no"))  # O(SF): AQE
        .crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- q27: month-over-month growth (navigation over an aggregate) ------------
# Monthly revenue rollup (one partial-agg shuffle over orders, key space =
# months) then lag/growth% over the TINY aggregate — the e06 pattern: the
# partition-less window is fine because it runs on O(months) rows, never
# the corpus.

@query(
    "q27_monthly_growth",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
             round(sum(o_totalprice), 2) AS revenue,
             count(*) AS n_orders
      FROM orders
      GROUP BY ym
    )
    SELECT CAST(ym AS BIGINT) AS ym, n_orders, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY ym), 2) AS delta,
           round((revenue - lag(revenue) OVER (ORDER BY ym))
                 / lag(revenue) OVER (ORDER BY ym) * 100, 4) AS growth_pct
    FROM m
    ORDER BY ym
    """,
)
def q27_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("ym")
    prev = F.lag("revenue").over(w)
    return (
        m.select(
            F.col("ym").cast("long").alias("ym"),
            "n_orders",
            "revenue",
            F.round(F.col("revenue") - prev, 2).alias("delta"),
            F.round((F.col("revenue") - prev) / prev * 100, 4).alias("growth_pct"),
        )
        .orderBy("ym")
    )


# --- q28: waiting suppliers (TPC-H Q21 shape, adapted) ----------------------
# The classic hard TPC-H query: suppliers who were the ONLY late shipper in
# a multi-supplier finished order. The testdata trims l_receiptdate /
# l_commitdate, so "late" is adapted to l_shipdate > o_orderdate + 90 days;
# the double-correlated EXISTS / NOT EXISTS structure is intact. The Spark
# side uses the aggregate rewrite (per-order supplier and late-supplier
# counts joined back — two wordcount-bound aggregates + one orderkey join,
# no correlated subquery re-execution); the ORACLE keeps the textbook
# EXISTS/NOT EXISTS form, so the rewrite's equivalence is itself what the
# hash checks.

@query(
    "q28_waiting_suppliers",
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, count(*) AS numwait
    FROM (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM l l1
      WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
        AND EXISTS (
          SELECT 1 FROM l l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM l l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY
        )
    ) w
    JOIN supplier ON s_suppkey = w.l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q28_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    l = li.join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    late_flag = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 90 DAYS"
    )
    per_supp = (
        l.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late_flag, 1).otherwise(0)).alias("is_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("is_late").alias("n_late"),
    )
    waiting = (
        per_supp.where(F.col("is_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        waiting.join(s, F.col("l_suppkey") == F.col("s_suppkey"))  # O(SF): AQE
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --- q29: dominant suppliers (correlated aggregate threshold, Q20 family) ---
# "Which suppliers ship an outsized share of some part's total quantity?" —
# the correlated-subquery-with-aggregate shape (TPC-H Q20's inner predicate
# qty > θ * sum(...)), decorrelated the way Catalyst does: compute the
# per-part total ONCE as a relation and join it back, instead of a per-row
# subquery. Two shuffles over the fact table (part+supplier keyed, then
# part keyed), one co-partitioned join between two aggregates of the SAME
# scan (Spark reuses the exchange), then a supplier-keyed rollup joined to
# the broadcast supplier dim.

@query(
    "q29_dominant_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY 1, 2
    ), pt AS (
      SELECT l_partkey, sum(qty) AS total_qty FROM ps GROUP BY 1
    ), dom AS (
      SELECT ps.l_suppkey,
             count(*) AS n_dominated,
             round(max(ps.qty / pt.total_qty), 4) AS max_share
      FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
      WHERE ps.qty > 0.1 * pt.total_qty
      GROUP BY ps.l_suppkey
    )
    SELECT s.s_name, d.n_dominated, d.max_share
    FROM dom d JOIN supplier s ON s.s_suppkey = d.l_suppkey
    ORDER BY d.n_dominated DESC, s.s_name
    LIMIT 25
    """,
)
def q29_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    pt = ps.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dom = (
        ps.join(pt, "l_partkey")
        .where(F.col("qty") > 0.1 * F.col("total_qty"))
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_dominated"),
            F.round(F.max(F.col("qty") / F.col("total_qty")), 4).alias(
                "max_share"
            ),
        )
    )
    return (
        dom.join(s, dom["l_suppkey"] == s["s_suppkey"])  # O(SF): AQE's call
        .select("s_name", "n_dominated", "max_share")
        .orderBy(F.desc("n_dominated"), F.asc("s_name"))
        .limit(25)
    )


# --- q30: customer order-count distribution (TPC-H Q13 shape) ---------------
# The two-level aggregation with a NULL-preserving outer join: how many
# customers placed exactly k orders, INCLUDING k = 0 — the histogram the
# anti-join (q22) can't produce. Level 1 groups the outer join by customer
# (count(o_orderkey) ignores the null-extended rows, so zero-order
# customers count 0); level 2 groups by that count. Both shuffles shrink
# monotonically (customers, then O(distinct counts) rows).

@query(
    "q30_order_count_distribution",
    oracle="""
    SELECT c_orders, count(*) AS n_customers
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_orders
    ORDER BY n_customers DESC, c_orders DESC
    """,
)
def q30_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_orders"))
    )
    return (
        per_cust.groupBy("c_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("c_orders"))
    )


# --- q31: revenue concentration (Pareto share + Gini) ------------------------
# "How concentrated is revenue across customers?" — top-decile share and
# the Gini coefficient, the two standard concentration statistics. The
# global rank over customers uses the two-pass range-partitioned
# `distributed_row_number` (never a partition-less window), and EVERY sum
# runs in exact integer cents (l_extendedprice carries 2 decimals): the
# Gini numerator Σ rank·xᵢ reaches ~1e16 where double merge-order noise
# exceeds the round(4) resolution — integers are associative, so the
# statistic is bit-stable under any execution order.
#
# Gini = (2·Σ i·xᵢ)/(n·Σxᵢ) − (n+1)/n over x sorted ascending, i = 1..n.

@query(
    "q31_revenue_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, o_custkey) AS i,
             count(*) OVER () AS n,
             CAST(sum(cents) OVER () AS BIGINT) AS total
      FROM cust
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_customers,
           round(CAST(sum(CASE WHEN i > n - n // 10 THEN cents ELSE 0 END)
                      AS DOUBLE) / any_value(total), 4) AS top_decile_share,
           round(2.0 * CAST(sum(i * cents) AS DOUBLE)
                 / (CAST(any_value(n) AS DOUBLE) * any_value(total))
                 - (any_value(n) + 1.0) / any_value(n), 4) AS gini
    FROM ranked
    """,
)
def q31_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        distributed_row_number,
    )

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cents_row = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    cust = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(cents_row).alias("cents"))
    )
    ranked = distributed_row_number(
        cust, sort_cols=[F.col("cents"), F.col("o_custkey")], out="i"
    )
    totals = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    joined = ranked.join(F.broadcast(totals))
    top_cut = F.col("n") - F.expr("n div 10")
    return joined.agg(
        F.any_value("n").alias("n_customers"),
        F.round(
            F.sum(F.when(F.col("i") > top_cut, F.col("cents")).otherwise(0))
            .cast("double")
            / F.any_value("total"),
            4,
        ).alias("top_decile_share"),
        F.round(
            2.0
            * F.sum(F.col("i") * F.col("cents")).cast("double")
            / (F.any_value("n").cast("double") * F.any_value("total"))
            - (F.any_value("n") + 1.0) / F.any_value("n"),
            4,
        ).alias("gini"),
    )


# --- q32: order→ship latency percentiles by priority ------------------------
# The fulfillment-SLA question: how long after an order is placed does each
# line ship, by order priority? Latency lands in whole days (both engines
# compute identical integers), and the exact interpolated percentiles run
# per priority group — a partitioned aggregate over integer inputs, so the
# result is deterministic at any partitioning (no float-sum merge order
# anywhere). One fact shuffle on the join key, one on the priority group.

@query(
    "q32_ship_latency_percentiles",
    oracle="""
    WITH lat AS (
      SELECT o_orderpriority,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) AS days
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    )
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY days), 4) AS p50,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY days), 4) AS p90,
           round(percentile_cont(0.99) WITHIN GROUP (ORDER BY days), 4) AS p99,
           CAST(max(days) AS BIGINT) AS max_days
    FROM lat
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q32_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    lat = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.expr("percentile(days, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(days, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(days, 0.99)"), 4).alias("p99"),
            F.max("days").cast("bigint").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


# --- q33: brand repeat-purchase rate ------------------------------------------
# Customer-loyalty analytics over the full star: for each part brand, how
# many distinct customers bought it, how many came back for it in a SECOND
# distinct order, and the repeat share. The retention counterpart of q26's
# revenue ranking.
#
# 100 TB shape: lineitem ⋈ orders is the one fact-fact shuffle (both sides
# hash on l_orderkey/o_orderkey — co-partitionable/bucketable in a real
# deployment); part broadcasts (BROADCAST_TABLES); the distinct-order
# count groups on (brand, custkey) — O(customers × brands-touched) — and
# the final rollup is O(brands). Repeat share is exact half-up integer
# division to 1e-4 units.


@query(
    "q33_brand_repeat_share",
    oracle="""
    WITH bo AS (
      SELECT DISTINCT p.p_brand, o.o_custkey, o.o_orderkey
      FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
    ), bc AS (
      SELECT p_brand, o_custkey, count(*) AS n_orders
      FROM bo GROUP BY 1, 2
    )
    SELECT p_brand,
           count(*) AS n_customers,
           CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST((20000 * sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                 + count(*)) // (2 * count(*)) AS DOUBLE) / 10000.0
             AS repeat_share
    FROM bc
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q33_brand_repeat_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bo = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("p_brand", "o_custkey", "o_orderkey")
        .distinct()
    )
    bc = bo.groupBy("p_brand", "o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    rep = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return (
        bc.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rep.cast("bigint").alias("n_repeat"),
        )
        .select(
            "p_brand",
            "n_customers",
            "n_repeat",
            (
                F.expr(
                    "(20000 * n_repeat + n_customers) DIV (2 * n_customers)"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("repeat_share"),
        )
        .orderBy("p_brand")
    )


# --- q34: co-purchase pair lift (market-basket association) -----------------
# "Which part pairs land in the same order far more often than chance?" —
# association-rule mining's support/lift over order baskets, the family
# (frequent itemsets) nothing else in the registry covers. Reference
# parity: the aggregation surface of §2.4 composed into a self-join
# analytic the reference delegates to Spark SQL.
#
# 100 TB design: the pair generation is a basket self-join ON THE ORDER
# KEY with p1 < p2 — fan-out is C(basket_size, 2) per order, bounded by
# the basket size (TPC-H baskets are ≤7 lines; a general deployment caps
# baskets at top-K items first), NEVER a cross product over parts. The
# pair aggregate shuffles on the (p1, p2) composite — high cardinality,
# well spread; the per-part counts join back by part key. Lift is exact:
# n_ab·N·10000 against n_a·n_b with half-up integer division, computed in
# DECIMAL(38,0) (HUGEINT in DuckDB) because the numerator passes int64 at
# real scale (a 1%-of-orders pair at N≈1.5e10 puts 2·n_ab·N·10⁴ ≈ 4.5e23
# — ANSI Spark would abort, non-ANSI would wrap to garbage lifts); the
# top-50 cut orders by the INTEGER lift (then the pair) so the boundary
# is engine-agnostic.

BASKET_MIN_SUPPORT = 2


@query(
    "q34_copurchase_lift",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM baskets
    ), part_orders AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part
      FROM baskets GROUP BY l_partkey
    ), pairs AS (
      SELECT b1.l_partkey AS part_a, b2.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM baskets b1 JOIN baskets b2
        ON b1.l_orderkey = b2.l_orderkey AND b1.l_partkey < b2.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT part_a, part_b, n_both,
           CAST((2 * CAST(n_both AS HUGEINT) * n.n * 10000
                 + CAST(pa.n_part AS HUGEINT) * pb.n_part)
                // (2 * CAST(pa.n_part AS HUGEINT) * pb.n_part)
                AS BIGINT) AS lift_x10000
    FROM pairs
      JOIN part_orders pa ON pa.l_partkey = part_a
      JOIN part_orders pb ON pb.l_partkey = part_b
      CROSS JOIN n_orders n
    ORDER BY lift_x10000 DESC, part_a, part_b
    LIMIT 50
    """,
)
def q34_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = baskets.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n")
    )
    part_orders = baskets.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_part")
    )
    b1 = baskets.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b2 = baskets.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        b1.join(b2, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= BASKET_MIN_SUPPORT)
    )
    pa = part_orders.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("na")
    )
    pb = part_orders.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("nb")
    )
    return (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n_orders))  # 1-row scalar: hint is legal
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.expr(
                "CAST((2 * CAST(n_both AS DECIMAL(38,0)) * n * 10000"
                " + CAST(na AS DECIMAL(38,0)) * nb)"
                " DIV (2 * CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("lift_x10000"),
        )
        .orderBy(F.desc("lift_x10000"), "part_a", "part_b")
        .limit(50)
    )

"""Correlated-subquery decorrelation pack (round 4): the five classic
TPC-H nested-query shapes (Q2/Q17/Q18/Q20/Q22) adapted to the driver
tables, each hand-decorrelated into the aggregate+join plan a mature
optimizer produces — written out explicitly so the plan is GUARANTEED,
not dependent on the optimizer catching the rewrite.

Why this matters at 100 TB: a correlated scalar subquery executed naively
is one subplan PER OUTER ROW; every query here replaces that with one
bounded aggregate + one equi-join (plus broadcast for 1-row scalars).
The reference does none of this (its SQL is flat, `transform/
entity_matching.py:103-128`); these shapes are table stakes for an
analytics engine.

Each query's oracle states the NESTED form where DuckDB supports it —
proving the decorrelated Spark plan computes the textbook semantics,
not merely mirroring the same rewrite in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from firmable_company_data_pipeline_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str):
    return load_tables(spark, sf_dir, *names)


# ---------------------------------------------------------------------------
# q17 shape — small-quantity revenue: lineitems of one brand's parts with
# l_quantity below 20% of THAT PART's average quantity.  Correlated scalar
# avg → per-part hash-agg joined back on the part key (the agg's shuffle
# key = the join key, so AQE plans one exchange; the brand dim filter is
# broadcast and prunes the fact scan's parts early).
_Q17_BRAND = "Brand#1"


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    brand_parts = t["part"].filter(F.col("p_brand") == _Q17_BRAND).select("p_partkey")
    li = t["lineitem"].join(
        broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = '{_Q17_BRAND}'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey
  )
"""


# ---------------------------------------------------------------------------
# q18 shape — large-volume orders: orders whose line quantities sum past a
# threshold, with their customer.  HAVING-filtered hash-agg first (the
# selective step), THEN the dimension joins — never join-then-filter.
_Q18_MIN_QTY = 250


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


LARGE_ORDERS_SQL = f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       round(o.o_totalprice, 2) AS totalprice, b.total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_MIN_QTY}
) b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# q2 shape — min-cost supplier per part: the correlated "price = (SELECT
# min(price) …)" decorrelated to a per-part min aggregate joined back on
# (part, price); supplier ties collapse deterministically to the lowest
# suppkey.  Unit price derives from lineitem (no partsupp table in the
# driver set).
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier", "part")
    # Quantize with floor(x*100 + 0.5)/100, NOT round(): the unit-price
    # division lands on exact .xx5 halves, where Spark (decimal HALF_UP)
    # and DuckDB (binary-double rounding) disagree by one cent; the
    # floor form is pure IEEE arithmetic and bit-identical everywhere.
    unit = (
        t["lineitem"]
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.floor(F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 100 + 0.5)
                / 100
            ).alias("unit_price")
        )
    )
    cheapest = unit.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    best = (
        unit.join(
            cheapest,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    return (
        best.join(broadcast(t["supplier"]), F.col("best_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_partkey"),
            F.col("p_name"),
            F.col("best_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("min_price"),
        )
    )


MIN_COST_SUPPLIER_SQL = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         floor(min(l_extendedprice / l_quantity) * 100 + 0.5) / 100 AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey, unit_price AS min_price, min(l_suppkey) AS suppkey
  FROM unit u
  WHERE unit_price = (SELECT min(unit_price) FROM unit WHERE l_partkey = u.l_partkey)
  GROUP BY l_partkey, unit_price
)
SELECT p.p_partkey, p.p_name, b.suppkey, s.s_name AS supp_name, b.min_price
FROM best b
JOIN supplier s ON b.suppkey = s.s_suppkey
JOIN part p ON b.l_partkey = p.p_partkey
"""


# ---------------------------------------------------------------------------
# q22 shape — sales opportunity: above-average-balance customers with no
# orders.  The scalar "avg over positive balances" is a broadcast 1-row
# aggregate (never a per-row subquery); the NOT EXISTS is a left-anti join.
def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    avg_bal = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    rich = t["customer"].join(broadcast(avg_bal), how="cross").filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(
        t["orders"].select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


GLOBAL_SALES_OPPORTUNITY_SQL = """
SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q20 shape — excess suppliers: suppliers who shipped more than a threshold
# quantity of some part of one brand.  The doubly-nested EXISTS (supplier →
# part list → quantity subquery) flattens to: broadcast brand-part dim →
# per-(supp, part) hash-agg → HAVING filter → semi-join to supplier.
_Q20_BRAND = "Brand#1"
_Q20_MIN_QTY = 60


def excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier", "part")
    brand_parts = t["part"].filter(F.col("p_brand") == _Q20_BRAND).select("p_partkey")
    flagged = (
        t["lineitem"]
        .join(broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > _Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    return t["supplier"].join(
        flagged, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))


EXCESS_SUPPLIERS_SQL = f"""
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey
    AND EXISTS (SELECT 1 FROM part p
                WHERE p.p_partkey = l.l_partkey AND p.p_brand = '{_Q20_BRAND}')
  GROUP BY l.l_partkey HAVING sum(l.l_quantity) > {_Q20_MIN_QTY}
)
"""


QUERIES = {
    "small_quantity_revenue": small_quantity_revenue,
    "large_orders": large_orders,
    "min_cost_supplier": min_cost_supplier,
    "global_sales_opportunity": global_sales_opportunity,
    "excess_suppliers": excess_suppliers,
}

ORACLES = {
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "large_orders": LARGE_ORDERS_SQL,
    "min_cost_supplier": MIN_COST_SUPPLIER_SQL,
    "global_sales_opportunity": GLOBAL_SALES_OPPORTUNITY_SQL,
    "excess_suppliers": EXCESS_SUPPLIERS_SQL,
}

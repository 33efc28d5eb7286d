"""Core relational queries (SURVEY.md §2.2-2.7): projections, predicates,
equi/semi/anti joins, grouped aggregates, distinct, windows, sort/limit/
offset, unions.

These exercise the Spark primitives the reference's operators map onto
(J1-J3, A1-A7, O1-O3, U1, P1-P8) over the driver's TPC-H-ish tables.
Scale notes inline: every join states its expected physical strategy.

Cross-engine rounding note: the revenue aggregates here use plain
``round(sum(double), 2)`` — the residual boundary class documented in
ARCHITECTURE.md §8.  Every one of them is driver-green AND green at 10×
the driver SF on the current plan, so they stay as-is under the
evidence-ledger policy; if one ever lands on an exact .xx5 boundary at
a new SF, migrate it to ``functions/money.py`` (``dec2``/``dec_sum`` or
``half_up``) exactly as the warehouse revenue family was in round 7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from firmable_company_data_pipeline_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str):
    return load_tables(spark, sf_dir, *names)


# ---------------------------------------------------------------------------
# pricing_summary — flagship (TPC-H Q1 shape). Single scan + partial agg:
# at 100 TB this is one shuffle of 6 groups; map-side combine does the work.
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                            AS sum_qty,
       round(sum(l_extendedprice), 2)                                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                    AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)      AS sum_charge,
       round(avg(l_quantity), 2)                                            AS avg_qty,
       round(avg(l_extendedprice), 2)                                       AS avg_price,
       round(avg(l_discount), 4)                                            AS avg_disc,
       count(*)                                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# top_revenue_orders — Q3 shape: filtered dim join + agg + deterministic topN.
# customer is tiny relative to lineitem → broadcast; lineitem⋈orders shuffles
# on orderkey (co-partitioned at scale via bucketing on l_orderkey).
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("o_orderdate") < F.lit("2000-01-01"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


TOP_REVENUE_ORDERS_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '2000-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# nation_revenue — Q5 shape: star join through region/nation/supplier.
# All dims broadcast (region 5 rows, nation 25, supplier ~SF*10k) —
# lineitem never shuffles for the dim joins; one final 2-key agg shuffle.
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "region", "nation", "supplier", "lineitem")
    return (
        t["lineitem"]
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


NATION_REVENUE_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# order_priority_semi — Q4 shape: EXISTS → left-semi join (J2 analog,
# reference transform/entity_matching.py:100-103 subquery-IN pushdown).
def order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    late_items = t["lineitem"].filter(F.col("l_shipdate") > F.lit("2000-06-01"))
    return (
        t["orders"]
        .join(late_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_SEMI_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2000-06-01')
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# customers_without_orders — anti-join residual (J3/P7 analog, reference
# transform/entity_matching.py:172-174 cascade residual computation).
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# distinct_order_dims — DISTINCT projection (A3/A4, reference
# transform/entity_matching.py:100-103,117).
def distinct_order_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    return t["orders"].select("o_orderstatus", "o_orderpriority").distinct()


DISTINCT_ORDER_DIMS_SQL = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


# ---------------------------------------------------------------------------
# top1_order_per_customer — per-group arg-max (A6/O3, reference
# transform/entity_matching.py:151-156 extractOne): window row_number()==1,
# deterministic tie-break. One shuffle on the partition key.
def top1_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("best_orderkey"),
            F.round(F.col("o_totalprice"), 2).alias("best_totalprice"),
        )
    )


TOP1_ORDER_PER_CUSTOMER_SQL = """
SELECT o_custkey AS custkey, o_orderkey AS best_orderkey,
       round(o_totalprice, 2) AS best_totalprice
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# running_order_total — window frame (rows unbounded preceding → current).
def running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_custkey").alias("custkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
    )


RUNNING_ORDER_TOTAL_SQL = """
SELECT o_orderkey AS orderkey, o_custkey AS custkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS cum_spend
FROM orders
"""


# ---------------------------------------------------------------------------
# events_lag_delta — lag/lead over event streams (batch view).
def events_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        t["events"]
        .withColumn("prev_value", F.lag("value").over(w))
        .select(
            F.col("event_id"),
            F.col("user_id"),
            F.round(F.col("value") - F.col("prev_value"), 2).alias("value_delta"),
        )
    )


EVENTS_LAG_DELTA_SQL = """
SELECT event_id, user_id,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), 2)
           AS value_delta
FROM events
"""


# ---------------------------------------------------------------------------
# union_missing_columns — U1: unionByName(allowMissingColumns=True), the
# cascade-union with null-padding (transform/entity_matching.py:57-66,297).
def union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    high = (
        t["orders"]
        .filter(F.col("o_totalprice") > 400000)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            F.lit("high_value").alias("src"),
        )
    )
    urgent = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderpriority").alias("priority"),
            F.lit("urgent").alias("src"),
        )
    )
    return high.unionByName(urgent, allowMissingColumns=True)


UNION_MISSING_COLUMNS_SQL = """
SELECT o_orderkey AS orderkey, round(o_totalprice, 2) AS totalprice,
       'high_value' AS src, CAST(NULL AS VARCHAR) AS priority
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey AS orderkey, CAST(NULL AS DOUBLE) AS totalprice,
       'urgent' AS src, o_orderpriority AS priority
FROM orders WHERE o_orderpriority = '1-URGENT'
"""


# ---------------------------------------------------------------------------
# orders_page — O1: ORDER BY + OFFSET + FETCH (reference
# transform/entity_matching.py:95-110 pagination; obsolete at scale but part
# of the API surface). Deterministic total order.
def orders_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(100)
        .limit(50)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
        )
    )


ORDERS_PAGE_SQL = """
SELECT o_orderkey AS orderkey, round(o_totalprice, 2) AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
OFFSET 100 LIMIT 50
"""


# ---------------------------------------------------------------------------
# priority_price_stats — grouped numeric aggregates (count/sum/avg/min/max —
# absent from the reference, SURVEY §2.4 note; Spark built-ins).
def priority_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


PRIORITY_PRICE_STATS_SQL = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       round(avg(o_totalprice), 2) AS avg_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# events_json_k — JSONB analog (reference structured_data JSONB column,
# db/ddl_scripts.sql:36): get_json_object over events.props.
def events_json_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "events")
    return (
        t["events"]
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


EVENTS_JSON_K_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# priority_status_rollup — grouping-sets aggregation (rollup): per
# (priority, status), per priority subtotals, and the grand total in one
# pass.  Catalyst expands the rollup into an Expand + single hash
# aggregate — one shuffle for all three grouping levels (the reason to
# prefer rollup over unioned groupBys at scale).  Sums stay in DECIMAL
# until the final round/cast so both engines agree bit-for-bit.
def priority_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice").cast("double"), 2).alias("total_revenue"),
        )
    )


PRIORITY_STATUS_ROLLUP_SQL = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# nation_trade_volume — Q7 shape: revenue between two nation pairs by year.
# Two independent dim chains hang off the same fact row (supplier-nation via
# lineitem, customer-nation via orders); all dims broadcast, so the only
# data-sized shuffle is lineitem⋈orders on orderkey, then a tiny 3-key agg.
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8") | (
        F.col("supp_nation") == "NATION_8"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


NATION_TRADE_VOLUME_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate)::INT AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
GROUP BY n1.n_name, n2.n_name, 3
"""


# ---------------------------------------------------------------------------
# market_share — Q8 shape: one nation's share of regional revenue per year,
# via conditional aggregation (sum(CASE)/sum) — no second pass or self-join
# for the denominator.
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem", "supplier", "nation", "region")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_8", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


MARKET_SHARE_SQL = """
SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year,
       round(sum(CASE WHEN n_name = 'NATION_8'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# top_supplier_revenue — Q15 shape: supplier(s) with max total revenue.
# The reference SQL uses a scalar subquery over a view; Spark-first this is
# agg → rank() over the 1-group window... which would single-partition the
# whole agg output. Instead: agg, then a broadcast 1-row max joined back —
# keeps every stage partition-parallel (the Q15 HAVING max decorrelated by
# hand).
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("total_revenue"),
        )
    )


TOP_SUPPLIER_REVENUE_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name AS supp_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# waiting_suppliers — TPC-H Q21 shape (suppliers who kept orders waiting),
# adapted to this schema: "late" = shipped more than 60 days after the
# order date.  The classic formulation is EXISTS + NOT-EXISTS correlated
# self-joins on lineitem; the Spark-first decorrelation is two hash
# aggregations — per-(order, supplier) lateness, then a per-order rollup
# that keeps multi-supplier orders whose ONLY late supplier is this one
# — followed by a supplier-grain count and a broadcast dim join.  No
# self-join of the fact table at any point: at 100 TB that's two
# shuffles of lineitem-derived rows instead of three fact⋈fact joins.
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")
    per_supp = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    ranked = waiting.join(
        broadcast(t["supplier"]), F.col("late_supp") == F.col("s_suppkey")
    ).select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supp_name"),
        "numwait",
        F.row_number()
        .over(Window.orderBy(F.desc("numwait"), F.asc("s_suppkey")))
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= 10)


WAITING_SUPPLIERS_SQL = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey, l_suppkey
),
per_order AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
         max(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM per_supp GROUP BY l_orderkey
),
waiting AS (
  SELECT late_supp, count(*)::BIGINT AS numwait
  FROM per_order WHERE n_supp > 1 AND n_late = 1
  GROUP BY late_supp
)
SELECT suppkey, supp_name, numwait, rank FROM (
  SELECT s_suppkey AS suppkey, s_name AS supp_name, numwait,
         row_number() OVER (ORDER BY numwait DESC, s_suppkey) AS rank
  FROM waiting JOIN supplier ON late_supp = s_suppkey
) WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# customer_order_histogram — TPC-H Q13 shape: distribution of customers by
# order count, INCLUDING zero-order customers (the left join the naive
# GROUP BY silently drops).  Two hash-aggs: per-customer count, then the
# count-of-counts — the second operates on |customers| rows, the third on
# |distinct counts|.  No Expand, no self-join.
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select("c_count", "custdist")
    )


CUSTOMER_ORDER_HISTOGRAM_SQL = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# lineitem_correlations — one-pass Pearson correlations between the
# numeric measures (price/quantity/discount/tax): profiling's "which
# columns move together".  All six pairs ride ONE global aggregate (the
# same single-scan shape as dq_report's row-local rules) — at 100 TB
# this costs a count(*).
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    wide = li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"{a}__{b}")
            for a, b in pairs
        ]
    )
    stack = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in pairs)
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack}) as (col_a, col_b, pearson_r)"
    )


LINEITEM_CORRELATIONS_SQL = (
    "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"round(corr({a}, {b}), 4) AS pearson_r FROM lineitem"
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    )
)


# ---------------------------------------------------------------------------
# part_affinity — market-basket analysis: part pairs that co-occur in
# orders more than their popularity predicts (lift = P(ab)/(P(a)·P(b))).
# The self-join is WITHIN the order key, so pair work is Σ per-order
# |items|² (bounded by basket size, ~7 here), never |parts|² — the
# standard scale shape for co-occurrence mining.  Singles counts are a
# hash-agg; total order count is a broadcast 1-row aggregate.
_AFFINITY_TOP_N = 20


def part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem")
    items = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    singles = items.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = broadcast(
        items.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    )
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_together"))
    )
    joined = (
        pairs.join(
            singles.select(F.col("part").alias("part_a"), F.col("n_orders").alias("n_a")),
            "part_a",
        )
        .join(
            singles.select(F.col("part").alias("part_b"), F.col("n_orders").alias("n_b")),
            "part_b",
        )
        .join(total, how="cross")
        .select(
            "part_a",
            "part_b",
            "n_together",
            F.round(
                F.col("n_together") * F.col("n_baskets") / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )
    ranked = joined.select(
        "part_a",
        "part_b",
        "n_together",
        "lift",
        F.row_number()
        .over(
            Window.orderBy(
                F.desc("n_together"), F.desc("lift"), F.asc("part_a"), F.asc("part_b")
            )
        )
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= _AFFINITY_TOP_N)


PART_AFFINITY_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
singles AS (
  SELECT l_partkey AS part, count(*)::BIGINT AS n_orders
  FROM items GROUP BY l_partkey
),
total AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n_baskets FROM items),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*)::BIGINT AS n_together
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
scored AS (
  SELECT part_a, part_b, n_together,
         round(n_together * n_baskets / (sa.n_orders * sb.n_orders)::DOUBLE, 4)
           AS lift
  FROM pairs
  JOIN singles sa ON part_a = sa.part
  JOIN singles sb ON part_b = sb.part
  CROSS JOIN total
)
SELECT part_a, part_b, n_together, lift, rank FROM (
  SELECT part_a, part_b, n_together, lift,
         row_number() OVER (ORDER BY n_together DESC, lift DESC,
                            part_a, part_b) AS rank
  FROM scored
) WHERE rank <= {_AFFINITY_TOP_N}
"""


# ---------------------------------------------------------------------------
# customer_360 — the denormalized serving mart: one wide row per customer
# composing order aggregates, event aggregates, and the nation dim.  The
# canonical ETL "gold layer" build: each fact aggregates AT ITS OWN GRAIN
# first (orders → per-customer, events → per-user), then joins land on
# customer-key-sized tables — never a fact⋈fact join; the nation dim
# broadcasts.  LEFT joins keep customers with no orders/events (zeros).
def customer_360(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "events", "nation")
    ord_agg = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
        )
    )
    ev_agg = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
        )
    )
    return (
        t["customer"]
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(ord_agg, F.col("c_custkey") == F.col("o_custkey"), "left")
        .join(ev_agg, F.col("c_custkey") == F.col("user_id"), "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "c_mktsegment",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            "last_order_date",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
        )
    )


CUSTOMER_360_SQL = """
WITH ord_agg AS (
  SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_spend,
         max(CAST(o_orderdate AS DATE)) AS last_order_date
  FROM orders GROUP BY o_custkey
),
ev_agg AS (
  SELECT user_id, count(*) AS n_events,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS n_purchases
  FROM events GROUP BY user_id
)
SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_mktsegment,
       round(c.c_acctbal, 2) AS acctbal,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.total_spend, 0.0) AS total_spend,
       o.last_order_date,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.n_purchases, 0) AS n_purchases
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN ord_agg o ON c.c_custkey = o.o_custkey
LEFT JOIN ev_agg e ON c.c_custkey = e.user_id
"""


# ---------------------------------------------------------------------------
# promo_revenue_share — TPC-H Q14 shape: conditional-aggregate share of
# revenue from one part type inside a date window.  Part dim broadcasts;
# the share is a single conditional agg (never two scans or a self-join);
# DECIMAL-exact sums so the ratio is engine-stable.
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01").cast("timestamp"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    j = li.join(broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.round(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)")))
                / F.sum(rev)
                * 100
            ).cast("double"),
            4,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


PROMO_REVENUE_SHARE_SQL = """
SELECT round(CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                           ELSE 0 END)
                / sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) * 100
              AS DOUBLE), 4) AS promo_share_pct,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-03-01'
"""


# ---------------------------------------------------------------------------
# disjunctive_predicate_revenue — TPC-H Q19 shape: a disjunction of
# (brand, size-range, quantity-range) conjunct groups.  The dim side
# broadcasts; the OR-of-ANDs evaluates post-join inside codegen — the
# common-conjunct parts (quantity floor, size floor) still push to the
# scans.  The shape optimizers historically fumbled into cross products;
# the plan test pins no nested-loop.
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    j = t["lineitem"].join(broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    q, sz, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#1") & sz.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(10, 30) & q.between(10, 40))
        | ((b == "Brand#3") & sz.between(20, 50) & q.between(20, 60))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return j.filter(cond).agg(
        F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


DISJUNCTIVE_PREDICATE_REVENUE_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 60)
"""


# ---------------------------------------------------------------------------
# orders_page_keyset — keyset (seek) pagination: the scale-correct twin of
# `orders_page`'s OFFSET/FETCH.  OFFSET must compute and discard every
# earlier row (O(page_number) per page); the keyset form pushes
# `o_orderkey > cursor` INTO the parquet scan and takes the next page
# with TakeOrdered — O(page) regardless of depth.
_KEYSET_CURSOR = 30_000
_KEYSET_PAGE = 50


def orders_page_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") > _KEYSET_CURSOR)
        .orderBy("o_orderkey")
        .limit(_KEYSET_PAGE)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
    )


ORDERS_PAGE_KEYSET_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice, 2) AS totalprice,
       CAST(o_orderdate AS DATE) AS orderdate
FROM orders
WHERE o_orderkey > {_KEYSET_CURSOR}
ORDER BY o_orderkey
LIMIT {_KEYSET_PAGE}
"""


# ---------------------------------------------------------------------------
# order_percentile_ranks — relative-rank window functions (percent_rank /
# cume_dist, the §2.5 members no other query exercised): each order's
# price position within its priority class.  One window exchange on the
# priority key; ties break identically in both engines because the rank
# functions are value-deterministic (no row_number in the output).
# Scale note: the partition key has only 5 distinct values, so at 100×
# each priority class lands on a single reducer — that bound is inherent
# to percent_rank/cume_dist semantics over coarse classes (every row of
# a class must see the class's total ordering), not a plan defect; for
# finer keys the same window scales with key cardinality.
def order_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


ORDER_PERCENTILE_RANKS_SQL = """
SELECT o_orderkey, o_orderpriority,
       round(o_totalprice, 2) AS totalprice,
       round(percent_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice), 6) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice), 6) AS cume
FROM orders
"""


# ---------------------------------------------------------------------------
# unshipped_order_revenue — TPC-H Q3 shape: revenue of orders placed
# before a cutoff whose items ship after it, for one market segment.
# All three predicates push into their scans (plan-checked pattern);
# the segment-filtered customer side broadcasts; the top-10 is a
# global-window row_number + rank<=10 filter, which Spark 4 compiles to
# WindowGroupLimit — the limit is pushed below the final exchange, so
# each partition forwards at most 10 rows (TakeOrdered economics without
# leaving the declarative plan).
_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1996-06-01"


def unshipped_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cut = F.lit(_Q3_DATE).cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == _Q3_SEGMENT).select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > cut).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)").alias("rev"),
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum("rev").cast("double"), 2).alias("revenue")
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
            "revenue",
            "rank",
        )
    )


UNSHIPPED_ORDER_REVENUE_SQL = f"""
WITH agg AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
               AS DOUBLE), 2) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
    AND EXISTS (SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = '{_Q3_SEGMENT}')
  GROUP BY 1, 2, 3
)
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
       revenue, rank
FROM (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rank
  FROM agg
) WHERE rank <= 10
"""


QUERIES = {
    "pricing_summary": pricing_summary,
    "top_revenue_orders": top_revenue_orders,
    "nation_revenue": nation_revenue,
    "order_priority_semi": order_priority_semi,
    "customers_without_orders": customers_without_orders,
    "distinct_order_dims": distinct_order_dims,
    "top1_order_per_customer": top1_order_per_customer,
    "running_order_total": running_order_total,
    "events_lag_delta": events_lag_delta,
    "union_missing_columns": union_missing_columns,
    "orders_page": orders_page,
    "priority_price_stats": priority_price_stats,
    "events_json_k": events_json_k,
    "priority_status_rollup": priority_status_rollup,
    "nation_trade_volume": nation_trade_volume,
    "market_share": market_share,
    "top_supplier_revenue": top_supplier_revenue,
    "waiting_suppliers": waiting_suppliers,
    "customer_order_histogram": customer_order_histogram,
    "lineitem_correlations": lineitem_correlations,
    "part_affinity": part_affinity,
    "customer_360": customer_360,
    "promo_revenue_share": promo_revenue_share,
    "disjunctive_predicate_revenue": disjunctive_predicate_revenue,
    "orders_page_keyset": orders_page_keyset,
    "order_percentile_ranks": order_percentile_ranks,
    "unshipped_order_revenue": unshipped_order_revenue,
}

ORACLES = {
    "customer_360": CUSTOMER_360_SQL,
    "promo_revenue_share": PROMO_REVENUE_SHARE_SQL,
    "disjunctive_predicate_revenue": DISJUNCTIVE_PREDICATE_REVENUE_SQL,
    "orders_page_keyset": ORDERS_PAGE_KEYSET_SQL,
    "order_percentile_ranks": ORDER_PERCENTILE_RANKS_SQL,
    "unshipped_order_revenue": UNSHIPPED_ORDER_REVENUE_SQL,
    "nation_trade_volume": NATION_TRADE_VOLUME_SQL,
    "market_share": MARKET_SHARE_SQL,
    "top_supplier_revenue": TOP_SUPPLIER_REVENUE_SQL,
    "pricing_summary": PRICING_SUMMARY_SQL,
    "top_revenue_orders": TOP_REVENUE_ORDERS_SQL,
    "nation_revenue": NATION_REVENUE_SQL,
    "order_priority_semi": ORDER_PRIORITY_SEMI_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "distinct_order_dims": DISTINCT_ORDER_DIMS_SQL,
    "top1_order_per_customer": TOP1_ORDER_PER_CUSTOMER_SQL,
    "running_order_total": RUNNING_ORDER_TOTAL_SQL,
    "events_lag_delta": EVENTS_LAG_DELTA_SQL,
    "union_missing_columns": UNION_MISSING_COLUMNS_SQL,
    "orders_page": ORDERS_PAGE_SQL,
    "priority_price_stats": PRIORITY_PRICE_STATS_SQL,
    "events_json_k": EVENTS_JSON_K_SQL,
    "priority_status_rollup": PRIORITY_STATUS_ROLLUP_SQL,
    "waiting_suppliers": WAITING_SUPPLIERS_SQL,
    "customer_order_histogram": CUSTOMER_ORDER_HISTOGRAM_SQL,
    "lineitem_correlations": LINEITEM_CORRELATIONS_SQL,
    "part_affinity": PART_AFFINITY_SQL,
}

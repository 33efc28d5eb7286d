"""Warehouse-maintenance queries: data-quality report and dimension
merge/upsert (SCD1) — the operations the reference defers to a dbt layer
(``README.md:227-237`` quality tests, ``README.md:137-165`` incremental
loads) implemented as first-class engine operators.

Both are DuckDB-oracle-checked.  The dq rules are chosen so some counts
are zero and some are non-zero (a report of all zeros wouldn't prove the
counting logic); the merge fixture exercises all four actions
(insert / update / unchanged / keep).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.operators.merge import merge_upsert
from firmable_company_data_pipeline_spark.operators.quality import dq_report
from firmable_company_data_pipeline_spark.session import load_tables


# ---------------------------------------------------------------------------
# dq_summary — dbt-style not_null / accepted_values / expression / unique
# rules over orders.  Row-local families each run as ONE scan of orders
# (conditional sums, map-side combined); the unique rule is one shuffle.
def dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return dq_report(
        orders,
        not_null=["o_custkey", "o_orderdate"],
        accepted_values={
            "o_orderstatus": ["O", "F", "P"],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
        },
        expressions={
            "positive_price": F.col("o_totalprice") > 0,
            "price_cap_400k": F.col("o_totalprice") <= 400000,
        },
        unique=[["o_orderkey"], ["o_custkey", "o_orderdate"]],
    )


DQ_SUMMARY_SQL = """
SELECT 'not_null' AS rule, 'o_custkey' AS col_name,
       count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations FROM orders
UNION ALL
SELECT 'not_null', 'o_orderdate',
       count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
UNION ALL
SELECT 'accepted_values', 'o_orderstatus',
       count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
UNION ALL
SELECT 'accepted_values', 'o_orderpriority',
       count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                          AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM'))
FROM orders
UNION ALL
SELECT 'expression', 'positive_price',
       count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, false)) FROM orders
UNION ALL
SELECT 'expression', 'price_cap_400k',
       count(*) FILTER (WHERE NOT coalesce(o_totalprice <= 400000, false)) FROM orders
UNION ALL
SELECT 'unique', 'o_orderkey', count(*)
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'unique', 'o_custkey,o_orderdate', count(*)
FROM (SELECT o_custkey, o_orderdate FROM orders
      GROUP BY o_custkey, o_orderdate HAVING count(*) > 1)
"""


# ---------------------------------------------------------------------------
# dim_merge_upsert — SCD1 keyed merge of a customer-dimension snapshot with
# a synthesized delta: every 7th customer changes segment (update), every
# 13th arrives with identical attributes (unchanged), and a shifted key
# range is brand new (insert); everything else is untouched (keep).
def dim_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    current = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    k = F.col("c_custkey")
    changed = cust.filter(k % 7 == 0).select(
        k.alias("custkey"),
        F.col("c_name").alias("name"),
        F.lit("RELOCATED").alias("mktsegment"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    same = cust.filter(k % 13 == 0).select(
        k.alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    new = cust.filter(k % 11 == 0).select(
        (k + 9_000_000).alias("custkey"),
        F.concat(F.lit("New "), F.col("c_name")).alias("name"),
        F.lit("STARTUP").alias("mktsegment"),
        F.lit(0.0).alias("acctbal"),
    )
    # %7 ∩ %13 overlap: keep the changed version (updates must be unique
    # per key for a deterministic merge) — drop the 'same' rows for keys
    # also present in 'changed'.
    updates = changed.unionByName(
        same.join(changed.select("custkey"), "custkey", "left_anti")
    ).unionByName(new)
    return merge_upsert(
        current, updates, keys=["custkey"], with_action=True
    )


DIM_MERGE_UPSERT_SQL = """
WITH current AS (
  SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS mktsegment,
         round(c_acctbal, 2) AS acctbal
  FROM customer
), changed AS (
  SELECT c_custkey AS custkey, c_name AS name, 'RELOCATED' AS mktsegment,
         round(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_custkey % 7 = 0
), same AS (
  SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS mktsegment,
         round(c_acctbal, 2) AS acctbal
  FROM customer WHERE c_custkey % 13 = 0
    AND NOT EXISTS (SELECT 1 FROM changed ch WHERE ch.custkey = c_custkey)
), new AS (
  SELECT c_custkey + 9000000 AS custkey, 'New ' || c_name AS name,
         'STARTUP' AS mktsegment, 0.0 AS acctbal
  FROM customer WHERE c_custkey % 11 = 0
), updates AS (
  SELECT * FROM changed UNION ALL SELECT * FROM same UNION ALL SELECT * FROM new
)
SELECT coalesce(u.custkey, c.custkey) AS custkey,
       CASE WHEN u.custkey IS NOT NULL THEN u.name ELSE c.name END AS name,
       CASE WHEN u.custkey IS NOT NULL THEN u.mktsegment ELSE c.mktsegment END
           AS mktsegment,
       CASE WHEN u.custkey IS NOT NULL THEN u.acctbal ELSE c.acctbal END AS acctbal,
       CASE WHEN c.custkey IS NULL THEN 'insert'
            WHEN u.custkey IS NULL THEN 'keep'
            WHEN u.name IS DISTINCT FROM c.name
              OR u.mktsegment IS DISTINCT FROM c.mktsegment
              OR u.acctbal IS DISTINCT FROM c.acctbal THEN 'update'
            ELSE 'unchanged' END AS merge_action
FROM current c FULL OUTER JOIN updates u ON c.custkey = u.custkey
"""


# ---------------------------------------------------------------------------
# column_profile_orders — per-column profiling of orders in ONE aggregate
# pass (multiple exact count-distincts compile to a single shuffle via
# Catalyst's Expand; approx=True switches to HLL sketches at scale).
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.profile import column_profile

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    prof = column_profile(orders)  # exact mode: oracle-reproducible
    return prof.select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        F.round("min_val", 2).alias("min_val"),
        F.round("max_val", 2).alias("max_val"),
        F.round("avg_val", 2).alias("avg_val"),
    )


_PROF_NUM = """
SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) FILTER (WHERE {c} IS NULL) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       round(CAST(min({c}) AS DOUBLE), 2) AS min_val,
       round(CAST(max({c}) AS DOUBLE), 2) AS max_val,
       round(CAST(avg({c}) AS DOUBLE), 2) AS avg_val
FROM orders
"""
_PROF_STR = """
SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) FILTER (WHERE {c} IS NULL) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_val, CAST(NULL AS DOUBLE) AS max_val,
       CAST(NULL AS DOUBLE) AS avg_val
FROM orders
"""

COLUMN_PROFILE_ORDERS_SQL = "\nUNION ALL\n".join(
    _PROF_NUM.format(c=c) if num else _PROF_STR.format(c=c)
    for c, num in [
        ("o_orderkey", True),
        ("o_custkey", True),
        ("o_orderstatus", False),
        ("o_totalprice", True),
        ("o_orderdate", False),
        ("o_orderpriority", False),
    ]
)


# ---------------------------------------------------------------------------
# events_rollup_incremental — continuous-aggregate refresh: the stored
# (day, event_type) rollup of history merged with a freshly-aggregated
# delta partition via operators/merge.rollup_merge, WITHOUT rescanning
# history.  Double sums ride DECIMAL(18,6) so partial-aggregate addition
# is exact and associative (merge(base, delta) ≡ full recompute bit-for-
# bit); the oracle IS the full single-pass recompute — the check proves
# the incremental path equals the from-scratch answer.
_ROLLUP_CUTOFF = "2024-01-16"


def events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.merge import rollup_merge

    ev = load_tables(spark, sf_dir, "events")["events"].select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        "ts",
    )

    def roll(df: DataFrame) -> DataFrame:
        return df.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("sum_v"),
            F.max("v").alias("max_v"),
        )

    base = roll(ev.filter(F.col("ts") < F.lit(_ROLLUP_CUTOFF).cast("timestamp")))
    delta = roll(ev.filter(F.col("ts") >= F.lit(_ROLLUP_CUTOFF).cast("timestamp")))
    merged = rollup_merge(
        base,
        delta,
        keys=["day", "event_type"],
        metrics={"n_events": "sum", "sum_v": "sum", "max_v": "max"},
    )
    return merged.select(
        "day",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("sum_v").cast("double"), 2).alias("sum_value"),
        F.round(F.col("max_v").cast("double"), 2).alias("max_value"),
    )


EVENTS_ROLLUP_INCREMENTAL_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value,
       round(CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS max_value
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "dq_summary": dq_summary,
    "events_rollup_incremental": events_rollup_incremental,
    "dim_merge_upsert": dim_merge_upsert,
    "column_profile_orders": column_profile_orders,
}

ORACLES = {
    "dq_summary": DQ_SUMMARY_SQL,
    "events_rollup_incremental": EVENTS_ROLLUP_INCREMENTAL_SQL,
    "dim_merge_upsert": DIM_MERGE_UPSERT_SQL,
    "column_profile_orders": COLUMN_PROFILE_ORDERS_SQL,
}

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
    # synthetic brand-new keys live in the NEGATIVE range: c_custkey
    # >= 1 at every SF, so -k can never collide with a real key (a
    # fixed +9M offset collides once custkeys reach 9M, sf >= ~60 —
    # advice r7)
    new = cust.filter(k % 11 == 0).select(
        (-k).alias("custkey"),
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
  SELECT -c_custkey AS custkey, 'New ' || c_name AS name,
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


# ---------------------------------------------------------------------------
# scd2_customer_history — SCD TYPE-2 merge through operators/merge.scd2_apply
# (previously pytest-only; this query puts the operator under the oracle
# gate).  Dimension = every customer's segment as an open v1 row, plus a
# pre-existing CLOSED 'LEGACY' row for every 5th customer (closed history
# must pass through untouched).  Update batch as of 1996-06-01: every 7th
# customer changes segment (close + open), every 13th arrives unchanged
# (single open row survives), a shifted key range is brand new (open row
# only).  One full-outer join on the key + a four-way union; the closed
# partition is never joined — the 100-TB shape is "rewrite only the
# current partition".
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.merge import scd2_apply

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    v1 = cust.select(
        k.alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    legacy = cust.filter(k % 5 == 0).select(
        k.alias("custkey"),
        F.lit("LEGACY").alias("mktsegment"),
        F.to_date(F.lit("1990-01-01")).alias("valid_from"),
        F.to_date(F.lit("1992-01-01")).alias("valid_to"),
    )
    changed = cust.filter(k % 7 == 0).select(
        k.alias("custkey"),
        F.lit("RELOCATED").alias("mktsegment"),
        F.to_date(F.lit("1996-06-01")).alias("as_of"),
    )
    same = cust.filter((k % 13 == 0) & (k % 7 != 0)).select(
        k.alias("custkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.to_date(F.lit("1996-06-01")).alias("as_of"),
    )
    # negative synthetic key range: collision-free at every SF (advice r7)
    new = cust.filter(k % 11 == 0).select(
        (-k).alias("custkey"),
        F.lit("STARTUP").alias("mktsegment"),
        F.to_date(F.lit("1996-06-01")).alias("as_of"),
    )
    updates = changed.unionByName(same).unionByName(new)
    return scd2_apply(v1.unionByName(legacy), updates, keys=["custkey"])


SCD2_CUSTOMER_HISTORY_SQL = """
WITH v1 AS (
  SELECT c_custkey AS custkey, c_mktsegment AS mktsegment,
         DATE '1992-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
), legacy AS (
  SELECT c_custkey AS custkey, 'LEGACY' AS mktsegment,
         DATE '1990-01-01' AS valid_from, DATE '1992-01-01' AS valid_to
  FROM customer WHERE c_custkey % 5 = 0
), upd AS (
  SELECT c_custkey AS custkey, 'RELOCATED' AS mktsegment,
         DATE '1996-06-01' AS as_of
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, DATE '1996-06-01'
  FROM customer WHERE c_custkey % 13 = 0 AND c_custkey % 7 <> 0
  UNION ALL
  SELECT -c_custkey, 'STARTUP', DATE '1996-06-01'
  FROM customer WHERE c_custkey % 11 = 0
), j AS (
  SELECT coalesce(c.custkey, u.custkey) AS custkey,
         c.mktsegment AS cur_seg, c.valid_from AS cur_from,
         u.mktsegment AS upd_seg, u.as_of,
         c.custkey IS NOT NULL AS has_cur, u.custkey IS NOT NULL AS has_upd,
         u.mktsegment IS DISTINCT FROM c.mktsegment AS changed
  FROM v1 c FULL OUTER JOIN upd u ON c.custkey = u.custkey
)
SELECT custkey, mktsegment, valid_from, valid_to FROM legacy
UNION ALL
SELECT custkey, cur_seg, cur_from, CAST(NULL AS DATE)
FROM j WHERE has_cur AND (NOT has_upd OR NOT changed)
UNION ALL
SELECT custkey, cur_seg, cur_from, as_of
FROM j WHERE has_cur AND has_upd AND changed
UNION ALL
SELECT custkey, upd_seg, as_of, CAST(NULL AS DATE)
FROM j WHERE has_upd AND (NOT has_cur OR changed)
"""


# ---------------------------------------------------------------------------
# scd2_order_priority_history — the INITIAL-LOAD twin of the SCD2 merge:
# operators/merge.scd2_rebuild compacts a change feed into full validity
# history.  Feed = one observation per (customer, order date) — the max
# order priority that day; consecutive identical observations collapse
# into one range, valid_to = next change (NULL = current).  One shuffle
# on custkey + two per-key-bounded window passes over the same exchange.
def scd2_order_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.merge import scd2_rebuild

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    feed = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("obs_date"),
    ).agg(F.max("o_orderpriority").alias("priority"))
    return scd2_rebuild(
        feed, keys=["custkey"], ts_col="obs_date", value_cols=["priority"]
    )


SCD2_ORDER_PRIORITY_HISTORY_SQL = """
WITH feed AS (
  SELECT o_custkey AS custkey, o_orderdate AS obs_date,
         max(o_orderpriority) AS priority
  FROM orders GROUP BY 1, 2
), flagged AS (
  SELECT custkey, obs_date, priority,
         lag(obs_date) OVER w IS NULL AS is_first,
         lag(priority) OVER w IS NOT DISTINCT FROM priority AS same_as_prev
  FROM feed
  WINDOW w AS (PARTITION BY custkey ORDER BY obs_date)
), compacted AS (
  SELECT custkey, obs_date, priority FROM flagged
  WHERE is_first OR NOT same_as_prev
)
SELECT custkey, priority, obs_date AS valid_from,
       lead(obs_date) OVER (PARTITION BY custkey ORDER BY obs_date) AS valid_to
FROM compacted
"""


# ---------------------------------------------------------------------------
# fk_integrity_audit — referential-integrity report across the star schema
# (dbt's `relationships` test as a first-class operator): per FK edge,
# child rows vs orphans (child keys with no parent).  One left join +
# conditional count per edge, unioned; nation-sized parents broadcast,
# fact-sized parents shuffle on the key — the honest 100-TB plan (a
# bloom-filter prefilter is the optimization seam, not a different
# shape).  The TPC-H edges are clean by construction, so a deliberately
# stale parent snapshot (customers with c_custkey % 3 <> 0, i.e. a
# partial dim load) contributes a non-zero orphan count — an all-zero
# report would not prove the counting logic (same fixture principle as
# dq_summary).
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )

    def audit(name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str):
        p = parent.select(F.col(pkey).alias("_pk")).distinct()
        # a NULL child FK is an optional reference, not a violation
        # (dbt's relationships test excludes NULLs) — only a NON-NULL
        # key with no parent counts as an orphan (review r7)
        return (
            child.select(F.col(ckey).alias("_ck"))
            .join(p, F.col("_ck") == F.col("_pk"), "left")
            .agg(
                F.count(F.lit(1)).alias("n_child_rows"),
                F.count(
                    F.when(F.col("_ck").isNotNull() & F.col("_pk").isNull(), 1)
                ).alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk_relation"), "n_child_rows", "n_orphans")
        )

    stale_cust = t["customer"].filter(F.col("c_custkey") % 3 != 0)
    return (
        audit("lineitem.l_orderkey->orders", t["lineitem"], "l_orderkey",
              t["orders"], "o_orderkey")
        .unionByName(audit("orders.o_custkey->customer", t["orders"], "o_custkey",
                           t["customer"], "c_custkey"))
        .unionByName(audit("orders.o_custkey->customer(stale_snapshot)",
                           t["orders"], "o_custkey", stale_cust, "c_custkey"))
        .unionByName(audit("customer.c_nationkey->nation", t["customer"],
                           "c_nationkey", t["nation"], "n_nationkey"))
        .unionByName(audit("supplier.s_nationkey->nation", t["supplier"],
                           "s_nationkey", t["nation"], "n_nationkey"))
    )


FK_INTEGRITY_AUDIT_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS fk_relation,
       count(*) AS n_child_rows,
       count(*) FILTER (WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL)
         AS n_orphans
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders.o_custkey->customer', count(*),
       count(*) FILTER (WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'orders.o_custkey->customer(stale_snapshot)', count(*),
       count(*) FILTER (WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_custkey % 3 <> 0) c
  ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer.c_nationkey->nation', count(*),
       count(*) FILTER (WHERE c.c_nationkey IS NOT NULL AND n.n_nationkey IS NULL)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
UNION ALL
SELECT 'supplier.s_nationkey->nation', count(*),
       count(*) FILTER (WHERE s.s_nationkey IS NOT NULL AND n.n_nationkey IS NULL)
FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


# ---------------------------------------------------------------------------
# scd2_point_in_time — the CONSUMPTION twin of the SCD2 maintenance ops:
# reconstruct the dimension exactly as it stood on a date (training-data
# reproducibility: "rebuild the features as of the snapshot we trained
# on").  One predicate over the audited scd2_rebuild history — zero
# added shuffles; with the streaming open/closed layout a current-date
# snapshot prunes to the open partition via the valid_to IS NULL
# disjunct.
_PIT_DATE = "1996-01-01"


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = scd2_order_priority_history(spark, sf_dir)
    d = F.to_date(F.lit(_PIT_DATE))
    return hist.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    )


SCD2_POINT_IN_TIME_SQL = f"""
SELECT custkey, priority, valid_from, valid_to
FROM ({SCD2_ORDER_PRIORITY_HISTORY_SQL}) h
WHERE valid_from <= DATE '{_PIT_DATE}'
  AND (valid_to IS NULL OR valid_to > DATE '{_PIT_DATE}')
"""


# ---------------------------------------------------------------------------
# corpus_snapshot_diff — dataset-versioning diff at the document grain:
# between two corpus snapshots, which documents were added / removed /
# changed / unchanged?  The primitive behind "what moved between the
# refresh we trained on and today" — reproducibility auditing for a
# training pipeline.  v2 is synthesized deterministically from the same
# table (every 13th doc dropped, every 7th survivor's text edited, a
# negative-id range added — the collision-free synthetic-key convention).
# Plan: both sides reduce to (doc_id, content fingerprint) map-side —
# the rolling char_fold_hash, oracle-mirrored — so the full-outer join
# ships 16 bytes per doc, never text; at 100 TB both snapshots bucket by
# doc_id and the join is co-located.
def _v2_docs(docs: DataFrame) -> DataFrame:
    """The synthesized v2 snapshot shared by the versioning family
    (corpus_snapshot_diff, corpus_drift_psi): every 13th doc dropped,
    every 7th survivor's text edited, a negative-id range added (the
    collision-free synthetic-key convention).  Carries through any
    extra columns beyond (doc_id, text) unchanged."""
    k = F.col("doc_id")
    others = [c for c in docs.columns if c not in ("doc_id", "text")]
    return (
        docs.filter(k % 13 != 0)
        .select(
            "doc_id",
            F.when(k % 7 == 0, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
            *others,
        )
        .unionByName(
            docs.filter(k % 11 == 0).select(
                (-(k + 1)).alias("doc_id"), "text", *others
            )
        )
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.functions.textstats import (
        char_fold_hash,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text"
    )
    v2_docs = _v2_docs(docs)
    # presence flags, not fp nullity: a NULL text folds to a NULL
    # fingerprint, which must read as "same null content", never as a
    # missing row
    v1 = docs.select(
        "doc_id",
        char_fold_hash(F.col("text")).alias("fp_v1"),
        F.lit(True).alias("_v1"),
    )
    v2 = v2_docs.select(
        "doc_id",
        char_fold_hash(F.col("text")).alias("fp_v2"),
        F.lit(True).alias("_v2"),
    )
    status = (
        F.when(F.col("_v1").isNull(), F.lit("added"))
        .when(F.col("_v2").isNull(), F.lit("removed"))
        .when(F.col("fp_v1").eqNullSafe(F.col("fp_v2")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        v1.join(v2, "doc_id", "full_outer")
        .select("doc_id", status.alias("status"))
    )


def _diff_sql() -> str:
    from firmable_company_data_pipeline_spark.queries.llmops import _fold

    return f"""
WITH v1 AS (SELECT doc_id, {_fold("text")} AS fp FROM documents),
v2_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT -(doc_id + 1) AS doc_id, text FROM documents WHERE doc_id % 11 = 0
),
v2 AS (SELECT doc_id, {_fold("text")} AS fp FROM v2_docs)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.fp IS NOT DISTINCT FROM v2.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""


# ---------------------------------------------------------------------------
# corpus_drift_psi — Population Stability Index between two corpus
# snapshots, per source: the standard data-drift monitor a training
# pipeline runs between "the refresh we trained on" and "today" before
# deciding to re-train.  Reuses corpus_snapshot_diff's synthesized v2
# (every 13th doc dropped, every 7th survivor edited, a negative-id
# range added) so the versioning family shares one snapshot fixture.
# Feature: document length in chars, 10 fixed-width buckets (60 chars
# wide, top bucket open); probabilities additively smoothed
# (+0.5 per bucket) so empty buckets never hit ln(0);
# psi = sum_b (p2-p1) * ln(p2/p1), folded sequentially in bucket order
# on both engines (the repo's cross-engine float convention), HALF_UP
# at 6 places.
#
# Shape: two (source, bucket) hash-aggs (map-side combined), a
# full-outer join on the bounded (source x 10) bucket grid, a broadcast
# of the per-source totals, and a 10-element fold per source — nothing
# data-sized past the first aggregation, safe at any corpus size.
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.functions.money import half_up

    docs = load_tables(spark, sf_dir, "documents")["documents"].select(
        "doc_id", "text", "source"
    )
    v2 = _v2_docs(docs)

    def buckets(df: DataFrame, cname: str) -> DataFrame:
        bucket = F.least(
            F.lit(9),
            F.floor(F.coalesce(F.length("text"), F.lit(0)) / F.lit(60)),
        ).cast("long")
        return df.groupBy("source", bucket.alias("bucket")).agg(
            F.count(F.lit(1)).alias(cname)
        )

    # the FULL source x 10 grid, not just observed buckets (review r8
    # second pass): a bucket empty in both snapshots still contributes
    # its smoothing term (0.5/(n2+5) - 0.5/(n1+5))·ln((n1+5)/(n2+5)),
    # nonzero whenever the snapshot sizes differ — dropping it would
    # systematically understate PSI against the documented definition
    grid = (
        docs.select("source")
        .distinct()
        .select("source", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bucket"))
        .select("source", F.col("bucket").cast("long").alias("bucket"))
    )
    g = (
        grid.join(buckets(docs, "c1"), ["source", "bucket"], "left")
        .join(buckets(v2, "c2"), ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    tot = g.groupBy("source").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    p1 = (F.col("c1") + 0.5) / (F.col("n1") + 5.0)
    p2 = (F.col("c2") + 0.5) / (F.col("n2") + 5.0)
    terms = g.join(F.broadcast(tot), "source").select(
        "source", "bucket", ((p2 - p1) * F.log(p2 / p1)).alias("term")
    )
    folded = terms.groupBy("source").agg(
        F.sort_array(
            F.collect_list(F.struct("bucket", "term"))
        ).alias("ts")
    )
    psi = F.aggregate(
        F.col("ts"), F.lit(0.0), lambda acc, s: acc + s["term"]
    )
    return folded.select("source", half_up(psi, 6).alias("psi"))


CORPUS_DRIFT_PSI_SQL = """
WITH v2_docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text,
         source
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT -(doc_id + 1) AS doc_id, text, source
  FROM documents WHERE doc_id % 11 = 0
),
b1 AS (SELECT source, least(9, coalesce(length(text), 0) // 60) AS bucket,
              count(*) AS c FROM documents GROUP BY ALL),
b2 AS (SELECT source, least(9, coalesce(length(text), 0) // 60) AS bucket,
              count(*) AS c FROM v2_docs GROUP BY ALL),
grid AS (
  SELECT source, unnest(range(10)) AS bucket
  FROM (SELECT DISTINCT source FROM documents)
),
g AS (
  SELECT grid.source, grid.bucket,
         coalesce(b1.c, 0) AS c1, coalesce(b2.c, 0) AS c2
  FROM grid
  LEFT JOIN b1 ON b1.source = grid.source AND b1.bucket = grid.bucket
  LEFT JOIN b2 ON b2.source = grid.source AND b2.bucket = grid.bucket
),
tot AS (SELECT source, sum(c1) AS n1, sum(c2) AS n2 FROM g GROUP BY source),
terms AS (
  SELECT g.source, g.bucket,
         ((c2 + 0.5)/(n2 + 5.0) - (c1 + 0.5)/(n1 + 5.0))
         * ln(((c2 + 0.5)/(n2 + 5.0)) / ((c1 + 0.5)/(n1 + 5.0))) AS term
  FROM g JOIN tot USING (source)
)
SELECT source,
       floor(list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY bucket)),
                         (acc, v) -> acc + v) * 1000000.0 + 0.5)
       / 1000000.0 AS psi
FROM terms GROUP BY source
"""


QUERIES = {
    "dq_summary": dq_summary,
    "events_rollup_incremental": events_rollup_incremental,
    "dim_merge_upsert": dim_merge_upsert,
    "scd2_customer_history": scd2_customer_history,
    "scd2_order_priority_history": scd2_order_priority_history,
    "fk_integrity_audit": fk_integrity_audit,
    "column_profile_orders": column_profile_orders,
    "scd2_point_in_time": scd2_point_in_time,
    "corpus_snapshot_diff": corpus_snapshot_diff,
    "corpus_drift_psi": corpus_drift_psi,
}

ORACLES = {
    "dq_summary": DQ_SUMMARY_SQL,
    "events_rollup_incremental": EVENTS_ROLLUP_INCREMENTAL_SQL,
    "dim_merge_upsert": DIM_MERGE_UPSERT_SQL,
    "scd2_customer_history": SCD2_CUSTOMER_HISTORY_SQL,
    "scd2_order_priority_history": SCD2_ORDER_PRIORITY_HISTORY_SQL,
    "fk_integrity_audit": FK_INTEGRITY_AUDIT_SQL,
    "column_profile_orders": COLUMN_PROFILE_ORDERS_SQL,
    "scd2_point_in_time": SCD2_POINT_IN_TIME_SQL,
    "corpus_snapshot_diff": _diff_sql(),
    "corpus_drift_psi": CORPUS_DRIFT_PSI_SQL,
}

"""Behavioral / governance analytics queries, round 4 (charter
extensions): funnel conversion, cohort retention, per-source quality
pruning, k-anonymity audit.

Oracle-parity design as in ``queries/curation.py``: identical aliases
both engines, rates rounded before compare, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.functions import textstats as ts
from firmable_company_data_pipeline_spark.functions.money import half_up
from firmable_company_data_pipeline_spark.operators import behavior as bh
from firmable_company_data_pipeline_spark.operators import curation as cu
from firmable_company_data_pipeline_spark.operators.quality import k_anonymity_report
from firmable_company_data_pipeline_spark.session import load_tables, spread


# --------------------------------------------------------------------------
# funnel_conversion — view → click → purchase first-touch funnel.
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    return bh.funnel_report(events, steps=("view", "click", "purchase"))


FUNNEL_CONVERSION_SQL = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.t
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.t
  GROUP BY e.user_id
),
c AS (
  SELECT (SELECT count(*) FROM s0) AS n0,
         (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2
)
SELECT 'view' AS step, 0 AS step_idx, n0::BIGINT AS n_users,
       NULL::DOUBLE AS conv_from_prev, 1.0 AS conv_from_first FROM c
UNION ALL
SELECT 'click', 1, n1::BIGINT,
       CASE WHEN n0 > 0 THEN round(n1 / n0::DOUBLE, 4) END,
       CASE WHEN n0 > 0 THEN round(n1 / n0::DOUBLE, 4) END FROM c
UNION ALL
SELECT 'purchase', 2, n2::BIGINT,
       CASE WHEN n1 > 0 THEN round(n2 / n1::DOUBLE, 4) END,
       CASE WHEN n0 > 0 THEN round(n2 / n0::DOUBLE, 4) END FROM c
"""


# --------------------------------------------------------------------------
# user_retention_cohorts — day-grain cohort retention triangle.
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    return bh.retention_cohorts(events)


USER_RETENTION_COHORTS_SQL = """
WITH first AS (
  SELECT user_id, min(ts::DATE) AS cohort_day FROM events GROUP BY user_id
),
act AS (SELECT DISTINCT user_id, ts::DATE AS day FROM events)
SELECT cohort_day,
       date_diff('day', cohort_day, day)::BIGINT AS age_days,
       count(*)::BIGINT AS n_users
FROM act JOIN first USING (user_id)
GROUP BY cohort_day, age_days
"""


# --------------------------------------------------------------------------
# quality_prune_per_source — keep top 60% by quality within each source.
_PRUNE_FRAC = 0.6


def quality_prune_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    with_q = ts.text_features(spread(docs), keep=("doc_id", "source")).select(
        "doc_id", "source", "quality"
    )
    return cu.quality_prune(with_q, keep_frac=_PRUNE_FRAC)


def _quality_prune_sql() -> str:
    from firmable_company_data_pipeline_spark.queries.llmops import TEXT_STATS_SQL

    return f"""
WITH q AS (
  SELECT s.doc_id, d.source, s.quality
  FROM ({TEXT_STATS_SQL}) s JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT doc_id, source, quality,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality DESC, doc_id) AS src_rank,
         count(*) OVER (PARTITION BY source) AS n_src
  FROM q
)
SELECT doc_id, source, quality, src_rank, n_src,
       src_rank <= CAST(ceil(n_src * {_PRUNE_FRAC}) AS BIGINT) AS keep
FROM ranked
"""


QUALITY_PRUNE_PER_SOURCE_SQL = _quality_prune_sql()


# --------------------------------------------------------------------------
# k_anonymity_customers — re-identification audit on (nation, segment).
_KANON_K = 5
_KANON_COLS = ("c_nationkey", "c_mktsegment")


def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return k_anonymity_report(cust, _KANON_COLS, k=_KANON_K)


K_ANONYMITY_CUSTOMERS_SQL = f"""
WITH g AS (
  SELECT {", ".join(_KANON_COLS)}, count(*) AS n
  FROM customer GROUP BY {", ".join(_KANON_COLS)}
)
SELECT {_KANON_K} AS k,
       count(*)::BIGINT AS n_groups,
       sum(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END)::BIGINT AS n_small_groups,
       sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)::BIGINT AS n_exposed_rows,
       round(sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) / sum(n)::DOUBLE, 6)
         AS exposed_frac
FROM g
"""


# --------------------------------------------------------------------------
# l_diversity_customers — the l-diversity companion audit (round 6):
# k-anonymity alone still leaks when a whole equivalence class shares
# one sensitive value, so each (nation, segment) class must carry >= l
# distinct sensitive values — here the account-balance thousand-band.
# The band uses FLOOR over an IEEE double division in BOTH engines
# (div/`//` disagree on negative balances between engines; floor on the
# identical double does not).
_LDIV_L = 3


def l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.quality import (
        l_diversity_report,
    )

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    band = F.floor(F.col("c_acctbal").cast("double") / 1000).cast("long")
    return l_diversity_report(cust, _KANON_COLS, band, l=_LDIV_L)


L_DIVERSITY_CUSTOMERS_SQL = f"""
WITH g AS (
  SELECT {", ".join(_KANON_COLS)},
         count(DISTINCT CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000) AS BIGINT))
           AS ndv,
         count(*) AS n
  FROM customer GROUP BY {", ".join(_KANON_COLS)}
)
SELECT {_LDIV_L} AS l,
       count(*)::BIGINT AS n_groups,
       CAST(sum(CASE WHEN ndv < {_LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_groups,
       CAST(sum(CASE WHEN ndv < {_LDIV_L} THEN n ELSE 0 END) AS BIGINT)
         AS n_exposed_rows,
       round(sum(CASE WHEN ndv < {_LDIV_L} THEN n ELSE 0 END) / sum(n)::DOUBLE, 6)
         AS exposed_frac,
       min(ndv)::BIGINT AS min_diversity
FROM g
"""


# --------------------------------------------------------------------------
# funnel_user_stages — per-user funnel stage (the streaming operator's
# batch twin; streaming execution proven in tests/test_streaming.py).
def funnel_user_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    return bh.funnel_user_stages(events)


FUNNEL_USER_STAGES_SQL = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.t
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.t
  GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN s2.user_id IS NOT NULL THEN 3
                 WHEN s1.user_id IS NOT NULL THEN 2
                 WHEN s0.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s0 ON u.user_id = s0.user_id
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
"""


# --------------------------------------------------------------------------
# common_event_paths — top 3-step event-type sequences: which journeys
# users actually take (the path-analysis complement to the fixed-order
# funnel).  One window exchange (per-user event-time order, two leads),
# then a bounded hash-agg (≤ |event_types|³ groups) and a TakeOrdered.
_PATH_TOP_N = 15


def common_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    n1 = F.lead("event_type", 1).over(w)
    n2 = F.lead("event_type", 2).over(w)
    paths = (
        events.select(
            "user_id",
            F.col("event_type").alias("e0"),
            n1.alias("e1"),
            n2.alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .select(F.concat_ws(" > ", "e0", "e1", "e2").alias("path"))
    )
    ranked = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_journeys"))
        .select(
            "path",
            "n_journeys",
            F.row_number()
            .over(Window.orderBy(F.desc("n_journeys"), F.asc("path")))
            .alias("rank"),
        )
    )
    return ranked.filter(F.col("rank") <= _PATH_TOP_N)


COMMON_EVENT_PATHS_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type AS e0,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2
  FROM events
),
paths AS (
  SELECT e0 || ' > ' || e1 || ' > ' || e2 AS path
  FROM seq WHERE e2 IS NOT NULL
),
agg AS (SELECT path, count(*)::BIGINT AS n_journeys FROM paths GROUP BY path)
SELECT path, n_journeys, rank FROM (
  SELECT path, n_journeys,
         row_number() OVER (ORDER BY n_journeys DESC, path) AS rank
  FROM agg
) WHERE rank <= {_PATH_TOP_N}
"""


# --------------------------------------------------------------------------
# events_trending — top event types per day by count growth vs the prior
# day (the "trending" dashboard): tumbling day aggregation, a lag window
# over the (type, day) series, rank within day.  Aggregation shuffles
# once to day×type grain (bounded); both windows run on that tiny frame.
def events_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_tables(spark, sf_dir, "events")["events"]
    daily = (
        events.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    prev = F.lag("n_events").over(
        Window.partitionBy("event_type").orderBy("day")
    )
    growth = F.when(
        prev.isNotNull() & (prev > 0),
        F.round((F.col("n_events") - prev) / prev, 4),
    )
    scored = daily.select("day", "event_type", "n_events", growth.alias("growth"))
    ranked = scored.filter(F.col("growth").isNotNull()).select(
        "day",
        "event_type",
        "n_events",
        "growth",
        F.row_number()
        .over(
            Window.partitionBy("day").orderBy(
                F.desc("growth"), F.asc("event_type")
            )
        )
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= 2)


EVENTS_TRENDING_SQL = """
WITH daily AS (
  SELECT ts::DATE AS day, event_type, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT day, event_type, n_events,
         round((n_events - lag(n_events) OVER w)
               / lag(n_events) OVER w::DOUBLE, 4) AS growth
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT day, event_type, n_events, growth, rank FROM (
  SELECT day, event_type, n_events, growth,
         row_number() OVER (PARTITION BY day
                            ORDER BY growth DESC, event_type) AS rank
  FROM scored WHERE growth IS NOT NULL
) WHERE rank <= 2
"""


# --------------------------------------------------------------------------
# customer_rfm — recency/frequency/monetary segmentation over orders:
# per-customer aggregates, quartile scores via exact distributed ntile
# (deterministic tie-break on custkey), and the classic segment labels.
# One shuffle to customer grain; each quartile score is then a
# range-partitioned rank (operators/ranks.exact_ntile, round 6) — the
# previous ntile-over-unpartitioned-window spelling funneled the whole
# customer grain through ONE reducer per metric, the doc_length_deciles
# defect class.  At 100 TB the customer grain is itself billions of
# rows; now each metric costs a distributed range sort + P-way window +
# broadcast offsets instead.
def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.ranks import exact_ntile

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    scored = exact_ntile(per_cust, 4, ["last_order", "custkey"], out="r_score")
    scored = exact_ntile(scored, 4, ["frequency", "custkey"], out="f_score")
    scored = exact_ntile(scored, 4, ["monetary", "custkey"], out="m_score")
    scored = scored.select(
        "custkey", "frequency", "monetary", "r_score", "f_score", "m_score"
    )
    segment = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), F.lit("champion"))
        .when(F.col("r_score") >= 3, F.lit("active"))
        .when(F.col("f_score") >= 3, F.lit("at_risk"))
        .otherwise(F.lit("hibernating"))
    )
    return scored.withColumn("segment", segment)


CUSTOMER_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate::DATE) AS last_order,
         count(*)::BIGINT AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT custkey, frequency, monetary,
         ntile(4) OVER (ORDER BY last_order, custkey) AS r_score,
         ntile(4) OVER (ORDER BY frequency, custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary, custkey) AS m_score
  FROM per_cust
)
SELECT custkey, frequency, monetary, r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 3 THEN 'active'
            WHEN f_score >= 3 THEN 'at_risk'
            ELSE 'hibernating' END AS segment
FROM scored
"""


# --------------------------------------------------------------------------
# events_daily_anomalies — volume anomaly screen: each (day, type)'s
# count z-scored against its trailing 7 CALENDAR days (RANGE frame over
# days-since-epoch, so gap days shrink the baseline instead of silently
# reaching weeks back the way a ROWS frame would).  All windows run on
# the bounded day×type aggregate; |z| ≥ 2 flags.
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_tables(spark, sf_dir, "events")["events"]
    daily = (
        events.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-7, -1)
    )
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp("n_events").over(w)
    z = F.round((F.col("n_events") - mu) / sd, 4)
    return (
        daily.select(
            "day",
            "event_type",
            "n_events",
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            z.alias("z_score"),
        )
        .filter((F.col("n_trailing") >= 4) & F.col("z_score").isNotNull())
        .select(
            "day",
            "event_type",
            "n_events",
            "z_score",
            (F.abs(F.col("z_score")) >= 2.0).alias("is_anomaly"),
        )
    )


EVENTS_DAILY_ANOMALIES_SQL = """
WITH daily AS (
  SELECT ts::DATE AS day, event_type, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT day, event_type, n_events,
         count(*) OVER w AS n_trailing,
         round((n_events - avg(n_events) OVER w) / stddev_samp(n_events) OVER w, 4)
           AS z_score
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY (day - DATE '1970-01-01')
               RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, event_type, n_events, z_score, abs(z_score) >= 2.0 AS is_anomaly
FROM scored WHERE n_trailing >= 4 AND z_score IS NOT NULL
"""


# --------------------------------------------------------------------------
# events_ewma_daily — exponential smoothing of daily volumes per event
# type: the telemetry-dashboard trend line.  A sequential recurrence
# (s_t = α·x_t + (1-α)·s_{t-1}) evaluated through its CLOSED FORM
# (s_t = (1-α)^t·x_0 + Σ_{k=1..t} α·(1-α)^{t-k}·x_k) so both engines
# compute the identical ascending-k summation — the repo's pattern for
# sequential algorithms over BOUNDED per-key series (|days| per type),
# where a per-row HOF beats a window recursion Spark can't express.
# O(n²) per group, n = |days| ≈ 30 — bounded, map-side, one shuffle to
# type grain.
_EWMA_ALPHA = 0.3


def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _EWMA_ALPHA
    events = load_tables(spark, sf_dir, "events")["events"]
    daily = (
        events.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "n_events"))
        ).alias("pts")
    )
    # (1-a)^t via SEQUENTIAL MULTIPLIES, not pow(): libm pow is not
    # correctly rounded and JVM Math.pow vs DuckDB's C pow can differ in
    # the last ulp for some (base, t).  A chain of single IEEE multiplies
    # is exactly rounded at every step, so both engines produce
    # bit-identical decays (the determinism-contract pattern: same
    # operation, same order).  The whole decay table dk[i] = (1-a)^(i-1)
    # is built ONCE per series as a prefix-product fold (each element is
    # one multiply on the previous — n-1 multiplies total), then the
    # summations below only LOOK UP dk — keeping the query O(n²) per
    # group instead of the O(n³) a fresh per-term multiply chain would
    # cost (review r7).  The fold's chain order is identical to
    # evaluating each power independently left-to-right, so the values
    # (not just the totals) are bit-identical to the per-term form.
    # NOTE sequence(1, n-1) DESCENDS when n == 1 (Spark sequence is
    # bidirectional), hence the explicit n >= 2 guard.
    dk = F.when(
        F.size("pts") >= 2,
        F.aggregate(
            F.sequence(F.lit(1), F.size("pts") - 1),
            F.array(F.lit(1.0)),
            lambda acc, _k: F.concat(
                acc, F.array(F.element_at(acc, -1) * F.lit(1 - a))
            ),
        ),
    ).otherwise(F.array(F.lit(1.0)))
    series = series.withColumn("dk", dk)
    xs = F.col("pts.n_events").cast("array<double>")
    n = F.size("pts")

    def decay(t):
        # dk is 1-indexed: dk[i] = (1-a)^(i-1)
        return F.element_at(F.col("dk"), t + 1)

    def ewma_at(t):
        base = decay(t) * F.element_at(xs, 1)
        tail = F.when(
            t >= 1,
            F.aggregate(
                F.sequence(F.lit(1), t),
                F.lit(0.0),
                lambda acc, k: acc
                + F.lit(a) * decay(t - k) * F.element_at(xs, k + 1),
            ),
        ).otherwise(F.lit(0.0))
        return base + tail

    idx = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda t: F.struct(
            F.element_at(F.col("pts.day"), t + 1).alias("day"),
            F.element_at(xs, t + 1).cast("long").alias("n_events"),
            # explicit floor-based HALF_UP instead of round(): the two
            # engines disagree on exact .xxxx5 boundaries (Spark rounds
            # the decimal expansion HALF_UP, DuckDB rounds the double —
            # sf0.1 hit one: 657.04325).  functions/money.half_up is the
            # same IEEE operation sequence everywhere.
            half_up(ewma_at(t), 4).alias("ewma"),
        ),
    )
    return series.select(
        "event_type", F.explode(idx).alias("g")
    ).select("event_type", "g.day", "g.n_events", "g.ewma")


# The oracle builds the same per-series decay table once (dk CTE column;
# DuckDB's list_reduce seeds from the first element, so acc must stay
# DOUBLE — the prefix table is built as one fresh left-to-right chain
# per element, O(n²) multiplies once per series, same chain order →
# bit-identical values) and the summation only indexes it — mirroring
# the Spark side's lookup structure.
EVENTS_EWMA_DAILY_SQL = f"""
WITH daily AS (
  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT event_type,
         list_sort(list({{'day': day, 'n_events': n_events}})) AS pts
  FROM daily GROUP BY event_type
),
ex AS (
  SELECT event_type,
         list_transform(pts, p -> p.day) AS days,
         list_transform(pts, p -> p.n_events::DOUBLE) AS xs,
         list_transform(range(len(pts)),
           j -> list_reduce(list_prepend(1.0::DOUBLE,
                  list_transform(range(j), i -> {1 - _EWMA_ALPHA})),
                  (acc, v) -> acc * v)) AS dk,
         unnest(range(len(pts))) AS t
  FROM series
)
SELECT event_type,
       days[t+1] AS day,
       CAST(xs[t+1] AS BIGINT) AS n_events,
       floor((dk[t+1] * xs[1]
             + CASE WHEN t >= 1 THEN
                 list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(range(1, t+1),
                     k -> {_EWMA_ALPHA} * dk[t-k+1] * xs[k+1])),
                   (acc, v) -> acc + v)
               ELSE 0.0 END) * 10000 + 0.5) / 10000 AS ewma
FROM ex
"""


# --------------------------------------------------------------------------
# copurchase_triangles — triangle counts + clustering coefficient over the
# co-purchase graph (parts bought together in ≥2 orders).  Dense cliques =
# product bundles; the graph-cohesion twin of `part_affinity`'s lift.
# Edge build: per-order DISTINCT baskets self-joined (Σ basket², never
# |parts|²), min-support 2 prunes the accidental pairs; the operator then
# runs the degree-ordered wedge algorithm (operators/graph.triangle_count).
_TRI_MIN_ORDERS = 2


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.graph import triangle_count

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # Per-order pair expansion MAP-SIDE from the collected basket array
    # (r13, guide §2.3/§2.4 — the shingle_sets shape): ONE exchange
    # (groupBy orderkey, map-side combine dedups parts) instead of a
    # row-level distinct exchange + a self-join that re-exchanges both
    # sides.  array_sort + (i < j) index combos emit exactly the a < b
    # distinct-part pairs the old self-join produced; baskets are
    # order-line-bounded, so the per-row combo work is O(basket²) on a
    # tiny array, never a shuffle.
    basket = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    n = F.size("parts")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.transform(
                F.sequence(i + 1, n - 1),
                lambda j: F.struct(
                    F.get("parts", i).alias("id_a"),
                    F.get("parts", j).alias("id_b"),
                ),
            ),
        )
    )
    pairs = (
        basket.filter(n >= 2)
        .select(F.explode(combos).alias("pr"))
        .groupBy(F.col("pr.id_a").alias("id_a"), F.col("pr.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= _TRI_MIN_ORDERS)
        .select("id_a", "id_b")
    )
    return triangle_count(pairs)


# Oracle enumerates triangles over canonical (u < v) edges directly —
# orientation strategy changes the JOIN COST, never the triangle set, so
# the naive SQL form is the independent semantic check.
COPURCHASE_TRIANGLES_SQL = f"""
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_TRI_MIN_ORDERS}
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT x AS id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
pern AS (SELECT id, count(*) AS n_triangles FROM corners GROUP BY id),
deg AS (
  SELECT id, count(*) AS degree
  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
  GROUP BY id
)
SELECT d.id, d.degree,
       COALESCE(p.n_triangles, 0) AS n_triangles,
       round(CASE WHEN d.degree >= 2
                  THEN 2.0 * COALESCE(p.n_triangles, 0) / (d.degree * (d.degree - 1.0))
                  ELSE 0.0 END, 6) AS clustering
FROM deg d LEFT JOIN pern p USING (id)
"""


# --------------------------------------------------------------------------
# events_daily_gapfill — time-series resample with a generated date spine:
# days with NO events appear with zeros (aggregations alone silently skip
# empty buckets — the spine is what makes downstream window math, EWMA,
# anomaly frames calendar-correct).  Spine = sequence(min_day, max_day)
# from a broadcast 1-row bounds agg, crossed with the distinct type dim;
# facts left-join onto it.  Spine size = days × types, independent of
# event volume.
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    bounds = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    # both spine factors are bounded dims — broadcast the type side
    # explicitly rather than leaving it to AQE (repo broadcast policy;
    # verdict r7 #6)
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    ).crossJoin(F.broadcast(ev.select("event_type").distinct()))
    daily = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    return spine.join(daily, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


EVENTS_DAILY_GAPFILL_SQL = """
WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type, value FROM events),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds
),
types AS (SELECT DISTINCT event_type FROM ev),
daily AS (
  SELECT day, event_type, count(*) AS n_events,
         round(sum(value), 2) AS sum_value
  FROM ev GROUP BY 1, 2
)
SELECT s.day, t.event_type,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.sum_value, 0.0) AS sum_value
FROM spine s CROSS JOIN types t
LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
"""


# --------------------------------------------------------------------------
# part_revenue_pareto — cumulative-share concentration analysis: parts
# ranked by revenue, how many cover 50/80/95% of total.  The rank/cumsum
# window runs over the PART-GRAIN aggregate (dimension-sized — a
# the global rank and cumulative revenue run through the distributed
# range-partitioned machinery of operators/ranks (round 6) — the part
# grain is dimension-sized today but nothing about the query needs a
# single-reducer window; DESC revenue is spelled as ASC on the negated
# key so the asc-only primitives apply.
def part_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.ranks import prefix_agg

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    ).withColumn("_negrev", -F.col("rev"))
    total = per_part.agg(F.sum("rev").alias("tot"))
    # fused rank + running sum: one range shuffle serves both
    ranked = prefix_agg(
        per_part,
        ["_negrev", "l_partkey"],
        "rev",
        fn="sum",
        inclusive=True,
        out="cum_rev",
        rank_out="rank",
    ).crossJoin(F.broadcast(total))
    share = F.col("cum_rev") / F.col("tot")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min(F.when(share >= 0.5, F.col("rank"))).cast("long").alias("parts_for_50pct"),
        F.min(F.when(share >= 0.8, F.col("rank"))).cast("long").alias("parts_for_80pct"),
        F.min(F.when(share >= 0.95, F.col("rank"))).cast("long").alias("parts_for_95pct"),
    )


PART_REVENUE_PARETO_SQL = """
WITH per_part AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT rev,
         row_number() OVER (ORDER BY rev DESC, l_partkey) AS rank,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
         sum(rev) OVER () AS tot
  FROM per_part
)
SELECT count(*) AS n_parts,
       min(CASE WHEN cum_rev / tot >= 0.5 THEN rank END)::BIGINT AS parts_for_50pct,
       min(CASE WHEN cum_rev / tot >= 0.8 THEN rank END)::BIGINT AS parts_for_80pct,
       min(CASE WHEN cum_rev / tot >= 0.95 THEN rank END)::BIGINT AS parts_for_95pct
FROM ranked
"""


# --------------------------------------------------------------------------
# user_week_over_week — §2.7 set operations (INTERSECT / EXCEPT) as user
# cohort algebra: users active in both halves of the month (retained),
# first half only (churned), second half only (new).  Spark plans
# INTERSECT/EXCEPT as left-semi/anti aggregates — one shuffle each over
# the DISTINCT user sets, never row-level.
_WOW_SPLIT = "2024-01-16"


def user_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    cut = F.lit(_WOW_SPLIT).cast("timestamp")
    h1 = ev.filter(F.col("ts") < cut).select("user_id").distinct()
    h2 = ev.filter(F.col("ts") >= cut).select("user_id").distinct()
    retained = h1.intersect(h2).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("retained").alias("cohort"), "n"
    )
    churned = h1.exceptAll(h2).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("churned").alias("cohort"), "n"
    )
    new = h2.exceptAll(h1).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("new").alias("cohort"), "n"
    )
    return retained.unionByName(churned).unionByName(new)


USER_WEEK_OVER_WEEK_SQL = f"""
WITH h1 AS (SELECT DISTINCT user_id FROM events WHERE ts < TIMESTAMP '{_WOW_SPLIT}'),
h2 AS (SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '{_WOW_SPLIT}')
SELECT 'retained' AS cohort,
       (SELECT count(*) FROM (SELECT user_id FROM h1 INTERSECT SELECT user_id FROM h2)) AS n
UNION ALL
SELECT 'churned',
       (SELECT count(*) FROM (SELECT user_id FROM h1 EXCEPT SELECT user_id FROM h2))
UNION ALL
SELECT 'new',
       (SELECT count(*) FROM (SELECT user_id FROM h2 EXCEPT SELECT user_id FROM h1))
"""


# --------------------------------------------------------------------------
# funnel_time_to_convert — the time-dimension the funnel report lacks:
# per converting user, minutes from FIRST click to the first purchase at
# or after it; distribution summarized with exact discrete percentiles
# (percentile_disc — interpolated quantiles land on engine-divergent
# rounding, §8 of ARCHITECTURE).  Two type-filtered per-user min-aggs +
# one user equi-join; the summary is one global agg.
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        first_click.join(purchases, "user_id")
        .filter(F.col("p_ts") >= F.col("click_ts"))
        .groupBy("user_id", "click_ts")
        .agg(F.min("p_ts").alias("purchase_ts"))
        .select(
            # NTZ timestamps don't cast to double; integer-microsecond
            # diff (timestampdiff) ÷ 60e6 is IEEE-identical to the
            # oracle's epoch_us(...)/60e6.
            (
                F.expr("timestampdiff(MICROSECOND, click_ts, purchase_ts)")
                / 60_000_000.0
            ).alias("mins")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY mins)"), 4).alias(
            "median_minutes"
        ),
        F.round(F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY mins)"), 4).alias(
            "p90_minutes"
        ),
    )


FUNNEL_TIME_TO_CONVERT_SQL = """
WITH first_click AS (
  SELECT user_id, min(ts) AS click_ts FROM events
  WHERE event_type = 'click' GROUP BY user_id
),
conv AS (
  SELECT e.user_id,
         epoch_us(min(e.ts) - f.click_ts) / 60000000.0 AS mins
  FROM events e JOIN first_click f
    ON e.user_id = f.user_id AND e.ts >= f.click_ts
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id, f.click_ts
)
SELECT count(*) AS n_converted,
       round(quantile_disc(mins, 0.5), 4) AS median_minutes,
       round(quantile_disc(mins, 0.9), 4) AS p90_minutes
FROM conv
"""


# --------------------------------------------------------------------------
# event_transition_matrix — first-order Markov estimate of the event
# stream: P(next event type | current), from per-user lead() sequences
# (round 5; the n-gram sibling of common_event_paths, but normalized
# per source state — the input for session-simulation / anomaly work).
# Scale: one window shuffle on user_id, one hash-agg over ≤|types|²
# cells, then a broadcast-sized window for the row-normalize.
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    agg = trans.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wf = Window.partitionBy("from_type")
    return agg.select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(F.col("n_trans") / F.sum("n_trans").over(wf), 6).alias("p_trans"),
    )


EVENT_TRANSITION_MATRIX_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
agg AS (
  SELECT from_type, to_type, count(*) AS n_trans
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_trans,
       round(n_trans::DOUBLE / sum(n_trans) OVER (PARTITION BY from_type), 6)
         AS p_trans
FROM agg
"""


# --------------------------------------------------------------------------
# customer_order_gaps — inter-purchase cadence per customer: average and
# maximum days between consecutive orders (round 5; the lag() twin of
# customer_rfm's recency).  One window shuffle on o_custkey doubling as
# the aggregation shuffle (same key → AQE plans one exchange).  Tie
# dates order by o_orderkey; the gap multiset is tie-order-invariant
# anyway (equal dates contribute 0 either way).
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    od = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey", od.alias("od"), F.lag(od).over(w).alias("prev_od")
    )
    gap = F.datediff(F.col("od"), F.col("prev_od"))
    return (
        seq.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg(gap), 4).alias("avg_gap_days"),
            F.max(gap).alias("max_gap_days"),
        )
        .filter(F.col("n_orders") >= 2)
    )


CUSTOMER_ORDER_GAPS_SQL = """
WITH seq AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
         lag(CAST(o_orderdate AS DATE)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_od
  FROM orders
)
SELECT o_custkey, n_orders, avg_gap_days, max_gap_days FROM (
  SELECT o_custkey, count(*) AS n_orders,
         round(avg(date_diff('day', prev_od, od)), 4) AS avg_gap_days,
         max(date_diff('day', prev_od, od)) AS max_gap_days
  FROM seq GROUP BY 1
) WHERE n_orders >= 2
"""


QUERIES = {
    "event_transition_matrix": event_transition_matrix,
    "customer_order_gaps": customer_order_gaps,
    "funnel_conversion": funnel_conversion,
    "funnel_user_stages": funnel_user_stages,
    "common_event_paths": common_event_paths,
    "events_trending": events_trending,
    "customer_rfm": customer_rfm,
    "events_daily_anomalies": events_daily_anomalies,
    "events_ewma_daily": events_ewma_daily,
    "user_retention_cohorts": user_retention_cohorts,
    "quality_prune_per_source": quality_prune_per_source,
    "k_anonymity_customers": k_anonymity_customers,
    "l_diversity_customers": l_diversity_customers,
    "copurchase_triangles": copurchase_triangles,
    "events_daily_gapfill": events_daily_gapfill,
    "part_revenue_pareto": part_revenue_pareto,
    "user_week_over_week": user_week_over_week,
    "funnel_time_to_convert": funnel_time_to_convert,
}

ORACLES = {
    "event_transition_matrix": EVENT_TRANSITION_MATRIX_SQL,
    "customer_order_gaps": CUSTOMER_ORDER_GAPS_SQL,
    "funnel_conversion": FUNNEL_CONVERSION_SQL,
    "funnel_user_stages": FUNNEL_USER_STAGES_SQL,
    "common_event_paths": COMMON_EVENT_PATHS_SQL,
    "events_trending": EVENTS_TRENDING_SQL,
    "customer_rfm": CUSTOMER_RFM_SQL,
    "events_daily_anomalies": EVENTS_DAILY_ANOMALIES_SQL,
    "events_ewma_daily": EVENTS_EWMA_DAILY_SQL,
    "user_retention_cohorts": USER_RETENTION_COHORTS_SQL,
    "quality_prune_per_source": QUALITY_PRUNE_PER_SOURCE_SQL,
    "k_anonymity_customers": K_ANONYMITY_CUSTOMERS_SQL,
    "l_diversity_customers": L_DIVERSITY_CUSTOMERS_SQL,
    "copurchase_triangles": COPURCHASE_TRIANGLES_SQL,
    "events_daily_gapfill": EVENTS_DAILY_GAPFILL_SQL,
    "part_revenue_pareto": PART_REVENUE_PARETO_SQL,
    "user_week_over_week": USER_WEEK_OVER_WEEK_SQL,
    "funnel_time_to_convert": FUNNEL_TIME_TO_CONVERT_SQL,
}

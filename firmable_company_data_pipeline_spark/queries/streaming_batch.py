"""Batch views of the streaming operators (SURVEY.md §2.9) over the
driver's ``events`` table, with DuckDB oracles.

These call the *same* transformations ``streaming/windows.py`` applies
to streaming inputs — Spark's batch/stream unification is what makes
the streaming logic oracle-checkable: the oracle validates the
windowing semantics, and ``tests/test_streaming.py`` separately proves
the streaming execution path (file source → watermark → availableNow)
produces the same rows as the batch path.

Oracle notes: tumbling windows mirror as ``time_bucket``; sliding
windows as a union of the two candidate bucket starts; session windows
as classic gaps-and-islands (lag + cumulative flag sum).  Timestamps
are cast to µs precision on the DuckDB side to match Spark's
``TIMESTAMP`` (the parquet files store TIMESTAMP(NANOS)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from firmable_company_data_pipeline_spark.session import load_tables
from firmable_company_data_pipeline_spark.streaming import windows as W


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, "events")["events"]


# --------------------------------------------------------------------------
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_value_stats(_events(spark, sf_dir), "1 hour")


EVENTS_TUMBLING_1H_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts)::TIMESTAMP AS win_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
def events_sliding_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sliding_value_stats(_events(spark, sf_dir), "10 minutes", "5 minutes")


# An event at t belongs to the two 10-min windows starting at
# time_bucket(5m, t) and time_bucket(5m, t) - 5m.
EVENTS_SLIDING_10M_SQL = """
WITH starts AS (
  SELECT time_bucket(INTERVAL '5 minutes', ts)::TIMESTAMP AS win_start, value FROM events
  UNION ALL
  SELECT (time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes')::TIMESTAMP, value
  FROM events
)
SELECT win_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM starts
GROUP BY 1
"""


# --------------------------------------------------------------------------
def events_session_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.session_stats(_events(spark, sf_dir), "5 minutes")


EVENTS_SESSION_5M_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL '5 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       min(ts)::TIMESTAMP AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# events_dedup_union — batch analog of dropDuplicatesWithinWatermark:
# double the stream, dedup by event_id, aggregate (doubled input must
# collapse back to the original totals).
def events_dedup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir)
    deduped = W.dedup_events(ev.unionByName(ev), ["event_id"])
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


EVENTS_DEDUP_UNION_SQL = """
WITH doubled AS (SELECT * FROM events UNION ALL SELECT * FROM events),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY event_id) AS rn
    FROM doubled
  ) WHERE rn = 1
)
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM deduped
GROUP BY event_type
"""


# --------------------------------------------------------------------------
def events_click_error_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.click_error_interval_join(_events(spark, sf_dir), "10 minutes")


EVENTS_CLICK_ERROR_JOIN_SQL = """
SELECT c.user_id AS user_id, count(*) AS n_pairs
FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id
 AND e.ts > c.ts
 AND e.ts <= c.ts + INTERVAL '10 minutes'
GROUP BY c.user_id
"""


# --------------------------------------------------------------------------
def events_user_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered sequence numbers (the batch view the streaming
    tests cross-check; deterministic tie-break on event_id)."""
    return W.user_event_rate(_events(spark, sf_dir)).select(
        "event_id", "user_id", "seq"
    )


EVENTS_USER_SEQ_SQL = """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
"""


def user_value_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming/stateful.user_new_maxima``: events whose
    value strictly exceeds the running maximum over all EARLIER
    (ts, event_id)-ordered events of the same user — record-breaking
    detection.  One window exchange on user_id; NULL values are neither
    emitted nor advance the maximum (matching the processor)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    return (
        ev.withColumn("_prev_max", F.max("value").over(w))
        .filter(F.col("_prev_max").isNull() | (F.col("value") > F.col("_prev_max")))
        .select("user_id", "event_id", F.round("value", 6).alias("value"))
    )


USER_VALUE_RECORDS_SQL = """
SELECT user_id, event_id, round(value, 6) AS value
FROM (
  SELECT user_id, event_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events WHERE value IS NOT NULL
)
WHERE prev_max IS NULL OR value > prev_max
"""


def events_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data audit — the batch view of exactly which rows a
    10-minute watermark WOULD drop if the table replayed as a stream in
    arrival order (event_id): a row is late iff its event time is below
    the watermark its arrival-time predecessor set
    (``max(ts) so far − delay``).  The pre-flight run before picking a
    watermark delay: counts the data loss each candidate delay buys.
    The high-water-mark is a global arrival-order prefix max over the
    FULL event stream — fact-sized — so it runs through the distributed
    range-partitioned prefix machinery (operators/ranks.prefix_agg,
    round 6), never an unpartitioned window's single reducer."""
    from pyspark.sql import functions as F

    from firmable_company_data_pipeline_spark.operators.ranks import prefix_agg

    delay = F.expr("INTERVAL 10 MINUTES")
    ev = prefix_agg(
        _events(spark, sf_dir),
        ["event_id"],
        "ts",
        fn="max",
        inclusive=False,
        out="_hwm",
    )
    return (
        ev.withColumn("_late", (F.col("ts") < F.col("_hwm") - delay).cast("long"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_late").alias("n_late"),
            F.round(F.sum("_late") / F.count(F.lit(1)), 6).alias("late_frac"),
        )
    )


EVENTS_LATE_AUDIT_SQL = """
WITH flagged AS (
  SELECT event_type,
         CASE WHEN ts < max(ts) OVER (ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)
                   - INTERVAL '10 minutes'
              THEN 1 ELSE 0 END AS late
  FROM events
)
SELECT event_type, count(*) AS n_events,
       sum(late)::BIGINT AS n_late,
       round(sum(late) / count(*)::DOUBLE, 6) AS late_frac
FROM flagged
GROUP BY event_type
"""


QUERIES = {
    "events_tumbling_1h": events_tumbling_1h,
    "user_value_records": user_value_records,
    "events_late_audit": events_late_audit,
    "events_sliding_10m": events_sliding_10m,
    "events_session_5m": events_session_5m,
    "events_dedup_union": events_dedup_union,
    "events_click_error_join": events_click_error_join,
    "events_user_seq": events_user_seq,
}

ORACLES = {
    "events_tumbling_1h": EVENTS_TUMBLING_1H_SQL,
    "user_value_records": USER_VALUE_RECORDS_SQL,
    "events_late_audit": EVENTS_LATE_AUDIT_SQL,
    "events_sliding_10m": EVENTS_SLIDING_10M_SQL,
    "events_session_5m": EVENTS_SESSION_5M_SQL,
    "events_dedup_union": EVENTS_DEDUP_UNION_SQL,
    "events_click_error_join": EVENTS_CLICK_ERROR_JOIN_SQL,
    "events_user_seq": EVENTS_USER_SEQ_SQL,
}

"""Windowed event-time transformations, batch/stream agnostic.

Each function takes any events-shaped DataFrame (``event_id, ts,
user_id, event_type, value, props``) and returns a lazy DataFrame; the
same call works on ``spark.read`` and ``spark.readStream`` inputs
(streaming callers add ``withWatermark`` first — see ``jobs.py``).

Scale notes: windowed groupBys shuffle once on (window, key); Spark's
incremental state store handles the streaming case.  The interval join
is a range join — at scale, bound its state with watermarks on both
sides (done in ``jobs.py``) and keep the time bound tight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_value_stats(events: DataFrame, size: str = "1 hour") -> DataFrame:
    """Per event-type counts/sums over tumbling event-time windows."""
    return (
        events.groupBy(F.window("ts", size).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_value_stats(
    events: DataFrame, size: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding-window counts (each event lands in size/slide windows)."""
    return (
        events.groupBy(F.window("ts", size, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n_events", "sum_value")
    )


def session_stats(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Per-user session windows (gap-based): session start, size, value.

    On streaming inputs Spark maintains session state incrementally; on
    batch inputs ``session_window`` computes the same gaps-and-islands
    result the oracle derives with lag() + cumulative sum.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Exact dedup by key — batch analog of
    ``dropDuplicatesWithinWatermark`` (streaming version in jobs.py)."""
    return events.dropDuplicates(keys or ["event_id"])


def click_error_interval_join(
    events: DataFrame, lead: str = "10 minutes"
) -> DataFrame:
    """Interval (range) join: for each click, errors by the same user
    within ``lead`` afterwards.  Equi-join on user_id plus a time-range
    predicate — the stream-stream join shape (with watermarks bounding
    state in the streaming case).  Output: user_id, n_pairs.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    return (
        clicks.join(
            errors,
            (F.col("c_user") == F.col("e_user"))
            & (F.col("e_ts") > F.col("c_ts"))
            & (F.col("e_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {lead}")),
        )
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def user_event_rate(events: DataFrame) -> DataFrame:
    """Per-user ordered event sequence stats (batch window-function view
    used by tests to cross-check streaming outputs)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.withColumn("seq", F.row_number().over(w))

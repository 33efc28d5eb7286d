"""Behavioral-analytics operators over the events stream (charter
extension, round 4: the product-analytics queries every events pipeline
ships — funnel conversion and cohort retention).

Both are UDF-free DataFrame compositions over the batch ``events``
table; the same transformations apply to a streaming micro-batch via
``foreachBatch`` (the per-user minima are classic incremental state).

Scale shapes:

* ``funnel_report``      — each step is a type-filtered scan (predicate
                           pushdown to parquet) + per-user min
                           aggregation; per-user tables are |users|
                           rows, joined back on user_id (AQE broadcasts
                           them when small, shuffle-joins when not).
                           The report itself is a cross of 1-row
                           aggregates — no global sort anywhere.
* ``retention_cohorts``  — per-user first-day agg + distinct
                           (user, day) activity + one equi-join on
                           user_id; the final (cohort, age) rollup has
                           |days|² bounded cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _reached_tables(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str,
    ts_col: str,
    type_col: str,
) -> list[DataFrame]:
    """Per-step first-touch tables: reached[i] = (u, t) where ``t`` is
    the user's earliest ``steps[i]`` event strictly after their
    reached[i-1] time.  The single source of the chaining semantics —
    both the conversion report and the per-user stage frame (and, via
    the stream-equality test, the streaming state machine) derive from
    this."""
    user = F.col(user_col)
    reached = [
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user.alias("u"))
        .agg(F.min(ts_col).alias("t"))
    ]
    for step in steps[1:]:
        reached.append(
            events.filter(F.col(type_col) == step)
            .join(reached[-1], user == F.col("u"))
            .filter(F.col(ts_col) > F.col("t"))
            .groupBy("u")
            .agg(F.min(ts_col).alias("t"))
        )
    return reached


def funnel_report(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: a user counts for step i iff they
    performed ``steps[i]`` strictly AFTER their earliest qualifying
    ``steps[i-1]`` event (first-touch chaining, the standard
    product-analytics funnel definition).

    Output one row per step: (step, step_idx, n_users, conv_from_prev,
    conv_from_first), rates rounded to 4 dp; ``conv_from_prev`` is NULL
    for the first step.  The report explodes ONE wide 1-row frame (the
    cross of per-step counts), so the chained plan appears once, not
    once per output step.
    """
    reached = _reached_tables(events, steps, user_col, ts_col, type_col)
    wide = reached[0].agg(F.count(F.lit(1)).alias("n0"))
    for i, r in enumerate(reached[1:], start=1):
        wide = wide.crossJoin(broadcast(r.agg(F.count(F.lit(1)).alias(f"n{i}"))))
    step_structs = []
    for i, step in enumerate(steps):
        n_i, n_first = F.col(f"n{i}"), F.col("n0")
        prev = (
            F.lit(None).cast("double")
            if i == 0
            else F.when(
                F.col(f"n{i-1}") > 0, F.round(n_i / F.col(f"n{i-1}"), 4)
            )
        )
        first = (
            F.lit(1.0)
            if i == 0
            else F.when(n_first > 0, F.round(n_i / n_first, 4))
        )
        step_structs.append(
            F.struct(
                F.lit(step).alias("step"),
                F.lit(i).alias("step_idx"),
                n_i.cast("long").alias("n_users"),
                prev.alias("conv_from_prev"),
                first.alias("conv_from_first"),
            )
        )
    return wide.select(
        F.explode(F.array(*step_structs)).alias("g")
    ).select("g.step", "g.step_idx", "g.n_users", "g.conv_from_prev", "g.conv_from_first")


def funnel_user_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel stage under the same first-touch chaining as
    :func:`funnel_report`: output (user_id, stage) where ``stage`` is
    the number of steps completed, 0 for users who never performed the
    first step.  This is the batch twin of
    ``streaming.funnel.funnel_stages_stream`` — the stream's final
    emission per user equals this frame on the same (time-ordered)
    data.
    """
    user = F.col(user_col)
    users = events.select(user.alias("u")).distinct()
    reached = _reached_tables(events, steps, user_col, ts_col, type_col)
    out = users
    stage = F.lit(0)
    for i, r in enumerate(reached):
        out = out.join(r.select("u", F.col("t").alias(f"t{i}")), "u", "left")
        stage = F.when(F.col(f"t{i}").isNotNull(), i + 1).otherwise(stage)
    return out.select(F.col("u").alias(user_col), stage.cast("int").alias("stage"))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-grain cohort retention: users cohorted by their first active
    day; for each (cohort_day, age_days) the number of cohort members
    active ``age_days`` days after joining.

    Output (cohort_day date, age_days long, n_users long).  Each
    (user, day) pair is counted once; age 0 rows give cohort sizes.
    """
    user = F.col(user_col)
    first = (
        events.groupBy(user.alias("u"))
        .agg(F.min(F.to_date(ts_col)).alias("cohort_day"))
    )
    act = events.select(user.alias("u"), F.to_date(ts_col).alias("day")).distinct()
    return (
        act.join(first, "u")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("age_days"),
        )
        .groupBy("cohort_day", "age_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )

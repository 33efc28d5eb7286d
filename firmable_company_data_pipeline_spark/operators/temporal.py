"""Temporal join operators (charter extension): as-of join.

The reference has no temporal logic beyond a DATE cast
(`extract/abr_parser.py:55`); an engine feeding training pipelines needs
the as-of join (last event/quote/feature value at or before a point in
time) as a first-class operator.

Scale formulation — union + carry-forward window, NOT a range join:

* a range join (``l.key = r.key AND r.ts <= l.ts`` then per-left argmax)
  materializes every (left, earlier-right) pair — quadratic inside hot
  keys, and Spark plans non-equi conditions as BroadcastNestedLoop when
  one side is small and falls over when it isn't;
* this operator tags both sides, unions them, and carries the most
  recent right payload forward with one window over ``(key)`` ordered by
  ``(ts, side, order)`` — ONE shuffle, O(n log n) per key, bounded state.
  It is the batch analog of how a stream-stream as-of maintains keyed
  state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_order: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``key`` with ``right_ts <= left_ts`` (NULLs when none exists).

    Tie-break at equal ``right_ts``: the greatest ``right_order`` value
    wins (pass a unique column for determinism; defaults to ``right_ts``
    order only). Exact-timestamp matches are included (``<=``), matching
    ``pandas.merge_asof(direction="backward", allow_exact_matches=True)``.

    Output: all left columns, then ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each of ``right_cols`` (default: every right
    column except the key).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    order_col = right_order or right_ts

    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in right_cols if c != right_ts],
    )
    rord_type = right.schema[order_col].dataType
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(order_col).alias("_rord"),
        payload.alias("_rpay"),
    )
    # Left columns ride through the union FLAT (aliased "_l_<name>" to dodge
    # collisions with the internal _k/_ts/... columns), not packed in a
    # struct: only the right payload needs row-atomic carry (last(ignorenulls)
    # over a struct keeps one right ROW's values together even when some of
    # its fields are null), while left values are simply passed through the
    # window operator untouched.  Flat carry removes a null-struct cast
    # branch from the Union — the shape that intermittently tripped the
    # physical binder under load in round 3.
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rord_type).alias("_rord"),
        F.lit(None).cast(r_tagged.schema["_rpay"].dataType).alias("_rpay"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    r_tagged = r_tagged.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
        ],
    )

    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_last("_rord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_match.{right_ts}").alias(f"{prefix}{right_ts}"))
    out_cols += [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols if c != right_ts
    ]
    return carried.select(*out_cols)

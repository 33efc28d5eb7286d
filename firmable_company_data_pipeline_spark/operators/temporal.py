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

Round 12 widens the contract to ``pandas.merge_asof`` parity:
``direction`` backward (default) / forward / nearest, and a
``tolerance`` (seconds for timestamp axes, native units for numeric
axes) that nulls out matches farther than the bound.  Forward is the
mirror carry (``first`` over the following frame); nearest runs BOTH
carries over ONE union frame and picks by distance — the equal-ts
exact match is caught by the backward carry at distance 0, so a single
sort order serves both arms (no second shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _ts_distance(a: F.Column, b: F.Column, dtype) -> F.Column:
    """|a - b| in seconds for time axes, native units otherwise.
    ``timestamp_diff`` is timezone-free (works on TIMESTAMP_NTZ, the
    type the nanos-parquet events land as) and exact in micros."""
    if isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
        return F.abs(F.timestamp_diff("MICROSECOND", b, a)) / F.lit(1_000_000.0)
    return F.abs(a - b)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    right_order: str | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For every left row, attach the right row of the same ``key``
    selected by ``direction`` (NULLs when none exists):

    * ``backward`` — most recent right with ``right_ts <= left_ts``;
      tie-break at equal ``right_ts``: greatest ``right_order`` wins.
    * ``forward`` — earliest right with ``right_ts >= left_ts``; an
      exact-ts match resolves like backward (greatest ``right_order``),
      a strictly-later match takes the smallest ``right_order``.
    * ``nearest`` — whichever of the two is closer in time; equal
      distance resolves to the backward (earlier) match.

    Exact-timestamp matches are always included (pandas
    ``allow_exact_matches=True``).  ``tolerance`` (seconds for
    timestamp/date axes, native units for numerics) nulls out a match
    farther than the bound — the pandas ``tolerance`` contract.

    Output: all left columns, then ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each of ``right_cols`` (default: every right
    column except the key).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    order_col = right_order or right_ts

    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in right_cols if c != right_ts],
    )
    rord_type = right.schema[order_col].dataType
    # Backward layout: right rows sort BEFORE left rows at equal _ts
    # (side 0 < 1), so the preceding frame includes exact matches; the
    # forward carry below skips same-position rights via an explicit
    # exact-match coalesce rather than a second sort order.
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

    order = [F.asc("_ts"), F.asc("_side"), F.asc_nulls_last("_rord")]
    w_back = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        carried = unioned.withColumn(
            "_match", F.last("_rpay", ignorenulls=True).over(w_back)
        )
    else:
        # Forward carry over the SAME backward layout: the following
        # frame starts past any equal-ts rights (they sort before the
        # left row), so an exact match is recovered from the backward
        # carry when its ts equals the left ts — distance 0, which is
        # also exactly what `nearest` needs.  Among equal-ts rights the
        # backward carry's last() picks the greatest _rord; the forward
        # first() picks the smallest — documented tie-breaks.
        w_fwd = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.withColumn(
            "_back", F.last("_rpay", ignorenulls=True).over(w_back)
        ).withColumn("_fwd", F.first("_rpay", ignorenulls=True).over(w_fwd))
        ts_type = left.schema[left_ts].dataType
        exact = F.col(f"_back.{right_ts}") == F.col("_ts")
        if direction == "forward":
            carried = carried.withColumn(
                "_match",
                F.when(exact, F.col("_back")).otherwise(F.col("_fwd")),
            )
        else:  # nearest
            d_back = _ts_distance(F.col("_ts"), F.col(f"_back.{right_ts}"), ts_type)
            d_fwd = _ts_distance(F.col("_ts"), F.col(f"_fwd.{right_ts}"), ts_type)
            carried = carried.withColumn(
                "_match",
                F.when(F.col("_back").isNull(), F.col("_fwd"))
                .when(F.col("_fwd").isNull(), F.col("_back"))
                .when(d_fwd < d_back, F.col("_fwd"))
                .otherwise(F.col("_back")),  # ties -> backward
            )
    carried = carried.filter(F.col("_side") == 1)

    if tolerance is not None:
        ts_type = left.schema[left_ts].dataType
        dist = _ts_distance(F.col("_ts"), F.col(f"_match.{right_ts}"), ts_type)
        carried = carried.withColumn(
            "_match", F.when(dist <= F.lit(float(tolerance)), F.col("_match"))
        )

    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_match.{right_ts}").alias(f"{prefix}{right_ts}"))
    out_cols += [
        F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols if c != right_ts
    ]
    return carried.select(*out_cols)

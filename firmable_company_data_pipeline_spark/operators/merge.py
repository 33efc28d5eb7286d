"""Dimension maintenance: keyed merge/upsert (SCD type 1) and history
tracking (SCD type 2).

The reference maintains its dimension by **drop/recreate on every run**
(``transform/entity_matching.py:37-55`` — S9) and its README's
production sketch hand-waves incremental loads to a dbt layer
(``README.md:137-165``).  A real warehouse dimension needs MERGE
semantics; these operators express them as pure DataFrame plans so the
same code works against parquet, Delta (which would use a native
``MERGE INTO``), or a JDBC sink via ``foreachBatch``.

Scale design:

* One shuffle per side on the merge keys (full-outer hash join).  With
  both sides bucketed by the key the join is co-located and shuffle-free
  — the recommended layout for a 100 TB dimension maintained by daily
  deltas (the updates side is usually small enough for a broadcast,
  which AQE converts at runtime).
* No row is ever collected to the driver; the merged dimension is the
  return value, written back with ``mode("overwrite")`` (atomic
  file-commit) or handed to a Delta MERGE.
* The streaming twin is ``streaming/jobs.py::foreach_batch_upsert``
  (micro-batch keyed upsert).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACTION = "merge_action"


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    tracked_cols: Sequence[str] | None = None,
    with_action: bool = False,
) -> DataFrame:
    """SCD1 merge: updates win per key; unmatched current rows are kept;
    unmatched update rows are inserted.

    ``tracked_cols`` (default: every non-key column present on both
    sides) define "changed": an update row whose tracked columns all
    null-safe-equal the current row is ``unchanged``; otherwise
    ``update``.  ``with_action=True`` appends a ``merge_action`` column
    (``insert`` / ``update`` / ``unchanged`` / ``keep``) for audit
    sinks.

    Both inputs must share the key columns; non-key columns are aligned
    by name (missing on either side → NULL, mirroring the reference's
    null-padding semantics, ``transform/entity_matching.py:57-66``).
    """
    keys = list(keys)
    cur_cols = [c for c in current.columns if c not in keys]
    upd_cols = [c for c in updates.columns if c not in keys]
    out_cols = cur_cols + [c for c in upd_cols if c not in cur_cols]
    if tracked_cols is None:
        tracked_cols = [c for c in cur_cols if c in upd_cols]

    cur = current.withColumn("_cur", F.lit(True)).alias("cur")
    upd = updates.withColumn("_upd", F.lit(True)).alias("upd")
    joined = cur.join(upd, on=keys, how="full_outer")

    has_cur = F.col("cur._cur").isNotNull()
    has_upd = F.col("upd._upd").isNotNull()
    changed = F.lit(False)
    for c in tracked_cols:
        changed = changed | ~F.col(f"upd.{c}").eqNullSafe(F.col(f"cur.{c}"))

    def val(c: str):
        in_cur, in_upd = c in cur_cols, c in upd_cols
        if in_cur and in_upd:
            return F.when(has_upd, F.col(f"upd.{c}")).otherwise(F.col(f"cur.{c}"))
        if in_upd:
            return F.when(has_upd, F.col(f"upd.{c}"))
        return F.when(has_cur, F.col(f"cur.{c}"))

    action = (
        F.when(~has_cur, F.lit("insert"))
        .when(~has_upd, F.lit("keep"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    cols = [F.col(k).alias(k) for k in keys] + [val(c).alias(c) for c in out_cols]
    if with_action:
        cols.append(action.alias(_ACTION))
    return joined.select(*cols)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    as_of_col: str = "as_of",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD2 history merge: changed keys close their current row
    (``valid_to`` = the update's ``as_of``) and open a new one; new keys
    insert an open row; unchanged keys pass through.

    ``dim`` carries ``valid_from`` and ``valid_to`` (NULL = current
    row); ``updates`` carries the key, the tracked attribute columns,
    and ``as_of_col``.  Attribute columns are whatever both sides share
    beyond keys/validity.  Closed history rows are never touched — at
    scale, partition the dimension on ``valid_to IS NULL`` (or store
    history in a separate table) so the merge only rewrites the current
    partition.
    """
    keys = list(keys)
    attrs = [
        c
        for c in dim.columns
        if c in updates.columns and c not in keys and c not in (valid_from, valid_to, as_of_col)
    ]

    closed_history = dim.filter(F.col(valid_to).isNotNull())
    open_rows = (
        dim.filter(F.col(valid_to).isNull()).withColumn("_cur", F.lit(True)).alias("cur")
    )
    upd = updates.withColumn("_upd", F.lit(True)).alias("upd")

    # The three branches below share this join subplan; Spark's exchange
    # reuse dedups its shuffles across the union branches.
    joined = open_rows.join(upd, on=keys, how="full_outer")
    has_cur = F.col("cur._cur").isNotNull()
    has_upd = F.col("upd._upd").isNotNull()
    changed = F.lit(False)
    for c in attrs:
        changed = changed | ~F.col(f"upd.{c}").eqNullSafe(F.col(f"cur.{c}"))

    key_cols = [F.col(k).alias(k) for k in keys]

    # Unchanged current rows (no update, or update carrying equal attrs).
    untouched = joined.filter(has_cur & (~has_upd | ~changed)).select(
        *key_cols,
        *[F.col(f"cur.{c}").alias(c) for c in attrs],
        F.col(f"cur.{valid_from}").alias(valid_from),
        F.col(f"cur.{valid_to}").alias(valid_to),
    )
    # Current rows superseded by a changed update: close them at as_of.
    closed_now = joined.filter(has_cur & has_upd & changed).select(
        *key_cols,
        *[F.col(f"cur.{c}").alias(c) for c in attrs],
        F.col(f"cur.{valid_from}").alias(valid_from),
        F.col(f"upd.{as_of_col}").alias(valid_to),
    )
    # New versions: changed updates and brand-new keys open at as_of.
    opened = joined.filter(has_upd & (~has_cur | changed)).select(
        *key_cols,
        *[F.col(f"upd.{c}").alias(c) for c in attrs],
        F.col(f"upd.{as_of_col}").alias(valid_from),
        F.lit(None).cast(dict(dim.dtypes)[valid_to]).alias(valid_to),
    )
    return (
        closed_history.select(*keys, *attrs, valid_from, valid_to)
        .unionByName(untouched)
        .unionByName(closed_now)
        .unionByName(opened)
    )


def rollup_merge(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    metrics: dict[str, str],
) -> DataFrame:
    """Incremental maintenance of an aggregate table: combine a stored
    rollup with a freshly-aggregated delta partition WITHOUT rescanning
    history — the continuous-aggregate refresh step (pairs with
    ``sources/io.incremental_append``'s high-water-mark ingest; the
    reference recomputes everything from scratch on each load,
    `transform/data_cleaning.py:121-133`).

    ``metrics`` maps column → combiner: ``sum``/``count`` merge by
    addition (a count IS a sum of partial counts), ``min``/``max`` by
    the corresponding pick.  Only algebraic/distributive aggregates
    belong here — avg must be carried as (sum, count) and derived at
    read time; exact distinct-count is NOT mergeable (carry an HLL
    sketch instead).

    Plan: one full-outer equi-join on the rollup keys — |key-space|
    rows, never event volume.  At 100 TB the base side is the stored
    aggregate (small), the delta side aggregates only the new
    partition: refresh cost is O(delta + key-space), independent of
    history length.
    """
    b = base.alias("b")
    d = delta.alias("d")
    cond = None
    for k in keys:
        eq = F.col(f"b.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else cond & eq
    out_keys = [
        F.coalesce(F.col(f"b.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    out_metrics = []
    for c, how in metrics.items():
        bcol, dcol = F.col(f"b.{c}"), F.col(f"d.{c}")
        if how in ("sum", "count"):
            # NULL-on-both-sides must stay NULL (a full recompute's sum()
            # over all-NULL values is NULL, not 0) — coalesce only when at
            # least one side carries a partial.
            merged = F.when(
                bcol.isNull() & dcol.isNull(), F.lit(None)
            ).otherwise(F.coalesce(bcol, F.lit(0)) + F.coalesce(dcol, F.lit(0)))
        elif how == "min":
            merged = F.least(bcol, dcol)  # least/greatest skip NULLs
        elif how == "max":
            merged = F.greatest(bcol, dcol)
        else:
            raise ValueError(f"unsupported combiner {how!r} for {c!r}")
        out_metrics.append(merged.alias(c))
    return b.join(d, cond, "full_outer").select(*out_keys, *out_metrics)


def scd2_rebuild(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Build the FULL SCD2 history from a change feed — the initial-load
    twin of :func:`scd2_apply` (which folds one delta batch into an
    existing dimension).

    ``changes``: at most one observation per (keys, ts_col) — pre-
    aggregate upstream if the feed is finer-grained.  Consecutive
    observations with identical ``value_cols`` compact into a single
    validity range; ``valid_to`` is the next change's timestamp (NULL =
    current version).

    Plan: one shuffle on ``keys``, then two window passes over that same
    partitioning (lag for change detection, lead over the compacted set
    for ``valid_to``) — both windows are bounded by a single key's
    history, never corpus-wide, and Catalyst reuses the one exchange.
    """
    from pyspark.sql import Window

    keys = list(keys)
    value_cols = list(value_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    # lag(ts) is NULL exactly on each key's first observation (ts is
    # non-null by contract); eqNullSafe alone would wrongly drop a
    # first row whose values are all NULL.
    is_first = F.lag(ts_col).over(w).isNull()
    same_as_prev = F.lit(True)
    for c in value_cols:
        same_as_prev = same_as_prev & F.lag(c).over(w).eqNullSafe(F.col(c))
    compacted = (
        changes.withColumn("_keep", is_first | ~same_as_prev)
        .filter(F.col("_keep"))
        .drop("_keep")
    )
    return compacted.select(
        *keys,
        *value_cols,
        F.col(ts_col).alias(valid_from),
        F.lead(ts_col).over(w).alias(valid_to),
    )

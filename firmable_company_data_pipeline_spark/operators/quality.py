"""Data-quality validation operators.

The reference *defers* data-quality testing to a hypothetical dbt layer
(``README.md:227-237``: unique / not-null / accepted-values tests — never
implemented).  This module makes those checks first-class engine
operators with dbt-compatible semantics, plus arbitrary boolean
expression rules (the generalization of the reference's validity
predicates P5/P6, ``transform/data_cleaning.py:71-75``,
``extract/commoncrawl_scraper.py:40-48``).

Scale design:

* Every **row-local** rule (not-null, accepted-values, expression) is
  evaluated in ONE scan — a single global aggregate of conditional
  sums, map-side combined, no shuffle beyond the 1-row final agg.  At
  100 TB this is the same cost as a ``count()``.
* Each **unique** rule needs its own shuffle on its key tuple (that is
  inherent: uniqueness is a grouping question).  The group-by keeps
  only ``count > 1`` groups, so the second-level agg is tiny.
* Nothing collects to the driver; the report is itself a DataFrame.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("rule", "col_name", "n_violations")


def not_null_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """dbt ``not_null`` analog: per column, the number of NULL rows.
    One scan for all columns."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (col_name, n_violations)"
    ).select(F.lit("not_null").alias("rule"), "col_name", "n_violations")


def accepted_values_violations(
    df: DataFrame, accepted: Mapping[str, Sequence]
) -> DataFrame:
    """dbt ``accepted_values`` analog: per column, rows whose (non-null)
    value is outside the accepted set.  One scan for all columns."""
    cols = list(accepted)
    aggs = [
        F.sum(
            F.when(F.col(c).isNotNull() & ~F.col(c).isin(list(accepted[c])), 1).otherwise(0)
        )
        .cast("long")
        .alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', {c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as (col_name, n_violations)"
    ).select(F.lit("accepted_values").alias("rule"), "col_name", "n_violations")


def expression_violations(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Named boolean invariants: a violation is a row where the predicate
    is NOT satisfied (false or NULL — SQL three-valued logic means a NULL
    predicate is "not known to hold", which is the conservative reading).
    One scan for all rules."""
    names = list(rules)
    aggs = [
        F.sum(F.when(F.coalesce(rules[n].cast("boolean"), F.lit(False)), 0).otherwise(1))
        .cast("long")
        .alias(f"_r{i}")
        for i, n in enumerate(names)
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{n}', _r{i}" for i, n in enumerate(names))
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) as (col_name, n_violations)"
    ).select(F.lit("expression").alias("rule"), "col_name", "n_violations")


def unique_violations(df: DataFrame, key_sets: Sequence[Sequence[str]]) -> DataFrame:
    """dbt ``unique`` analog: per key tuple, the number of DISTINCT key
    values that occur more than once (dbt counts duplicated keys, not
    duplicated rows).  One shuffle per key set — inherent to the check."""
    out = None
    for keys in key_sets:
        keys = list(keys)
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .filter(F.col("_cnt") > 1)
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(
                F.lit("unique").alias("rule"),
                F.lit(",".join(keys)).alias("col_name"),
                "n_violations",
            )
        )
        out = dup if out is None else out.unionByName(dup)
    return out


def dq_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    accepted_values: Mapping[str, Sequence] | None = None,
    expressions: Mapping[str, Column] | None = None,
    unique: Sequence[Sequence[str]] = (),
) -> DataFrame:
    """Full data-quality report: one row per (rule, column) with its
    violation count.  Row-local rule families each run in a single scan;
    ``unique`` rules add one shuffle each (see module docstring).

    Returns columns ``(rule, column, n_violations)``.
    """
    parts: list[DataFrame] = []
    if not_null:
        parts.append(not_null_violations(df, not_null))
    if accepted_values:
        parts.append(accepted_values_violations(df, accepted_values))
    if expressions:
        parts.append(expression_violations(df, expressions))
    if unique:
        parts.append(unique_violations(df, unique))
    if not parts:
        raise ValueError("dq_report: no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def enforce(df: DataFrame, predicate: Column) -> DataFrame:
    """Quarantine-style enforcement: rows violating ``predicate`` are
    dropped (the P5/P6 pattern as a reusable operator).  Pair with
    ``expression_violations`` to count what was dropped."""
    return df.filter(F.coalesce(predicate.cast("boolean"), F.lit(False)))


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple: how many
    equivalence classes (distinct quasi-identifier combinations) have
    fewer than ``k`` rows, and how many rows those classes expose — the
    re-identification screen run before releasing or training on
    tabular records (Sweeney 2002).

    Output one row: (k, n_groups, n_small_groups, n_exposed_rows,
    exposed_frac).  Shape: ONE shuffle (hash-groupBy on the quasi
    tuple, map-side combined) + a 1-row conditional rollup — the same
    cost as a grouped count at any scale.
    """
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )
    small = F.col("n") < k
    return groups.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0)).cast("long").alias("n_small_groups"),
        F.sum(F.when(small, F.col("n")).otherwise(0)).cast("long").alias(
            "n_exposed_rows"
        ),
        F.round(
            F.sum(F.when(small, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("exposed_frac"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive: Column | str,
    l: int = 3,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007), the
    companion to :func:`k_anonymity_report`: k-anonymity alone still
    leaks when every record in an equivalence class shares one
    sensitive value, so each class must also contain at least ``l``
    DISTINCT sensitive values.

    Output one row: (l, n_groups, n_low_groups, n_exposed_rows,
    exposed_frac, min_diversity).  Shape: one hash-groupBy on the quasi
    tuple with a count-distinct of the sensitive attribute (Spark
    expands the distinct into a two-phase partial aggregate — map-side
    combined, no extra full shuffle) + a 1-row conditional rollup.
    """
    sens = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.countDistinct(sens).alias("ndv"), F.count(F.lit(1)).alias("n")
    )
    low = F.col("ndv") < l
    return groups.agg(
        F.lit(l).alias("l"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(low, 1).otherwise(0)).cast("long").alias("n_low_groups"),
        F.sum(F.when(low, F.col("n")).otherwise(0)).cast("long").alias(
            "n_exposed_rows"
        ),
        F.round(
            F.sum(F.when(low, F.col("n")).otherwise(0)) / F.sum("n"), 6
        ).alias("exposed_frac"),
        F.min("ndv").cast("long").alias("min_diversity"),
    )

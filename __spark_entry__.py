"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 (core relational, scalar library, matching cascade, LLM-
pipeline extensions, streaming-batch views) with DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from firmable_company_data_pipeline_spark.queries import registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from firmable_company_data_pipeline_spark.queries.core import pricing_summary

    return pricing_summary(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = registry()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query (omitted for
    non-SQL-expressible operators → driver does a rows-only check)."""
    _, o = registry()
    return o

"""Driver-contract query registry.

Each submodule defines ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB-ANSI SQL on the same
parquet views). ``registry()`` merges them for ``__spark_entry__``.

Naming contract: every computed column is aliased identically in the Spark
plan and the oracle SQL — the driver sorts columns by name and hashes
values, so names and value round-tripping must agree exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from firmable_company_data_pipeline_spark.queries import (
        advanced,
        cleaning,
        core,
        llmops,
        maintenance,
        matching,
        scalar,
        scale,
        streaming_batch,
        training,
    )

    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in (
        core,
        scalar,
        matching,
        llmops,
        streaming_batch,
        cleaning,
        maintenance,
        advanced,
        scale,
        training,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles

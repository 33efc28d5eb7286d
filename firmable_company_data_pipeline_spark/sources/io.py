"""Sinks (SURVEY.md §2.1 S8-S11).

The reference's three load modes map onto Spark writer modes:

* drop/recreate (S9, extract/abr_parser.py:26-43) → ``mode("overwrite")``
* truncate-reload (S10, transform/data_cleaning.py:121-133) →
  ``mode("overwrite").option("truncate", "true")`` on JDBC
* batched inserts (S8, 50k/500k ``execute_values``) → JDBC ``batchsize``
  / parquet row groups — Spark writes are partition-parallel, the
  reference's manual batching is subsumed.

Parquet is the canonical store (partition-friendly, column-pruned);
JDBC is the optional compatibility sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Full-refresh parquet write (S9 semantics). ``partition_by`` enables
    partition pruning for downstream readers — at 100 TB, partition the
    silver layer by a low-cardinality pruning key (e.g. state)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    truncate: bool = False,
    batchsize: int = 50_000,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink with the reference's batch-size default
    (extract/abr_parser.py:20). ``truncate=True`` reproduces the
    truncate-reload mode (S10) without dropping the table's DDL."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", str(truncate).lower())
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()

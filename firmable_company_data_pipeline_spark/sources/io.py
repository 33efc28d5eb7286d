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

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source (S7, transform/data_cleaning.py:92-100).

    ``table`` may be a table name or a parenthesized subquery alias —
    Catalyst pushes filters/aggregates into the remote database (DSv2
    pushdown), which is the Spark analog of the reference running its
    stage-1 join inside Postgres (transform/entity_matching.py:113-135).

    At scale, pass ``partition_column``/bounds/``num_partitions`` (or
    explicit ``predicates``) so the read is split across executors —
    the distributed replacement for the reference's ORDER/OFFSET/FETCH
    pagination (O1, transform/entity_matching.py:95-110).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if predicates:
        # Spark's predicate-list API lives on the classic reader path.
        props = dict(properties or {})
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    return reader.load()


def write_overwrite(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Full-refresh parquet write (S9 semantics). ``partition_by`` enables
    partition pruning for downstream readers — at 100 TB, partition the
    silver layer by a low-cardinality pruning key (e.g. state)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed managed-table write: the Spark analog of the reference's
    B-tree indexes on join keys (``db/ddl_scripts.sql:93-120``).

    Two tables bucketed on the same keys with the same bucket count
    join WITHOUT a shuffle — each bucket pairs up by file, which is the
    layout to give a 100 TB fact table that is repeatedly joined on the
    same key (e.g. lineitem/orders on orderkey, or the matching layers
    on abn/postcode).  ``sort_cols`` additionally pre-sorts within
    buckets so sort-merge joins skip their sort.

    Bucketing requires the table-catalog write path (``saveAsTable``);
    plain ``.parquet(path)`` writes cannot carry bucket metadata.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


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

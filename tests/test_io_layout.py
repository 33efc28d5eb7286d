"""Lenient CSV ingestion and pruning-optimized parquet layout."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from firmable_company_data_pipeline_spark.sources.io import (
    read_csv_lenient,
    write_bucketed,
    write_sorted,
    write_zorder,
)

CSV_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("n", LongType()),
    ]
)


def test_read_csv_lenient_quarantines_ragged_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("1,alpha,10\n2,beta,not_a_number\n3,gamma,30\n")
    df = read_csv_lenient(spark, str(p), CSV_SCHEMA)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["n"] == 10 and rows[1]["_corrupt_record"] is None
    assert rows[3]["n"] == 30
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]


def test_read_csv_lenient_passes_options(spark, tmp_path):
    p = tmp_path / "in.tsv"
    p.write_text("id\tname\tn\n7\tdelta\t70\n")
    df = read_csv_lenient(spark, str(p), CSV_SCHEMA, header=True, sep="\t")
    # NOTE: Spark forbids plans whose only referenced column is the
    # internal corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    # — collect the full rows, as a quarantine router would.
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == "delta" and rows[0]["_corrupt_record"] is None


def test_write_sorted_layout_prunes(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("part"),
        (999 - F.col("id")).alias("k"),
    )
    out = str(tmp_path / "sorted")
    write_sorted(df, out, partition_by=["part"], sort_cols=["k"], target_partitions=4)
    # directory partitioning materialized
    dirs = sorted(os.path.basename(d) for d in glob.glob(f"{out}/part=*"))
    assert dirs == ["part=0", "part=1", "part=2", "part=3"]
    # rows are clustered by k within each file -> row-group min/max selective
    for f in glob.glob(f"{out}/part=*/*.parquet"):
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)
    # round-trips with the expected per-partition split
    back = spark.read.parquet(out)
    assert back.count() == 1000
    # partition-column type inference reads part= values back as ints
    per_part = {r["part"]: r["count"] for r in back.groupBy("part").count().collect()}
    assert per_part == {0: 250, 1: 250, 2: 250, 3: 250}


def test_write_zorder_clusters_both_dims(spark, tmp_path):
    # A grid where x and y are independent: a single-column sort layout
    # clusters x perfectly and leaves every file spanning y's full
    # range; Z-order must bound the per-file span of BOTH columns.
    n = 64
    df = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    out = str(tmp_path / "zorder")
    write_zorder(df, out, zorder_cols=["x", "y"], bits=6, target_partitions=16)

    spans = {"x": [], "y": []}
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = {"x": None, "y": None}
        hi = {"x": None, "y": None}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in lo:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        for c in ("x", "y"):
            spans[c].append((hi[c] - lo[c]) / (n - 1))
    # Every row survived the round trip.
    assert spark.read.parquet(out).count() == n * n
    # With 16 range partitions of a 2-D Morton curve each file covers a
    # quadrant-ish hyper-rectangle: mean span far below the full range
    # in BOTH dimensions (a lexicographic sort would put ~1.0 on y).
    for c in ("x", "y"):
        mean_span = sum(spans[c]) / len(spans[c])
        assert mean_span <= 0.6, (c, spans[c])


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    big = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    other = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("b")
    )
    try:
        write_bucketed(big, "t_big", ["k"], n_buckets=4)
        write_bucketed(other, "t_other", ["k"], n_buckets=4)
        l, r = spark.table("t_big"), spark.table("t_other")
        joined = l.join(r.hint("merge"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: sort-merge join with ZERO shuffles on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 10_000
        # bucket-key aggregation also skips its shuffle
        agg = l.groupBy("k").agg(F.sum("a").alias("s"))
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_big")
        spark.sql("DROP TABLE IF EXISTS t_other")

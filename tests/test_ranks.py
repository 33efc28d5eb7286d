"""operators/ranks: distributed global rank / ntile / prefix-agg must
be bit-identical to the engine's single-partition window forms, while
never moving the full frame through one reducer."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.operators import ranks as rk


def _sample(spark, n=500, seed=11):
    import random

    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 40), rng.randint(-5, 5)) for i in range(n)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "id long, v long, d long")


def test_exact_global_row_number_matches_window(spark):
    df = _sample(spark)
    got = {
        r["id"]: r["rn"]
        for r in rk.exact_global_row_number(df, ["v", "id"]).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
        ).collect()
    }
    assert got == want
    # the scale property itself: the plan range-partitions the frame and
    # the only windows run per physical partition / over the tiny
    # per-partition counts, never over the unpartitioned full frame.
    # Since r13 _range_partitioned cuts lineage with a lazy
    # localCheckpoint, hiding the range exchange behind a LogicalRDD
    # leaf — make the checkpoint transparent while building the plan
    # (identity: it truncates lineage, never changes the computed plan).
    cls = type(df)
    orig = cls.localCheckpoint
    cls.localCheckpoint = lambda self, eager=True: self
    try:
        plan = (
            rk.exact_global_row_number(df, ["v", "id"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        cls.localCheckpoint = orig
    assert "rangepartitioning" in plan


def test_exact_ntile_matches_engine_ntile(spark):
    # 503 rows over 10 buckets: N % n != 0 exercises the fat buckets
    df = _sample(spark, n=503, seed=3)
    for n_buckets in (4, 10):
        got = {
            r["id"]: r["bucket"]
            for r in rk.exact_ntile(df, n_buckets, ["v", "id"]).collect()
        }
        want = {
            r["id"]: r["nt"]
            for r in df.select(
                "id",
                F.ntile(n_buckets).over(Window.orderBy("v", "id")).alias("nt"),
            ).collect()
        }
        assert got == want
    # fewer rows than buckets: ntile degenerates to the row number
    tiny = _sample(spark, n=7, seed=5)
    got = {
        r["id"]: r["bucket"] for r in rk.exact_ntile(tiny, 10, ["v", "id"]).collect()
    }
    want = {
        r["id"]: r["nt"]
        for r in tiny.select(
            "id", F.ntile(10).over(Window.orderBy("v", "id")).alias("nt")
        ).collect()
    }
    assert got == want


def test_prefix_agg_matches_window_frames(spark):
    df = _sample(spark, n=400, seed=9)
    for fn, inclusive in (("max", True), ("max", False), ("sum", True), ("sum", False)):
        end = 0 if inclusive else -1
        w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, end)
        agg = {"max": F.max, "sum": F.sum}[fn]
        want = {
            r["id"]: r["p"]
            for r in df.select("id", agg("d").over(w).alias("p")).collect()
        }
        got = {
            r["id"]: r["prefix"]
            for r in rk.prefix_agg(
                df, ["v", "id"], "d", fn=fn, inclusive=inclusive
            ).collect()
        }
        assert got == want, f"{fn} inclusive={inclusive}"


def test_prefix_agg_rejects_unknown_fn(spark):
    import pytest

    with pytest.raises(ValueError, match="max/sum"):
        rk.prefix_agg(_sample(spark, n=4), ["id"], "d", fn="avg")

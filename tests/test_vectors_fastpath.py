"""The dimension-unrolled dot/norm2/cosine fast path (round 13) must be
bit-identical to the sequential HOF fold — same IEEE-754 ops in the same
order — and must fall back to the fold for rows whose array length
differs from the probed dimension."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.functions.vectors import (
    cosine,
    dot,
    norm2,
    probe_dim,
    to_double,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [0.1, 0.2, 0.3, 0.4], [1.5, -2.25, 3.125, 0.0625]),
        (2, [1e-30, 1e30, -1e30, 1.0], [1.0, 1.0, 1.0, 1.0]),  # cancellation order matters
        (3, [0.1] * 4, [0.3] * 4),
        (4, [float(i) / 7.0 for i in range(4)], [float(3 - i) / 11.0 for i in range(4)]),
    ]
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def test_unrolled_bit_identical(vec_df):
    d = probe_dim(vec_df, "a")
    assert d == 4
    out = vec_df.select(
        dot(F.col("a"), F.col("b")).alias("dot_fold"),
        dot(F.col("a"), F.col("b"), d).alias("dot_fast"),
        norm2(F.col("a")).alias("n2_fold"),
        norm2(F.col("a"), d).alias("n2_fast"),
        cosine(F.col("a"), F.col("b")).alias("cos_fold"),
        cosine(F.col("a"), F.col("b"), d).alias("cos_fast"),
    ).collect()
    for r in out:
        # exact bit equality, not approx: the fast path must be the SAME
        # sequential left fold, just unrolled
        assert math.isclose(r["dot_fold"], r["dot_fast"], rel_tol=0.0, abs_tol=0.0)
        assert math.isclose(r["n2_fold"], r["n2_fast"], rel_tol=0.0, abs_tol=0.0)
        assert math.isclose(r["cos_fold"], r["cos_fast"], rel_tol=0.0, abs_tol=0.0)


def test_size_mismatch_falls_back(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]), (2, [1.0, 2.0], [3.0, 4.0])],
        "id long, a array<double>, b array<double>",
    )
    # probe says 3; row 2 has length 2 and must take the fold branch
    out = {
        r["id"]: (r["fast"], r["fold"])
        for r in df.select(
            "id",
            dot(F.col("a"), F.col("b"), 3).alias("fast"),
            dot(F.col("a"), F.col("b")).alias("fold"),
        ).collect()
    }
    assert out[1][0] == out[1][1] == 32.0
    assert out[2][0] == out[2][1] == 11.0


def test_float_widening_matches(spark):
    # array<float> inputs widen exactly; unrolled path agrees with fold
    df = spark.createDataFrame(
        [(1, [0.1, 0.7, -0.3],)], "id long, v array<float>"
    )
    r = df.select(
        norm2(to_double(F.col("v"))).alias("fold"),
        norm2(to_double(F.col("v")), 3).alias("fast"),
    ).first()
    assert r["fold"] == r["fast"]


def test_probe_dim_empty(spark):
    empty = spark.createDataFrame([], "id long, v array<double>")
    assert probe_dim(empty, "v") is None


def test_unroll_cap_uses_fold(spark):
    """advice r13: d beyond UNROLL_MAX_D must not expand to ~6d codegen
    nodes (JVM 64KB method-limit risk) — the builders return the plain
    HOF fold expression, value-identical by construction."""
    from firmable_company_data_pipeline_spark.functions.vectors import (
        UNROLL_MAX_D,
    )

    big = UNROLL_MAX_D + 1
    rows = [(1, [float(i % 7) / 3.0 for i in range(big)],
             [float((i + 2) % 5) / 9.0 for i in range(big)])]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    capped = dot(F.col("a"), F.col("b"), big)
    # no element_at unroll in the capped expression tree
    assert "element_at" not in str(capped)
    out = df.select(
        capped.alias("fast"), dot(F.col("a"), F.col("b")).alias("fold")
    ).collect()[0]
    assert math.isclose(out["fast"], out["fold"], rel_tol=0.0, abs_tol=0.0)
    # at or below the cap the unroll still fires
    assert "element_at" in str(dot(F.col("a"), F.col("b"), UNROLL_MAX_D))


def test_dot_literal_bit_identical(spark):
    """dot_literal (r14, the mmr penalty form) must equal both the
    array-literal unrolled dot and the HOF fold bit-for-bit, and fall
    back to the fold on size-mismatched rows."""
    from firmable_company_data_pipeline_spark.functions.vectors import (
        dot_literal,
    )

    lit = [1.5, -2.25, 3.125, 0.0625]
    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4]), (2, [1e-30, 1e30, -1e30, 1.0]),
         (3, [7.0, 11.0])],  # short row -> fold branch
        "id long, a array<double>",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            dot_literal(F.col("a"), lit).alias("lit_path"),
            dot(F.col("a"), F.lit(lit), 4).alias("arr_path"),
            dot(F.col("a"), F.lit(lit)).alias("fold"),
        ).collect()
    }
    for rid, r in out.items():
        if r["fold"] is None:
            # short row: zip_with pads with NULL, every path yields NULL
            assert r["lit_path"] is None and r["arr_path"] is None, rid
            continue
        assert math.isclose(r["lit_path"], r["arr_path"], rel_tol=0.0, abs_tol=0.0), rid
        assert math.isclose(r["lit_path"], r["fold"], rel_tol=0.0, abs_tol=0.0), rid
    # and the literal path is the SMALL tree: no CreateArray inside the
    # unrolled branch (one array literal only in the fold fallback)
    s = str(dot_literal(F.col("a"), lit))
    assert s.count("array(") <= 1

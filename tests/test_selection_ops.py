"""Unit tests for the round-12 selection/audit pack: weighted reservoir
sampling, per-source token-budget nucleus selection, char-entropy
screening, Benford DQ audit, and the supplier skyline (brute-force
dominance check at the tiny SF)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.queries.selection import (
    _SAMPLE_K,
    _NUCLEUS_P,
    char_entropy,
    nucleus_token_budget,
    weighted_corpus_sample,
)
from firmable_company_data_pipeline_spark.queries.warehouse import (
    benford_revenue_audit,
    skyline_suppliers,
    _BENFORD_EXP,
)


# ---------------------------------------------------------------- sampling
def test_weighted_sample_shape_and_determinism(spark, sf_dir):
    out = weighted_corpus_sample(spark, sf_dir)
    rows = out.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == min(_SAMPLE_K, n_docs)
    ids = [r.doc_id for r in rows]
    assert len(set(ids)) == len(ids)
    keys = [r.sample_key for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert all(k <= 0.0 for k in keys)  # ln(u)/w with u in (0,1]
    again = weighted_corpus_sample(spark, sf_dir).collect()
    assert sorted(ids) == sorted(r.doc_id for r in again)


def test_weighted_sample_plan_is_take_ordered(spark, sf_dir):
    plan = weighted_corpus_sample(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]


# ---------------------------------------------------------------- nucleus
def test_nucleus_budget_prefix_and_bound(spark, sf_dir):
    out = nucleus_token_budget(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.src_rank)
        src_chars = rows[0].src_chars
        budget = math.ceil(src_chars * _NUCLEUS_P)
        kept = [r for r in rows if r.keep]
        # the keep set is a rank prefix and never empty
        assert kept and [r.src_rank for r in kept] == list(range(1, len(kept) + 1))
        # every kept row beyond the guaranteed first respects the budget
        assert all(r.cum_chars <= budget for r in kept if r.src_rank > 1)
        # the first dropped row (if any) would have blown the budget
        if len(kept) < len(rows):
            assert rows[len(kept)].cum_chars > budget
        # cum_chars is strictly increasing along the rank order
        cums = [r.cum_chars for r in rows]
        assert cums == sorted(cums) and rows[-1].cum_chars == src_chars


# ---------------------------------------------------------------- entropy
def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "aaaa"),  # single symbol: 0 bits -> suspect (low)
            (2, "abcd"),  # uniform over 4: exactly 2 bits -> not suspect
            (3, "aAbBcCdD" * 2),  # lowercased -> same 2 bits
            (4, "KxQz9mW3pLr7Tf2VbN8sJdYcHg4uEiAo"),  # random-ish: high
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert got[1].entropy_bits == 0.0 and got[1].suspect
    assert got[2].entropy_bits == 2.0 and not got[2].suspect
    assert got[3].entropy_bits == 2.0 and got[3].n_chars_counted == 16
    assert got[4].entropy_bits == 5.0 and got[4].n_chars_counted == 32


# ---------------------------------------------------------------- benford
def test_benford_audit_frame(spark, sf_dir):
    rows = benford_revenue_audit(spark, sf_dir).collect()
    digits = sorted(r.digit for r in rows)
    assert set(digits) <= set(range(1, 10))
    assert abs(sum(r.obs_frac for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.exp_frac - round(_BENFORD_EXP[r.digit - 1], 6)) < 1e-9
        assert r.chi2_term >= 0.0
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders


# ---------------------------------------------------------------- skyline
def test_skyline_matches_bruteforce(spark, sf_dir):
    sky = {r.suppkey for r in skyline_suppliers(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"))
    )
    pts = [
        (r.s_suppkey, float(r.rev or 0.0), float(r.s_acctbal))
        for r in sup.join(rev, sup.s_suppkey == rev.l_suppkey, "left").select(
            "s_suppkey", "rev", "s_acctbal"
        ).collect()
    ]
    brute = {
        k
        for (k, rv, b) in pts
        if not any(
            (rv2 >= rv and b2 >= b and (rv2 > rv or b2 > b))
            for (k2, rv2, b2) in pts
            if k2 != k
        )
    }
    assert sky == brute and sky


# ------------------------------------------------------------- ks / mad
def _write_orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_orderpriority string, o_totalprice decimal(15,2)"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    return str(tmp_path)


def test_ks_drift_known_values(spark, tmp_path):
    import datetime as dt
    from decimal import Decimal

    from firmable_company_data_pipeline_spark.queries.advanced import ks_drift_orders

    d97, d98 = dt.date(1997, 6, 1), dt.date(1998, 6, 1)
    # F_a jumps at {1,2}, F_b at {2,4}: sup|F_a-F_b| = 0.5
    rows = [
        (1, d97, "P", Decimal("1.00")),
        (2, d97, "P", Decimal("2.00")),
        (3, d98, "P", Decimal("2.00")),
        (4, d98, "P", Decimal("4.00")),
    ]
    out = ks_drift_orders(spark, _write_orders(spark, tmp_path, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b, r.ks_stat) == (2, 2, 0.5)


def test_ks_drift_identical_samples_is_zero(spark, tmp_path):
    import datetime as dt
    from decimal import Decimal

    from firmable_company_data_pipeline_spark.queries.advanced import ks_drift_orders

    d97, d98 = dt.date(1997, 1, 2), dt.date(1998, 1, 2)
    rows = []
    for i, v in enumerate(["10.00", "20.00", "30.00"]):
        rows.append((i, d97, "P", __import__("decimal").Decimal(v)))
        rows.append((100 + i, d98, "P", __import__("decimal").Decimal(v)))
    r = ks_drift_orders(spark, _write_orders(spark, tmp_path, rows)).collect()[0]
    assert r.ks_stat == 0.0


def test_mad_outliers_known_values(spark, tmp_path):
    import datetime as dt
    from decimal import Decimal

    from firmable_company_data_pipeline_spark.queries.advanced import (
        order_price_outliers_mad,
    )

    d = dt.date(1995, 1, 1)
    prices = ["1.00", "2.00", "3.00", "4.00", "100.00"]
    rows = [(i, d, "1-URGENT", Decimal(p)) for i, p in enumerate(prices)]
    r = order_price_outliers_mad(spark, _write_orders(spark, tmp_path, rows)).collect()[0]
    # med = 3 (rank ceil(2.5)=3), adevs sorted [0,1,1,2,97] -> mad = 1,
    # outliers: adev > 3*1 -> only the 100.00 row
    assert r.median_price == 3.0 and r.mad_price == 1.0
    assert r.n_outliers == 1 and r.n_orders == 5
    assert abs(r.outlier_frac - 0.2) < 1e-9

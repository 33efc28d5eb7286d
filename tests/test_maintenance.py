"""Unit tests for the warehouse-maintenance operators: data-quality
report (dbt-analog rules the reference defers to dbt, README.md:227-237)
and SCD1/SCD2 dimension merges (replacing the reference's drop/recreate
loads, transform/entity_matching.py:37-55)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.operators.merge import merge_upsert, scd2_apply
from firmable_company_data_pipeline_spark.operators.quality import dq_report, enforce


def _report_dict(df):
    return {(r["rule"], r["col_name"]): r["n_violations"] for r in df.collect()}


def test_dq_report_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (2, "B", -5.0),
            (3, None, 0.0),
            (3, "Z", None),
            (4, "A", 2.0),
        ],
        "id long, status string, amount double",
    )
    rep = _report_dict(
        dq_report(
            df,
            not_null=["status", "amount"],
            accepted_values={"status": ["A", "B"]},
            expressions={"positive_amount": F.col("amount") > 0},
            unique=[["id"]],
        )
    )
    assert rep[("not_null", "status")] == 1
    assert rep[("not_null", "amount")] == 1
    # NULL status rows are not accepted-values violations (dbt semantics).
    assert rep[("accepted_values", "status")] == 1  # only 'Z'
    # -5.0 fails, 0.0 fails, NULL fails (conservative three-valued logic).
    assert rep[("expression", "positive_amount")] == 3
    # id=3 occurs twice → one duplicated key.
    assert rep[("unique", "id")] == 1


def test_enforce_drops_violations(spark):
    df = spark.createDataFrame([(1, 5.0), (2, -1.0), (3, None)], "id long, v double")
    kept = enforce(df, F.col("v") > 0).collect()
    assert [r["id"] for r in kept] == [1]


def test_merge_upsert_actions(spark):
    current = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    updates = spark.createDataFrame(
        [(2, "b2", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    out = {
        r["k"]: r
        for r in merge_upsert(current, updates, ["k"], with_action=True).collect()
    }
    assert len(out) == 4
    assert out[1]["merge_action"] == "keep" and out[1]["name"] == "a"
    assert out[2]["merge_action"] == "update" and out[2]["name"] == "b2"
    assert out[3]["merge_action"] == "unchanged" and out[3]["name"] == "c"
    assert out[4]["merge_action"] == "insert" and out[4]["name"] == "d"


def test_merge_upsert_null_safe_change_detection(spark):
    current = spark.createDataFrame([(1, None)], "k long, name string")
    updates = spark.createDataFrame([(1, None)], "k long, name string")
    row = merge_upsert(current, updates, ["k"], with_action=True).collect()[0]
    # NULL == NULL must count as unchanged (eqNullSafe, not =).
    assert row["merge_action"] == "unchanged"


def test_scd2_apply_versions(spark):
    d = datetime.datetime
    dim = spark.createDataFrame(
        [
            # closed history row for k=1
            (1, "old", d(2020, 1, 1), d(2021, 1, 1)),
            # open rows
            (1, "v1", d(2021, 1, 1), None),
            (2, "w1", d(2021, 1, 1), None),
            (3, "x1", d(2021, 1, 1), None),
        ],
        "k long, attr string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [
            (1, "v2", d(2022, 6, 1)),  # changed → close + open
            (2, "w1", d(2022, 6, 1)),  # identical → untouched
            (9, "new", d(2022, 6, 1)),  # new key → insert open row
        ],
        "k long, attr string, as_of timestamp",
    )
    out = scd2_apply(dim, updates, ["k"]).collect()
    rows = {(r["k"], r["attr"]): r for r in out}
    assert len(out) == 6
    # closed history passes through untouched
    assert rows[(1, "old")]["valid_to"] == d(2021, 1, 1)
    # k=1: v1 closed at as_of, v2 opened at as_of
    assert rows[(1, "v1")]["valid_to"] == d(2022, 6, 1)
    assert rows[(1, "v2")]["valid_from"] == d(2022, 6, 1)
    assert rows[(1, "v2")]["valid_to"] is None
    # k=2 unchanged: still the original open row
    assert rows[(2, "w1")]["valid_from"] == d(2021, 1, 1)
    assert rows[(2, "w1")]["valid_to"] is None
    # k=3 untouched by updates
    assert rows[(3, "x1")]["valid_to"] is None
    # k=9 inserted open
    assert rows[(9, "new")]["valid_from"] == d(2022, 6, 1)
    assert rows[(9, "new")]["valid_to"] is None


def test_column_profile_exact_and_approx(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", None), (3, None, 4.0), (3, "b", 7.0)],
        "id long, s string, v double",
    )
    from firmable_company_data_pipeline_spark.operators.profile import column_profile

    prof = {r["col_name"]: r for r in column_profile(df).collect()}
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_distinct"] == 3
    assert prof["s"]["n_nulls"] == 1
    assert prof["s"]["min_val"] is None  # non-numeric: no range stats
    assert prof["v"]["n_nulls"] == 1
    assert prof["v"]["min_val"] == 1.0 and prof["v"]["max_val"] == 7.0
    assert abs(prof["v"]["avg_val"] - 4.0) < 1e-9

    approx = {r["col_name"]: r for r in column_profile(df, approx=True).collect()}
    # HLL estimates are exact at this cardinality
    assert approx["id"]["n_distinct"] == 3


def test_skew_report_ranks_heavy_hitters(spark, sf_dir):
    from firmable_company_data_pipeline_spark.operators.profile import skew_report
    from firmable_company_data_pipeline_spark.session import load_tables

    ev = load_tables(spark, sf_dir, "events")["events"]
    rows = skew_report(ev, "user_id", top_k=5).collect()
    assert len(rows) == 5
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    total = ev.count()
    for r in rows:
        assert abs(r.share - r.n_rows / total) < 1e-6


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from firmable_company_data_pipeline_spark.sources.io import compact_parquet, dir_stats
    from firmable_company_data_pipeline_spark.session import load_tables

    path = str(tmp_path / "frag")
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    orders.repartition(16).write.parquet(path)
    before_rows = spark.read.parquet(path).count()
    _, files_before = dir_stats(spark, path)
    assert files_before >= 16

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == files_before
    assert stats["files_after"] == 1
    # contents unchanged, no leftover temp dirs
    assert spark.read.parquet(path).count() == before_rows
    import os

    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__pre_compact")


def test_recover_compaction_restores_interrupted_swap(spark, sf_dir, tmp_path):
    """Simulate a crash between compact_parquet's two renames: the table
    path is gone, data stranded in __pre_compact, stale __compacting
    output present.  recover_compaction must restore the table."""
    import os
    import shutil

    from firmable_company_data_pipeline_spark.sources.io import recover_compaction
    from firmable_company_data_pipeline_spark.session import load_tables

    path = str(tmp_path / "crashed")
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    orders.write.parquet(path)
    n = spark.read.parquet(path).count()

    # crash state: path -> __pre_compact done, tmp not yet swapped in
    os.rename(path, path + "__pre_compact")
    os.makedirs(path + "__compacting")
    with open(path + "__compacting/part-stale.parquet", "w") as f:
        f.write("stale")

    assert recover_compaction(spark, path) == "restored_from_pre_compact"
    assert spark.read.parquet(path).count() == n
    assert not os.path.exists(path + "__pre_compact")
    assert not os.path.exists(path + "__compacting")
    # idempotent: nothing to do on a healthy table
    assert recover_compaction(spark, path) is None
    shutil.rmtree(path)


def test_incremental_append_high_water_mark(spark, sf_dir, tmp_path):
    from firmable_company_data_pipeline_spark.sources.io import incremental_append
    from firmable_company_data_pipeline_spark.session import load_tables

    sink = str(tmp_path / "inc")
    ev = load_tables(spark, sf_dir, "events")["events"]
    first = ev.filter("event_id < 500")
    n1 = incremental_append(spark, first, sink, "event_id")
    assert n1 == first.count()

    # overlapping re-run: only rows past the watermark land
    second = ev.filter("event_id < 800")
    n2 = incremental_append(spark, second, sink, "event_id")
    assert n2 == ev.filter("event_id >= 500 AND event_id < 800").count()
    assert spark.read.parquet(sink).count() == n1 + n2

    # idempotent re-run appends nothing
    assert incremental_append(spark, second, sink, "event_id") == 0


def test_rollup_merge_equals_full_recompute(spark):
    from firmable_company_data_pipeline_spark.operators.merge import rollup_merge

    rows = [
        ("a", 1, 10.0), ("a", 2, 5.0), ("b", 1, 7.0),
        ("a", 3, 1.0), ("c", 9, 2.5), ("b", 2, 7.5),
    ]
    df = spark.createDataFrame(rows, "k string, n long, v double")

    def roll(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n").alias("sum_n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )

    base = roll(df.filter(F.col("n") <= 2))
    delta = roll(df.filter(F.col("n") > 2))  # 'c' only in delta, 'b' only in base
    merged = rollup_merge(
        base, delta, keys=["k"],
        metrics={"n_rows": "sum", "sum_n": "sum", "min_v": "min", "max_v": "max"},
    )
    got = {r["k"]: (r["n_rows"], r["sum_n"], r["min_v"], r["max_v"]) for r in merged.collect()}
    exp = {r["k"]: (r["n_rows"], r["sum_n"], r["min_v"], r["max_v"]) for r in roll(df).collect()}
    assert got == exp
    # unsupported combiner rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rollup_merge(base, delta, keys=["k"], metrics={"n_rows": "avg"})


def test_scd2_rebuild_compacts_change_feed(spark):
    from firmable_company_data_pipeline_spark.operators.merge import scd2_rebuild

    feed = spark.createDataFrame(
        [
            # k1: A, A (compact), B, B (compact), A again (new range)
            ("k1", 1, "A"), ("k1", 2, "A"), ("k1", 3, "B"),
            ("k1", 4, "B"), ("k1", 5, "A"),
            # k2: single observation -> one open range
            ("k2", 7, "X"),
            # k3: first observation has a NULL value (the eqNullSafe trap)
            ("k3", 1, None), ("k3", 2, None), ("k3", 3, "Y"),
        ],
        "k string, ts int, v string",
    )
    out = {
        (r["k"], r["valid_from"]): (r["v"], r["valid_to"])
        for r in scd2_rebuild(feed, ["k"], "ts", ["v"]).collect()
    }
    assert out == {
        ("k1", 1): ("A", 3),
        ("k1", 3): ("B", 5),
        ("k1", 5): ("A", None),
        ("k2", 7): ("X", None),
        ("k3", 1): (None, 3),   # NULL-valued first row kept, NULL run compacted
        ("k3", 3): ("Y", None),
    }


def test_corpus_drift_psi_nonnegative_and_stable(spark, sf_dir):
    # PSI terms (p2-p1)*ln(p2/p1) are sign-coherent, so psi >= 0 always;
    # the synthesized v2 snapshot (drops+edits+adds) must register SOME
    # drift in at least one source, and the fold is deterministic.
    from firmable_company_data_pipeline_spark.queries.maintenance import (
        corpus_drift_psi,
    )

    out = corpus_drift_psi(spark, sf_dir).collect()
    n_sources = {r["source"] for r in out}
    assert len(out) == len(n_sources)  # one row per source
    assert all(r["psi"] >= 0.0 for r in out)
    assert any(r["psi"] > 0.0 for r in out)
    again = {r["source"]: r["psi"] for r in corpus_drift_psi(spark, sf_dir).collect()}
    assert {r["source"]: r["psi"] for r in out} == again


def test_corpus_drift_psi_hand_computed(spark, tmp_path):
    # Reference implementation of the whole chain (v2 synthesis ->
    # fixed-width buckets -> +0.5 smoothing -> sequential fold ->
    # HALF_UP 6) in plain Python over a controlled corpus that hits
    # every v2 branch (drop %13, edit %7, add %11).
    import math

    rows = [
        (i, "x" * ((i * 37) % 550 + 10), "sA" if i % 2 else "sB")
        for i in range(1, 29)
    ]
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    from firmable_company_data_pipeline_spark.queries.maintenance import (
        corpus_drift_psi,
    )

    got = {
        r["source"]: r["psi"]
        for r in corpus_drift_psi(spark, str(tmp_path)).collect()
    }

    def bucket(n):
        return min(9, n // 60)

    v1 = [(i, len(t), s) for i, t, s in rows]
    v2 = [
        (i, len(t) + (3 if i % 7 == 0 else 0), s)
        for i, t, s in rows
        if i % 13 != 0
    ] + [(-(i + 1), len(t), s) for i, t, s in rows if i % 11 == 0]
    for src in ("sA", "sB"):
        c1, c2 = [0] * 10, [0] * 10
        for _, n, s in v1:
            if s == src:
                c1[bucket(n)] += 1
        for _, n, s in v2:
            if s == src:
                c2[bucket(n)] += 1
        n1, n2 = sum(c1), sum(c2)
        psi = 0.0
        for b in range(10):
            # ALL 10 buckets contribute — an empty-in-both bucket still
            # carries its smoothing term when n1 != n2 (review r8)
            p1 = (c1[b] + 0.5) / (n1 + 5.0)
            p2 = (c2[b] + 0.5) / (n2 + 5.0)
            psi += (p2 - p1) * math.log(p2 / p1)
        expect = math.floor(psi * 1e6 + 0.5) / 1e6
        assert got[src] == pytest.approx(expect, abs=2e-6), (src, got[src], expect)


def test_embedding_drift_identical_and_orthogonal(spark, tmp_path):
    # label 0: even and odd snapshots have IDENTICAL centroids -> 1.0;
    # label 1: even centroid (1,0), odd centroid (0,1) -> 0.0.
    import pandas as pd

    rows = [
        (0, [1.0, 2.0], 0), (1, [1.0, 2.0], 0),
        (2, [3.0, 4.0], 0), (3, [3.0, 4.0], 0),
        (4, [1.0, 0.0], 1), (5, [0.0, 1.0], 1),
        (6, [1.0, 0.0], 1), (7, [0.0, 1.0], 1),
    ]
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        str(tmp_path / "embeddings.parquet")
    )
    from firmable_company_data_pipeline_spark.queries.llmops import (
        embedding_drift,
    )

    got = {
        r["label"]: r["centroid_cos"]
        for r in embedding_drift(spark, str(tmp_path)).collect()
    }
    assert got[0] == pytest.approx(1.0, abs=1e-6)
    assert got[1] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Bloom-filtered semi-join (round 12): exactness vs the plain semi-join
# and the superset property of the prefilter stage.
def test_bloom_semi_join_equals_plain_semi(spark):
    from firmable_company_data_pipeline_spark.operators.joins import bloom_semi_join
    from firmable_company_data_pipeline_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001", "lineitem", "orders")
    import pyspark.sql.functions as F

    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    got = bloom_semi_join(
        t["lineitem"], urgent, left_key="l_orderkey", right_key="o_orderkey"
    )
    want = t["lineitem"].join(
        urgent.select("o_orderkey").distinct(),
        t["lineitem"]["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_bloom_semi_join_tiny_bits_still_exact(spark):
    # 64 bits over 50 build keys -> dense vector, many false positives:
    # the verify stage must still return the exact semi-join.
    from firmable_company_data_pipeline_spark.operators.joins import bloom_semi_join

    left = spark.createDataFrame([(i,) for i in range(500)], "k long")
    right = spark.createDataFrame([(i * 7,) for i in range(50)], "r long")
    out = bloom_semi_join(left, right, left_key="k", right_key="r", n_bits=64)
    got = sorted(r.k for r in out.collect())
    assert got == sorted(i * 7 for i in range(50) if i * 7 < 500)


# ---------------------------------------------------------------------------
# KMV bottom-k distinct sketch (round 12).
def test_kmv_distinct_exact_below_k_and_bounded_error_above(spark):
    from firmable_company_data_pipeline_spark.operators.sketches import kmv_distinct

    rows = [("small", i % 10) for i in range(100)] + [
        ("big", i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, u long")
    out = {r.g: r for r in kmv_distinct(df, "g", "u", k=64).collect()}
    # below k: the sketch IS the exact count
    assert out["small"].n_exact == 10
    assert out["small"].est_distinct == 10.0
    assert out["small"].rel_err == 0.0
    # above k: estimator within the ~4/sqrt(k) tail bound (k=64 -> 50%)
    assert out["big"].n_exact == 5000
    assert abs(out["big"].est_distinct - 5000) / 5000 < 0.5
    assert out["big"].rel_err == round(abs(out["big"].est_distinct - 5000) / 5000, 4)


def test_kmv_intersection_estimates_overlap(spark):
    from firmable_company_data_pipeline_spark.operators.sketches import (
        kmv_intersection,
    )

    a = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(500, 1500)], "k long")
    row = kmv_intersection(a, "k", b, "k", k=64).collect()[0]
    assert row.n_sketch_a == 64 and row.n_sketch_b == 64
    # true union 1500, overlap 500, jaccard 1/3 — KMV with k=64 has
    # ~1/sqrt(64) relative sd; assert the loose 50% tail bound
    assert abs(row.est_union - 1500) / 1500 < 0.5
    assert abs(row.est_overlap - 500) / 500 < 0.75
    assert 0.05 < row.est_jaccard < 0.7
    # disjoint sets: overlap estimate must collapse to ~0
    c = spark.createDataFrame([(i,) for i in range(5000, 6000)], "k long")
    row2 = kmv_intersection(a, "k", c, "k", k=64).collect()[0]
    assert row2.est_jaccard < 0.1


# ---------------------------------------------------------------------------
# as-of join directions + tolerance (round 12, pandas merge_asof parity).
def test_asof_join_directions_and_tolerance(spark):
    from firmable_company_data_pipeline_spark.operators.temporal import asof_join

    quotes = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 20, 2, "b"), (1, 20, 3, "b2"), (1, 40, 4, "c")],
        "k long, qts long, qid long, q string",
    )
    trades = spark.createDataFrame(
        [(1, 5), (1, 20), (1, 25), (1, 30), (1, 100)], "k long, tts long"
    )

    def run(**kw):
        out = asof_join(
            trades, quotes, key="k", left_ts="tts", right_ts="qts",
            right_cols=["q"], right_order="qid", **kw,
        )
        return {r.tts: r.asof_q for r in out.collect()}

    assert run() == {5: None, 20: "b2", 25: "b2", 30: "b2", 100: "c"}
    assert run(direction="forward") == {
        5: "a",      # earliest later quote
        20: "b2",    # exact match resolves backward-style (greatest qid)
        25: "c",
        30: "c",
        100: None,   # nothing later
    }
    assert run(direction="nearest") == {
        5: "a",      # only a forward candidate
        20: "b2",    # distance 0
        25: "b2",    # back d=5 beats fwd d=15
        30: "b2",    # TIE (d=10 both ways) -> backward
        100: "c",
    }
    assert run(tolerance=10) == {
        5: None, 20: "b2", 25: "b2", 30: "b2", 100: None,  # d=60 nulled
    }
    assert run(direction="nearest", tolerance=7) == {
        5: "a", 20: "b2", 25: "b2", 30: None, 100: None,
    }


def test_kmv_merge_equals_one_pass_across_hash_period(spark):
    """Keys differing by a multiple of P collide post-hash; both the
    one-pass build and the fold must dedup by HASH so merge == one-pass
    holds on any key domain (review r12)."""
    from firmable_company_data_pipeline_spark.operators.sketches import (
        KMV_P,
        kmv_merge,
        kmv_partial,
    )

    rows = [("g", 5), ("g", 5 + KMV_P), ("g", 7)]
    df = spark.createDataFrame(rows, "g string, u long")
    one = {tuple(r.hs) for r in kmv_partial(df, "g", "u", k=8).collect()}
    a = kmv_partial(spark.createDataFrame(rows[:1], "g string, u long"), "g", "u", 8)
    b = kmv_partial(spark.createDataFrame(rows[1:], "g string, u long"), "g", "u", 8)
    folded = {tuple(r.hs) for r in kmv_merge(a.union(b), k=8).collect()}
    assert folded == one
    (hs,) = one
    assert len(hs) == 2  # the colliding pair counts once in BOTH arms


def test_bloom_semi_join_refuses_non_integral_keys(spark):
    import pytest as _pytest

    from firmable_company_data_pipeline_spark.operators.joins import bloom_semi_join

    left = spark.createDataFrame([("a",)], "k string")
    right = spark.createDataFrame([("a",)], "r string")
    with _pytest.raises(TypeError, match="integral"):
        bloom_semi_join(left, right, "k", "r")

"""Round-2 training-pipeline operators: substring-window dedup, PII
redaction, contamination screening — hand-built fixtures with known
expected outputs (the sf0.01 oracle parity is covered by the driver
contract; these pin the semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def docs(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (1, f"intro {shared} outro one"),
        (2, f"prefix words {shared} and more trailing text"),
        (3, "completely different content with no overlap at all here"),
        (10, f"eval doc containing {shared} plus extra eval only words"),
        (4, shared + " " + shared),  # window repeats inside one doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dup_spans_finds_cross_doc_window(spark, docs):
    out = dd.substring_dup_spans(docs, k=8, min_docs=2).collect()
    # the shared window appears in docs 1, 2, 10, 4 (twice within 4)
    by_first = {r["first_doc"]: r for r in out}
    assert 1 in by_first
    hit = by_first[1]
    assert hit["n_docs"] >= 4
    assert hit["n_occ"] >= hit["n_docs"] + 1  # doc 4 contributes 2 occurrences
    # no window of the unique doc shows up
    assert all(r["first_doc"] != 3 for r in out)


def test_substring_dup_spans_respects_min_docs(spark, docs):
    singles = dd.substring_dup_spans(docs, k=8, min_docs=5).collect()
    # only windows in >=5 distinct docs — fixture has at most 4
    assert singles == []


def test_redact_pii_scrubs_what_extractors_find(spark):
    import firmable_company_data_pipeline_spark.functions as lib

    df = spark.createDataFrame(
        [
            ("write bob@example.com or call (02) 9123 4567 now",),
            ("ring +61 2 555 333 asap",),
            ("no pii here",),
        ],
        "text string",
    )
    out = df.select(
        lib.redact_pii(F.col("text")).alias("red"),
        F.size(lib.extract_emails(F.col("text"))).alias("ne"),
        F.size(lib.extract_phones(F.col("text"))).alias("np"),
    ).collect()
    assert out[0]["red"] == "write [EMAIL] or call [PHONE] now"
    assert out[0]["ne"] == 1 and out[0]["np"] == 1
    assert out[1]["red"] == "ring [PHONE] asap"
    assert out[2]["red"] == "no pii here"
    # invariant: redacted text contains no extractable PII
    again = df.select(
        F.size(lib.extract_emails(lib.redact_pii(F.col("text")))).alias("ne")
    ).collect()
    assert all(r["ne"] == 0 for r in again)


def test_contamination_check_flags_eval_overlap(spark, docs):
    # doc_id 10 is the eval split (10 % 10 == 0); docs 1/2/4 share its
    # 8-token run, doc 3 shares nothing.
    out = dd.contamination_check(docs, n=5, eval_mod=10, min_overlap=0.01)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 10 not in rows  # eval docs are never scored
    assert 1 in rows and 2 in rows and 4 in rows
    assert 3 not in rows
    for r in rows.values():
        assert 0.0 < r["overlap_frac"] <= 1.0
        assert r["n_common"] <= r["n_sh"]


def test_contamination_threshold_filters(spark, docs):
    strict = dd.contamination_check(docs, n=5, eval_mod=10, min_overlap=0.99)
    # nobody overlaps 99% of their shingles with eval in this fixture
    # except possibly doc 4 (pure repetition of the shared run)
    ids = {r["doc_id"] for r in strict.collect()}
    assert ids <= {4}


def test_training_shuffle_shards_balance_and_determinism(spark):
    """Round-robin over the shuffled order: shard sizes differ by at
    most one, positions are dense 1..size within each shard, the
    assignment is identical across runs (no RNG), and the shuffle
    actually permutes (shard != doc_id order)."""
    from collections import Counter

    from firmable_company_data_pipeline_spark.queries.training import (
        training_shuffle_shards,
    )

    sf = "/root/testdata/sf0.001"
    rows = training_shuffle_shards(spark, sf).collect()
    again = training_shuffle_shards(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    sizes = Counter(r["shard"] for r in rows)
    assert len(sizes) == 8
    assert max(sizes.values()) - min(sizes.values()) <= 1
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # the shuffle is not the identity: consecutive doc_ids land on
    # scattered shards (a sorted-by-id assignment would chunk them)
    ordered = [r["shard"] for r in sorted(rows, key=lambda r: r["doc_id"])]
    assert len(set(ordered[:16])) > 2


def test_padding_efficiency_report_invariants(spark):
    """Equal-count buckets (sizes differ by <= 1 across the ntile), waste
    fractions in [0, 1), bucket max lengths non-decreasing with bucket
    index (buckets are length-ordered), and total doc count conserved."""
    from firmable_company_data_pipeline_spark.queries.training import (
        padding_efficiency_report,
    )

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        padding_efficiency_report(spark, sf).collect(), key=lambda r: r["bucket"]
    )
    n_total = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r["waste_frac"] < 1
        assert r["padded_waste"] == r["n_docs"] * r["max_len"] - r["sum_len"]
    assert [r["max_len"] for r in rows] == sorted(r["max_len"] for r in rows)


def test_segment_dedup_rewrite_drops_shared_boilerplate(spark):
    """CCNet-style line dedup on a planted fixture: an 8-token
    boilerplate segment shared by three docs is dropped everywhere,
    unique segments survive in original order, an all-boilerplate doc
    rewrites to '' (kept_frac 0), and a doc with a ragged tail keeps
    its short final segment."""
    boiler = "all rights reserved contact us for more info"  # 8 tokens
    rows = [
        (0, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
        (1, "one two three four five six seven eight " + boiler),
        (2, boiler),
        (3, "unique doc with a short tail"),  # 6 tokens: 1 ragged segment
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dd.segment_dedup_rewrite(docs, w=8).collect()}
    assert out[0]["n_segments"] == 2 and out[0]["n_dropped"] == 1
    assert out[0]["text_kept"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[1]["n_dropped"] == 1
    assert out[1]["text_kept"] == "one two three four five six seven eight"
    assert out[2]["text_kept"] == "" and out[2]["kept_frac"] == 0.0
    assert out[3]["n_dropped"] == 0
    assert out[3]["text_kept"] == "unique doc with a short tail"
    # NULL text: no segments, no row (review r12 — size(NULL) = -1 made
    # sequence(0, -1) step DOWN to [0, -1], two phantom '' segments)
    docs_null = spark.createDataFrame(
        [(0, None), (1, "a b c")], "doc_id long, text string"
    )
    out_null = {r["doc_id"]: r for r in dd.segment_dedup_rewrite(docs_null, w=8).collect()}
    assert set(out_null) == {1}
    assert out_null[1]["n_segments"] == 1 and out_null[1]["n_dropped"] == 0
    # order preserved across multiple kept segments
    docs2 = spark.createDataFrame(
        [
            (0, "a b c d e f g h " + boiler + " i j k l m n o p"),
            (1, boiler),
        ],
        "doc_id long, text string",
    )
    r0 = {r["doc_id"]: r for r in dd.segment_dedup_rewrite(docs2, w=8).collect()}[0]
    assert r0["text_kept"] == "a b c d e f g h i j k l m n o p"
    assert r0["n_segments"] == 3 and r0["n_dropped"] == 1


def test_zipf_fit_recovers_planted_slope(spark):
    """zipf_fit_report's regression is a real fit: a corpus whose term
    frequencies are exactly freq(r) = round(1000 * r^-1) must fit a
    slope near -1 with high r2; a uniform corpus fits slope ~0."""
    from firmable_company_data_pipeline_spark.queries.training import (
        zipf_fit_report,
    )
    import math

    words = []
    for r in range(1, 41):
        words += [f"w{r:02d}"] * round(1000 * r**-1.0)
    uni = [f"u{r:02d}" for r in range(1, 41)] * 25
    rows = [(0, " ".join(words), "zipfian"), (1, " ".join(uni), "uniform")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: r for r in zipf_fit_report(spark, d).collect()}
    z, u = out["zipfian"], out["uniform"]
    assert abs(z["zipf_slope"] + 1.0) < 0.05 and z["r2"] > 0.99
    assert abs(u["zipf_slope"]) < 1e-6 and u["n_types"] == 40

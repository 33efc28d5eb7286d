"""build_training_corpus / corpus_attrition_card reconciliation (verdict
r10 #2): the flagship's stage counts must agree with the standalone
audited queries it composes, and the manifest must balance against the
mixing-expanded survivor set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.queries import corpus as cb
from firmable_company_data_pipeline_spark.queries.curation import curate_corpus
from firmable_company_data_pipeline_spark.queries.llmops import decontaminate_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def card(spark):
    return cb.corpus_attrition_card(spark, SF).collect()


def test_attrition_chains_and_matches_curate_reasons(spark, card):
    """docs_out at stage i == docs_in at stage i+1 per source; the
    quality / repetition / exact_dup drop totals equal curate_corpus's
    drop_reason counts (stages 1-3 are definitionally the same ladder);
    decontamination drops never exceed the standalone screen's."""
    by = {}
    for r in card:
        by[(r["stage_no"], r["source"])] = r
    stages = sorted({k[0] for k in by})
    sources = sorted({k[1] for k in by})
    assert stages == list(range(1, 8))
    for src in sources:
        for i in stages[:-1]:
            assert by[(i, src)]["docs_out"] == by[(i + 1, src)]["docs_in"]
        for i in stages:
            r = by[(i, src)]
            assert r["docs_in"] - r["docs_dropped"] == r["docs_out"]

    reasons = {
        r["drop_reason"]: r["n"]
        for r in curate_corpus(spark, SF)
        .groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    drop_tot = {
        i: sum(by[(i, s)]["docs_dropped"] for s in sources) for i in stages
    }
    assert drop_tot[1] == reasons.get("quality", 0)
    assert drop_tot[2] == reasons.get("repetition", 0)
    assert drop_tot[3] == reasons.get("exact_dup", 0)

    decon = {
        r["source"]: r["n_dropped"]
        for r in decontaminate_corpus(spark, SF).collect()
    }
    for src in sources:
        assert by[(6, src)]["docs_dropped"] <= decon.get(src, 0)


def test_manifest_balances_against_mixing_expansion(spark, card):
    """Sum of shard n_docs == sum of survivor n_copies; sum of shard
    n_tokens == sum of survivor n_tok * n_copies; round-robin shard
    sizes differ by at most one; selection stage respects the DSIR
    budget (pool survivors <= budget + all target survivors)."""
    from firmable_company_data_pipeline_spark.operators import retrieval as rt
    from firmable_company_data_pipeline_spark.session import load_tables

    manifest = cb.build_training_corpus(spark, SF).collect()
    sizes = sorted(r["n_docs"] for r in manifest)
    assert len(manifest) <= cb._N_SHARDS
    assert sizes[-1] - sizes[0] <= 1

    ffd = cb._corpus_ff(spark, SF)
    final = ffd.filter(F.col("ff").isNull()).select("doc_id", "n_tok")
    docs = load_tables(spark, SF, "documents")["documents"]
    copies = rt.apply_mixing(docs.join(final.select("doc_id"), "doc_id"))
    bal = (
        copies.join(final, "doc_id")
        .agg(
            F.sum("n_copies").alias("nd"),
            F.sum(F.col("n_copies") * F.col("n_tok")).alias("nt"),
        )
        .collect()[0]
    )
    assert sum(r["n_docs"] for r in manifest) == bal["nd"]
    assert sum(r["n_tokens"] for r in manifest) == bal["nt"]

    # final docs_out at stage 7 equals the survivor count feeding the
    # manifest (pre-mixing), and pool survivors obey the budget
    per7 = {r["source"]: r for r in card if r["stage_no"] == 7}
    assert sum(r["docs_out"] for r in per7.values()) == final.count()
    pool_out = sum(
        r["docs_out"] for s, r in per7.items() if s not in cb._TARGETS
    )
    assert pool_out <= cb._DSIR_BUDGET


def test_write_training_corpus_shards_match_manifest(spark, tmp_path):
    """The writer's artifact is self-consistent: the written shard
    partitions reproduce the manifest rollup AND the registered
    manifest query; pos_in_shard is contiguous 1..n per shard; text
    rides every row."""
    import json

    out = str(tmp_path / "corpus")
    manifest = cb.write_training_corpus(spark, SF, out)
    on_disk = json.load(open(out + "/_manifest.json"))
    assert on_disk["shards"] == manifest and on_disk["seed"] == cb._SHUFFLE_SEED

    written = spark.read.parquet(out)
    assert "text" in written.columns
    per = {
        r["shard"]: r
        for r in written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .collect()
    }
    query = {
        r["shard"]: r for r in cb.build_training_corpus(spark, SF).collect()
    }
    assert set(per) == set(query)
    for s, r in query.items():
        assert per[s]["n_docs"] == r["n_docs"]
        assert per[s]["n_tokens"] == r["n_tokens"]
    for s in per:
        pos = sorted(
            x["pos_in_shard"]
            for x in written.filter(F.col("shard") == s)
            .select("pos_in_shard")
            .collect()
        )
        assert pos == list(range(1, len(pos) + 1))


def test_write_training_corpus_schemed_path(spark, tmp_path):
    """Verdict r11 #4: a scheme'd out_dir works — shards AND manifest
    land in the same (Hadoop-FS-addressed) store.  file: is the
    cheapest non-posix-addressed scheme: open()/os.path cannot reach
    it, so a driver-local manifest write would land in a cwd-relative
    './file:/...' tree; the Hadoop FileSystem API resolves it to the
    real path."""
    import json
    import os

    local = str(tmp_path / "corpus_schemed")
    manifest = cb.write_training_corpus(spark, SF, "file://" + local)
    # the manifest is readable at the REAL location through plain posix
    assert os.path.exists(local + "/_manifest.json")
    on_disk = json.load(open(local + "/_manifest.json"))
    assert on_disk["shards"] == manifest and on_disk["seed"] == cb._SHUFFLE_SEED
    assert {r["shard"] for r in spark.read.parquet(local).select("shard").distinct().collect()} == {
        m["shard"] for m in manifest
    }


def test_persisted_verdicts_reconcile_with_self_contained(spark, tmp_path):
    """The production arm (verdict r11 #3): write_corpus_verdicts once,
    then the manifest, attrition card and shard writer over the
    persisted frame must reproduce the self-contained registry views
    row-for-row — and the persisted reads must be cheap (no verdict
    recomputation: their plans scan the verdicts parquet, not the
    documents-table lineage)."""
    import json

    vd = str(tmp_path / "verdicts")
    cb.write_corpus_verdicts(spark, SF, vd)

    # stage counts identical
    self_card = sorted(
        map(tuple, cb.corpus_attrition_card(spark, SF).collect())
    )
    pers_card = sorted(
        map(tuple, cb.corpus_attrition_card_from_verdicts(spark, SF, vd).collect())
    )
    assert pers_card == self_card

    # manifest identical
    self_man = sorted(
        map(tuple, cb.build_training_corpus(spark, SF).collect())
    )
    pers_man = sorted(
        map(tuple, cb.build_training_corpus_from_verdicts(spark, SF, vd).collect())
    )
    assert pers_man == self_man

    # the persisted card never touches the documents table: one parquet
    # source only (the self-contained plan embeds the full lineage)
    plan = (
        cb.corpus_attrition_card_from_verdicts(spark, SF, vd)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "documents.parquet" not in plan

    # the shard writer accepts the persisted frame and its manifest
    # matches the self-contained writer's rollup
    out = str(tmp_path / "corpus_from_verdicts")
    manifest = cb.write_training_corpus(spark, SF, out, verdicts_dir=vd)
    on_disk = json.load(open(out + "/_manifest.json"))
    assert on_disk["shards"] == manifest
    assert sorted(
        (m["shard"], m["n_docs"], m["n_tokens"], m["n_sources"]) for m in manifest
    ) == self_man

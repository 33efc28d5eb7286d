"""Round-4 corpus-curation operators: repetition quality signals,
stratified split, sequence packing, unigram surprisal, semantic dedup —
hand-built fixtures with known expected outputs (sf0.01 oracle parity is
covered by the driver contract; these pin the semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.operators import curation as cu


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 6 tokens, all distinct; bigrams all distinct; trigrams all distinct
        (1, "one two three four five six", "en", "s0"),
        # "spam spam spam spam": 4 tokens 1 distinct -> dup_word 0.75;
        # single distinct bigram "spam spam" x3 -> top_bigram 2*3/4 = 1.5? no:
        # 3 occurrences of the most common bigram -> 6/4 = 1.5 capped? not
        # capped — fraction can exceed 1 for degenerate docs (documented).
        (2, "spam spam spam spam", "en", "s0"),
        # two-token doc: no trigram rows -> dup_trigram 0.0
        (3, "tiny doc", "fr", "s1"),
        # repeated phrase: "the cat sat the cat sat" -> 6 tok, 3 distinct
        (4, "the cat sat the cat sat", "fr", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_repetition_stats_fractions(spark, docs):
    out = {r["doc_id"]: r for r in cu.repetition_stats(docs).collect()}
    assert out[1]["dup_word_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == pytest.approx(2 / 6, abs=1e-6)
    assert out[1]["dup_trigram_frac"] == 0.0
    assert out[1]["keep"]

    assert out[2]["n_tok"] == 4
    assert out[2]["dup_word_frac"] == 0.75
    # bigram "spam spam" occurs 3 times
    assert out[2]["top_bigram_frac"] == 1.5
    # trigrams: 2 occurrences, 1 distinct
    assert out[2]["dup_trigram_frac"] == 0.5
    assert not out[2]["keep"]

    assert out[3]["dup_trigram_frac"] == 0.0  # no trigrams at all

    # doc 4: 6 tok 3 distinct -> 0.5; "the cat" x2 of 5 bigrams -> 4/6
    assert out[4]["dup_word_frac"] == 0.5
    assert out[4]["top_bigram_frac"] == pytest.approx(4 / 6, abs=1e-6)
    # trigrams: 4 occurrences ("the cat sat","cat sat the","sat the cat",
    # "the cat sat") -> 3 distinct -> 1/4
    assert out[4]["dup_trigram_frac"] == 0.25


def test_stratified_split_deterministic_and_total(spark, docs):
    a = cu.stratified_split(docs).collect()
    b = cu.stratified_split(docs).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 4
    for r in a:
        assert 0 <= r["bucket"] < 100
        assert r["split"] in ("train", "val", "test")
        expected = (
            "train" if r["bucket"] < cu.SPLIT_TRAIN
            else "val" if r["bucket"] < cu.SPLIT_VAL
            else "test"
        )
        assert r["split"] == expected


def test_pack_sequences_contiguous_within_shard(spark, docs):
    out = {r["doc_id"]: r for r in cu.pack_sequences(docs, budget=5).collect()}
    # shard s0: doc 1 (6 tok) then doc 2 (4 tok)
    assert (out[1]["seq_bin"], out[1]["tok_offset"]) == (0, 0)
    assert (out[2]["seq_bin"], out[2]["tok_offset"]) == (1, 1)  # cum=6
    # shard s1: doc 3 (2 tok) then doc 4 (6 tok)
    assert (out[3]["seq_bin"], out[3]["tok_offset"]) == (0, 0)
    assert (out[4]["seq_bin"], out[4]["tok_offset"]) == (0, 2)


def test_unigram_surprise_orders_rare_docs_higher(spark, docs):
    out = {r["doc_id"]: r for r in cu.unigram_surprise(docs).collect()}
    # doc 2 is all "spam" (4 of the 18 corpus tokens) -> low surprise;
    # doc 1 is six singletons -> maximal surprise.
    assert out[1]["avg_surprise"] > out[2]["avg_surprise"]
    total = sum(r["n_tok"] for r in out.values())
    assert out[2]["avg_surprise"] == pytest.approx(math.log(total / 4), abs=1e-3)


def test_semantic_dedup_matches_exact_within_cells(spark):
    # ids 0 and 1 anchor the two cells (lowest-id deterministic centroids)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),   # near-dup of 0 -> cell 0
        (3, [0.0, 0.98, 0.2]),   # near-dup of 1 -> cell 1
        (4, [-1.0, 0.0, 0.1]),   # isolated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cu.semantic_dedup_pairs(emb, n_cells=2, threshold=0.9).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 2) in pairs
    assert (1, 3) in pairs
    assert all(r["cos_sim"] >= 0.9 for r in out)
    # the isolated vector pairs with nothing
    assert not any(4 in p for p in pairs)


def test_curate_corpus_reasons_consistent(spark, sf_dir):
    import __spark_entry__ as e

    out = e.queries()["curate_corpus"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["keep"] == (r["drop_reason"] is None)
    # the synthetic corpus contains both kept and dropped docs
    kept = sum(1 for r in out if r["keep"])
    assert 0 < kept < len(out)


def test_chunk_documents_covers_and_overlaps(spark):
    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    out = sorted(
        cu.chunk_documents(df, size=64, stride=48).collect(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 tokens, size 64, stride 48 -> chunks at 0 and 48 (48+64 >= 100)
    assert [(r["tok_start"], r["n_chunk_tok"]) for r in by_doc[1]] == [(0, 64), (48, 52)]
    # overlap region: last 16 tokens of chunk 0 == first 16 of chunk 1
    c0, c1 = by_doc[1][0]["chunk_text"].split(" "), by_doc[1][1]["chunk_text"].split(" ")
    assert c0[-16:] == c1[:16]
    # full coverage, in order
    assert c0 + c1[16:] == text.split(" ")
    # short doc -> exactly one chunk, the doc itself
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc"


def test_null_text_rows_do_not_crash(spark):
    """NULL text must flow through every curation op without raising;
    token-derived ops drop or null the row identically on both engines
    (string_split(NULL) is NULL in Spark and DuckDB alike)."""
    df = spark.createDataFrame(
        [(1, None, "en", "s0"), (2, "hello world here", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    rep = cu.repetition_stats(df).collect()
    assert [r["doc_id"] for r in rep] == [2]  # null-text doc has no token rows
    chunks = cu.chunk_documents(df).collect()
    assert {r["doc_id"] for r in chunks} == {2}
    packed = {r["doc_id"]: r for r in cu.pack_sequences(df).collect()}
    assert packed[1]["n_tok"] is None  # row survives with null size
    split = cu.stratified_split(df).collect()
    assert len(split) == 2  # hash of (lang, id) never needs the text
    surprise = cu.unigram_surprise(df).collect()
    assert {r["doc_id"] for r in surprise} == {2}


def test_null_stratum_hashes_like_skipped_separator(spark):
    """concat_ws skips a NULL stratum on BOTH engines, so a NULL-lang
    row must bucket exactly like hashing the bare id — pinning the
    Spark/DuckDB parity of the split's NULL arm."""
    import duckdb

    from firmable_company_data_pipeline_spark.functions.textstats import HASH_MOD

    df = spark.createDataFrame(
        [(7, None), (8, "en")], "doc_id long, lang string"
    )
    got = {r["doc_id"]: r["bucket"] for r in cu.stratified_split(df).collect()}
    oracle = dict(
        duckdb.sql(
            "SELECT doc_id, list_reduce(list_prepend(0::BIGINT, "
            "list_transform(string_split(concat_ws('|', lang, doc_id::VARCHAR), ''), "
            f"c -> ascii(c)::BIGINT)), (h, c) -> (h*31 + c) % {HASH_MOD}) % 100 "
            "FROM (VALUES (7, NULL), (8, 'en')) t(doc_id, lang)"
        ).fetchall()
    )
    assert got == oracle


def test_bigram_surprise_hand_computed(spark):
    import math

    # corpus: doc1 "a b a b", doc2 "a b c" → bigrams: d1 [ab, ba, ab],
    # d2 [ab, bc].  c(ab)=3, c(ba)=1, c(bc)=1; ctx a·=3+... ctx(a)=c(a b)=3,
    # ctx(b)=c(b a)+c(b c)=2; V=3 (a,b,c); k=0.5.
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    from firmable_company_data_pipeline_spark.operators.curation import (
        BIGRAM_ADD_K as k,
        bigram_surprise,
    )

    out = {r["doc_id"]: r for r in bigram_surprise(docs).collect()}
    p_ab = (3 + k) / (3 + k * 3)      # ctx(a)=3
    p_ba = (1 + k) / (2 + k * 3)      # ctx(b)=2
    p_bc = (1 + k) / (2 + k * 3)
    d1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    d2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_bigram_surprise"] == pytest.approx(d1, abs=1e-4)
    assert out[2]["avg_bigram_surprise"] == pytest.approx(d2, abs=1e-4)
    # single-token doc contributes no row
    single = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
    assert bigram_surprise(single).count() == 0


def test_boilerplate_stats_per_source_scoping(spark):
    # s0 (5 docs incl. a gram-less single-token doc): "acme corp" is in
    # 3/5 docs -> boilerplate at the 50% threshold (doc_decifrac=5);
    # every other gram is single-doc.  s1 (3 docs): "acme corp" is in
    # only 1/3 docs -> NOT boilerplate there, pinning per-source
    # scoping of the threshold.
    rows = [
        (1, "acme corp alpha beta", "s0"),
        (2, "acme corp gamma", "s0"),
        (3, "delta acme corp acme corp", "s0"),
        (4, "epsilon zeta", "s0"),
        (8, "solo", "s0"),  # no bigram: excluded from output, counted in n_docs
        (5, "acme corp solo", "s1"),
        (6, "unique words here", "s1"),
        (7, "more filler text", "s1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in cu.boilerplate_stats(docs, doc_decifrac=5).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}  # doc 8 has no bigram
    assert (out[1]["n_gram"], out[1]["n_boiler_gram"]) == (3, 1)
    assert out[1]["boiler_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert (out[2]["n_gram"], out[2]["n_boiler_gram"]) == (2, 1)
    # doc 3 contains the boilerplate bigram TWICE ("acme corp" at two
    # positions) - occurrences, not distinct grams, are counted
    assert (out[3]["n_gram"], out[3]["n_boiler_gram"]) == (4, 2)
    assert (out[4]["n_gram"], out[4]["n_boiler_gram"]) == (1, 0)
    # per-source scoping: same gram, different source, below threshold
    assert (out[5]["n_gram"], out[5]["n_boiler_gram"]) == (2, 0)
    assert out[6]["n_boiler_gram"] == 0 and out[7]["n_boiler_gram"] == 0


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR weights order the raw pool by target-likeness: a pool doc
    written in the target's vocabulary outscores one written in a
    disjoint vocabulary, only non-target docs are scored, and the
    per-doc gram counts are the doc's bigram occurrences."""
    target_text = "alpha beta gamma delta alpha beta gamma delta alpha beta"
    rows = [
        (1, target_text, "tgt"),
        (2, "beta gamma delta alpha beta gamma delta alpha gamma beta", "tgt"),
        (3, "alpha beta gamma delta alpha beta unseen gamma delta beta", "pool"),
        (4, "zebra yacht xylophone walrus zebra yacht xylophone walrus quack", "pool"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in cu.dsir_importance(
            docs, F.col("source") == "tgt", n_buckets=64
        ).collect()
    }
    assert set(out) == {3, 4}  # target docs are never scored
    assert out[3]["avg_logratio"] > out[4]["avg_logratio"]
    assert out[3]["n_grams"] == 9  # 10 tokens -> 9 bigram occurrences
    assert out[4]["n_grams"] == 8


def test_dsir_resample_tracks_weights(spark):
    """Gumbel-top-k selection probabilities track the importance
    weights on a two-population pool: across seeds, target-vocabulary
    pool docs are selected far more often than disjoint-vocabulary
    ones, the draw actually varies with the seed (it is a sample, not
    a deterministic top-k), and ranks are contiguous 1..k."""
    target_vocab = "alpha beta gamma delta epsilon zeta eta theta"
    other_vocab = "zebra yacht xylo walrus vulture umber tiger sparrow"
    rows = [(0, target_vocab + " " + target_vocab, "tgt")]
    # 20 target-like + 20 disjoint pool docs, slight per-doc variation
    tgt_words = target_vocab.split()
    oth_words = other_vocab.split()
    for i in range(20):
        shift = tgt_words[i % 8 :] + tgt_words[: i % 8]
        rows.append((10 + i, " ".join(shift + shift[:3]), "pool"))
    for i in range(20):
        shift = oth_words[i % 8 :] + oth_words[: i % 8]
        rows.append((50 + i, " ".join(shift + shift[:3]), "pool"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    k = 10
    picks: list[set] = []
    for seed in range(6):
        sel = cu.dsir_resample(
            docs, F.col("source") == "tgt", k=k, n_buckets=64, seed=seed
        ).collect()
        assert sorted(r["sel_rank"] for r in sel) == list(range(1, k + 1))
        picks.append({r["doc_id"] for r in sel})
    n_tgt = sum(sum(1 for d in p if d < 50) for p in picks)
    n_oth = sum(sum(1 for d in p if d >= 50) for p in picks)
    assert n_tgt > 2 * n_oth, (n_tgt, n_oth)
    # the seed matters: different seeds must not all pick one fixed set
    assert len({frozenset(p) for p in picks}) > 1


def test_dsir_weight_table_covers_every_bucket(spark):
    """Advice r9: the frozen weight table must hold a row for EVERY
    bucket in range(n_buckets) — buckets the training snapshot never
    populated carry the smoothed floor — so a scored doc whose grams
    all land in unseen buckets still surfaces with a finite score
    instead of silently vanishing from the inner join."""
    import math

    n_buckets, alpha = 64, 1.0
    train = spark.createDataFrame(
        [(1, "alpha beta alpha beta alpha", "tgt"), (2, "alpha beta gamma", "pool")],
        "doc_id long, text string, source string",
    )
    weights = cu.dsir_weight_table(
        train, F.col("source") == "tgt", n_buckets=n_buckets, alpha=alpha
    ).persist()
    assert weights.count() == n_buckets
    assert [r["bucket"] for r in weights.select("bucket").collect()] != []
    # the training snapshot populates only a handful of buckets; every
    # other bucket must carry the identical smoothed floor
    tt, ts = 4, 2  # target/pool bigram occurrence totals of the fixture
    floor = math.log(alpha / (tt + alpha * n_buckets)) - math.log(
        alpha / (ts + alpha * n_buckets)
    )
    vals = sorted(r["w"] for r in weights.collect())
    assert sum(1 for v in vals if abs(v - floor) < 1e-12) >= n_buckets - 4
    # a doc written entirely in unseen vocabulary scores the floor, and
    # it APPEARS in the output (the advice's vanishing-doc case)
    probe = spark.createDataFrame(
        [(9, "zebra walrus yacht")], "doc_id long, text string"
    )
    out = cu.dsir_score_docs(probe, weights, n_buckets=n_buckets).collect()
    assert len(out) == 1
    assert out[0]["n_grams"] == 2
    assert out[0]["avg_logratio"] == pytest.approx(round(floor, 6), abs=1e-6)
    weights.unpersist()


# ---------------------------------------------------------------------------
# Model-based quality classifier (round 10): closed-form Naive-Bayes
# log-odds over the shared hashed-gram features, scored via the frozen
# broadcast table — graded against the heuristic filters on a planted
# fixture the heuristics are structurally blind to.

_CLEAN_POOL = (
    "the quick brown fox jumps over a lazy dog near the quiet river "
    "bank while autumn leaves drift slowly past the old stone bridge"
).split()
_SPAM_POOL = (
    "buy cheap pills casino bonus win jackpot free prize claim lottery "
    "viagra discount offer click subscribe deal credit loan insurance"
).split()


def _planted_quality_docs(spark):
    """16 docs, 8 clean / 8 spam, each with NO in-doc token repetition
    (every doc is a distinct 8-token rotation of its pool) — so the
    Gopher repetition heuristic keeps every one of them, while the
    vocabulary split is trivially learnable from labels."""
    rows = []
    for i in range(8):
        toks = [_CLEAN_POOL[(i * 3 + j) % len(_CLEAN_POOL)] for j in range(8)]
        rows.append((i, " ".join(dict.fromkeys(toks)), "clean"))
    for i in range(8):
        toks = [_SPAM_POOL[(i * 3 + j) % len(_SPAM_POOL)] for j in range(8)]
        rows.append((100 + i, " ".join(dict.fromkeys(toks)), "spam"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_nb_classifier_separates_spam_heuristics_miss(spark):
    """The graded fixture: spam docs have zero in-doc repetition, so
    repetition_stats keeps ALL of them (the heuristic is blind here);
    the NB classifier trained on 12 labeled docs classifies the 4
    HELD-OUT docs perfectly."""
    docs = _planted_quality_docs(spark)
    rep = {r["doc_id"]: r["keep"] for r in cu.repetition_stats(docs).collect()}
    spam_ids = [i for i in rep if i >= 100]
    assert spam_ids and all(rep[i] for i in spam_ids)  # heuristic misses

    held_out = [6, 7, 106, 107]
    train = docs.filter(~F.col("doc_id").isin(held_out))
    w = cu.nb_quality_weights(train, F.col("kind") == "clean")
    scored = {
        r["doc_id"]: r for r in cu.nb_quality_score(docs, w).collect()
    }
    assert len(scored) == 16  # every doc has features
    for i in held_out:
        expect = 1 if i < 100 else 0
        assert scored[i]["is_good"] == expect, (i, scored[i])
        assert (scored[i]["prob_good"] > 0.5) == (expect == 1)
        assert (scored[i]["log_odds"] > 0) == (expect == 1)
        assert 0.0 <= scored[i]["prob_good"] <= 1.0


def test_nb_weight_table_shape_and_prior(spark):
    docs = _planted_quality_docs(spark)
    w = cu.nb_quality_weights(docs, F.col("kind") == "clean", n_buckets=64)
    rows = {r["bucket"]: r["w"] for r in w.collect()}
    assert len(rows) == 65 and -1 in rows  # 64 feature rows + prior
    # balanced classes -> prior log-odds exactly 0
    assert rows[-1] == pytest.approx(0.0, abs=1e-12)


def test_nb_score_covers_unseen_buckets(spark):
    """A doc whose grams hit buckets no training gram landed in must
    still be scored (the full-bucket smoothed floor — the r9 advice
    contract), never silently dropped."""
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta", True), (2, "omega psi chi phi", False)],
        "doc_id long, text string, good boolean",
    )
    w = cu.nb_quality_weights(train, F.col("good"))
    probe = spark.createDataFrame(
        [(9, "zzz9qq yy8xx ww7vv uu6tt")], "doc_id long, text string"
    )
    out = cu.nb_quality_score(probe, w).collect()
    assert len(out) == 1 and out[0]["n_grams"] == 3
    assert math.isfinite(out[0]["log_odds"])


def test_lr_quality_weights_shared_scorer_contract(spark):
    """The MLlib LogisticRegression arm emits the same (bucket, w) +
    intercept-at-(-1) table, so the ONE scorer serves both estimators —
    and it separates the planted fixture's held-out docs too."""
    pytest.importorskip("numpy")
    docs = _planted_quality_docs(spark)
    held_out = [6, 7, 106, 107]
    train = docs.filter(~F.col("doc_id").isin(held_out))
    w = cu.lr_quality_weights(train, F.col("kind") == "clean", n_buckets=256)
    rows = w.collect()
    assert len(rows) == 257 and {r["bucket"] for r in rows} >= {-1, 0, 255}
    scored = {
        r["doc_id"]: r["is_good"] for r in cu.nb_quality_score(docs, w).collect()
    }
    for i in held_out:
        assert scored[i] == (1 if i < 100 else 0), i


def test_dsir_resample_by_source_budget_and_weights(spark):
    """The per-source arm keeps exactly min(budget, pool size) docs per
    source, never mixes sources in a rank partition, and within each
    source still tracks the importance weights (target-like docs win
    more often than off-target ones, across seeds)."""
    rows = []
    # target: 20 "wiki" docs establishing the target distribution
    for i in range(20):
        rows.append((i, "alpha beta gamma delta epsilon zeta", "wiki"))
    # pool source A: 10 target-like, 10 off-target
    for i in range(10):
        rows.append((100 + i, "alpha beta gamma delta epsilon zeta", "crawlA"))
        rows.append((200 + i, "xray yankee zulu quebec romeo sierra", "crawlA"))
    # pool source B: tiny (3 docs) — budget exceeds it
    for i in range(3):
        rows.append((300 + i, "alpha beta gamma xray yankee zulu", "crawlB"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    hits = {"tgt": 0, "off": 0}
    for seed in (1, 2, 3, 4, 5):
        out = cu.dsir_resample_by_source(
            docs, F.col("source") == "wiki", budget=8, seed=seed
        ).collect()
        by_src: dict = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert set(by_src) == {"crawlA", "crawlB"}
        assert len(by_src["crawlA"]) == 8  # budget binds
        assert len(by_src["crawlB"]) == 3  # pool smaller than budget
        for src, rs in by_src.items():
            assert sorted(r["src_rank"] for r in rs) == list(
                range(1, len(rs) + 1)
            ), src
        for r in by_src["crawlA"]:
            hits["tgt" if r["doc_id"] < 200 else "off"] += 1
    assert hits["tgt"] > hits["off"], hits


def test_dsir_resample_temperature_contract(spark):
    """temperature → 0 must DEGENERATE TO DETERMINISTIC top-k by
    importance weight (inclusion ∝ exp(w/T) — review r10: the previous
    w + g/T form implemented the inverse), identically across seeds."""
    rows = [(i, "alpha beta gamma delta epsilon zeta", "wiki") for i in range(20)]
    for i in range(10):
        rows.append((100 + i, "alpha beta gamma delta epsilon zeta", "pool"))
        rows.append((200 + i, "xray yankee zulu quebec romeo sierra", "pool"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tgt = F.col("source") == "wiki"
    top_by_weight = {
        r["doc_id"]
        for r in cu.dsir_importance(docs, tgt)
        .orderBy(F.desc("avg_logratio"), F.asc("doc_id"))
        .limit(10)
        .collect()
    }
    for seed in (1, 2, 3):
        picked = {
            r["doc_id"]
            for r in cu.dsir_resample(
                docs, tgt, k=10, seed=seed, temperature=1e-4
            ).collect()
        }
        assert picked == top_by_weight, seed


def test_nb_score_raw_weight_table_scores_with_zero_prior(spark):
    """Advice r10: a weight table WITHOUT the bucket = -1 prior row (a
    raw dsir_weight_table passed straight to the scorer — a legitimate
    call) must score with prior 0 / even prior odds, not silently
    return an empty frame (the old filter+crossJoin collapse)."""
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta", True), (2, "omega psi chi phi", False)],
        "doc_id long, text string, good boolean",
    )
    raw = cu.dsir_weight_table(train, F.col("good"), n_buckets=64)
    probe = spark.createDataFrame(
        [(9, "alpha beta gamma")], "doc_id long, text string"
    )
    out = cu.nb_quality_score(probe, raw, n_buckets=64).collect()
    assert len(out) == 1  # never empty
    # explicit zero-prior row gives the identical score: prior defaulted to 0
    zero = raw.unionByName(
        spark.createDataFrame([(-1, 0.0)], "bucket long, w double")
    )
    out0 = cu.nb_quality_score(probe, zero, n_buckets=64).collect()
    assert out[0]["log_odds"] == out0[0]["log_odds"]
    assert out[0]["prob_good"] == out0[0]["prob_good"]


def test_trigram_lm_separates_shuffled_where_unigram_cannot(spark):
    """Verdict r10 #3's graded fixture: a fluent doc and its word-level
    shuffle have the IDENTICAL unigram multiset, so unigram surprisal
    scores them equal — the Stupid-Backoff trigram LM must rank the
    fluent doc strictly higher (seen trigrams vs the alpha^2 floor)."""
    train = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "the cat ran to the dog"),
        ],
        "doc_id long, text string",
    )
    model = cu.trigram_lm_table(train)
    probe = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    lm = {r["doc_id"]: r for r in cu.trigram_lm_score_docs(probe, model).collect()}
    assert lm[10]["n_trigrams"] == lm[11]["n_trigrams"] == 4
    assert lm[10]["avg_logscore"] > lm[11]["avg_logscore"] + 1.0
    # the unigram score is blind to the shuffle: the corpus-self
    # surprisal of the two docs is identical (same token multiset)
    both = probe
    uni = {
        r["doc_id"]: r["avg_surprise"]
        for r in cu.unigram_surprise(both).collect()
    }
    assert uni[10] == uni[11]


def test_trigram_lm_table_one_table_contract(spark):
    """The frozen model is ONE table: orders 1/2/3 plus the order-0
    total row whose c equals the unigram occurrence sum."""
    train = spark.createDataFrame(
        [(1, "a b c"), (2, "a b")], "doc_id long, text string"
    )
    rows = {(r["order"], r["gram"]): r["c"] for r in cu.trigram_lm_table(train).collect()}
    assert rows[(0, "")] == 5  # 3 + 2 tokens
    assert rows[(1, "a")] == 2 and rows[(2, "a b")] == 2 and rows[(3, "a b c")] == 1
    # backoff levels score finitely even for fully-OOV probes
    probe = spark.createDataFrame([(9, "z z z")], "doc_id long, text string")
    out = cu.trigram_lm_score_docs(
        probe, spark.createDataFrame(
            [(o, g, c) for (o, g), c in rows.items()], "order int, gram string, c long"
        )
    ).collect()
    assert len(out) == 1
    import math as _m
    assert _m.isfinite(out[0]["avg_logscore"])


def test_quality_classifier_sweep_monotone_cumulative(spark):
    """The threshold-sweep card's invariants (verdict r10 #6): cum_docs
    and cum_tp nondecreasing in decile, cum_docs covers the whole
    held-out set at decile 10, recall_cum nondecreasing and exactly 1.0
    at decile 10 when any positive exists, precision_cum always
    cum_tp/cum_docs."""
    from firmable_company_data_pipeline_spark.queries.curation import (
        quality_classifier_sweep,
    )

    rows = quality_classifier_sweep(spark, "/root/testdata/sf0.001").orderBy(
        "decile"
    ).collect()
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    prev_docs = prev_tp = 0
    for r in rows:
        assert r["cum_docs"] >= prev_docs and r["cum_tp"] >= prev_tp
        assert r["cum_docs"] - prev_docs == r["n_docs"]
        assert r["cum_tp"] - prev_tp == r["n_pos"]
        assert r["precision_cum"] == pytest.approx(
            round(r["cum_tp"] / r["cum_docs"], 6)
        )
        prev_docs, prev_tp = r["cum_docs"], r["cum_tp"]
    if prev_tp > 0:
        assert rows[-1]["recall_cum"] == pytest.approx(1.0)


def test_lm_perplexity_bins_tiers_per_source(spark):
    """CCNet-style terciles: per source, bins are equal-count (±1),
    bin 1 holds the highest scores, and bin ranges never overlap
    (max of bin b+1 <= min of bin b)."""
    rows = []
    for s in ("a", "b"):
        for i in range(9):
            fluent = "the cat sat on the mat " * (i + 1)
            shuffled = "mat the on sat cat the " * (i + 1)
            rows.append((len(rows), fluent if i % 3 else shuffled, s))
    rows.append((len(rows), "tiny doc", "a"))  # < 3 tokens: unscoreable
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    model = cu.trigram_lm_table(docs.filter(F.col("doc_id") % 2 == 0))
    card = cu.lm_perplexity_bins(docs, model, n_bins=3).collect()
    by = {(r["source"], r["bin"]): r for r in card}
    for s in ("a", "b"):
        sizes = [by[(s, b)]["n_docs"] for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1 and sum(sizes) == 9
        for b in (1, 2):
            assert by[(s, b + 1)]["max_logscore"] <= by[(s, b)]["min_logscore"]
    # the unscoreable doc is surfaced, not silently absent (review r11)
    assert all(by[("a", b)]["n_unscored"] == 1 for b in (1, 2, 3))
    assert all(by[("b", b)]["n_unscored"] == 0 for b in (1, 2, 3))


def test_lm_perplexity_bins_all_unscored_source_survives(spark):
    """A source whose docs are ALL too short to score (zero bin rows)
    must still appear — one (bin NULL, n_docs 0) row carrying its
    n_unscored count (advice r11: the old inner join dropped it)."""
    rows = [
        (0, "the cat sat on the mat", "scored"),
        (1, "the cat sat on the mat again", "scored"),
        (2, "tiny", "ghost"),
        (3, "two words", "ghost"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    model = cu.trigram_lm_table(docs)
    card = cu.lm_perplexity_bins(docs, model, n_bins=3).collect()
    ghost = [r for r in card if r["source"] == "ghost"]
    assert len(ghost) == 1
    g = ghost[0]
    assert g["bin"] is None and g["n_docs"] == 0 and g["n_unscored"] == 2
    assert g["min_logscore"] is None and g["avg_logscore"] is None


def test_ngram_diversity_separates_templated_from_varied(spark):
    """Distinct-n on a planted fixture: a source that loops one
    sentence collapses (few unique n-grams over many occurrences)
    while a source of all-distinct tokens maxes out (distinct_1 = 1),
    and distinct-n falls with n on the templated source."""
    rows = [
        (0, "the cat sat on the mat " * 20, "templated"),
        (1, "the cat sat on the mat " * 20, "templated"),
        (2, "alpha beta gamma delta epsilon zeta", "varied"),
        (3, "eta theta iota kappa lambda mu", "varied"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in cu.ngram_diversity(docs).collect()}
    t, v = out["templated"], out["varied"]
    assert v["distinct_1"] == 1.0 and v["distinct_2"] == 1.0
    assert t["distinct_1"] < 0.05  # 5 unique tokens / 240 occurrences
    assert t["distinct_2"] <= t["distinct_1"] * 2  # no diversity recovery
    assert t["n_tokens"] == 240 and v["n_tokens"] == 12


def test_quality_ensemble_topk_invariants(spark, sf_dir):
    """RRF fusion invariants on the real corpus: output is the top-100
    of the fused order with contiguous ranks; rrf is exactly the
    integer-rank formula (recomputable); signal ranks are positive and
    distinct per signal; and the fused head is not a copy of either
    single signal's head (the point of ensembling)."""
    import __spark_entry__ as e

    rows = e.queries()["quality_ensemble_topk"](spark, sf_dir).collect()
    assert len(rows) == 100
    assert sorted(r["rank"] for r in rows) == list(range(1, 101))
    for r in rows:
        expect = round(1.0 / (60 + r["rank_nb"]) + 1.0 / (60 + r["rank_lm"]), 6)
        assert abs(r["rrf"] - expect) < 1e-9
    # descending rrf with doc_id tiebreak
    ordered = sorted(rows, key=lambda r: r["rank"])
    for a, b in zip(ordered, ordered[1:]):
        assert (a["rrf"], -a["doc_id"]) >= (b["rrf"], -b["doc_id"])
    # fusion differs from both single-signal orders somewhere in the head
    assert any(r["rank"] != r["rank_nb"] for r in rows)
    assert any(r["rank"] != r["rank_lm"] for r in rows)

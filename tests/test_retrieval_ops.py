"""Round-4 retrieval/training-mix operators: BM25 ranking, deterministic
random projection, dataset mixing plan, BPE pair counts — hand-built
fixtures with known expected values (sf0.01 oracle parity is covered by
the driver contract; these pin the semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.operators import retrieval as rt


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark join spark window", "en", "s0"),
        (2, "join join join filter", "en", "s0"),
        (3, "scan filter merge sort", "en", "s1"),
        (4, "window window spark", "fr", "s1"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _bm25(tf, df, n, dl, avgdl, k1=rt.BM25_K1, b=rt.BM25_B):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_scores_and_rank(spark, docs):
    out = rt.bm25_topk(docs, ("spark", "join"), k=10).collect()
    got = {r["doc_id"]: (r["bm25"], r["rank"]) for r in out}
    # corpus: N=4, avgdl = (4+4+4+3)/4 = 3.75
    avgdl = 3.75
    exp1 = round(_bm25(2, 2, 4, 4, avgdl) + _bm25(1, 2, 4, 4, avgdl), 4)
    exp2 = round(_bm25(3, 2, 4, 4, avgdl), 4)
    exp4 = round(_bm25(1, 2, 4, 3, avgdl), 4)
    assert got[1][0] == pytest.approx(exp1, abs=1e-4)
    assert got[2][0] == pytest.approx(exp2, abs=1e-4)
    assert got[4][0] == pytest.approx(exp4, abs=1e-4)
    # doc 3 matches no term -> absent
    assert 3 not in got
    # ranks follow score desc
    ranks = sorted(got.values(), key=lambda t: t[1])
    assert [s for s, _ in ranks] == sorted((s for s, _ in ranks), reverse=True)


def test_bm25_respects_k(spark, docs):
    out = rt.bm25_topk(docs, ("spark", "join"), k=2).collect()
    assert len(out) == 2
    assert {r["rank"] for r in out} == {1, 2}


def test_projection_signs_deterministic_and_mixed():
    s = rt.projection_signs(16, 4)
    assert s == rt.projection_signs(16, 4)
    assert all(len(row) == 16 for row in s) and len(s) == 4
    # not degenerate: every row mixes both signs, rows differ
    for row in s:
        assert {-1, 1} == set(row) or len(set(row)) == 2
    assert len({tuple(r) for r in s}) == 4


def test_random_project_values(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0, 0.0]), (2, [0.0, 1.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = rt.random_project(emb, in_dim=4, out_dim=2).collect()
    signs = rt.projection_signs(4, 2)
    scale = 1 / math.sqrt(2)
    exp = {}
    for vid, v in [(1, [1.0, 0.0, 2.0, 0.0]), (2, [0.0, 1.0, 0.0, 1.0])]:
        for j in range(2):
            exp[(vid, j)] = round(
                sum(x * s for x, s in zip(v, signs[j])) * scale, 6
            )
    got = {(r["vec_id"], r["dim"]): r["rp_val"] for r in out}
    assert got == exp


def test_mixing_plan_weights_sum_and_budget(spark, docs):
    out = rt.mixing_plan(docs, alpha=0.5, budget_tokens=1000).collect()
    by_src = {r["source"]: r for r in out}
    # s0: docs 1,2 -> 8 tokens; s1: docs 3,4 -> 7 tokens
    assert by_src["s0"]["n_tokens"] == 8 and by_src["s1"]["n_tokens"] == 7
    raw0, raw1 = math.sqrt(8), math.sqrt(7)
    tot = raw0 + raw1
    assert by_src["s0"]["mix_weight"] == pytest.approx(raw0 / tot, abs=1e-6)
    # alpha < 1 upsamples the smaller source relative to proportional
    assert by_src["s1"]["mix_weight"] > 7 / 15 - 1e-9
    # quotas approximately exhaust the budget (rounding drift < n_sources)
    assert abs(sum(r["quota_tokens"] for r in out) - 1000) <= 2
    assert by_src["s0"]["epochs"] == pytest.approx(
        by_src["s0"]["quota_tokens"] / 8, abs=1e-4
    )


def test_bpe_pair_counts(spark):
    docs = spark.createDataFrame(
        [(1, "abab ab", "en", "s0"), (2, "ab cd", "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    out = rt.bpe_pair_counts(docs, top_n=10).collect()
    got = {r["pair"]: (r["n_words"], r["n_occurrences"], r["rank"]) for r in out}
    # words: abab(1), ab(2), cd(1).  Pairs: abab -> ab,ba,ab ; ab -> ab ; cd -> cd
    # 'ab': words {abab, ab} -> n_words 2; occurrences 2*1 + 1*2 = weight-sum
    # of word counts per pair occurrence: abab contributes its wc (1) per
    # occurrence of 'ab' in it (x2) and 'ab' contributes wc 2 once.
    assert got["ab"][1] == 1 + 1 + 2  # two in 'abab' (wc 1 each) + one in 'ab' (wc 2)
    assert got["ba"] == (1, 1, got["ba"][2])
    assert got["cd"] == (1, 1, got["cd"][2])
    assert got["ab"][2] == 1  # most frequent pair ranks first


def test_single_char_words_produce_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "en", "s0")], "doc_id long, text string, lang string, source string"
    )
    assert rt.bpe_pair_counts(docs, top_n=5).count() == 0


def test_apply_mixing_copies_match_plan(spark, docs):
    plan = {r["source"]: r for r in rt.mixing_plan(docs, budget_tokens=30).collect()}
    out = rt.apply_mixing(docs, budget_tokens=30).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["n_copies"])
    for src, copies in by_src.items():
        e = plan[src]["epochs"]
        import math

        lo, hi = math.floor(e), math.floor(e) + 1
        assert all(c in (lo, hi) for c in copies)
    # every doc present exactly once
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3, 4]


def test_vocab_coverage_monotone_and_complete(spark, docs):
    out = {r["vocab_size"]: r for r in rt.vocab_coverage(docs, checkpoints=(1, 2, 100)).collect()}
    assert out[1]["coverage"] <= out[2]["coverage"] <= out[100]["coverage"]
    assert out[100]["coverage"] == pytest.approx(1.0)
    # top-1 covers exactly the most frequent token's share (join: 4 of 15)
    assert out[1]["covered_tokens"] == 4


def test_norm_histogram_bins(spark):
    from firmable_company_data_pipeline_spark.operators.similarity_search import (
        norm_histogram,
    )

    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.3, 0.4]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["bin"]: r for r in norm_histogram(emb, bin_width=1.0).collect()}
    assert out[5]["n_vecs"] == 1  # norm 5.0
    assert out[0]["n_vecs"] == 2  # norms 0.5 and 0.0
    assert out[5]["lo"] == 5.0


def test_hybrid_rrf_fusion_math(spark):
    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    dense = spark.createDataFrame(
        [(20, 1), (40, 2)], "neighbor_id long, rank int"
    )
    out = {r["doc_id"]: r for r in rt.hybrid_rrf(lex, dense, k=10).collect()}
    # doc 20 appears in both lists: 1/(60+2) + 1/(60+1)
    assert out[20]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert out[20]["rank"] == 1 and out[20]["lex_rank"] == 2
    # single-system docs get the single reciprocal; missing rank is NULL
    assert out[10]["dense_rank"] is None
    assert out[10]["rrf_score"] == pytest.approx(1 / 61, abs=1e-6)
    # doc 10 (rank 1 lexical) beats doc 40 (rank 2 dense)
    assert out[10]["rank"] < out[40]["rank"]


def _bpe_py(word, merges):
    """Reference BPE apply: per merge (in rank order), left-to-right
    non-overlapping pair replacement — the Sennrich inference step."""
    toks = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_bpe_apply_matches_python_reference(spark):
    import pyspark.sql.functions as F

    words = [
        "the", "thunder", "and", "banana", "anandan", "rethethere",
        "in", "on", "i", "", "anananan", "interband",
    ]
    df = spark.createDataFrame([(w, [w]) for w in words], "w string, arr array<string>")
    got = {
        r["w"]: r["enc"]
        for r in df.select("w", rt.bpe_apply(F.col("arr")).alias("enc")).collect()
    }
    for w in words:
        assert got[w] == _bpe_py(w, rt.BPE_MERGES), w


def test_bpe_apply_matches_python_on_corpus_vocab(spark, docs):
    import pyspark.sql.functions as F
    from firmable_company_data_pipeline_spark.functions.textstats import tokens

    vocab = [
        r["w"]
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .distinct()
        .collect()
    ]
    df = spark.createDataFrame([(w, [w]) for w in vocab], "w string, arr array<string>")
    got = {
        r["w"]: r["enc"]
        for r in df.select("w", rt.bpe_apply(F.col("arr")).alias("enc")).collect()
    }
    for w in vocab:
        assert got[w] == _bpe_py(w, rt.BPE_MERGES), w
        assert "".join(got[w]) == w  # lossless


def _py_bpe_learn(word_counts: dict, n_merges: int):
    """Independent reference BPE trainer (Sennrich et al. 2016 Alg. 1):
    dict-of-symbol-tuples, overlapping pair counting, leftmost-
    nonoverlapping merge, ties by (count desc, lhs asc, rhs asc)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pairs[k] = pairs.get(k, 0) + c
        if not pairs:
            break
        (l, r), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark):
    """The learned merge table equals an independent Python BPE trainer
    on the classic Sennrich fixture (no self-pairs, so the double-
    replace and leftmost-nonoverlap semantics coincide exactly)."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, c in wc.items() for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["n_occurrences"])
        for r in rt.bpe_train(docs, 6).orderBy("step").collect()
    ]
    assert got == _py_bpe_learn(wc, 6)


def test_bpe_train_learned_vocab_reduces_fertility(spark, docs):
    """Verdict r10 #4's lifecycle close: feeding the LEARNED merge list
    to bpe_apply must strictly reduce the corpus subword count vs the
    unmerged (character) encoding, and every merge step must report a
    positive occurrence count — the tokenizer a user trains actually
    compresses the corpus it was trained on."""
    learned = tuple(
        (r["lhs"], r["rhs"])
        for r in rt.bpe_train(docs, 5).orderBy("step").collect()
    )
    assert len(learned) == 5
    toks = rt.tokens(F.col("text"))
    n_sub = docs.select(
        F.sum(F.size(rt.bpe_apply(toks, learned))).alias("n")
    ).collect()[0]["n"]
    n_chars = docs.select(
        F.sum(F.size(rt.bpe_apply(toks, ()))).alias("n")
    ).collect()[0]["n"]
    assert n_sub < n_chars

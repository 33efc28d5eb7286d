"""Retrieval / training-mix queries, round 4 (charter extensions):
BM25 keyword retrieval, deterministic random-projection embedding
reduction, temperature-weighted dataset mixing, and BPE merge-step pair
statistics.

Oracle-parity design follows ``queries/curation.py``: no RNG (the
projection sign matrix is generated once in Python and inlined into
BOTH engines' plans), identical aliases, floats rounded before compare.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from firmable_company_data_pipeline_spark.operators import retrieval as rt
from firmable_company_data_pipeline_spark.session import load_tables

_TOKENS = r"string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"

# --------------------------------------------------------------------------
# bm25_search — BM25 top-20 for a fixed keyword query.
_BM25_TERMS = ("spark", "join", "window", "vector")
_BM25_K = 20


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return rt.bm25_topk(docs, _BM25_TERMS, k=_BM25_K)


_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

BM25_SEARCH_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
sized AS (SELECT doc_id, t, len(t) AS dl FROM tok),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM sized),
occ AS (SELECT doc_id, dl, unnest(t) AS tok FROM sized),
tf AS (
  SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
  FROM occ WHERE tok IN ({_TERMS_SQL})
  GROUP BY doc_id, tok
),
df_t AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT doc_id,
         round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * ({rt.BM25_K1} + 1)
                   / (tf + {rt.BM25_K1} * (1 - {rt.BM25_B}
                      + {rt.BM25_B} * dl / avgdl))), 4) AS bm25
  FROM tf JOIN df_t USING (tok) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, bm25, rank FROM (
  SELECT doc_id, bm25,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {_BM25_K}
"""


# --------------------------------------------------------------------------
# random_projection — JL ±1 projection of the 64-dim embeddings to 8.
_RP_IN, _RP_OUT = 64, 8
_RP_SIGNS = rt.projection_signs(_RP_IN, _RP_OUT)
_RP_SCALE = 1.0 / math.sqrt(_RP_OUT)


def random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return rt.random_project(emb, in_dim=_RP_IN, out_dim=_RP_OUT)


def _rp_dim_sql(j: int) -> str:
    signs = "[" + ", ".join(f"{float(s)}" for s in _RP_SIGNS[j]) + "]"
    return (
        f"round(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range({_RP_IN}), i -> v[i+1] * ({signs}::DOUBLE[])[i+1])), "
        f"(a, x) -> a + x) * {_RP_SCALE!r}, 6)"
    )


RANDOM_PROJECTION_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
proj AS (
  SELECT vec_id, [{", ".join(_rp_dim_sql(j) for j in range(_RP_OUT))}] AS rp
  FROM e
)
SELECT vec_id, i AS dim, rp[i+1] AS rp_val
FROM proj, range({_RP_OUT}) r(i)
"""


# --------------------------------------------------------------------------
# dataset_mixing_plan — per-source temperature-weighted token quotas.
def dataset_mixing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return rt.mixing_plan(docs)


DATASET_MIXING_PLAN_SQL = f"""
WITH per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(len({_TOKENS}))::BIGINT AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, n_tokens,
         pow(n_tokens::DOUBLE, {rt.MIX_ALPHA}) AS raw_w
  FROM per_src
),
tot AS (SELECT sum(raw_w) AS tot_w FROM w)
SELECT source, n_docs, n_tokens,
       round(raw_w / tot_w, 6) AS mix_weight,
       CAST(round(round(raw_w / tot_w, 6) * {rt.MIX_BUDGET_TOKENS}, 0) AS BIGINT)
         AS quota_tokens,
       round(CAST(round(round(raw_w / tot_w, 6) * {rt.MIX_BUDGET_TOKENS}, 0) AS BIGINT)
             / n_tokens::DOUBLE, 4) AS epochs
FROM w CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# vocab_pair_counts — BPE merge-step statistics (top-20 char pairs).
_BPE_TOP_N = 20


def vocab_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return rt.bpe_pair_counts(docs, top_n=_BPE_TOP_N)


VOCAB_PAIR_COUNTS_SQL = f"""
WITH words AS (
  SELECT tok, count(*)::BIGINT AS wc
  FROM (SELECT unnest({_TOKENS}) AS tok FROM documents)
  GROUP BY tok
),
pairs AS (
  SELECT wc, unnest(CASE WHEN len(cs) >= 2
                         THEN list_transform(range(len(cs)-1),
                              i -> cs[i+1] || cs[i+2])
                         ELSE [] END) AS pair
  FROM (SELECT wc, string_split(tok, '') AS cs FROM words)
),
agg AS (
  SELECT pair, count(*)::BIGINT AS n_words, sum(wc)::BIGINT AS n_occurrences
  FROM pairs GROUP BY pair
)
SELECT pair, n_words, n_occurrences, rank FROM (
  SELECT pair, n_words, n_occurrences,
         row_number() OVER (ORDER BY n_occurrences DESC, pair) AS rank
  FROM agg
) WHERE rank <= {_BPE_TOP_N}
"""


# --------------------------------------------------------------------------
# apply_mixing_plan — materialize the mix: copies per document.
def apply_mixing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return rt.apply_mixing(docs)


def _fold(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(string_split({expr}, ''), "
        f"c -> ascii(c)::BIGINT)), (h, c) -> (h*31 + c) % 1000000007)"
    )


APPLY_MIXING_PLAN_SQL = f"""
WITH plan AS ({DATASET_MIXING_PLAN_SQL})
SELECT d.doc_id, d.source,
       (CAST(floor(p.epochs) AS BIGINT)
        + CASE WHEN {_fold("concat_ws('|', d.source, d.doc_id::VARCHAR)")} % 100
                    < CAST(floor((p.epochs - floor(p.epochs)) * 100) AS BIGINT)
               THEN 1 ELSE 0 END) AS n_copies
FROM documents d JOIN plan p USING (source)
"""


# --------------------------------------------------------------------------
# vocab_coverage — corpus coverage of the top-N vocabulary.
_COV_CHECKPOINTS = (100, 1000, 5000)


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return rt.vocab_coverage(docs, checkpoints=_COV_CHECKPOINTS)


VOCAB_COVERAGE_SQL = f"""
WITH freq AS (
  SELECT tok, count(*) AS n
  FROM (SELECT unnest({_TOKENS}) AS tok FROM documents)
  GROUP BY tok
),
ranked AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS r FROM freq),
tot AS (SELECT sum(n) AS total FROM freq)
{" UNION ALL ".join(
    f'''SELECT {cp} AS vocab_size,
       sum(CASE WHEN r <= {cp} THEN n ELSE 0 END)::BIGINT AS covered_tokens,
       round(sum(CASE WHEN r <= {cp} THEN n ELSE 0 END) / total::DOUBLE, 6)
         AS coverage
FROM ranked CROSS JOIN tot GROUP BY total''' for cp in _COV_CHECKPOINTS)}
"""


# --------------------------------------------------------------------------
# hybrid_search_rrf — reciprocal-rank fusion of BM25 (lexical) and exact
# cosine ANN (dense, query = embedding of vec_id 0; vec_id aligns 1:1
# with doc_id in the test corpus).  Both branches are their standalone,
# scale-audited top-k plans; fusion joins two ≤20-row lists.
_HYBRID_QUERY_VEC = 0
_HYBRID_K_EACH = 20
_HYBRID_K = 10


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators import similarity_search as ann
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir, "documents", "embeddings")
    lex = rt.bm25_topk(t["documents"], _BM25_TERMS, k=_HYBRID_K_EACH)
    dense = ann.brute_force_topk(
        t["embeddings"],
        t["embeddings"].filter(F.col("vec_id") == _HYBRID_QUERY_VEC),
        k=_HYBRID_K_EACH,
    )
    return rt.hybrid_rrf(lex, dense, k=_HYBRID_K)


_HDOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(range(len(qv)), i -> qv[i+1] * cv[i+1])), (x, y) -> x + y)"
)


def _hnorm(v: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({v}, x -> x * x)), (x, y) -> x + y))"
    )


HYBRID_SEARCH_RRF_SQL = f"""
WITH lex AS (SELECT doc_id, rank AS lex_rank FROM ({BM25_SEARCH_SQL}) b),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {_HYBRID_QUERY_VEC}),
scored AS (
  SELECT e.vec_id AS doc_id,
         round({_HDOT.replace("cv", "e.v")} / ({_hnorm("qv")} * {_hnorm("e.v")}), 6)
           AS cos_sim
  FROM e CROSS JOIN q
  WHERE e.vec_id <> {_HYBRID_QUERY_VEC}
),
dense AS (
  SELECT doc_id, rank AS dense_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY cos_sim DESC, doc_id ASC) AS rank
    FROM scored
  ) WHERE rank <= {_HYBRID_K_EACH}
),
fused AS (
  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id, lex_rank, dense_rank,
         round(COALESCE(1.0 / ({rt.RRF_K} + lex_rank), 0.0)
               + COALESCE(1.0 / ({rt.RRF_K} + dense_rank), 0.0), 6) AS rrf_score
  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
)
SELECT doc_id, lex_rank, dense_rank, rrf_score, rank FROM (
  SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {_HYBRID_K}
"""


# --------------------------------------------------------------------------
# bpe_tokenize_stats — corpus subword frequencies under the fixed BPE
# merge table, applied natively (chained boundary-safe replaces; no UDF).
# The oracle mirrors the same replace chain (replace() semantics are
# identical in both engines); the SEMANTIC pin against true iterative
# BPE is the pure-Python parity test in tests/test_retrieval_ops.py.
_BPE_TOP = 20


def bpe_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return rt.bpe_token_stats(docs, top_n=_BPE_TOP)


def _bpe_chain_sql() -> str:
    expr = "'|' || regexp_replace(w, '(.)', '\\1|', 'g')"
    for a, b in rt.BPE_MERGES:
        pat, rep = f"'|{a}|{b}|'", f"'|{a}{b}|'"
        expr = f"replace(replace({expr}, {pat}, {rep}), {pat}, {rep})"
    return expr


BPE_TOKENIZE_STATS_SQL = f"""
WITH words AS (SELECT unnest({_TOKENS}) AS w FROM documents),
enc AS (SELECT {_bpe_chain_sql()} AS s FROM words),
occ AS (
  SELECT unnest(list_filter(string_split(s, '|'), x -> x != '')) AS subword
  FROM enc
),
agg AS (SELECT subword, count(*) AS n FROM occ GROUP BY subword)
SELECT subword, n, rank FROM (
  SELECT subword, n,
         row_number() OVER (ORDER BY n DESC, subword) AS rank
  FROM agg
) WHERE rank <= {_BPE_TOP}
"""


# --------------------------------------------------------------------------
# tokenizer_fertility — subwords per whitespace word, per source (round
# 5): the tokenizer-efficiency metric that decides how many TRAINING
# tokens a source actually costs (fertility ≈ 1 = merges cover the
# domain; high fertility = the source is expensive per word).  Map-only
# native BPE encode (operators/retrieval.bpe_apply — no UDF) + one
# per-source hash-agg; the oracle re-runs the same boundary-safe replace
# chain per word.
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from firmable_company_data_pipeline_spark.functions.textstats import tokens
    from firmable_company_data_pipeline_spark.session import spread

    docs = spread(load_tables(spark, sf_dir, "documents")["documents"])
    t = tokens(F.col("text"))
    per = docs.select(
        "source",
        F.size(t).alias("nw"),
        F.size(rt.bpe_apply(t)).alias("ns"),
    )
    return per.groupBy("source").agg(
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("ns").cast("long").alias("n_subwords"),
        F.round(F.sum("ns") / F.sum("nw"), 6).alias("fertility"),
    )


TOKENIZER_FERTILITY_SQL = f"""
WITH words AS (SELECT source, unnest({_TOKENS}) AS w FROM documents),
enc AS (SELECT source, {_bpe_chain_sql()} AS s FROM words),
cnt AS (
  SELECT source,
         len(list_filter(string_split(s, '|'), x -> x != '')) AS ns
  FROM enc
)
SELECT source, count(*)::BIGINT AS n_words, sum(ns)::BIGINT AS n_subwords,
       round(sum(ns)::DOUBLE / count(*), 6) AS fertility
FROM cnt GROUP BY source
"""


# --------------------------------------------------------------------------
# bpe_train — LEARN a BPE merge table from the corpus (verdict r10 #4:
# the iterative loop that closes the tokenizer lifecycle — before this,
# bpe_pair_counts scored one step and bpe_apply consumed a GIVEN list;
# now a user can produce the list).  Fixed small merge count so every
# step is SQL-expressible: the oracle programmatically nests one
# (pair-count -> argmax -> boundary-safe double-replace) CTE layer per
# step, the exact shape the Spark loop executes (vocabulary-sized after
# the one corpus word-count pass; argmax is a 1-row bounded driver
# read, the pagerank/CC loop convention).
_BPE_TRAIN_STEPS = 8


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return rt.bpe_train(docs, n_merges=_BPE_TRAIN_STEPS)


def _bpe_train_sql(n_steps: int) -> str:
    spell = r"'|' || regexp_replace(w, '(.)', '\1|', 'g')"
    ctes = [
        f"""w0 AS (
  SELECT count(*) AS wc, {spell} AS spelled
  FROM (SELECT unnest({_TOKENS}) AS w FROM documents)
  GROUP BY w
)"""
    ]
    for k in range(1, n_steps + 1):
        ctes.append(
            f"""p{k} AS (
  SELECT s[i+1] AS lhs, s[i+2] AS rhs, sum(wc) AS n
  FROM (SELECT wc, list_filter(string_split(spelled, '|'), x -> x != '') AS s
        FROM w{k - 1}) t,
       unnest(range(len(s) - 1)) AS u(i)
  WHERE len(s) >= 2
  GROUP BY 1, 2
),
b{k} AS (SELECT {k} AS step, lhs, rhs, n FROM p{k}
         ORDER BY n DESC, lhs ASC, rhs ASC LIMIT 1),
w{k} AS (
  SELECT wc,
         replace(replace(spelled, '|' || lhs || '|' || rhs || '|',
                         '|' || lhs || rhs || '|'),
                 '|' || lhs || '|' || rhs || '|',
                 '|' || lhs || rhs || '|') AS spelled
  FROM w{k - 1} CROSS JOIN b{k}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT step, lhs, rhs, n FROM b{k}" for k in range(1, n_steps + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT step, lhs, rhs, CAST(n AS BIGINT) AS n_occurrences"
        f"\nFROM ({union})"
    )


BPE_TRAIN_SQL = _bpe_train_sql(_BPE_TRAIN_STEPS)


QUERIES = {
    "tokenizer_fertility": tokenizer_fertility,
    "bpe_train": bpe_train,
    "bm25_search": bm25_search,
    "hybrid_search_rrf": hybrid_search_rrf,
    "bpe_tokenize_stats": bpe_tokenize_stats,
    "random_projection": random_projection,
    "dataset_mixing_plan": dataset_mixing_plan,
    "vocab_pair_counts": vocab_pair_counts,
    "apply_mixing_plan": apply_mixing_plan,
    "vocab_coverage": vocab_coverage,
}

ORACLES = {
    "tokenizer_fertility": TOKENIZER_FERTILITY_SQL,
    "bpe_train": BPE_TRAIN_SQL,
    "bm25_search": BM25_SEARCH_SQL,
    "hybrid_search_rrf": HYBRID_SEARCH_RRF_SQL,
    "bpe_tokenize_stats": BPE_TOKENIZE_STATS_SQL,
    "random_projection": RANDOM_PROJECTION_SQL,
    "dataset_mixing_plan": DATASET_MIXING_PLAN_SQL,
    "vocab_pair_counts": VOCAB_PAIR_COUNTS_SQL,
    "apply_mixing_plan": APPLY_MIXING_PLAN_SQL,
    "vocab_coverage": VOCAB_COVERAGE_SQL,
}

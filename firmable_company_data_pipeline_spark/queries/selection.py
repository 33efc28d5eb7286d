"""Data-selection pack (round 12): the three selection primitives a
training-data pipeline applies between dedup and packing —

* ``weighted_corpus_sample`` — Efraimidis–Spirakis weighted sampling
  without replacement (key = ln(u)/w, take the top-K keys), with the
  uniform drawn DETERMINISTICALLY from the repo's cross-engine char
  fold hash instead of an RNG, so the sample is reproducible
  run-to-run and engine-to-engine (the ``train_split_stratified``
  discipline applied to weighted reservoirs).
* ``nucleus_token_budget`` — per-source top-p selection by TOKEN
  budget: order each source's documents by quality and keep the
  smallest prefix holding ``p`` of the source's characters.  The
  count-based cousin (``quality_prune_per_source``) keeps 60% of the
  DOCUMENTS; a mixing plan budgets tokens, not documents, so the two
  cuts differ exactly when quality correlates with length.
* ``char_entropy_quality`` — character-distribution Shannon entropy
  per document: the classic cheap screen for gibberish, binary junk
  (entropy too high) and repetition/boilerplate (too low) that fires
  before any tokenizer runs.

Oracle-parity design as in ``queries/curation.py``: deterministic
char-fold hashing, no RNG, identical aliases both engines, float sums
rounded (4 dp, the ``unigram_surprise`` precedent for hash-agg float
accumulation) before compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.functions import textstats as ts
from firmable_company_data_pipeline_spark.session import load_tables, spread

_MOD = ts.HASH_MOD


def _fold_sql(expr: str) -> str:
    """DuckDB mirror of ``ts.char_fold_hash`` (h*31 + ascii) % MOD."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(string_split({expr}, ''), "
        f"c -> ascii(c)::BIGINT)), (h, c) -> (h*31 + c) % {_MOD})"
    )


# ---------------------------------------------------------------------------
# weighted_corpus_sample — top-K weighted reservoir, weight = n_chars.
#
# A-ES (Efraimidis & Spirakis 2006): draw u~U(0,1] per item, keep the K
# largest u^(1/w) — equivalently the K largest ln(u)/w, which avoids
# pow.  u = (fold_hash(doc_id)+1)/(MOD+1) is deterministic and
# identically computed on both engines; the sort key is rounded to 9 dp
# BEFORE ranking so a last-ulp ln() divergence cannot flip membership
# at the cut, with doc_id as the total-order tie-break.
#
# Scale: orderBy().limit(K) compiles to TakeOrderedAndProject — each
# input partition keeps its local top-K and only K-row heaps reach the
# driver-side merge, so a 100 TB corpus costs one scan and no shuffle.
_SAMPLE_K = 200


def weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    u = (ts.char_fold_hash(F.col("doc_id").cast("string")) + 1).cast("double") / float(
        _MOD + 1
    )
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    key = F.round(F.log(u) / w, 9)
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(_SAMPLE_K)
    )


WEIGHTED_CORPUS_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       round(ln(({_fold_sql("doc_id::VARCHAR")} + 1) / {float(_MOD + 1)!r})
             / greatest(n_chars, 1), 9) AS sample_key
FROM documents
ORDER BY sample_key DESC, doc_id
LIMIT {_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# nucleus_token_budget — per-source top-p selection by character budget.
#
# Order each source's docs by (quality DESC, doc_id), keep rows while
# the running character total stays within ceil(p * source_chars); the
# best document is always kept even when it alone blows the budget
# (src_rank = 1), so no source is emptied.  Quality is the shared
# ``textstats`` score the prune/classifier packs already oracle.
#
# Scale: ONE window exchange partitioned by source (rank, running sum
# and source total share it).  Same caveat as quality_prune: for a
# corpus where one source is billions of docs, swap the exact window
# for an approx_percentile length-threshold per source — documented
# approximation, same output contract.
_NUCLEUS_P = 0.5


def nucleus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    q = ts.text_features(spread(docs), keep=("doc_id", "source", "n_chars")).select(
        "doc_id", "source", "n_chars", "quality"
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wsrc = Window.partitionBy("source")
    staged = q.select(
        "doc_id",
        "source",
        "quality",
        F.sum("n_chars").over(run).alias("cum_chars"),
        F.sum("n_chars").over(wsrc).alias("src_chars"),
        F.row_number().over(w).alias("src_rank"),
    )
    budget = F.ceil(F.col("src_chars") * F.lit(_NUCLEUS_P))
    return staged.select(
        "doc_id",
        "source",
        "quality",
        "cum_chars",
        "src_chars",
        "src_rank",
        ((F.col("cum_chars") <= budget) | (F.col("src_rank") == 1)).alias("keep"),
    )


def _nucleus_sql() -> str:
    from firmable_company_data_pipeline_spark.queries.llmops import TEXT_STATS_SQL

    return f"""
WITH q AS (
  SELECT s.doc_id, d.source, d.n_chars, s.quality
  FROM ({TEXT_STATS_SQL}) s JOIN documents d USING (doc_id)
),
r AS (
  SELECT doc_id, source, quality,
         sum(n_chars) OVER (PARTITION BY source
                            ORDER BY quality DESC, doc_id
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_chars,
         sum(n_chars) OVER (PARTITION BY source)::BIGINT AS src_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY quality DESC, doc_id) AS src_rank
  FROM q
)
SELECT doc_id, source, quality, cum_chars, src_chars, src_rank,
       (cum_chars <= ceil(src_chars * {_NUCLEUS_P}) OR src_rank = 1) AS keep
FROM r
"""


NUCLEUS_TOKEN_BUDGET_SQL = _nucleus_sql()


# ---------------------------------------------------------------------------
# char_entropy_quality — per-doc character-distribution Shannon entropy.
#
# entropy_bits = (ln N − Σ n·ln n / N) / ln 2 over the lowercased
# character histogram — algebraically the −Σ p·log2 p definition but
# with ONE log per distinct character and exact integer counts
# everywhere outside the final fold.  Suspect band: printed English
# sits near 4.1 bits/char; below LO is repetition/boilerplate, above
# HI is random-looking bytes (base64 blobs, minified junk).
#
# Scale: per-(doc, char) counts collapse FIRST (hash-agg with map-side
# combine; per-doc alphabet is bounded by the charset, so the second
# per-doc agg sees ≤ ~100 rows per doc).  Float accumulation is the
# bounded Σ over that alphabet — rounded 4 dp (unigram_surprise
# precedent).
_ENTROPY_LO, _ENTROPY_HI = 2.0, 5.2


def char_entropy(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """DataFrame-level core (unit-testable on constructed frames)."""
    chars = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(text_col), "")).alias("c"),
    )
    per = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    n_tot = F.sum("n")
    ent_nats = F.log(n_tot) - F.sum(F.col("n") * F.log("n")) / n_tot
    ent_bits = F.round(ent_nats / F.lit(float(__import__("math").log(2.0))), 4)
    return (
        per.groupBy("doc_id")
        .agg(
            n_tot.cast("long").alias("n_chars_counted"),
            ent_bits.alias("entropy_bits"),
        )
        .select(
            "doc_id",
            "n_chars_counted",
            "entropy_bits",
            (
                (F.col("entropy_bits") < _ENTROPY_LO)
                | (F.col("entropy_bits") > _ENTROPY_HI)
            ).alias("suspect"),
        )
    )


def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return char_entropy(spread(docs))


CHAR_ENTROPY_QUALITY_SQL = f"""
WITH per AS (
  SELECT doc_id, c, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split(lower(text), '')) AS c FROM documents)
  GROUP BY doc_id, c
),
e AS (
  SELECT doc_id, sum(n)::BIGINT AS n_chars_counted,
         round((ln(sum(n)) - sum(n * ln(n)) / sum(n))
               / {float(__import__("math").log(2.0))!r}, 4) AS entropy_bits
  FROM per GROUP BY doc_id
)
SELECT doc_id, n_chars_counted, entropy_bits,
       (entropy_bits < {_ENTROPY_LO} OR entropy_bits > {_ENTROPY_HI}) AS suspect
FROM e
"""


QUERIES = {
    "weighted_corpus_sample": weighted_corpus_sample,
    "nucleus_token_budget": nucleus_token_budget,
    "char_entropy_quality": char_entropy_quality,
}

ORACLES = {
    "weighted_corpus_sample": WEIGHTED_CORPUS_SAMPLE_SQL,
    "nucleus_token_budget": NUCLEUS_TOKEN_BUDGET_SQL,
    "char_entropy_quality": CHAR_ENTROPY_QUALITY_SQL,
}

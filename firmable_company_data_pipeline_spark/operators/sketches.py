"""Mergeable count-min sketch building blocks (round 5).

A CMS is ``CMS_D × CMS_W`` counters; an occurrence increments one
bucket per hash row, an estimate is the MIN over its D buckets —
always an overcount (collisions only add), E[overcount] ≤ N/W per row.
The hashes are the repo's explicit cross-engine arithmetic (char-fold
+ per-row affine permute, the MinHash constant pattern), so a DuckDB
oracle reproduces every counter bit-for-bit.

Why it lives here and not inline in a query: counters ADD across
partitions/batches — `cms_partial` is the per-batch map-side build,
`cms_merge` the combiner — which makes the sketch the heavy-hitter
structure a streaming refresh can maintain incrementally
(`streaming/jobs.streaming_cms_refresh`).  At 100 TB the partial per
batch is at most D·W rows (kilobytes) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.functions.textstats import HASH_MOD

CMS_D, CMS_W = 3, 512
CMS_A = [(2654435761 * (d + 13)) % HASH_MOD for d in range(CMS_D)]
CMS_B = [(40503 * (d + 7) * (d + 7) + 29) % HASH_MOD for d in range(CMS_D)]


def cms_bucket(d: int, h: F.Column) -> F.Column:
    """Row-``d`` bucket of a pre-hashed key (a char-fold long)."""
    return F.pmod(
        F.pmod(F.lit(CMS_A[d]) * h + F.lit(CMS_B[d]), F.lit(HASH_MOD)),
        F.lit(CMS_W),
    )


def cms_partial(hashed: DataFrame, h_col: str = "h") -> DataFrame:
    """(d, bucket, cnt) counters for one occurrence stream — the
    map-side/per-batch build; ≤ D·W output rows.

    Single-pass by construction: the D (d, bucket) cells come from ONE
    explode over an in-row array, not a D-way union — a union would
    re-evaluate the (possibly expensive, usually unpersisted) upstream
    tokenize/hash pipeline once per hash row (found by review: the
    streaming refresh paid 3× per micro-batch)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), cms_bucket(d, F.col(h_col)).alias("bucket")
            )
            for d in range(CMS_D)
        ]
    )
    return (
        hashed.select(F.explode(cells).alias("c"))
        .select("c.d", "c.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(partials: DataFrame) -> DataFrame:
    """Fold any union of partial counter tables into one sketch —
    counters add, which is the mergeability contract the streaming
    refresh relies on."""
    return partials.groupBy("d", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cms_lookup(keys: DataFrame, sketch: DataFrame, h_col: str = "h") -> DataFrame:
    """Point estimates for pre-hashed keys: min over the D broadcast-
    joined buckets, appended as ``est_n``.

    LEFT join + coalesce(0): a key never counted has empty cells, and
    an inner join would drop them — inflating the min to whatever
    collision counts remain, or losing the key entirely (found by
    review; a CMS estimate for an absent key is exactly 0)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), cms_bucket(d, F.col(h_col)).alias("bucket")
            )
            for d in range(CMS_D)
        ]
    )
    group_cols = list(keys.columns)
    cand = keys.select(*group_cols, F.explode(cells).alias("c")).select(
        *group_cols, "c.d", "c.bucket"
    )
    return (
        cand.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(*group_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_n"))
    )


# ---------------------------------------------------------------------------
# Fixed-bin value histogram — the quantile member of the mergeable-sketch
# family (CMS = heavy hitters, HLL = distinct, this = rank/quantile).
# Bin edges are DATA-INDEPENDENT constants, which is what makes partials
# add across partitions/batches (`hist_partial` + `hist_merge`, the same
# contract as cms_partial/cms_merge) and the streaming refresh possible
# (`streaming/jobs.streaming_histogram_refresh`).  A quantile estimate
# reads the cumulative bin counts (HIST_BINS rows, constant) and is off
# by at most one bin width — the error contract `value_quantile_sketch`
# materializes against the exact distributed quantile.

HIST_LO, HIST_WIDTH, HIST_BINS = 0.0, 2.0, 256


def hist_bin(value: F.Column) -> F.Column:
    """Clamped fixed-width bin index of a double value.  Pure IEEE
    arithmetic on the stored double, so DuckDB reproduces every index
    bit-for-bit from the same parquet."""
    raw = F.floor((value - F.lit(HIST_LO)) / F.lit(HIST_WIDTH)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(HIST_BINS - 1))


def hist_partial(df: DataFrame, value_col: str = "value") -> DataFrame:
    """(bin, cnt) counters for one value stream — map-side/per-batch
    build, ≤ HIST_BINS output rows regardless of input size.

    NULL values are excluded (standard aggregate semantics): without
    the filter, Spark's greatest/least skip the NULL operand and a
    NULL value would silently land in bin 0, biasing every quantile
    low (review r7)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(hist_bin(F.col(value_col)).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(partials: DataFrame) -> DataFrame:
    """Fold any union of partial histograms — counters add."""
    return partials.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch (round 12): the
# DETERMINISTIC cross-engine cousin of approx_count_distinct.  HLL
# register layouts are engine-private (our approx_distinct_users query
# can only carry an error-CONTRACT oracle); KMV is pure order
# statistics over an explicit hash, so the estimate itself
# hash-matches between Spark and DuckDB — and the sketch (k longs per
# group) is mergeable: union two groups' bottom-k lists, re-sort, cut
# at k.  Estimator (Bar-Yossef et al. 2002): with h uniform on [0, P),
# the k-th smallest hash h_(k) satisfies E[h_(k)/P] ~ k/(n+1), giving
# n-hat = (k-1) * P / h_(k).
KMV_P = 1_000_000_007
# Affine bijection on [0, P): spreads a dense integer id space
# uniformly; same public-LCG constant family as the bloom/minhash
# permutes.
KMV_A, KMV_B = 1103515245, 12345
_KMV_SALTS = 64


def kmv_hash(key: F.Column) -> F.Column:
    """h(key) = (key·A + B) mod P — a bijection on [0, P) ONLY: key
    domains inside [0, P) keep distinct hashes exactly; keys differing
    by a multiple of P collide (the standard KMV hash-collision
    undercount, negligible for k ≪ P).  Negative keys are well-defined
    (pmod folds them into [0, P)) but any DuckDB oracle replaying this
    hash must fold the sign too — plain ``%`` follows the dividend's
    sign, so mirror as ``((u % P) + P) % P`` (advice r12; done in
    queries/scale.py's KMV oracles)."""
    return F.pmod(
        F.pmod(key.cast("long"), F.lit(KMV_P)) * F.lit(KMV_A) + F.lit(KMV_B),
        F.lit(KMV_P),
    )


def kmv_partial(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch of ``df``: (g, hs) with ``hs`` the sorted
    bottom-k hashes — k longs per group however many keys exist.  The
    map-side build of the mergeable pair (``kmv_merge`` is the
    combiner), same split as ``cms_partial``/``cms_merge``."""
    from pyspark.sql import Window

    # Distinct on the HASH, not the key: kmv_merge dedups folded
    # partials by hash, so the one-pass build must too or a key domain
    # spanning a multiple of P breaks merge == one-pass (review r12 —
    # identical output for domains < P, where the hash is a bijection).
    hashed = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("key"))
        .select("g", kmv_hash(F.col("key")).alias("h"))
        .distinct()
    )
    salted = hashed.withColumn("salt", F.pmod(F.col("h"), F.lit(_KMV_SALTS)))
    w = Window.partitionBy("g", "salt").orderBy(F.asc("h"))
    bottom = salted.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return bottom.groupBy("g").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs")
    )


def kmv_merge(partials: DataFrame, k: int = 64) -> DataFrame:
    """Fold any union of per-batch KMV partials back into one sketch
    per group: explode, dedup (a key seen in two batches hashes
    identically — the hash is a bijection, so DISTINCT is exact
    key-level dedup), re-sort, cut at k.  Input per group is ≤
    n_batches·k longs, so the fold is bounded however much history the
    batches cover.  Bottom-k of a union IS the bottom-k of the union of
    bottom-ks — the merged sketch is identical to a single-pass build
    (pinned by the stream-vs-batch test)."""
    exploded = partials.select("g", F.explode("hs").alias("h")).distinct()
    return exploded.groupBy("g").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs")
    )


def kmv_estimate(hs: F.Column, k: int = 64) -> F.Column:
    """Distinct-count estimate off a sketch array: exact size when the
    group never filled k slots, else (k-1)·P/h_(k), rounded 2 dp."""
    return F.when(F.size(hs) < k, F.size(hs).cast("double")).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(KMV_P)) / F.element_at(hs, k), 2
        )
    )


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate via the bottom-k of hashed
    keys.  Output: (group, n_exact, est_distinct, rel_err) — n_exact is
    the true COUNT(DISTINCT) computed alongside so the query doubles as
    the sketch's error card.

    Scale shape: distinct (group, hash) → per-(group, salt) bottom-k
    with a row_number window — Spark rewrites rank<=k to
    WindowGroupLimit, so every input partition pre-filters to k rows
    per (group, salt) BEFORE the shuffle — → one final per-group merge
    of ≤ 64·k hashes (array_sort + slice, driver-free).  No window
    partition ever sorts more than its salt bucket's share, and the
    final state per group is k longs however many distinct keys exist.
    """
    merged = kmv_partial(df, group_col, key_col, k)
    # size(hs) < k can only happen when the group's TOTAL distinct
    # count is < k (a salt bucket truncates only past k entries), so
    # the exact count is sitting in the sketch — kmv_estimate uses it.
    est = kmv_estimate(F.col("hs"), k)
    exact = (
        df.select(F.col(group_col).alias("g"), F.col(key_col).alias("key"))
        .groupBy("g")
        .agg(F.count_distinct("key").alias("n_exact"))
    )
    return (
        merged.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "n_exact",
            est.alias("est_distinct"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
    )


def kmv_intersection(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    k: int = 64,
) -> DataFrame:
    """KMV set-operation estimator (Beyer et al. 2007): estimate
    |A ∪ B| and |A ∩ B| from the two sides' bottom-k sketches alone —
    the pre-join cardinality diagnostic that answers "how big is this
    join's key overlap" at 100 TB for the cost of two sketch builds
    (each one WindowGroupLimit pass) instead of the join itself.

    Union sketch = bottom-k of the merged lists; with ρ = the fraction
    of union-sketch hashes present in BOTH sides' sketches,
    est_inter = ρ · est_union.  Every term is order statistics over
    the bijective hash — deterministic, cross-engine.

    Output: one row (n_sketch_a, n_sketch_b, est_union, est_overlap,
    est_jaccard) — all estimates 2 dp.
    """
    ga = df_a.select(F.lit("s").alias("_g"), F.col(key_a).alias("key"))
    gb = df_b.select(F.lit("s").alias("_g"), F.col(key_b).alias("key"))
    sa = kmv_partial(ga, "_g", "key", k).select(F.col("hs").alias("ha"))
    sb = kmv_partial(gb, "_g", "key", k).select(F.col("hs").alias("hb"))
    both = sa.crossJoin(sb)  # 1 row x 1 row
    union_hs = F.slice(
        F.array_sort(F.array_union(F.col("ha"), F.col("hb"))), 1, k
    )
    inter = F.array_intersect(
        F.array_intersect(union_hs, F.col("ha")), F.col("hb")
    )
    est_union = kmv_estimate(union_hs, k)
    rho = F.size(inter).cast("double") / F.size(union_hs)
    return both.select(
        F.size("ha").alias("n_sketch_a"),
        F.size("hb").alias("n_sketch_b"),
        est_union.alias("est_union"),
        F.round(rho * est_union, 2).alias("est_overlap"),
        F.round(rho, 4).alias("est_jaccard"),
    )

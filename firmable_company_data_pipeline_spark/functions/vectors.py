"""Vector math over ``array<float>`` embedding columns, as pure Column
expressions (charter extension: similarity search / near-dup over the
driver's ``embeddings`` table).

Design for oracle parity: every reduction is an explicit *sequential
left fold* in element order (``F.aggregate`` over ``zip_with``), which
DuckDB mirrors with ``list_reduce(list_prepend(0.0, list_transform(...)))``
— identical IEEE-754 double operations in identical order, so results
match bit-for-bit.  Everything stays JVM-side (no UDF).

Round 13 (optimization; guide §1.2 "per-task work"): higher-order
functions are NOT whole-stage-codegen'd — ``F.aggregate`` evaluates an
interpreted lambda per element, which made the brute-force pair queries
(``dedup_embedding_cosine``: ~4M candidate pairs × 64 interpreted fold
steps) compute-bound on the INTERPRETER, not on the arithmetic.  When
the caller knows the (constant) vector dimension, ``dot``/``norm2``/
``cosine`` accept ``d`` and emit the SAME sequential left fold as an
unrolled expression tree — ``((0.0 + a[1]*b[1]) + a[2]*b[2]) + …`` —
plain codegen'd double arithmetic, identical IEEE-754 operations in
identical order, so values are bit-for-bit unchanged (pinned by
tests/test_vectors_fastpath.py).  A per-row size guard falls back to
the HOF fold for any row whose array length differs from ``d``, so the
fast path can never change a result, only speed it up.  Callers probe
``d`` once per frame with :func:`probe_dim` (a one-row job — O(1) at
any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_double(col: Column) -> Column:
    """array<float> → array<double> (exact widening)."""
    return col.cast("array<double>")


def probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """The array length of ``vec_col``'s first row (None on an empty
    frame) — the O(1)-rows driver probe that unlocks the unrolled fold
    fast path.  Dimensions are constant per embedding table by
    construction; rows that nevertheless differ are handled row-level
    by the size guard in :func:`dot`/:func:`norm2`."""
    row = df.select(F.size(F.col(vec_col)).alias("_d")).first()
    return int(row["_d"]) if row is not None and row["_d"] is not None else None


def _dot_fold(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm2_fold(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def _unrolled(terms) -> Column:
    acc: Column = F.lit(0.0)
    for t in terms:
        acc = acc + t
    return acc


def dot(a: Column, b: Column, d: int | None = None) -> Column:
    """Sequential-fold dot product Σ a[i]*b[i] (double).  With ``d``:
    the k-step fold unrolled into codegen'd arithmetic for rows where
    both arrays have exactly ``d`` elements (identical values — same
    ops, same order), HOF-fold fallback otherwise."""
    if d is None:
        return _dot_fold(a, b)
    unrolled = _unrolled(
        F.element_at(a, i) * F.element_at(b, i) for i in range(1, d + 1)
    )
    return F.when(
        (F.size(a) == d) & (F.size(b) == d), unrolled
    ).otherwise(_dot_fold(a, b))


def norm2(a: Column, d: int | None = None) -> Column:
    """Sequential-fold squared L2 norm (``d``: see :func:`dot`)."""
    if d is None:
        return _norm2_fold(a)
    unrolled = _unrolled(
        F.element_at(a, i) * F.element_at(a, i) for i in range(1, d + 1)
    )
    return F.when(F.size(a) == d, unrolled).otherwise(_norm2_fold(a))


def cosine(a: Column, b: Column, d: int | None = None) -> Column:
    """Cosine similarity in double precision (caller rounds for display)."""
    return dot(a, b, d) / (F.sqrt(norm2(a, d)) * F.sqrt(norm2(b, d)))

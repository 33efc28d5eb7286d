"""Vector math over ``array<float>`` embedding columns, as pure Column
expressions (charter extension: similarity search / near-dup over the
driver's ``embeddings`` table).

Design for oracle parity: every reduction is an explicit *sequential
left fold* in element order (``F.aggregate`` over ``zip_with``), which
DuckDB mirrors with ``list_reduce(list_prepend(0.0, list_transform(...)))``
— identical IEEE-754 double operations in identical order, so results
match bit-for-bit.  Everything stays JVM-side (no UDF): at 100 TB the
dot products run inside whole-stage codegen on the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(col: Column) -> Column:
    """array<float> → array<double> (exact widening)."""
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product Σ a[i]*b[i] (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    """Sequential-fold squared L2 norm."""
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision (caller rounds for display)."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))

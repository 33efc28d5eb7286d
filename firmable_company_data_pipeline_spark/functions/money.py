"""Cross-engine exact money arithmetic — the shared closure for the
``round(double, k)`` boundary class documented in ARCHITECTURE.md
(“Cross-engine determinism”).

The class: Spark rounds a double's shortest decimal representation
HALF_UP while DuckDB rounds the exact binary value, so any
``round(sum(double_expr), 2)`` that lands on an exact ``.xx5`` boundary
can differ between the engines (sf0.1 hit real rows in round 7:
`supplier_nation_cube`, `events_ewma_daily`).  Two remedies, both here
so the next query that trips the class has something to reach for
instead of a hand-rolled per-site fix (review r7):

* **Decimal-space arithmetic** (:func:`dec2` + :func:`dec_sum`): cast
  the ≤2-dp money/rate doubles to exact DECIMALs *before* multiplying,
  sum exactly, ``round()`` the DECIMAL (HALF_UP/half-away in both
  engines), cast to double once at the end.  Order-independent and
  boundary-free; used by the warehouse revenue queries.
* **Floor-based HALF_UP on a double** (:func:`half_up`): when the value
  must stay a double end-to-end, ``floor(x*10^k + 0.5)/10^k`` is the
  same IEEE operation sequence in both engines.  Used by
  `events_ewma_daily`, whose smoothed values are inherently doubles.

Queries whose plain ``round(sum(double), 2)`` has ALREADY been proven
green at 10× the driver SF (core.py's revenue family) keep their
current plans — rewriting a driver-green plan without a driver re-check
violates the evidence-ledger policy; they migrate here the round after
any of them lands in the rotation window or trips a boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column) -> Column:
    """Order-independent exact sum: cast to DECIMAL(27,10) per row,
    sum exactly.  Caller rounds the DECIMAL and casts to double once."""
    return F.sum(col.cast("decimal(27,10)"))


def dec2(col: Column, prec: int = 15) -> Column:
    """Exact 2-dp DECIMAL view of a money/rate double.  TPC-H money and
    discount columns carry <= 2 decimals, and a 2-dp double rounds to
    the same DECIMAL(p,2) in every engine (representation error ~1e-14,
    far below the 0.005 boundary).  Doing revenue arithmetic in decimal
    keeps every per-row product exact — the alternative, casting a
    double PRODUCT to DECIMAL(27,10), sits on a HALF_UP boundary that
    Spark (shortest-repr) and DuckDB (exact binary value) can round
    apart."""
    return col.cast(f"decimal({prec},2)")


def half_up(col: Column, places: int) -> Column:
    """HALF_UP rounding of a double as an explicit IEEE operation
    sequence — ``floor(x * 10^places + 0.5) / 10^places`` — identical
    in any engine, unlike ``round(double, k)`` whose tie-breaking is
    representation-dependent (see module docstring).  For non-negative
    values (HALF_UP == half-away there); money sums that can go
    negative should use the decimal path instead."""
    scale = float(10**places)
    return F.floor(col * scale + F.lit(0.5)) / scale

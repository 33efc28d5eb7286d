"""Skew-mitigation join operators (charter extension — the reference
joins everything through pandas merges / SQL on a single Postgres node,
`transform/entity_matching.py:103-128`, and never meets shuffle skew).

At 100 TB a handful of hot keys (the NULL-like placeholder customer, a
viral user_id) concentrate an entire shuffle partition on one reducer.
AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`, on in our
session factory) handles SORT-MERGE skew after the fact; explicit
salting is the a-priori fix that also covers shuffle-hash joins and
bounds the per-reducer working set deterministically.

``salted_join`` is semantics-preserving by construction: the small side
is replicated once per salt value, so every (left-row, right-row) match
that exists un-salted exists in exactly one salt bucket — results are
IDENTICAL to the plain join (the oracle for the demo query is the plain
SQL join), only the shuffle layout changes: a key that previously
hashed to one reducer now spreads over ``n_salt`` of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salt: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``left`` (big, possibly key-skewed) to ``right`` (small
    enough to replicate ``n_salt``×, too big or deliberately not
    broadcast) with a salted key.

    The left side gets a per-row salt and the right side is exploded
    once per salt value (``n_salt``× replication ≪ broadcast for
    mid-sized dims since each reducer still receives only 1/n_salt of
    the big side's rows per key).  The join runs on ``(key…, _salt)``
    and the salt column is dropped.

    Salt derivation: by default ``xxhash64(all left columns) mod
    n_salt`` — DETERMINISTIC under task retry and stage recompute.  A
    per-row nondeterministic salt (``monotonically_increasing_id``,
    ``rand``) was rejected on purpose: it is a shuffle key, and if a
    left partition is recomputed after a shuffle-fetch failure its rows
    can re-salt differently and land on different reducers — the
    classic lost/duplicated-row hazard, at exactly the failure-prone
    scale this operator targets.  The cost of determinism: rows that
    are byte-identical across ALL columns share a salt and don't
    spread; in practice hot-key rows differ in their other attributes
    (the placeholder customer's orders still have distinct orderkeys).
    Pass ``salt_cols`` to pick the distinguishing columns explicitly
    when the full-row hash is wasteful or the frame carries huge
    payload columns.

    ``how`` must be one of inner/left/left_semi/left_anti: right-side
    replication would duplicate unmatched right rows under right/full
    joins.  The join is hinted ``shuffle_hash`` — under a broadcast
    there is no shuffle to de-skew and the salt would only widen the
    build side.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if salt_cols:
        hash_cols = salt_cols
    else:
        # xxhash64 rejects map-typed inputs (at any nesting depth) at
        # analysis time — exclude them from the default full-row hash so
        # the operator keeps working on frames with properties maps; the
        # join keys are always hashable, so the fallback is never empty.
        def _hashable(dt) -> bool:
            from pyspark.sql.types import ArrayType, MapType, StructType

            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return _hashable(dt.elementType)
            if isinstance(dt, StructType):
                return all(_hashable(f.dataType) for f in dt.fields)
            return True

        hash_cols = [f.name for f in left.schema.fields if _hashable(f.dataType)]
        # If nothing beyond the join keys is hashable, the salt is a
        # pure function of the key — a hot key still lands on one
        # reducer, so the n_salt-fold right-side replication buys zero
        # skew spreading.  Don't pay for nothing (advice r5): warn and
        # fall back to a plain shuffle-hash join (the n_salt=1
        # degenerate), and tell the caller to pass salt_cols.
        if set(hash_cols) <= set(keys):
            import warnings

            warnings.warn(
                "salted_join: only the join key columns are hashable on the "
                "left side, so the default salt cannot spread a skewed key "
                "across reducers — falling back to an unsalted join; pass "
                "salt_cols with a map-free distinguishing column to salt",
                stacklevel=2,
            )
            n_salt = 1
            hash_cols = keys
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(n_salt))
    l_salted = left.withColumn("_salt", salt.cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salt)]))
    )
    out = l_salted.join(r_salted.hint("shuffle_hash"), keys + ["_salt"], how)
    return out.drop("_salt")

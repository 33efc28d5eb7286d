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

    Salt derivation: by default ``monotonically_increasing_id() mod
    n_salt`` — a genuinely per-ROW value, so even a hot key whose rows
    are byte-identical (the NULL-placeholder-customer case this
    operator exists for) spreads across reducers.  ANY salt assignment
    yields identical join results (the right side exists under every
    salt), so the id's task-dependent numbering is semantics-free.
    Pass ``salt_cols`` to derive the salt from data instead when a
    reproducible physical row placement matters (e.g. plan diffing);
    note value-duplicate rows then share a salt.

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
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    else:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    l_salted = left.withColumn("_salt", salt.cast("int"))
    r_salted = right.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(n_salt)]))
    )
    out = l_salted.join(r_salted.hint("shuffle_hash"), keys + ["_salt"], how)
    return out.drop("_salt")

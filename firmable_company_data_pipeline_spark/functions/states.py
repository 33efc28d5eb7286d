"""Australian state standardization (reference F9,
transform/data_cleaning.py:31-53).

Exact-map lookup first; fuzzy fallback against the map keys with a
similarity threshold; NULL when nothing clears the bar. The reference
uses fuzzywuzzy ``process.extractOne`` (WRatio); our native fallback
scores with a Levenshtein ratio against each key and takes the arg-max —
same accept-if->85 contract, deterministic tie-break on map order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# transform/data_cleaning.py:31-42 — insertion order preserved for ties.
STATE_MAPPING: dict[str, str] = {
    "NSW": "NSW",
    "NEW SOUTH WALES": "NSW",
    "VIC": "VIC",
    "VICTORIA": "VIC",
    "QLD": "QLD",
    "QUEENSLAND": "QLD",
    "SA": "SA",
    "SOUTH AUSTRALIA": "SA",
    "WA": "WA",
    "WESTERN AUSTRALIA": "WA",
    "TAS": "TAS",
    "TASMANIA": "TAS",
    "ACT": "ACT",
    "AUSTRALIAN CAPITAL TERRITORY": "ACT",
    "NT": "NT",
    "NORTHERN TERRITORY": "NT",
}


def _lev_ratio(a: Column, b: Column) -> Column:
    """``(1 - levenshtein/max_len) * 100`` similarity, 0..100."""
    max_len = F.greatest(F.length(a), F.length(b))
    return F.when(max_len == 0, F.lit(100.0)).otherwise(
        (F.lit(1.0) - F.levenshtein(a, b) / max_len) * 100.0
    )


def standardize_state(state: Column, fuzzy_threshold: float = 85.0) -> Column:
    """Normalize then map; fuzzy-fallback against map keys above threshold.

    Normalization per the reference: trim, upper, collapse ``[.\\s]+`` to a
    single space (transform/data_cleaning.py:48).
    """
    cleaned = F.trim(F.regexp_replace(F.upper(F.trim(state)), r"[\.\s]+", " "))
    # Second exact attempt with spaces removed: catches dotted abbreviations
    # ("N.S.W." → "N S W" → "NSW") that the reference resolves via WRatio's
    # sub-token handling — our deterministic native equivalent.
    despaced = F.replace(cleaned, F.lit(" "), F.lit(""))

    exact = None
    for key, abbrev in STATE_MAPPING.items():
        cond = (cleaned == key) | (despaced == key)
        exact = F.when(cond, abbrev) if exact is None else exact.when(cond, abbrev)

    # Fuzzy fallback: arg-max of levenshtein ratio over the 16 keys.
    # greatest() over scored structs keeps it one expression, JVM-side.
    scored = F.array(
        *[
            F.struct(
                _lev_ratio(cleaned, F.lit(key)).alias("score"),
                F.lit(idx).alias("ord"),
                F.lit(abbrev).alias("abbrev"),
            )
            for idx, (key, abbrev) in enumerate(STATE_MAPPING.items())
        ]
    )
    # Max by (score, -ord): highest score wins; earlier map entry on ties.
    best = F.array_max(
        F.transform(
            scored,
            lambda s: F.struct(
                s["score"].alias("score"),
                (-s["ord"]).alias("neg_ord"),
                s["abbrev"].alias("abbrev"),
            ),
        )
    )
    fuzzy = F.when(best["score"] > fuzzy_threshold, best["abbrev"])

    return F.when(state.isNull(), F.lit(None).cast("string")).otherwise(
        exact.otherwise(fuzzy)
    )

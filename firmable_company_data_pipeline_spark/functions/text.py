"""Text cleaning functions (reference: extract/commoncrawl_scraper.py:25-38,
transform/data_cleaning.py:56-68).

All pure Column expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# TLD suffixes stripped by the reference, longest-first so `.com.au` wins
# over `.au` (extract/commoncrawl_scraper.py:34-36 strips iteratively; a
# single longest-match strip is observably identical for real domains).
_TLD_SUFFIXES = [".com.au", ".net.au", ".org.au", ".au", ".com", ".net", ".org"]


def clean_text(col: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim.

    Reference F1: ``' '.join(text.split())``
    (extract/commoncrawl_scraper.py:25-26). Python ``str.split()`` splits on
    any whitespace incl. tabs/newlines, which ``\\s+`` matches.
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def title_case(col: Column) -> Column:
    """Spark-native approximation of Python ``str.title()`` via ``initcap``.

    Deviation (documented): ``"ab1c".title() == "Ab1C"`` but
    ``initcap == "Ab1c"`` — ``initcap`` only capitalizes after whitespace,
    ``str.title()`` after any non-alpha. Identical on purely alphabetic
    space-separated words, which is what the cleaning pipeline produces.
    """
    return F.initcap(col)


def extract_company_name(domain: Column) -> Column:
    """Strip a known TLD suffix, map ``-``/``_`` to spaces, title-case.

    Reference F3 (extract/commoncrawl_scraper.py:32-38).
    """
    # Longest-match suffix strip expressed as one anchored alternation.
    alternation = "|".join(s.replace(".", r"\.") for s in _TLD_SUFFIXES)
    stripped = F.regexp_replace(domain, f"({alternation})$", "")
    spaced = F.translate(stripped, "-_", "  ")
    return title_case(spaced)


def clean_company_name(name: Column) -> Column:
    """Replace chars outside ``[A-Za-z0-9 &]`` with space, collapse, title.

    Reference F10 (transform/data_cleaning.py:56-61). NULL/empty → NULL.
    """
    replaced = F.regexp_replace(name, r"[^A-Za-z0-9 &]", " ")
    collapsed = F.trim(F.regexp_replace(replaced, r"\s+", " "))
    return F.when(name.isNull() | (name == ""), F.lit(None).cast("string")).otherwise(
        title_case(collapsed)
    )


def clean_postcode(postcode: Column) -> Column:
    """Strip non-digits; NULL if nothing remains.

    Reference F11 (transform/data_cleaning.py:64-68).
    """
    digits = F.regexp_replace(postcode.cast("string"), r"\D", "")
    return F.nullif(digits, F.lit(""))


def snippet(col: Column, n: int = 500) -> Column:
    """First ``n`` characters (reference F19, text[:500],
    extract/commoncrawl_scraper.py:208)."""
    return F.substring(col, 1, n)

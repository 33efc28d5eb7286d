"""Field extractors over raw page text / URLs.

Reference F2/F6/F7/F8/F14 (extract/commoncrawl_scraper.py:28-30,59-67,
187-195). All native expressions; arrays come back as
``ArrayType(StringType)`` via ``regexp_extract_all``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Three alternates per extract/commoncrawl_scraper.py:63.
PHONE_RE = r"(\+61\s?\d{1,2}\s?\d{3}\s?\d{3}|\(0\d\)\s?\d{4}\s?\d{4}|\d{4}\s?\d{3}\s?\d{3})"
POSTCODE_RE = r"\b(0[289][0-9]{2}|[1-9][0-9]{3})\b"


def extract_domain(url: Column) -> Column:
    """Hostname of a URL minus a leading ``www.`` (F2).

    ``urlparse(url).netloc`` → ``parse_url(url, 'HOST')``
    (extract/commoncrawl_scraper.py:28-30).
    """
    host = F.parse_url(url, F.lit("HOST"))
    return F.regexp_replace(host, r"^www\.", "")


def extract_emails(text: Column) -> Column:
    """All email-shaped substrings, in order (F6)."""
    return F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)


def extract_phones(text: Column) -> Column:
    """All AU-phone-shaped substrings, in order (F7)."""
    return F.regexp_extract_all(text, F.lit(PHONE_RE), 1)


def extract_postcode(text: Column) -> Column:
    """First valid-shaped AU postcode, else NULL (F8)."""
    hit = F.regexp_extract(text, POSTCODE_RE, 1)
    return F.nullif(hit, F.lit(""))


def redact_pii(text: Column) -> Column:
    """Replace email addresses and AU-phone-shaped substrings with
    ``[EMAIL]`` / ``[PHONE]`` tags — the pre-training PII scrub step of
    an LLM data pipeline, as a pure native expression chain (two
    regexp_replace passes, whole-stage codegen, no UDF).

    Emails are replaced first: the phone pattern's bare digit-run
    alternate could otherwise bite into addresses containing digits.
    Same patterns as the F6/F7 extractors, so what extract_* finds,
    redact_pii removes.
    """
    no_email = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(no_email, PHONE_RE, "[PHONE]")


def parse_json_ld(json_col: Column, schema: str = "array<map<string,string>>") -> Column:
    """Parse a JSON-LD payload, normalizing object-vs-array (F14/U2).

    The reference wraps a bare object into a one-element list
    (extract/commoncrawl_scraper.py:187-195); we do the same before
    ``from_json`` so downstream sees a uniform array.
    """
    normalized = F.when(
        F.ltrim(json_col).startswith("["), json_col
    ).otherwise(F.concat(F.lit("["), json_col, F.lit("]")))
    return F.from_json(normalized, schema)

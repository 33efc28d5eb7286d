"""Scalar-function queries (SURVEY.md §2.8, F1-F22) over the driver tables.

Each query synthesizes deterministic "dirty" inputs from testdata columns,
pushes them through the native function library, and is mirrored by a
DuckDB oracle computing the same semantics independently.

DuckDB notes: ``regexp_replace`` needs the ``'g'`` flag for global
replacement; ``initcap`` doesn't exist (emulated via list_transform);
decimals are cast to DOUBLE explicitly.
"""

from __future__ import annotations

# pandas is module-level (not function-local) because
# `from __future__ import annotations` stringifies the pandas_udf
# type hints and pyspark resolves them via this module's globals.
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import firmable_company_data_pipeline_spark.functions as lib
from firmable_company_data_pipeline_spark.session import load_tables

# DuckDB initcap emulation applied to an expression {x} (already lowered or
# mixed case — mirrors Spark initcap which lowercases the rest of each word).
_DUCK_INITCAP = (
    "array_to_string(list_transform(string_split_regex(lower({x}), ' '), "
    "w -> upper(w[1]) || w[2:]), ' ')"
)


# ---------------------------------------------------------------------------
# fn_clean_text — F1 over padded/tabbed customer names.
def fn_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    messy = F.concat(F.lit("  "), F.col("c_name"), F.lit("\t office\n "))
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        lib.clean_text(messy).alias("cleaned"),
    )


FN_CLEAN_TEXT_SQL = """
SELECT c_custkey AS custkey,
       trim(regexp_replace('  ' || c_name || chr(9) || ' office' || chr(10) || ' ',
                           '\\s+', ' ', 'g')) AS cleaned
FROM customer
"""


# ---------------------------------------------------------------------------
# fn_domain_company — F2 + F3: URL → domain → display name.
def fn_domain_company(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    url = F.concat(
        F.lit("https://www.customer-"), F.col("c_custkey").cast("string"), F.lit(".com.au/about")
    )
    domain = lib.extract_domain(url)
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        domain.alias("domain"),
        lib.extract_company_name(domain).alias("company_name"),
    )


FN_DOMAIN_COMPANY_SQL = """
SELECT c_custkey AS custkey,
       'customer-' || c_custkey || '.com.au' AS domain,
       {ic} AS company_name
FROM customer
""".format(
    ic=_DUCK_INITCAP.format(
        x="replace('customer-' || c_custkey, '-', ' ')"
    )
)


# ---------------------------------------------------------------------------
# fn_abn_checksum — F4/F12: generated 11-digit candidates → validity flag.
_ABN_WEIGHTS = [10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19]


def fn_abn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    cand = F.lpad(((F.col("c_custkey") * 7919) % 100000000000).cast("string"), 11, "0")
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        cand.alias("abn_candidate"),
        lib.validate_abn(cand).alias("is_valid"),
    )


def _duck_abn_total(expr: str) -> str:
    terms = []
    for i, w in enumerate(_ABN_WEIGHTS):
        d = f"CAST(substr({expr}, {i + 1}, 1) AS INT)"
        terms.append(f"({d} - 1) * {w}" if i == 0 else f"{d} * {w}")
    return " + ".join(terms)


FN_ABN_CHECKSUM_SQL = """
SELECT custkey, abn_candidate,
       ({total}) % 89 = 0 AS is_valid
FROM (SELECT c_custkey AS custkey,
             lpad(CAST((c_custkey * 7919) % 100000000000 AS VARCHAR), 11, '0')
                 AS abn_candidate
      FROM customer)
""".format(total=_duck_abn_total("abn_candidate"))


# ---------------------------------------------------------------------------
# fn_extract_abn_text — F5: embedded spaced ABNs in prose, validated on
# extraction (invalid checksums → NULL).
def fn_extract_abn_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    cand = F.lpad(((F.col("c_custkey") * 7919) % 100000000000).cast("string"), 11, "0")
    spaced = F.concat_ws(
        " ",
        F.substring(cand, 1, 2),
        F.substring(cand, 3, 3),
        F.substring(cand, 6, 3),
        F.substring(cand, 9, 3),
    )
    page = F.concat(F.lit("Contact us today. ABN: "), spaced, F.lit(" — thanks."))
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        lib.extract_abn(page).alias("extracted_abn"),
    )


FN_EXTRACT_ABN_TEXT_SQL = """
SELECT custkey,
       CASE WHEN ({total}) % 89 = 0 THEN cand ELSE NULL END AS extracted_abn
FROM (SELECT c_custkey AS custkey,
             lpad(CAST((c_custkey * 7919) % 100000000000 AS VARCHAR), 11, '0') AS cand
      FROM customer)
""".format(total=_duck_abn_total("cand"))


# ---------------------------------------------------------------------------
# fn_contacts — F6/F7/F8: emails, phones, postcode from synthesized prose.
def fn_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    k = F.col("c_custkey")
    text = F.concat(
        F.lit("mail info@c"), k.cast("string"), F.lit(".com.au or sales@c"),
        k.cast("string"), F.lit(".net, call (02) 9"),
        F.lpad((k % 1000).cast("string"), 3, "0"), F.lit(" 8888 at NSW "),
        (F.lit(2000) + (k % 999)).cast("string"), F.lit(" today"),
    )
    return cust.select(
        k.alias("custkey"),
        F.array_join(lib.extract_emails(text), ",").alias("emails"),
        F.array_join(lib.extract_phones(text), ",").alias("phones"),
        lib.extract_postcode(text).alias("postcode"),
    )


FN_CONTACTS_SQL = """
SELECT c_custkey AS custkey,
       array_to_string(regexp_extract_all(txt,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', 0), ',') AS emails,
       array_to_string(regexp_extract_all(txt,
           '(\\+61\\s?\\d{{1,2}}\\s?\\d{{3}}\\s?\\d{{3}}|\\(0\\d\\)\\s?\\d{{4}}\\s?\\d{{4}}|\\d{{4}}\\s?\\d{{3}}\\s?\\d{{3}})', 1), ',')
           AS phones,
       nullif(regexp_extract(txt, '\\b(0[289][0-9]{{2}}|[1-9][0-9]{{3}})\\b', 1), '')
           AS postcode
FROM (SELECT c_custkey,
             'mail info@c' || c_custkey || '.com.au or sales@c' || c_custkey ||
             '.net, call (02) 9' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') ||
             ' 8888 at NSW ' || CAST(2000 + (c_custkey % 999) AS VARCHAR) || ' today' AS txt
      FROM customer)
""".format()


# ---------------------------------------------------------------------------
# fn_standardize_state — F9: 12 deterministic raw variants → abbreviations.
# Variants exercise all three paths: exact map hit, despaced-dotted hit,
# fuzzy >85 hit, and a miss (NULL).
_STATE_VARIANTS = [
    ("nsw", "NSW"),             # exact (case)
    ("New South Wales", "NSW"),  # exact (full name)
    ("N.S.W.", "NSW"),          # dotted → despaced exact
    ("vic", "VIC"),
    ("Victoria", "VIC"),
    ("QLD", "QLD"),
    ("Queenslnd", "QLD"),       # fuzzy: 1 edit of 10 → 90 > 85
    ("S.A.", "SA"),             # dotted
    ("Tasmani", "TAS"),         # fuzzy: 1 edit of 8 → 87.5 > 85
    ("Australian Capital Territory", "ACT"),
    ("N.T.", "NT"),
    ("gibberish", None),         # miss
]


def fn_standardize_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    raw = F.element_at(
        F.array(*[F.lit(v) for v, _ in _STATE_VARIANTS]),
        (F.col("c_custkey") % len(_STATE_VARIANTS) + 1).cast("int"),
    )
    return cust.select(
        F.col("c_custkey").alias("custkey"),
        raw.alias("raw_state"),
        lib.standardize_state(raw).alias("state"),
    )


_duck_variants = ", ".join(f"'{v}'" for v, _ in _STATE_VARIANTS)
# Independent recompute of F9 (not a hardcoded expected-value table): the
# oracle normalizes, tries the exact map (first map entry wins, despaced
# form included), then the levenshtein-ratio fuzzy arg-max with the same
# strict >85 accept rule and (score desc, map order) tie-break as
# functions/states.py.  Generated from the same STATE_MAPPING constant so
# the two sides share the semantics but not the execution.
from firmable_company_data_pipeline_spark.functions.states import (  # noqa: E402
    STATE_MAPPING as _SM,
)

_STATE_ROWS = ", ".join(
    f"({i}, '{k}', '{a}')" for i, (k, a) in enumerate(_SM.items())
)
FN_STANDARDIZE_STATE_SQL = f"""
WITH v AS (
  SELECT c_custkey AS custkey,
         ([{_duck_variants}])[CAST(c_custkey % {len(_STATE_VARIANTS)} + 1 AS INT)] AS raw_state
  FROM customer
),
m(idx, key, abbrev) AS (VALUES {_STATE_ROWS}),
base AS (
  SELECT custkey, raw_state,
         trim(regexp_replace(upper(trim(raw_state)), '[.\\s]+', ' ', 'g')) AS cleaned,
         replace(trim(regexp_replace(upper(trim(raw_state)), '[.\\s]+', ' ', 'g')),
                 ' ', '') AS despaced
  FROM v
),
exact AS (
  SELECT b.custkey, min(m.idx) AS hit_idx
  FROM base b JOIN m ON b.cleaned = m.key OR b.despaced = m.key
  GROUP BY b.custkey
),
fuzzy AS (
  SELECT custkey, abbrev, score,
         row_number() OVER (PARTITION BY custkey ORDER BY score DESC, idx ASC) AS rn
  FROM (
    SELECT b.custkey, m.idx, m.abbrev,
           CASE WHEN greatest(length(b.cleaned), length(m.key)) = 0 THEN 100.0
                ELSE (1.0 - levenshtein(b.cleaned, m.key)::DOUBLE
                      / greatest(length(b.cleaned), length(m.key))) * 100.0 END AS score
    FROM base b CROSS JOIN m
  )
)
SELECT b.custkey, b.raw_state,
       COALESCE((SELECT abbrev FROM m WHERE m.idx = e.hit_idx),
                CASE WHEN f.score > 85.0 THEN f.abbrev END) AS state
FROM base b
LEFT JOIN exact e ON e.custkey = b.custkey
LEFT JOIN fuzzy f ON f.custkey = b.custkey AND f.rn = 1
"""


# ---------------------------------------------------------------------------
# fn_clean_company_name — F10 over noisy part names.
def fn_clean_company_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    dirty = F.concat(F.upper(F.col("p_name")), F.lit(", Pty. Ltd!"))
    return part.select(
        F.col("p_partkey").alias("partkey"),
        lib.clean_company_name(dirty).alias("clean_name"),
    )


FN_CLEAN_COMPANY_NAME_SQL = """
SELECT p_partkey AS partkey, {ic} AS clean_name
FROM (SELECT p_partkey,
             trim(regexp_replace(regexp_replace(upper(p_name) || ', Pty. Ltd!',
                  '[^A-Za-z0-9 &]', ' ', 'g'), '\\s+', ' ', 'g')) AS base
      FROM part)
""".format(ic=_DUCK_INITCAP.format(x="base"))


# ---------------------------------------------------------------------------
# fn_token_sort_ratio — F17: scrambled word order scores 100; cross-name
# scores land in (0,100). Same formula both sides.
def fn_token_sort_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    words = F.split(F.col("p_name"), " ")
    scrambled = F.upper(F.concat_ws(" ", F.element_at(words, 2), F.element_at(words, 1)))
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.round(lib.token_sort_ratio(F.col("p_name"), scrambled), 2).alias("score_scrambled"),
        F.round(lib.token_sort_ratio(F.col("p_name"), F.col("p_type")), 2).alias("score_type"),
    )


_duck_ts = (
    "array_to_string(list_sort(string_split(trim(regexp_replace("
    "lower({x}), '[^a-z0-9]+', ' ', 'g')), ' ')), ' ')"
)
_duck_ratio = (
    "CASE WHEN greatest(length({a}), length({b})) = 0 THEN 100.0 "
    "ELSE (1.0 - CAST(levenshtein({a}, {b}) AS DOUBLE) / greatest(length({a}), length({b}))) * 100.0 END"
)
FN_TOKEN_SORT_RATIO_SQL = """
SELECT p_partkey AS partkey,
       round({r1}, 2) AS score_scrambled,
       round({r2}, 2) AS score_type
FROM (SELECT p_partkey,
             {tsa} AS ta,
             {tsb} AS tb,
             {tst} AS tt
      FROM (SELECT p_partkey, p_name, p_type,
                   upper(string_split(p_name, ' ')[2] || ' ' || string_split(p_name, ' ')[1])
                       AS scrambled
            FROM part))
""".format(
    r1=_duck_ratio.format(a="ta", b="tb"),
    r2=_duck_ratio.format(a="ta", b="tt"),
    tsa=_duck_ts.format(x="p_name"),
    tsb=_duck_ts.format(x="scrambled"),
    tst=_duck_ts.format(x="p_type"),
)


# ---------------------------------------------------------------------------
# fn_dates — F20/F21/F22: date_trunc, format, epoch, concat_ws synthesis.
def fn_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate"))).alias("month_epoch"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.concat_ws(" ", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
                "status_priority"
            ),
        )
    )


FN_DATES_SQL = """
SELECT o_orderkey AS orderkey,
       CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
       strftime(o_orderdate, '%Y-%m') AS ym,
       concat_ws(' ', o_orderstatus, o_orderpriority) AS status_priority
FROM orders
WHERE o_orderkey % 10 = 0
"""


# ---------------------------------------------------------------------------
# fn_snippet — F19 + F16: substring + lower over documents.
def fn_snippet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        F.col("doc_id"),
        lib.snippet(F.upper(F.col("text")), 60).alias("snippet"),
        F.lower(F.col("source")).alias("source_lower"),
    )


FN_SNIPPET_SQL = """
SELECT doc_id, substr(upper(text), 1, 60) AS snippet, lower(source) AS source_lower
FROM documents
"""


# ---------------------------------------------------------------------------
# fn_jaro_winkler — Jaro-Winkler name similarity as an Arrow-batched
# pandas UDF (pure-Python implementation, functions/similarity.py
# py_jaro_winkler).  The oracle is DuckDB's own jaro_winkler_similarity —
# an INDEPENDENT C++ implementation — so this is a genuine two-codebase
# cross-check, not a mirrored formula.  UDF cost is per-name-pair and
# Arrow-batched (UD1/UD3 pattern); the native token-sort ratio remains
# the default cascade scorer.
def fn_jaro_winkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from firmable_company_data_pipeline_spark.functions.similarity import (
        py_jaro_winkler,
    )

    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [py_jaro_winkler(x or "", y or "") for x, y in zip(a, b)]
        )

    part = load_tables(spark, sf_dir, "part")["part"]
    words = F.split(F.col("p_name"), " ")
    scrambled = F.lower(
        F.concat_ws(" ", F.element_at(words, 2), F.element_at(words, 1))
    )
    # Two-token guard: concat_ws SKIPS a NULL token while the oracle's
    # `||` propagates NULL, so a one-word p_name would score on the
    # Spark side vs NULL in DuckDB.  TPC-H names are always multi-word;
    # the explicit filter (mirrored in the SQL) makes the degenerate
    # case agree by construction rather than by fixture luck.
    pairs = part.filter(F.size(words) >= 2).select(
        F.col("p_partkey").alias("partkey"),
        F.lower(F.col("p_name")).alias("a"),
        scrambled.alias("b"),
        F.lower(F.col("p_type")).alias("c"),
    )
    return pairs.select(
        "partkey",
        F.round(jw(F.col("a"), F.col("b")), 4).alias("jw_scrambled"),
        F.round(jw(F.col("a"), F.col("c")), 4).alias("jw_type"),
    )


FN_JARO_WINKLER_SQL = """
SELECT p_partkey AS partkey,
       round(jaro_winkler_similarity(a, b), 4) AS jw_scrambled,
       round(jaro_winkler_similarity(a, c), 4) AS jw_type
FROM (
  SELECT p_partkey, lower(p_name) AS a,
         lower(string_split(p_name, ' ')[2] || ' ' || string_split(p_name, ' ')[1]) AS b,
         lower(p_type) AS c
  FROM part
  WHERE len(string_split(p_name, ' ')) >= 2
)
"""


QUERIES = {
    "fn_jaro_winkler": fn_jaro_winkler,
    "fn_clean_text": fn_clean_text,
    "fn_domain_company": fn_domain_company,
    "fn_abn_checksum": fn_abn_checksum,
    "fn_extract_abn_text": fn_extract_abn_text,
    "fn_contacts": fn_contacts,
    "fn_standardize_state": fn_standardize_state,
    "fn_clean_company_name": fn_clean_company_name,
    "fn_token_sort_ratio": fn_token_sort_ratio,
    "fn_dates": fn_dates,
    "fn_snippet": fn_snippet,
}

ORACLES = {
    "fn_jaro_winkler": FN_JARO_WINKLER_SQL,
    "fn_clean_text": FN_CLEAN_TEXT_SQL,
    "fn_domain_company": FN_DOMAIN_COMPANY_SQL,
    "fn_abn_checksum": FN_ABN_CHECKSUM_SQL,
    "fn_extract_abn_text": FN_EXTRACT_ABN_TEXT_SQL,
    "fn_contacts": FN_CONTACTS_SQL,
    "fn_standardize_state": FN_STANDARDIZE_STATE_SQL,
    "fn_clean_company_name": FN_CLEAN_COMPANY_NAME_SQL,
    "fn_token_sort_ratio": FN_TOKEN_SORT_RATIO_SQL,
    "fn_dates": FN_DATES_SQL,
    "fn_snippet": FN_SNIPPET_SQL,
}

"""Cleaning-pipeline and semi-structured queries (SURVEY.md §3.2, §2.7 U2,
§2.8 F13/F14, §2.3 J6).

* ``clean_abr_pipeline`` — the reference's cleaning stage end-to-end
  (transform/data_cleaning.py:157-185): a dirty two-styling staging table
  is pushed through ``pipeline.cleaning.clean_abr_data`` (F10/F12/F11/F9
  withColumn chain + A1 four-key dropDuplicates).  Both stylings of each
  logical row clean to byte-identical rows, so the dedup's survivor is
  deterministic and oracle-checkable.
* ``jsonld_flatten`` — U2/F14 (extract/commoncrawl_scraper.py:187-195):
  list-or-object JSON-LD payloads normalized to an array, parsed with
  ``from_json``, exploded to (type, name) rows.
* ``order_lookup`` — J6 point lookup by key
  (transform/entity_matching.py:237) joined to its dimension row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.pipeline.cleaning import clean_abr_data
from firmable_company_data_pipeline_spark.queries.scalar import _DUCK_INITCAP
from firmable_company_data_pipeline_spark.session import load_tables

# Exact-map state variants (abbrev styling vs messy full-name styling) —
# both normalize to the same abbreviation via the exact-match arm of F9.
_ABBREVS = ["NSW", "VIC", "QLD", "SA", "WA", "TAS", "ACT", "NT"]
_FULLS = [
    "New South Wales",
    "victoria",
    "QUEENSLAND",
    "south  australia",
    "Western Australia",
    "TASMANIA",
    "australian capital territory",
    "Northern Territory",
]


def _raw_abr(supp: DataFrame) -> DataFrame:
    """Two stylings per supplier row: a clean-ish one and a messy one
    (dashed ABN, lowercased name with junk punctuation, full-name state,
    alpha-padded postcode).  Cleaning maps both to the same row."""
    k, nk = F.col("s_suppkey"), F.col("s_nationkey")
    abn = F.lpad(k.cast("string"), 11, "0")
    postcode = (F.lit(2000) + nk).cast("string")
    pick = lambda xs: F.element_at(  # noqa: E731
        F.array(*[F.lit(x) for x in xs]), (nk % len(xs) + 1).cast("int")
    )
    clean_style = supp.select(
        abn.alias("abn"),
        F.col("s_name").alias("entity_name"),
        pick(_ABBREVS).alias("state"),
        postcode.alias("postcode"),
    )
    messy_style = supp.select(
        F.concat(F.substring(abn, 1, 2), F.lit("-"), F.substring(abn, 3, 9)).alias("abn"),
        F.concat(F.lower(F.col("s_name")), F.lit("  !!")).alias("entity_name"),
        pick(_FULLS).alias("state"),
        F.concat(F.lit(" "), postcode, F.lit("a")).alias("postcode"),
    )
    return clean_style.unionByName(messy_style)


def clean_abr_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_tables(spark, sf_dir, "supplier")["supplier"]
    return clean_abr_data(_raw_abr(supp))


_ABBR_SQL = ", ".join(f"'{a}'" for a in _ABBREVS)
_FULL_SQL = ", ".join(f"'{x}'" for x in _FULLS)
# F9 exact-map arm in SQL: normalize (upper, collapse [.\s]+, trim) then map.
_STATE_CASE = (
    "CASE trim(regexp_replace(upper(trim(state)), '[.\\s]+', ' ', 'g')) "
    + " ".join(
        f"WHEN '{full.upper().replace('  ', ' ')}' THEN '{abbr}' WHEN '{abbr}' THEN '{abbr}'"
        for full, abbr in zip(_FULLS, _ABBREVS)
    )
    + " END"
)

# precomputed: f-string expression parts cannot contain backslashes
_CLEAN_NAME_BASE = (
    "trim(regexp_replace(regexp_replace(entity_name, '[^A-Za-z0-9 &]', ' ', 'g'), "
    "'\\s+', ' ', 'g'))"
)
_CLEAN_NAME = _DUCK_INITCAP.format(x=_CLEAN_NAME_BASE)
_CLEAN_ABN = (
    "CASE WHEN length(regexp_replace(abn, '[\\s-]', '', 'g')) = 11 "
    "THEN regexp_replace(abn, '[\\s-]', '', 'g') END"
)

CLEAN_ABR_PIPELINE_SQL = f"""
WITH raw AS (
  SELECT lpad(CAST(s_suppkey AS VARCHAR), 11, '0') AS abn,
         s_name AS entity_name,
         ([{_ABBR_SQL}])[CAST(s_nationkey % {len(_ABBREVS)} + 1 AS INT)] AS state,
         CAST(2000 + s_nationkey AS VARCHAR) AS postcode
  FROM supplier
  UNION ALL
  SELECT substr(lpad(CAST(s_suppkey AS VARCHAR), 11, '0'), 1, 2) || '-' ||
           substr(lpad(CAST(s_suppkey AS VARCHAR), 11, '0'), 3, 9) AS abn,
         lower(s_name) || '  !!' AS entity_name,
         ([{_FULL_SQL}])[CAST(s_nationkey % {len(_FULLS)} + 1 AS INT)] AS state,
         ' ' || CAST(2000 + s_nationkey AS VARCHAR) || 'a' AS postcode
  FROM supplier
)
SELECT DISTINCT
  {_CLEAN_ABN} AS abn,
  {_CLEAN_NAME} AS entity_name,
  {_STATE_CASE} AS state,
  nullif(regexp_replace(postcode, '[^0-9]', '', 'g'), '') AS postcode
FROM raw
"""


# ---------------------------------------------------------------------------
# jsonld_flatten — U2/F14: list-or-object JSON-LD → exploded typed rows.
_LD_SCHEMA = "array<struct<`@type`:string,name:string>>"


def jsonld_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    k = F.col("p_partkey")
    obj_org = F.concat(
        F.lit('{"@type":"Organization","name":"'), F.col("p_name"), F.lit('"}')
    )
    obj_site = F.concat(
        F.lit('{"@type":"WebSite","name":"p'), k.cast("string"), F.lit('.com.au"}')
    )
    raw = F.when(
        k % 3 == 0, F.concat(F.lit("["), obj_org, F.lit(","), obj_site, F.lit("]"))
    ).when(k % 3 == 1, obj_org)
    # list-or-object normalization (extract/commoncrawl_scraper.py:187-195):
    # wrap bare objects into a one-element array, then one parse + explode.
    arr = F.when(raw.startswith("["), raw).otherwise(
        F.concat(F.lit("["), raw, F.lit("]"))
    )
    parsed = F.from_json(arr, _LD_SCHEMA)
    return part.select(
        k.alias("partkey"), F.explode(parsed).alias("e")
    ).select(
        "partkey",
        F.col("e").getField("@type").alias("ld_type"),
        F.col("e").getField("name").alias("ld_name"),
    )


JSONLD_FLATTEN_SQL = """
WITH src AS (
  SELECT p_partkey AS partkey,
         CASE WHEN p_partkey % 3 = 0 THEN '[' || obj_org || ',' || obj_site || ']'
              WHEN p_partkey % 3 = 1 THEN obj_org
         END AS raw
  FROM (SELECT p_partkey,
               '{"@type":"Organization","name":"' || p_name || '"}' AS obj_org,
               '{"@type":"WebSite","name":"p' || p_partkey || '.com.au"}' AS obj_site
        FROM part)
),
arr AS (
  SELECT partkey,
         CASE WHEN raw LIKE '[%' THEN raw ELSE '[' || raw || ']' END AS rawa
  FROM src WHERE raw IS NOT NULL
)
SELECT partkey, e."@type" AS ld_type, e."name" AS ld_name
FROM (
  SELECT partkey,
         unnest(from_json(rawa, '[{"@type":"VARCHAR","name":"VARCHAR"}]')) AS e
  FROM arr
)
"""


# ---------------------------------------------------------------------------
# order_lookup — J6: point lookup by key + dimension join.  At scale this
# is a partition-pruned scan (or index-free broadcast lookup) — the filter
# reaches the parquet reader as PushedFilters.
def order_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") == 1)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("c_name").alias("customer_name"),
        )
    )


ORDER_LOOKUP_SQL = """
SELECT o_orderkey AS orderkey, o_orderdate AS orderdate,
       CAST(o_totalprice AS DOUBLE) AS totalprice, c_name AS customer_name
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey = 1
"""


QUERIES = {
    "clean_abr_pipeline": clean_abr_pipeline,
    "jsonld_flatten": jsonld_flatten,
    "order_lookup": order_lookup,
}

ORACLES = {
    "clean_abr_pipeline": CLEAN_ABR_PIPELINE_SQL,
    "jsonld_flatten": JSONLD_FLATTEN_SQL,
    "order_lookup": ORDER_LOOKUP_SQL,
}

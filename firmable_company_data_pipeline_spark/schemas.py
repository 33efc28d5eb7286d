"""Typed schemas for the three medallion layers (SURVEY.md §1.3).

The reference stages everything in Postgres with layer-specific DDL
(db/ddl_scripts.sql:10-91); its silver layer erases all types to TEXT
(transform/data_cleaning.py:121-128). We keep strong types end-to-end —
the all-TEXT erasure is a bug we deliberately do not reproduce — while
preserving observable semantics (trim-at-join, null-padding of missing
columns at the union).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# stg.abr_raw_companies (db/ddl_scripts.sql:10-22, extract/abr_parser.py:27-43)
ABR_RAW = StructType(
    [
        StructField("abn", StringType()),
        StructField("abn_status", StringType()),
        StructField("entity_type", StringType()),
        StructField("entity_name", StringType()),
        StructField("state", StringType()),
        StructField("postcode", StringType()),
        StructField("start_date", DateType()),
        StructField("address", StringType()),
    ]
)

# stg.common_crawl_raw_companies (db/ddl_scripts.sql:25-40,
# extract/commoncrawl_scraper.py:79-95,198-209)
CC_RAW = StructType(
    [
        StructField("url", StringType()),
        StructField("domain", StringType()),
        StructField("company_name", StringType()),
        StructField("abn", StringType()),
        StructField("emails", ArrayType(StringType())),
        StructField("phones", ArrayType(StringType())),
        StructField("postcode", StringType()),
        StructField("title", StringType()),
        StructField("structured_data", StringType()),  # JSON-LD array as JSON text
        StructField("snippet", StringType()),
    ]
)

# pre_dwh.cleaned_* carry the same columns, cleaned + typed (vs. the
# reference's all-TEXT, db/ddl_scripts.sql:44-73).
ABR_CLEAN = ABR_RAW
CC_CLEAN = CC_RAW

# dwh.dim_entity_match_company_data (db/ddl_scripts.sql:76-91,
# transform/entity_matching.py:38-55)
DIM_ENTITY_MATCH = StructType(
    [
        StructField("domain", StringType()),
        StructField("company_name", StringType()),
        StructField("cc_abn", StringType()),
        StructField("cc_postcode", StringType()),
        StructField("abr_abn", StringType()),
        StructField("entity_name", StringType()),
        StructField("entity_type", StringType()),
        StructField("state", StringType()),
        StructField("abr_postcode", StringType()),
        StructField("match_method", StringType()),
        StructField("match_score", DoubleType()),
        StructField("match_confidence", StringType()),
        StructField("creation_dt", TimestampType()),
    ]
)

# Driver testdata tables (TESTDATA.md) — documented for convenience.
DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

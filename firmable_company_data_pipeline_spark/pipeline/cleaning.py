"""Cleaning layer (SURVEY.md §3.2; transform/data_cleaning.py:157-185).

One lazy withColumn chain per source + multi-column dedup — Catalyst
fuses the per-column cleans into a single codegen stage (vs. the
reference's four sequential pandas ``.apply`` passes), and the dedup is
the only shuffle.

We keep strong types (the reference's all-TEXT silver-layer erasure,
transform/data_cleaning.py:121-128, is deliberately not reproduced) but
preserve observable cleaning semantics and dedup keys exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import firmable_company_data_pipeline_spark.functions as lib

# Reference dedup keys (transform/data_cleaning.py:177-179).
ABR_DEDUP_KEYS = ["abn", "entity_name", "state", "postcode"]
CC_DEDUP_KEYS = ["abn", "company_name", "postcode"]


def clean_abr_data(df: DataFrame) -> DataFrame:
    """Clean + dedup the ABR staging table
    (transform/data_cleaning.py:164-178: clean_company_name on
    entity_name, clean_abn, clean_postcode, standardize_state, then
    drop_duplicates on the four-key subset)."""
    return (
        df.withColumn("entity_name", lib.clean_company_name(F.col("entity_name")))
        .withColumn("abn", lib.clean_abn(F.col("abn")))
        .withColumn("postcode", lib.clean_postcode(F.col("postcode")))
        .withColumn("state", lib.standardize_state(F.col("state")))
        .dropDuplicates(ABR_DEDUP_KEYS)
    )


def clean_commoncrawl_data(df: DataFrame) -> DataFrame:
    """Clean + dedup the Common Crawl staging table
    (transform/data_cleaning.py:172-179: clean_company_name, clean_abn,
    clean_postcode, then drop_duplicates on the three-key subset).

    Array/JSON columns stay typed (ArrayType / JSON string) rather than
    being stringified via safe_jsonify (F13) — ``to_json`` is applied
    only at JDBC-sink time where a flat representation is required."""
    return (
        df.withColumn("company_name", lib.clean_company_name(F.col("company_name")))
        .withColumn("abn", lib.clean_abn(F.col("abn")))
        .withColumn("postcode", lib.clean_postcode(F.col("postcode")))
        .dropDuplicates(CC_DEDUP_KEYS)
    )


def jsonify_for_flat_sink(df: DataFrame) -> DataFrame:
    """safe_jsonify analog (F13, transform/data_cleaning.py:78-89,109-111):
    stringify array/map/struct columns to JSON for flat sinks (JDBC/CSV).
    Scalars pass through untouched."""
    out = df
    for field in df.schema.fields:
        if field.dataType.typeName() in ("array", "map", "struct"):
            out = out.withColumn(field.name, F.to_json(F.col(field.name)))
    return out

"""ABR bulk-extract XML source (SURVEY.md §2.1 S1/S2).

Reference: ``etree.iterparse(file, tag="ABR")`` + per-record XPath pulls
(extract/abr_parser.py:51-87) over ~19M records / ~20 multi-GB XML files.

Spark-first: the built-in XML data source (Spark 4) streams each file
split-parallel with ``rowTag="ABR"`` — the ``elem.clear()`` memory bound
of the reference is the source's per-partition streaming for free — and
the XPath field pulls become nested-struct projections, so column pruning
reaches the parser.

At 100 TB: XML parsing is CPU-bound; throughput scales with input splits.
The source splits large files on record boundaries; cluster-size the read
with ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_abr_xml(spark: SparkSession, path: str) -> DataFrame:
    """Read ABR XML into the staging schema (stg.abr_raw_companies analog,
    extract/abr_parser.py:27-43).

    Output columns: abn, entity_name, entity_type, entity_status, address,
    postcode, state, start_date — exactly the reference's extract tuple
    (extract/abr_parser.py:51-68), including the ``state || ' ' || postcode``
    address synthesis (line 66) and NULL-if-absent semantics.
    """
    raw = (
        spark.read.format("xml")
        .option("rowTag", "ABR")
        # attributes surface as _<name>; element text with attributes as _VALUE
        .option("attributePrefix", "_")
        .option("valueTag", "_VALUE")
        .load(path)
    )
    abn_text, abn_status, abn_from = _abn_fields(raw)
    state = _opt(raw, "MainEntity.BusinessAddress.AddressDetails.State")
    postcode = _opt(raw, "MainEntity.BusinessAddress.AddressDetails.Postcode")
    return raw.select(
        abn_text.alias("abn"),
        _opt(raw, "MainEntity.NonIndividualName.NonIndividualNameText").alias("entity_name"),
        _opt(raw, "EntityType.EntityTypeText").alias("entity_type"),
        abn_status.alias("entity_status"),
        # address = f"{state} {postcode}" only when both present (line 66)
        F.when(
            state.isNotNull() & postcode.isNotNull(), F.concat_ws(" ", state, postcode)
        ).alias("address"),
        postcode.alias("postcode"),
        state.alias("state"),
        F.to_date(abn_from, "yyyyMMdd").alias("start_date"),
    )


def _abn_fields(df: DataFrame):
    """ABN element text + status/from-date attributes, tolerant of the
    element arriving as a bare string (no attributes) or a struct."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    abn_type = schema.get("ABN")
    if abn_type is not None and abn_type.typeName() == "struct":
        names = [f.name for f in abn_type.fields]
        text = F.col("ABN._VALUE") if "_VALUE" in names else F.lit(None)
        status = F.col("ABN._status") if "_status" in names else F.lit(None)
        from_date = (
            F.col("ABN._ABNStatusFromDate") if "_ABNStatusFromDate" in names else F.lit(None)
        )
        return text.cast("string"), status.cast("string"), from_date.cast("string")
    if abn_type is not None:
        return F.col("ABN").cast("string"), F.lit(None).cast("string"), F.lit(None).cast("string")
    return (
        F.lit(None).cast("string"),
        F.lit(None).cast("string"),
        F.lit(None).cast("string"),
    )


def _opt(df: DataFrame, dotted: str):
    """Nested column if the path's root exists in the schema, else NULL —
    mirrors the reference's find()-returns-None tolerance."""
    root = dotted.split(".")[0]
    if root in df.columns:
        try:
            return F.col(dotted).cast("string")
        except Exception:  # pragma: no cover
            return F.lit(None).cast("string")
    return F.lit(None).cast("string")

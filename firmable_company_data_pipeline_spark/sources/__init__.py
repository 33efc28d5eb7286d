"""Extraction sources: ABR bulk XML, Common Crawl index/WARC, JDBC, and
the parquet-canonical writers."""

from firmable_company_data_pipeline_spark.sources.xml_abr import read_abr_xml
from firmable_company_data_pipeline_spark.sources.commoncrawl import (
    StubFetchClient,
    fetch_warc_html,
    parse_pages,
    read_cc_index,
)
from firmable_company_data_pipeline_spark.sources.io import (
    write_jdbc,
    write_overwrite,
)

__all__ = [
    "read_abr_xml",
    "StubFetchClient",
    "fetch_warc_html",
    "parse_pages",
    "read_cc_index",
    "write_jdbc",
    "write_overwrite",
]

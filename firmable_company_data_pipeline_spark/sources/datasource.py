"""``ccfetch`` — the Common Crawl pipeline as a Spark 4 Python custom
DataSource (charter §2.1 S3–S6 re-expressed through
``pyspark.sql.datasource``).

The mapInPandas pipeline (``sources/commoncrawl.py``) stays the primary
arm; this DataSource is the *engine-integrated* form of the same three
stages — index scan → ranged fetch → raw HTML parse — surfaced as

    spark.read.format("ccfetch").option("path", index_jsonl).load()

What the API buys over mapInPandas:

* **Partition planning is explicit and ours.** ``partitions()`` splits
  the index file into byte ranges aligned to line boundaries exactly the
  way Hadoop text splits work (a reader owns every line that STARTS in
  its range; a reader whose range begins mid-line skips forward) — so
  fetch parallelism is declared at plan time, visible in the UI, and
  independent of any upstream DataFrame's partitioning.
* **The scan is a leaf.** Downstream ``select``/``filter`` prune and
  push as with any source; no lineage back into a JSON scan that must
  be re-planned per query.

The fetch client is the deterministic offline ``StubFetchClient``
unless ``option("client", "http")`` — gated exactly like the pandas arm
(the real ranged-GET client imports only when requested; network IO is
not correctness-checkable, SURVEY §7 Phase 4).  Each partition reuses
ONE client instance — the per-partition-session property the reference's
serial loop (extract/commoncrawl_scraper.py:167-181) had globally.

Raw output schema matches the pandas arm's raw parse; compose with
``commoncrawl.derive_staging_fields`` for the full staging frame (the
equality of the two arms is pinned in tests/test_sources_pipeline.py).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Module-top imports, NOT lazy inside read(): the reader executes on
# Python WORKERS, and a lazy `import firmable_…` there requires every
# worker to have the package on ITS path — exactly what a driver
# running from a foreign cwd doesn't give them (found by the vanilla
# foreign-cwd probe).  With the imports at module top and the module
# registered for cloudpickle by-value serialization
# (``register_cc_datasource``), the reader ships self-contained.
from firmable_company_data_pipeline_spark.sources.commoncrawl import (
    HttpFetchClient,
    StubFetchClient,
    _html_parser,
)

RAW_SCHEMA = "url string, title string, text string, structured_data string"


class CCIndexSlice(InputPartition):
    """One byte range [start, end) of the index file."""

    def __init__(self, path: str, start: int, end: int) -> None:
        self.path = path
        self.start = start
        self.end = end


class CommonCrawlDataSource(DataSource):
    """Options: ``path`` (local JSONL index, required), ``partitions``
    (int, default 4), ``client`` (``stub`` | ``http``, default stub)."""

    @classmethod
    def name(cls) -> str:
        return "ccfetch"

    def schema(self) -> str:
        return RAW_SCHEMA

    def reader(self, schema) -> "CCFetchReader":
        return CCFetchReader(self.options)


class CCFetchReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("ccfetch requires option('path', <index jsonl>)")
        self.path = path
        self.n = max(1, int(options.get("partitions", "4")))
        self.client_kind = options.get("client", "stub")

    def partitions(self) -> list[CCIndexSlice]:
        # Hadoop-style text splits: equal byte ranges; line ownership is
        # resolved at read time (the reader owning the line's first byte
        # processes it), so no driver-side pass over the file contents.
        size = os.path.getsize(self.path)
        if size == 0:
            return [CCIndexSlice(self.path, 0, 0)]
        step = max(1, size // self.n)
        starts = list(range(0, size, step))[: self.n]
        return [
            CCIndexSlice(
                self.path,
                s,
                size if i == len(starts) - 1 else starts[i + 1],
            )
            for i, s in enumerate(starts)
        ]

    def read(self, partition: CCIndexSlice) -> Iterator[tuple]:
        # Executor-side: one client + one parser instance per partition.
        client = (
            HttpFetchClient() if self.client_kind == "http" else StubFetchClient()
        )
        strip = _html_parser()
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            if partition.start > 0:
                f.readline()  # the line spanning `start` belongs upstream
            while True:
                line_start = f.tell()
                # A line starting EXACTLY at `end` belongs to THIS reader
                # (break on >, not >=): the next reader unconditionally
                # discards its first line, so `>=` would drop boundary-
                # aligned lines from both readers (review r12 — repro'd
                # with fixed-width records whose length divides the file
                # size; the ownership pair (> here, skip-first there) is
                # exactly Hadoop's text-split convention).
                if line_start > partition.end:
                    break
                line = f.readline()
                if not line:
                    break
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                url = rec.get("url")
                fn, off, ln = (
                    rec.get("filename"),
                    rec.get("offset"),
                    rec.get("length"),
                )
                # P8 missing-field guard — EXACTLY read_cc_index's rule
                # (fetch coordinates only; a null url rides through like
                # the pandas arm, review r12)
                if fn is None or off is None or ln is None:
                    continue
                html = client.fetch(url, fn, off, ln)
                if not html:
                    yield (url, None, "", None)
                    continue
                title, text, sd = strip(html)
                yield (url, title, text, sd)


def register_cc_datasource(spark) -> None:
    """Register ``ccfetch`` with a session (idempotent).

    Both this module and the commoncrawl parse module are registered
    for cloudpickle BY-VALUE serialization first, so the reader class —
    which executes on Python workers — carries its fetch client and
    parser with it instead of asking every worker to import the
    package (the ``__spark_entry__._pickle_package_by_value``
    discipline, applied at the one entry point a driver uses for this
    source)."""
    try:
        from pyspark import cloudpickle

        import firmable_company_data_pipeline_spark.sources.commoncrawl as _cc
        import firmable_company_data_pipeline_spark.sources.datasource as _ds

        cloudpickle.register_pickle_by_value(_cc)
        cloudpickle.register_pickle_by_value(_ds)
    except Exception:  # pragma: no cover - belt-and-braces
        pass
    spark.dataSource.register(CommonCrawlDataSource)

"""Structured Streaming surface (SURVEY.md §2.9 — charter extension; the
reference is strictly batch, its closest analogs being the manual
micro-batches of ``extract/abr_parser.py:82-87`` and the streamed
XML/HTTP iterators).

Layout:

* ``windows``  — pure DataFrame→DataFrame transformations (tumbling /
  sliding / session windows, interval join, dedup) that run identically
  on batch and streaming inputs — the batch views in
  ``queries/streaming_batch.py`` reuse them verbatim, which is what
  keeps the streaming logic oracle-checkable.
* ``jobs``     — streaming-specific wiring: file/rate sources,
  watermarks, ``dropDuplicatesWithinWatermark``, ``foreachBatch``
  upsert sink, trigger management.
"""

from firmable_company_data_pipeline_spark.streaming.windows import (  # noqa: F401
    click_error_interval_join,
    session_stats,
    sliding_value_stats,
    tumbling_value_stats,
)

"""firmable_company_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL pipeline ``SriramAnanthanarayanan/Firmable-Company-data-pipeline``
(see SURVEY.md): extraction sources (ABR XML, Common Crawl), a cleaning
layer, a three-stage entity-matching cascade, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and a Structured Streaming surface.

Everything is declared through the DataFrame/SQL API so Catalyst plans the
physical execution; Python UDFs appear only where built-in expressions
genuinely cannot express the semantics (exact rapidfuzz parity, external
model calls, binary decode).
"""

from firmable_company_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

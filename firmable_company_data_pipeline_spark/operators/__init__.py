"""Operator library: matching cascade, dedup family, similarity search,
text analysis, multimodal plumbing."""

from firmable_company_data_pipeline_spark.operators.matching import (
    anti_join_residual,
    llm_match,
    match_cascade,
    rule_based_match,
    similarity_join,
)

__all__ = [
    "anti_join_residual",
    "llm_match",
    "match_cascade",
    "rule_based_match",
    "similarity_join",
]

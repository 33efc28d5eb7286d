"""Composable pipeline API (the intended five-function surface of
run_pipeline.py:7-22, SURVEY.md §3.4)."""

from firmable_company_data_pipeline_spark.pipeline.cleaning import (
    clean_abr_data,
    clean_commoncrawl_data,
)
from firmable_company_data_pipeline_spark.pipeline.run import run_pipeline

__all__ = ["clean_abr_data", "clean_commoncrawl_data", "run_pipeline"]

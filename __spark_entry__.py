"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator inventory from
SURVEY.md §2 (core relational, scalar library, matching cascade, LLM-
pipeline extensions, streaming-batch views) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The driver may import this module from any cwd and pair it with its own
# SparkSession. Make the package importable for THIS process and for Python
# UDF workers the JVM will fork (workers read PYTHONPATH from the env the
# JVM inherits, so this must happen before the session is created).
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + _pp if _pp else "")

from pyspark.sql import DataFrame, SparkSession

from firmable_company_data_pipeline_spark.queries import registry

_SF0001 = "/root/testdata/sf0.001"


def _pickle_package_by_value() -> None:
    """Serialize package functions by VALUE into UDF closures.

    Belt-and-braces for drivers whose JVM started before this import (env
    PYTHONPATH then can't reach the workers): cloudpickle normally pickles
    module-level functions by reference, requiring workers to import this
    package; registering every loaded submodule flips that to by-value so
    applyInPandas/mapInPandas closures are self-contained.
    """
    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover
        return
    import firmable_company_data_pipeline_spark as pkg

    for name, mod in list(sys.modules.items()):
        if mod is not None and name.split(".")[0] == pkg.__name__:
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:  # pragma: no cover
                pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from firmable_company_data_pipeline_spark.queries.core import pricing_summary

    return pricing_summary(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = registry()
    _pickle_package_by_value()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each query (omitted for
    non-SQL-expressible operators → driver does a rows-only check)."""
    _, o = registry()
    return o

"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the declared-query registry from
``shopify_youtube_etl_spark.plans`` — one entry per implemented
operator from SURVEY.md §2 (plus the north-star LLM-data extensions),
each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shopify_youtube_etl_spark.plans.registry import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (driver smoke check: rows > 0)."""
    specs = all_queries()
    return specs["flagship_revenue"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every declared query, keyed by name (SURVEY.md §2 coverage)."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query; omitted
    keys (sketch/LSH ops) get the driver's rows-only check."""
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle}

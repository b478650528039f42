"""Declared-query registry — the driver contract.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet tables.  ``__spark_entry__.py`` re-exports this registry.

Parity rules (SURVEY §7 risks 3-6):
- alias every computed column identically in Spark and oracle SQL;
- round double aggregates (helper ``MONEY_ROUND``) so summation-order
  float residue can't flip the driver's value hash;
- cast DuckDB integer aggregates to BIGINT (DuckDB SUM(int)→HUGEINT);
- format raw ``events.ts`` (ns parquet) through microsecond truncation
  on both engines before exposing it.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import.
_PLAN_MODULES = [
    "shopify_youtube_etl_spark.plans.relational",
    "shopify_youtube_etl_spark.plans.analytics",
    "shopify_youtube_etl_spark.plans.nested",
    "shopify_youtube_etl_spark.plans.etl",
    "shopify_youtube_etl_spark.plans.windows",
    "shopify_youtube_etl_spark.plans.llm_text",
    "shopify_youtube_etl_spark.plans.llm_similarity",
    "shopify_youtube_etl_spark.plans.multimodal",
    "shopify_youtube_etl_spark.plans.advanced_io",
    "shopify_youtube_etl_spark.plans.scale_ops",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    ref: str  # SURVEY.md §2 operator ids this query covers
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, ref: str = "", doc: str = ""):
    """Decorator registering a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, ref=ref, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)

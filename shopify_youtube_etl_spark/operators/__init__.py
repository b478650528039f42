from shopify_youtube_etl_spark.operators.components import connected_components
from shopify_youtube_etl_spark.operators.dedup import dedup_keep_first
from shopify_youtube_etl_spark.operators.scale import (
    adaptive_join,
    bucketed_join,
    choose_join_strategy,
    salted_join,
)
from shopify_youtube_etl_spark.operators.upsert import ParquetTable, upsert
from shopify_youtube_etl_spark.operators.verify import fk_orphans, uniqueness_report

__all__ = [
    "ParquetTable",
    "adaptive_join",
    "bucketed_join",
    "choose_join_strategy",
    "connected_components",
    "dedup_keep_first",
    "fk_orphans",
    "salted_join",
    "uniqueness_report",
    "upsert",
]

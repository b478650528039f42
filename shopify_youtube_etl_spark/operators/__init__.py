from shopify_youtube_etl_spark.operators.dedup import dedup_keep_first
from shopify_youtube_etl_spark.operators.upsert import upsert
from shopify_youtube_etl_spark.operators.verify import fk_orphans, uniqueness_report

__all__ = ["dedup_keep_first", "upsert", "fk_orphans", "uniqueness_report"]

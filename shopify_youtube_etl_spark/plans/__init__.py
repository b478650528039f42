from shopify_youtube_etl_spark.plans.registry import QuerySpec, all_queries, query

__all__ = ["QuerySpec", "all_queries", "query"]

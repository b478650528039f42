from shopify_youtube_etl_spark.sources.tables import load_table, register_testdata_views

__all__ = ["load_table", "register_testdata_views"]

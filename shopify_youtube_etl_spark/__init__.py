"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL pipeline (7ricard/shopify-youtube-etl).

The reference (see SURVEY.md) is a Shopify→BigQuery / YouTube→BigQuery
ETL whose relational layer is delegated to BigQuery SQL and whose row
layer is plain Python.  This package re-expresses BOTH layers as native
PySpark DataFrame / SQL plans executed by Catalyst, plus the
large-scale-pipeline extensions (dedup, similarity search, text
analysis, streaming windows) described in SURVEY.md §7.

Layout
------
- ``session``    : SparkSession factory (UTC, AQE, Arrow).
- ``schemas``    : StructTypes transcribed from the reference.
- ``sources``    : table/NDJSON/paginated-REST sources.
- ``operators``  : dedup, upsert (MERGE rewrite), verify, watermark.
- ``functions``  : scalar/text/similarity column helpers.
- ``plans``      : the declared query registry (driver contract).
- ``streaming``  : windowed aggs + incremental micro-batch pipeline.
"""

__version__ = "0.1.0"

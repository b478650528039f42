"""Multimodal-column query: binary payload → mapInPandas feature
extraction (north-star extension).  The byte-level outputs (length,
md5) are oracle-checkable in DuckDB; the decode metadata is produced by
the deterministic fake decoder and checked rows-only in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.functions.multimodal import (
    extract_media_features,
    with_binary_payload,
)
from shopify_youtube_etl_spark.plans.common import t
from shopify_youtube_etl_spark.plans.registry import query


@query(
    "media_payload_features",
    ref="multimodal binary column + mapInPandas feature extraction",
    doc="Binary payload stats computed in Arrow batches; oracle checks the byte-level columns.",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text)                    AS payload_md5
FROM documents
""",
)
def media_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text reinterpreted as an opaque UTF-8 payload: encode →
    binary column → mapInPandas (Arrow) → per-payload stats.  DuckDB's
    md5(text)/strlen(text) hash the same bytes, so the plumbing is
    value-checked end to end; width/height/mode come from the stubbed
    decoder and are exercised in tests/test_multimodal.py."""
    d = with_binary_payload(t(spark, sf_dir, "documents"))
    feats = extract_media_features(d, fake=True)
    return feats.select("doc_id", "n_bytes", "payload_md5")

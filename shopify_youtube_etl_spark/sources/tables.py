"""Parquet table source for the driver-provided testdata.

Scans stay fully declarative so Catalyst pushes filters and prunes
columns into the parquet reader (check with ``.explain``: PushedFilters
/ ReadSchema).  At 100 TB the same code path works — parquet splits
parallelize across executors; nothing here is driver-bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from shopify_youtube_etl_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (TESTDATA.md)."""
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; known: {TESTDATA_TABLES}")
    if name == "events":
        # Runtime conf (works on ANY caller-provided session, e.g. the
        # driver's): read parquet TIMESTAMP(NANOS) as long ns instead of
        # failing with PARQUET_TYPE_ILLEGAL.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Older runtimes honor nanosAsLong: events.ts (parquet
            # TIMESTAMP NANOS) arrives as long ns; truncate to a µs
            # timestamp, matching DuckDB's CAST(ts AS TIMESTAMP)
            # semantics (FIXTURES.md: "cast to µs in both engines").
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, TimestampNTZType):
            # PySpark 4.1+ reads parquet TIMESTAMP NANOS directly as
            # TIMESTAMP_NTZ (nanosAsLong ignored).  Cast to the session
            # TIMESTAMP type — session tz is UTC, so the instant values
            # are unchanged — because some consumers (unix_micros in
            # sessionize_gaps_islands) require a true TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql``."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

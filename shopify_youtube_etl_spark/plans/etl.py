"""ETL-operator queries: MERGE upsert, verification, control-table read
(SURVEY §2.3 J3, §2.4 A1-A3, §2.12) — the reference's custom surface,
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.upsert import upsert
from shopify_youtube_etl_spark.operators.verify import fk_report, uniqueness_report
from shopify_youtube_etl_spark.plans.common import money, t
from shopify_youtube_etl_spark.plans.registry import query


@query(
    "merge_upsert",
    ref="J3/J4/A4/D2 (shopify_etl.py:558-590 MERGE staging→final)",
    doc="MERGE rewrite: staging rows win on key, unmatched finals kept; aggregated for a compact hash.",
    oracle="""
WITH staging AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 5 = 0
),
merged AS (
    SELECT * FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = o.o_orderkey)
    UNION ALL
    SELECT * FROM staging
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM merged
GROUP BY o_orderstatus
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN MATCHED → staging's doubled price shows up; WHEN NOT MATCHED
    → untouched finals survive.  Uses operators.upsert.upsert — the
    engine's actual MERGE rewrite (anti-join + unionByName)."""
    final = t(spark, sf_dir, "orders")
    staging = final.where(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merged = upsert(final, staging, keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"), money(F.sum("o_totalprice")).alias("total_price")
    )


@query(
    "upsert_idempotency",
    ref="J3 + §5.4 property (upsert(upsert(T,B),B) == upsert(T,B))",
    doc="Applying the same staging batch twice must equal once — checked in-plan.",
    oracle="""
WITH staging AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 5 = 0
),
merged AS (
    SELECT * FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = o.o_orderkey)
    UNION ALL SELECT * FROM staging
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       round(sum(o_totalprice), 2) AS total_price
FROM merged
""",
)
def upsert_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1-hour overlap re-read (shopify_etl.py:191-198) is safe only
    because MERGE is idempotent; here the batch is applied TWICE and the
    oracle describes a single application."""
    final = t(spark, sf_dir, "orders")
    staging = final.where(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    once = upsert(final, staging, keys=["o_orderkey"])
    twice = upsert(once, staging, keys=["o_orderkey"])
    return twice.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        money(F.sum("o_totalprice")).alias("total_price"),
    )


@query(
    "verify_uniqueness",
    ref="A1-A3 (shopify_etl.py:592-618 verify_unique_records)",
    doc="The reference's per-table uniqueness verification as one report DF.",
    oracle="""
SELECT 'orders' AS table_name,
       CAST(count(*) AS BIGINT) AS total_records,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS unique_records,
       count(*) = count(DISTINCT o_orderkey) AS is_unique
FROM orders
UNION ALL
SELECT 'lineitem',
       CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
       count(*) = count(DISTINCT (l_orderkey, l_linenumber))
FROM lineitem
UNION ALL
SELECT 'customer',
       CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT c_custkey) AS BIGINT),
       count(*) = count(DISTINCT c_custkey)
FROM customer
""",
)
def verify_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return uniqueness_report(
        {
            "orders": (t(spark, sf_dir, "orders"), ["o_orderkey"]),
            "lineitem": (t(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"]),
            "customer": (t(spark, sf_dir, "customer"), ["c_custkey"]),
        }
    )


@query(
    "verify_fk_integrity",
    ref="J1 (shopify_etl.py:717-742 — FK anti-join checks)",
    doc="Orphan counts for each FK edge of the star schema.",
    oracle="""
SELECT 'lineitem->orders' AS check_name,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS orphan_count
UNION ALL
SELECT 'orders->customer',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'customer->nation',
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
""",
)
def verify_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fk_report(
        {
            "lineitem->orders": (
                t(spark, sf_dir, "lineitem"),
                t(spark, sf_dir, "orders"),
                "l_orderkey",
                "o_orderkey",
            ),
            "orders->customer": (
                t(spark, sf_dir, "orders"),
                t(spark, sf_dir, "customer"),
                "o_custkey",
                "c_custkey",
            ),
            "customer->nation": (
                t(spark, sf_dir, "customer"),
                t(spark, sf_dir, "nation"),
                "c_nationkey",
                "n_nationkey",
            ),
        }
    )

"""Scale-machinery queries: the skew/shuffle levers of operators/scale.py
exercised as registered, oracle-checked queries — proving the machinery
is RESULT-identical to the plain relational forms it replaces.

The reference never faces skew (BigQuery's planner owns it,
shopify_etl.py delegates every join); on Spark at 100 TB the engine
must supply these levers itself (SURVEY §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.scale import salted_join
from shopify_youtube_etl_spark.plans.common import money, t
from shopify_youtube_etl_spark.plans.registry import query


@query(
    "salted_join_revenue",
    ref="skew machinery — salted equi-join (operators/scale.py), result-identical to a plain join",
    doc="orders ⋈ customer through the salted-join path, aggregated per market segment; oracle is the PLAIN join.",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT)    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew lever, value-verified: the large side gets a
    deterministic row-hash salt, the small side replicates once per
    salt value, and the oracle describes the UNSALTED join — so the
    driver's hash check proves salting changes only the shuffle layout,
    never the result.  At 100 TB this is the fallback when one hot
    o_custkey (a marketplace aggregator account) exceeds what AQE's
    skew-join splitting can rebalance."""
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, key="o_custkey", salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("total_price"),
    )


@query(
    "zorder_locality_profile",
    ref="data-layout machinery — Morton/Z-order clustering key (Delta OPTIMIZE ZORDER BY equivalent)",
    doc="Z-interleave (customer, order-day); per z-bucket: row count and the min/max envelope each file would carry.",
    oracle="""
WITH m AS (
    SELECT o_orderkey,
           o_custkey & 65535 AS x,
           date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 65535 AS y
    FROM orders
),
z AS (
    SELECT x, y,
           (SELECT sum(
                ((m.x >> g.b) & 1) * (CAST(1 AS BIGINT) << (2 * g.b))
              + ((m.y >> g.b) & 1) * (CAST(1 AS BIGINT) << (2 * g.b + 1)))
            FROM (SELECT unnest(generate_series(0, 15)) AS b) g) AS zval
    FROM m
)
SELECT CAST(zval >> 16 AS BIGINT)    AS z_bucket,
       CAST(count(*) AS BIGINT)      AS n_orders,
       CAST(min(x) AS BIGINT)        AS custkey_lo,
       CAST(max(x) AS BIGINT)        AS custkey_hi,
       CAST(min(y) AS BIGINT)        AS day_lo,
       CAST(max(y) AS BIGINT)        AS day_hi
FROM z GROUP BY z_bucket
""",
)
def zorder_locality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The layout key behind multi-dimensional data skipping: interleave
    (o_custkey, order-day) bits into one z-value, bucket by its high
    bits (>>16) — each bucket is what one file would hold after
    ``repartitionByRange(z)`` — and report the min/max envelope per
    bucket on BOTH dimensions.  Narrow envelopes are the point: a
    predicate on EITHER customer or date prunes most buckets, which
    linear (single-column) sort order only gives for its leading
    column.  At 100 TB this runs once at write time; the z fold is a
    map-side JVM expression and the profile is one shuffle on the
    bucket id."""
    o = t(spark, sf_dir, "orders")
    from shopify_youtube_etl_spark.operators.scale import zorder_value

    b = o.select(
        (F.col("o_custkey").bitwiseAND(65535)).alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .bitwiseAND(65535)
        .alias("y"),
    )
    z = b.withColumn("zval", zorder_value("x", "y", bits=16))
    return (
        z.groupBy(F.shiftright("zval", 16).alias("z_bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("x").alias("custkey_lo"),
            F.max("x").alias("custkey_hi"),
            F.min("y").alias("day_lo"),
            F.max("y").alias("day_hi"),
        )
    )

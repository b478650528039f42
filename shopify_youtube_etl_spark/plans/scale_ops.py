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

"""Nested-data operator queries (SURVEY §2.9 N1-N5 — the reference core).

The reference's central transformation is normalizing a nested order
document into 6 flat tables (shopify_etl.py:333-426).  The driver's
testdata is already flat, so these queries prove the nested operators
by ROUNDTRIP: build the nested shape with collect_list/struct, apply
the reference's fan-out (explode / explode_outer / struct extraction),
and aggregate — the oracle computes the same result directly on the
flat tables, so any explode/extraction bug breaks the hash match.

The full raw-Shopify-NDJSON normalization (exact column names, ''
defaults, yes/no encode) lives in ``normalize.py`` and is oracle-tested
against DuckDB ``read_json`` in tests/test_normalize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.plans.common import money, t
from shopify_youtube_etl_spark.plans.registry import query


@query(
    "nested_explode_roundtrip",
    ref="N1 (shopify_etl.py:368-377 — array explode → child table)",
    doc="collect_list(struct) → explode → agg; oracle = direct agg (identity).",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)  AS n_items,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def nested_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1: one output row per array element, carrying the parent key —
    ``orders_raw.select(key, explode(line_items))`` in the reference's
    terms.  Built here by first nesting lineitem under its order."""
    li = t(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_returnflag", "l_quantity", "l_extendedprice")
        ).alias("line_items")
    )
    exploded = nested.select("l_orderkey", F.explode("line_items").alias("item")).select(
        "l_orderkey", "item.*"
    )
    return exploded.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        money(F.sum("l_quantity")).alias("sum_qty"),
        money(F.sum("l_extendedprice")).alias("sum_price"),
    )


@query(
    "explode_outer_guard",
    ref="N2 + P6 (shopify_etl.py:407-413 — guarded explode; empty array ⇒ no rows vs parent kept)",
    doc="explode_outer keeps array-less parents as a null row; inner explode drops them.",
    oracle="""
SELECT (l.l_orderkey IS NOT NULL)     AS has_item,
       CAST(count(*) AS BIGINT)       AS n_rows
FROM orders o
LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def explode_outer_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference emits discount rows only when the array is present
    (:407 guard) = inner ``explode``; parents must survive for orders
    = ``explode_outer``.  This query shows both: orders with no
    lineitems produce exactly one null-item row."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    nested = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.collect_list(F.struct("l_linenumber", "l_quantity")).alias("items")
    )
    joined = o.join(nested, o.o_orderkey == nested.key, "left")
    exploded = joined.select("o_orderkey", F.explode_outer("items").alias("item"))
    return exploded.groupBy(F.col("item").isNotNull().alias("has_item")).agg(
        F.count("*").alias("n_rows")
    )


@query(
    "struct_extract_roundtrip",
    ref="N3/N4 (shopify_etl.py:379-404 — struct → child table projection)",
    doc="Nest customer as a struct, extract fields back out, aggregate.",
    oracle="""
SELECT c_mktsegment                  AS segment,
       CAST(count(*) AS BIGINT)      AS n_orders,
       round(sum(o_totalprice), 2)   AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def struct_extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: ``filter(customer.isNotNull()).select("customer.*")`` — here
    the struct is first assembled (orders ⋈ broadcast customer), then
    fields are extracted via struct-path projection."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    nested = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "o_totalprice",
        F.struct("c_custkey", "c_name", "c_mktsegment").alias("customer"),
    )
    extracted = nested.where(F.col("customer").isNotNull()).select(
        "o_orderkey", "o_totalprice", F.col("customer.c_mktsegment").alias("segment")
    )
    return extracted.groupBy("segment").agg(
        F.count("*").alias("n_orders"), money(F.sum("o_totalprice")).alias("total_price")
    )


@query(
    "json_roundtrip_ingest",
    ref="S8/F10 (shopify_etl.py:105-143 — NDJSON serialize + schema'd load)",
    doc="to_json → from_json(schema, PERMISSIVE) roundtrip; oracle = direct agg.",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
""",
)
def json_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference serializes rows to NDJSON (:110-113) and loads with
    a declared schema + ignore_unknown_values (:130-135).  Spark's
    PERMISSIVE from_json has the same semantics: extra keys dropped,
    missing keys null (SURVEY §1.4)."""
    o = t(spark, sf_dir, "orders")
    js = o.select(
        F.to_json(F.struct("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")).alias("line")
    )
    # Parse with a schema that *omits* o_orderpriority (unknown-key drop)
    # and *adds* missing_col (absent key → null).
    parsed = js.select(
        F.from_json(
            "line",
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, missing_col STRING",
        ).alias("r")
    ).select("r.*")
    return (
        parsed.where(F.col("missing_col").isNull())  # asserts null-fill semantics in-plan
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"), money(F.sum("o_totalprice")).alias("total_price"))
    )


@query(
    "variant_json_analytics",
    ref="S8/F9 generalization — Spark 4 VARIANT: schema-on-read over HETEROGENEOUS JSON (the semi-structured path from_json's fixed schema cannot express)",
    doc="Heterogeneous NDJSON (optional keys, per-row field types) → parse_json VARIANT → typed path extraction (variant_get / try_variant_get) → per-status profile; oracle computes the same predicates directly on the flat columns.",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT)     AS n_orders,
       round(sum(o_totalprice), 2)  AS total_price,
       CAST(count(CASE WHEN o_orderpriority LIKE '1-%' THEN 1 END) AS BIGINT)
                                    AS n_urgent,
       CAST(count(CASE WHEN o_orderkey % 3 <> 0 AND o_totalprice IS NOT NULL
                       THEN 1 END) AS BIGINT)
                                    AS n_flex_numeric
FROM orders
GROUP BY o_orderstatus
""",
)
def variant_json_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The schema-drift half of the JSON family: ``json_roundtrip_ingest``
    proves the FIXED-schema contract (S8), this query proves the
    no-schema one.  Each order renders as a JSON document whose shape
    varies row to row — ``pri`` present only for urgent orders
    (``to_json`` drops null fields), ``flex`` a *string* on every third
    key and a *number* otherwise — then ``parse_json`` ingests it as a
    VARIANT column with no declared schema at all.  Typed reads come
    back out by path: ``variant_get`` for paths the pipeline requires
    (nested ``$.amounts.price``), ``try_variant_get`` for optional keys
    (absent → NULL, counted as presence) and for type-dispatch (the
    string-typed ``flex`` rows fail the ``double`` read → NULL — the
    per-row type census a fixed schema cannot express).

    Scale shape: VARIANT is a binary columnar encoding, so the parse
    happens once at ingest and every extraction is a JVM-side path read
    inside whole-stage codegen — no Python, no re-tokenizing, and the
    grouped aggregate shuffles only the five extracted columns, never
    the documents.  At 100 TB this is the crawl-metadata sidecar path:
    one lenient ingest, typed pruned reads forever after."""
    o = t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").startswith("1")
    base = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.struct(F.col("o_totalprice").alias("price")).alias("amounts"),
            F.when(urgent, F.col("o_orderpriority")).alias("pri"),
        ).alias("s"),
    )
    # Two serializations with DIFFERENT types for `flex`, chosen per row:
    # genuine cross-row type heterogeneity, not a stringly-typed column.
    js = base.select(
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.to_json(F.struct(F.col("s.*"), F.concat(F.lit("s-"), F.col("s.status")).alias("flex"))),
        )
        .otherwise(
            F.to_json(F.struct(F.col("s.*"), (F.col("s.amounts.price") / 100.0).alias("flex")))
        )
        .alias("line")
    )
    v = js.select(F.parse_json("line").alias("v"))
    extracted = v.select(
        F.variant_get("v", "$.status", "string").alias("status"),
        F.variant_get("v", "$.amounts.price", "double").alias("price"),
        F.try_variant_get("v", "$.pri", "string").alias("pri"),
        F.try_variant_get("v", "$.flex", "double").alias("flex_num"),
    )
    return extracted.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        money(F.sum("price")).alias("total_price"),
        F.count("pri").alias("n_urgent"),
        F.count("flex_num").alias("n_flex_numeric"),
    )

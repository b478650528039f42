"""Nested raw-order → 6-table normalization (SURVEY §2.9 N1-N5 — the
reference's core transformation, shopify-etl/shopify_etl.py:333-426).

One schema'd NDJSON read → one cached raw DF → six declarative
``select``/``explode`` branches, replacing the reference's six
materialized Python row-lists (:278-283, 454-461).  Dedup is the
keep-first semantics of :342-347 and :496-542 via
``operators.dedup.dedup_keep_first`` with arrival order =
(updated_at, id), mirroring the ``order=asc`` fetch (:274, O2).

Reference quirks — kept vs normalized (SURVEY §7 risk 3):
- ``str(None) → "None"`` on missing product_id/variant_id (:371-372) is
  KEPT: it guarantees the composite dedup key is never null, which is
  what makes the reference's uniqueness verification (:592-618) hold —
  with true NULLs, countDistinct drops those rows and every check
  reporting total==unique would fail.  The quirk is load-bearing.
- dict.get(k, default) yields the default only when the KEY IS ABSENT;
  an explicit JSON null stays None (:359-360 etc.).  Spark's JSON
  reader can't distinguish absent from null, so both become the
  default (coalesce) — a strict superset of the reference's defaulting.
- ``float(item["price"])`` raises on null (:374, F1) — we use a
  null-safe cast instead of crashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.dedup import dedup_keep_first
from shopify_youtube_etl_spark.schemas import FINAL_TABLE_SCHEMAS, RAW_ORDER, UNIQUE_KEYS


def read_raw_orders(spark: SparkSession, path: str) -> DataFrame:
    """Schema'd NDJSON ingest (S8 semantics: PERMISSIVE — unknown keys
    dropped, missing keys null, exactly BigQuery's
    ``ignore_unknown_values=True`` :130-135)."""
    return spark.read.schema(RAW_ORDER).json(path)


def _arrival_order() -> Column:
    """Arrival order for keep-first dedup: the reference consumes pages
    ascending by updated_at (:274), ties broken by id for determinism."""
    return F.struct(F.col("updated_at").cast("timestamp").alias("u"), F.col("id").alias("i"))


def _s(col: Column) -> Column:
    """String with ''-default (P2, :359-360)."""
    return F.coalesce(col, F.lit(""))


def normalize_orders(raw: DataFrame) -> dict[str, DataFrame]:
    """Fan a raw nested order DF out into the 6 final tables
    (FINAL_TABLE_SCHEMAS), dedup'd by UNIQUE_KEYS with keep-first
    semantics.  Caller should ``raw.persist()`` when materializing all
    six branches in one job (§3.1 lifecycle note)."""
    # Intra-fetch dedup of repeated order ids across pages (:342-347).
    raw = dedup_keep_first(raw, ["id"], _arrival_order())
    arrival = _arrival_order()

    orders = raw.select(
        F.col("id").cast("string").alias("order_id"),  # F2 str() keys :340
        F.col("created_at").cast("timestamp").alias("created_at"),  # F4
        F.col("updated_at").cast("timestamp").alias("updated_at"),
        F.col("processed_at").cast("timestamp").alias("processed_at"),
        F.coalesce(F.col("subtotal_price").cast("double"), F.lit(0.0)).alias("subtotal_price"),
        F.coalesce(F.col("total_tax").cast("double"), F.lit(0.0)).alias("total_tax"),
        F.coalesce(F.col("total_price").cast("double"), F.lit(0.0)).alias("total_price"),
        _s(F.col("financial_status")).alias("financial_status"),
        _s(F.col("fulfillment_status")).alias("fulfillment_status"),
        _s(F.col("currency")).alias("currency"),
        _s(F.col("source_name")).alias("source_name"),
        # P3 conditional-null projection (:363).
        F.when(F.col("customer").isNotNull(), F.col("customer.id").cast("string")).alias(
            "customer_id"
        ),
        arrival.alias("__arr"),
    )

    # N1: array explode → line_items child table (:368-377); inner
    # explode — absent/empty arrays yield no rows (order.get(..., [])).
    line_items = raw.select(
        F.col("id").cast("string").alias("order_id"),
        F.explode("line_items").alias("li"),
        arrival.alias("__arr"),
    ).select(
        "order_id",
        # str(None) → "None" quirk (:371-372) — load-bearing, see module doc.
        F.coalesce(F.col("li.product_id").cast("string"), F.lit("None")).alias("product_id"),
        F.coalesce(F.col("li.variant_id").cast("string"), F.lit("None")).alias("variant_id"),
        F.col("li.name").alias("product_name"),  # rename :373
        F.col("li.price").cast("double").alias("price"),  # null-safe F1
        F.coalesce(F.col("li.quantity"), F.lit(0)).cast("long").alias("quantity"),
        _s(F.col("li.vendor")).alias("vendor"),
        "__arr",
    )

    # N3: struct extraction → customers (:379-390); keep-first dedup
    # means customer attributes come from their EARLIEST fetched order.
    customers = raw.where(F.col("customer").isNotNull()).select(
        F.col("customer.id").cast("string").alias("customer_id"),
        _s(F.col("customer.email")).alias("email"),
        F.col("customer.created_at").cast("timestamp").alias("created_at"),
        _s(F.col("customer.first_name")).alias("first_name"),
        _s(F.col("customer.last_name")).alias("last_name"),
        F.col("customer.phone").alias("phone"),  # nullable, no default (:386)
        F.coalesce(F.col("customer.verified_email"), F.lit(False)).alias("verified_email"),
        arrival.alias("__arr"),
    )

    # N4: struct extraction → shipping_addresses (:392-404).
    shipping_addresses = raw.where(F.col("shipping_address").isNotNull()).select(
        F.col("id").cast("string").alias("order_id"),
        _s(F.col("shipping_address.first_name")).alias("first_name"),
        _s(F.col("shipping_address.last_name")).alias("last_name"),
        _s(F.col("shipping_address.address1")).alias("address1"),
        _s(F.col("shipping_address.city")).alias("city"),
        _s(F.col("shipping_address.province")).alias("province"),
        _s(F.col("shipping_address.country")).alias("country"),
        _s(F.col("shipping_address.zip")).alias("zip"),
        arrival.alias("__arr"),
    )

    # N2: guarded explode → discount_codes (:407-413); inner explode.
    discount_codes = raw.select(
        F.col("id").cast("string").alias("order_id"),
        F.explode("discount_codes").alias("dc"),
        arrival.alias("__arr"),
    ).select(
        "order_id",
        F.col("dc.code").alias("discount_code"),  # rename :411
        F.coalesce(F.col("dc.amount").cast("double"), F.lit(0.0)).alias("discount_value"),
        "__arr",
    )

    # N5: derived struct extraction → marketing_consent (:415-426);
    # F3 boolean→'yes'/'no' encode (:419), constant sms_consent (:425).
    marketing_consent = raw.where(F.col("customer").isNotNull()).select(
        F.col("customer.id").cast("string").alias("customer_id"),
        F.when(F.coalesce(F.col("customer.accepts_marketing"), F.lit(False)), "yes")
        .otherwise("no")
        .alias("email_consent"),
        F.lit("").alias("sms_consent"),
        arrival.alias("__arr"),
    )

    tables = {
        "orders": orders,
        "line_items": line_items,
        "customers": customers,
        "shipping_addresses": shipping_addresses,
        "discount_codes": discount_codes,
        "marketing_consent": marketing_consent,
    }
    out: dict[str, DataFrame] = {}
    for name, df in tables.items():
        deduped = dedup_keep_first(df, UNIQUE_KEYS[name], F.col("__arr")).drop("__arr")
        # Conform to the declared schema's column order (:33-86).
        out[name] = deduped.select(*[f.name for f in FINAL_TABLE_SCHEMAS[name].fields])
    return out

"""Declared schemas, transcribed from the reference.

The reference declares every table schema explicitly and never infers
(shopify-etl/shopify_etl.py:33-86 ``FINAL_TABLE_SCHEMAS``, :88-95
``UNIQUE_KEYS``, :255-264 control table, and
youtube-data-ingestion/fetch_youtube_data.py:38-46).  BigQuery types map
to Spark per SURVEY.md §1.3: STRING→StringType, TIMESTAMP→TimestampType
(session tz UTC), FLOAT→DoubleType (money stays double, NOT decimal —
reference semantics), INTEGER→LongType, BOOLEAN→BooleanType; REQUIRED →
nullable=False.

Keys are *stringified integers* (``str(order["id"])``,
shopify_etl.py:340,363,371-372) — joins and dedup happen on StringType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# Final normalized tables (shopify_etl.py:33-86)
# ---------------------------------------------------------------------------

ORDERS = StructType(
    [
        _f("order_id", StringType(), nullable=False),  # REQUIRED :35
        _f("created_at", TimestampType()),
        _f("updated_at", TimestampType()),
        _f("processed_at", TimestampType()),
        _f("subtotal_price", DoubleType()),
        _f("total_tax", DoubleType()),
        _f("total_price", DoubleType()),
        _f("financial_status", StringType()),
        _f("fulfillment_status", StringType()),
        _f("currency", StringType()),
        _f("source_name", StringType()),
        _f("customer_id", StringType()),
    ]
)

LINE_ITEMS = StructType(
    [
        _f("order_id", StringType(), nullable=False),  # REQUIRED :49
        _f("product_id", StringType()),
        _f("variant_id", StringType()),
        _f("product_name", StringType()),
        _f("price", DoubleType()),
        _f("quantity", LongType()),
        _f("vendor", StringType()),
    ]
)

CUSTOMERS = StructType(
    [
        _f("customer_id", StringType(), nullable=False),  # REQUIRED :58
        _f("email", StringType()),
        _f("created_at", TimestampType()),
        _f("first_name", StringType()),
        _f("last_name", StringType()),
        _f("phone", StringType()),
        _f("verified_email", BooleanType()),
    ]
)

SHIPPING_ADDRESSES = StructType(
    [
        _f("order_id", StringType(), nullable=False),  # REQUIRED :67
        _f("first_name", StringType()),
        _f("last_name", StringType()),
        _f("address1", StringType()),
        _f("city", StringType()),
        _f("province", StringType()),
        _f("country", StringType()),
        _f("zip", StringType()),
    ]
)

DISCOUNT_CODES = StructType(
    [
        _f("order_id", StringType(), nullable=False),  # REQUIRED :77
        _f("discount_code", StringType()),
        _f("discount_value", DoubleType()),
    ]
)

MARKETING_CONSENT = StructType(
    [
        _f("customer_id", StringType(), nullable=False),  # REQUIRED :82
        _f("email_consent", StringType()),  # 'yes'/'no' (:419)
        _f("sms_consent", StringType()),  # always '' (:425)
    ]
)

FINAL_TABLE_SCHEMAS: dict[str, StructType] = {
    "orders": ORDERS,
    "line_items": LINE_ITEMS,
    "customers": CUSTOMERS,
    "shipping_addresses": SHIPPING_ADDRESSES,
    "discount_codes": DISCOUNT_CODES,
    "marketing_consent": MARKETING_CONSENT,
}

# Unique keys per table (shopify_etl.py:88-95) — single and composite.
UNIQUE_KEYS: dict[str, list[str]] = {
    "orders": ["order_id"],
    "line_items": ["order_id", "product_id", "variant_id"],
    "customers": ["customer_id"],
    "shipping_addresses": ["order_id", "first_name", "last_name"],
    "discount_codes": ["order_id", "discount_code"],
    "marketing_consent": ["customer_id"],
}

# Implicit FK relationships enforced by runtime checks (shopify_etl.py:718-733).
FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    # (child_table, child_col, parent_table, parent_col)
    ("line_items", "order_id", "orders", "order_id"),
    ("shipping_addresses", "order_id", "orders", "order_id"),
]

# ---------------------------------------------------------------------------
# Control / watermark table (shopify_etl.py:255-264)
# ---------------------------------------------------------------------------

SYNC_CONTROL = StructType(
    [
        _f("table_name", StringType(), nullable=False),  # REQUIRED :256
        _f("last_sync_timestamp", TimestampType(), nullable=False),  # REQUIRED :257
        _f("records_processed", LongType()),
        _f("status", StringType()),  # success | error | partial
        _f("run_id", StringType()),
        _f("notes", StringType()),
        # default CURRENT_TIMESTAMP() (:262-263) — supplied via coalesce at
        # insert time since parquet has no DDL defaults (SURVEY §1.3).
        _f("created_at", TimestampType(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# YouTube day-grain metrics (fetch_youtube_data.py:38-46)
# ---------------------------------------------------------------------------

YOUTUBE_ANALYTICS_RAW = StructType(
    [
        _f("date", StringType()),  # day key kept as STRING (:40)
        _f("views", LongType()),
        _f("likes", LongType()),
        _f("comments", LongType()),
        _f("shares", LongType()),
        _f("revenue", DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Raw nested Shopify order (input to normalization, shopify_etl.py:333-426;
# field inventory per SURVEY §1.2 / FIXTURES.md B1).  Money arrives as
# decimal STRINGS (Shopify convention) and is float()-cast by the
# reference (:356-358); timestamps arrive as ISO8601 strings.
# ---------------------------------------------------------------------------

RAW_CUSTOMER = StructType(
    [
        _f("id", LongType()),
        _f("email", StringType()),
        _f("created_at", StringType()),
        _f("first_name", StringType()),
        _f("last_name", StringType()),
        _f("phone", StringType()),
        _f("verified_email", BooleanType()),
        _f("accepts_marketing", BooleanType()),
    ]
)

RAW_SHIPPING_ADDRESS = StructType(
    [
        _f("first_name", StringType()),
        _f("last_name", StringType()),
        _f("address1", StringType()),
        _f("city", StringType()),
        _f("province", StringType()),
        _f("country", StringType()),
        _f("zip", StringType()),
    ]
)

RAW_LINE_ITEM = StructType(
    [
        _f("product_id", LongType()),
        _f("variant_id", LongType()),
        _f("name", StringType()),
        _f("price", StringType()),
        _f("quantity", LongType()),
        _f("vendor", StringType()),
    ]
)

RAW_DISCOUNT_CODE = StructType(
    [
        _f("code", StringType()),
        _f("amount", StringType()),
    ]
)

RAW_ORDER = StructType(
    [
        _f("id", LongType()),
        _f("created_at", StringType()),
        _f("updated_at", StringType()),
        _f("processed_at", StringType()),
        _f("subtotal_price", StringType()),
        _f("total_price", StringType()),
        _f("total_tax", StringType()),
        _f("financial_status", StringType()),
        _f("fulfillment_status", StringType()),
        _f("currency", StringType()),
        _f("source_name", StringType()),
        _f("customer", RAW_CUSTOMER),
        _f("shipping_address", RAW_SHIPPING_ADDRESS),
        _f("line_items", ArrayType(RAW_LINE_ITEM)),
        _f("discount_codes", ArrayType(RAW_DISCOUNT_CODE)),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided testdata tables (FIXTURES.md Part A) — names only; the
# parquet footers carry the authoritative schemas.
# ---------------------------------------------------------------------------

TESTDATA_TABLES: list[str] = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

"""Normalization fan-out tests (SURVEY §5 items 2-4).

Oracle = a direct Python re-implementation of the documented engine
contract (reference semantics shopify_etl.py:333-426 + the deviations
documented in normalize.py's module docstring).  This is the strongest
check available: the same row-level algorithm the reference runs,
executed independently of Spark.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from shopify_youtube_etl_spark.normalize import normalize_orders, read_raw_orders
from shopify_youtube_etl_spark.operators.verify import fk_orphans, uniqueness_report
from shopify_youtube_etl_spark.schemas import FINAL_TABLE_SCHEMAS, UNIQUE_KEYS
from tests.conftest import normalize_frame
from tests.fixture_raw_orders import gen_raw_orders, write_ndjson


def _ts(s):
    return None if s is None else dt.datetime.fromisoformat(s).astimezone(dt.timezone.utc).replace(tzinfo=None)


def _d(v, default=""):
    return default if v is None else v


def reference_normalize(rows: list[dict]) -> dict[str, list[dict]]:
    """Row-level re-implementation of the engine contract."""
    seen: set = set()
    deduped = []
    for o in rows:  # file order == updated_at asc (O2)
        if o["id"] in seen:
            continue  # :342-347
        seen.add(o["id"])
        deduped.append(o)

    out: dict[str, list[dict]] = {k: [] for k in FINAL_TABLE_SCHEMAS}
    for o in deduped:
        cust = o.get("customer")
        out["orders"].append(
            {
                "order_id": str(o["id"]),
                "created_at": _ts(o.get("created_at")),
                "updated_at": _ts(o.get("updated_at")),
                "processed_at": _ts(o.get("processed_at")),
                "subtotal_price": float(_d(o.get("subtotal_price"), 0.0)),
                "total_tax": float(_d(o.get("total_tax"), 0.0)),
                "total_price": float(_d(o.get("total_price"), 0.0)),
                "financial_status": _d(o.get("financial_status")),
                "fulfillment_status": _d(o.get("fulfillment_status")),
                "currency": _d(o.get("currency")),
                "source_name": _d(o.get("source_name")),
                "customer_id": str(cust["id"]) if cust else None,
            }
        )
        for li in o.get("line_items") or []:
            out["line_items"].append(
                {
                    "order_id": str(o["id"]),
                    "product_id": str(li.get("product_id")),  # str(None)="None" quirk :371-372
                    "variant_id": str(li.get("variant_id")),
                    "product_name": li.get("name"),
                    "price": None if li.get("price") is None else float(li["price"]),
                    "quantity": int(_d(li.get("quantity"), 0)),
                    "vendor": _d(li.get("vendor")),
                }
            )
        if cust:
            out["customers"].append(
                {
                    "customer_id": str(cust["id"]),
                    "email": _d(cust.get("email")),
                    "created_at": _ts(cust.get("created_at")),
                    "first_name": _d(cust.get("first_name")),
                    "last_name": _d(cust.get("last_name")),
                    "phone": cust.get("phone"),
                    "verified_email": bool(_d(cust.get("verified_email"), False)),
                }
            )
            out["marketing_consent"].append(
                {
                    "customer_id": str(cust["id"]),
                    "email_consent": "yes" if cust.get("accepts_marketing") else "no",
                    "sms_consent": "",
                }
            )
        ship = o.get("shipping_address")
        if ship:
            out["shipping_addresses"].append(
                {
                    "order_id": str(o["id"]),
                    "first_name": _d(ship.get("first_name")),
                    "last_name": _d(ship.get("last_name")),
                    "address1": _d(ship.get("address1")),
                    "city": _d(ship.get("city")),
                    "province": _d(ship.get("province")),
                    "country": _d(ship.get("country")),
                    "zip": _d(ship.get("zip")),
                }
            )
        for dc in o.get("discount_codes") or []:
            out["discount_codes"].append(
                {
                    "order_id": str(o["id"]),
                    "discount_code": dc.get("code"),
                    "discount_value": float(_d(dc.get("amount"), 0.0)),
                }
            )

    # Keep-first dedup by UNIQUE_KEYS (:496-542): single key → drop
    # null-key rows; composite → rows with any null component kept.
    for name, keys in UNIQUE_KEYS.items():
        seen_keys: set = set()
        kept = []
        for row in out[name]:
            vals = tuple(row[k] for k in keys)
            if len(keys) == 1:
                if vals[0] is None:
                    continue  # :511
                if vals in seen_keys:
                    continue
                seen_keys.add(vals)
            else:
                if any(v is None for v in vals):
                    kept.append(row)  # :533-540
                    continue
                if vals in seen_keys:
                    continue
                seen_keys.add(vals)
            kept.append(row)
        out[name] = kept
    return out


@pytest.fixture(scope="module")
def raw_rows():
    return gen_raw_orders(n=300, seed=42)


@pytest.fixture(scope="module")
def normalized(spark, raw_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("raw") / "raw_orders.ndjson")
    write_ndjson(raw_rows, path)
    raw = read_raw_orders(spark, path)
    raw.persist()
    tables = normalize_orders(raw)
    yield tables
    raw.unpersist()


@pytest.mark.parametrize("table", list(FINAL_TABLE_SCHEMAS))
def test_fanout_matches_reference_semantics(normalized, raw_rows, table):
    expected = pd.DataFrame(reference_normalize(raw_rows)[table])
    actual = normalized[table].toPandas()
    assert len(actual) == len(expected), f"{table}: {len(actual)} vs {len(expected)} rows"
    pd.testing.assert_frame_equal(
        normalize_frame(actual), normalize_frame(expected), check_dtype=False, rtol=1e-9
    )


def test_schema_conformance(normalized):
    for name, df in normalized.items():
        want = [(f.name, f.dataType.simpleString()) for f in FINAL_TABLE_SCHEMAS[name].fields]
        got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        assert got == want, f"{name}: {got} != {want}"


def test_uniqueness_after_dedup(normalized):
    # Composite tables may keep null-component rows (by contract), so
    # verify uniqueness among fully-keyed rows only.
    from pyspark.sql import functions as F

    for name, keys in UNIQUE_KEYS.items():
        df = normalized[name]
        for k in keys:
            df = df.where(F.col(k).isNotNull())
        rep = uniqueness_report({name: (df, keys)}).collect()[0]
        assert rep["is_unique"], f"{name} not unique on {keys}: {rep}"


def test_fk_integrity_after_normalize(normalized):
    for child in ["line_items", "shipping_addresses"]:  # :718-733
        orphans = fk_orphans(normalized[child], normalized["orders"], "order_id", "order_id")
        assert orphans.count() == 0


def test_duplicate_orders_dropped_keep_first(normalized):
    # The planted "999999.99" re-emits (later pages) must lose to the
    # first occurrence.
    from pyspark.sql import functions as F

    assert normalized["orders"].where(F.col("total_price") > 900000).count() == 0

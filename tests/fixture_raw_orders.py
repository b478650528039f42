"""Deterministic raw-order NDJSON fixture generator (FIXTURES.md B1).

Shapes and edge-cases mirror what the reference consumes
(shopify-etl/shopify_etl.py:333-426): null/absent optional fields,
null customer/shipping structs, empty & multi-element arrays, unknown
extra keys at every nesting level, duplicate order ids (repeated-page
simulation), shared customer ids with differing attributes, rows
ascending by updated_at (``order=asc`` :274).
"""

from __future__ import annotations

import datetime as dt
import json
import random

UTC = dt.timezone.utc
BASE = dt.datetime(2024, 3, 1, tzinfo=UTC)


def _iso(ts: dt.datetime) -> str:
    return ts.isoformat()


def gen_raw_orders(n: int = 300, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    customer_pool = [5000 + i for i in range(40)]
    rows: list[dict] = []

    for i in range(n):
        oid = 1000 + i
        upd = BASE + dt.timedelta(minutes=7 * i)
        o: dict = {
            "id": oid,
            "created_at": _iso(upd - dt.timedelta(hours=rng.randint(1, 48))),
            "updated_at": _iso(upd),
            "processed_at": _iso(upd - dt.timedelta(minutes=30)),
            "subtotal_price": f"{rng.uniform(10, 500):.2f}",
            "total_price": f"{rng.uniform(10, 600):.2f}",
            "total_tax": f"{rng.uniform(0, 50):.2f}",
            "currency": rng.choice(["USD", "EUR"]),
            "unknown_top_level": {"ignore": "me"},  # ignore_unknown_values :134
        }
        if rng.random() < 0.9:
            o["financial_status"] = rng.choice(["paid", "pending", "refunded"])
        if rng.random() < 0.8:
            o["fulfillment_status"] = rng.choice(["fulfilled", None])
        if rng.random() < 0.7:
            o["source_name"] = rng.choice(["web", "pos"])

        if rng.random() < 0.9:  # ≥10% customer: null (:363, :380)
            cid = rng.choice(customer_pool)
            o["customer"] = {
                "id": cid,
                "email": f"c{cid}@example.com",
                "created_at": _iso(BASE - dt.timedelta(days=cid % 100)),
                "first_name": f"F{i % 7}",  # differs per order → keep-first matters
                "last_name": f"L{cid % 11}",
                "phone": None if rng.random() < 0.3 else f"+1-555-{cid}",
                "verified_email": rng.random() < 0.8,
                "accepts_marketing": rng.random() < 0.5,
                "unknown_nested": 42,
            }
        else:
            o["customer"] = None

        if rng.random() < 0.9:  # ≥10% shipping_address: null (:393)
            o["shipping_address"] = {
                "first_name": f"F{i % 7}",
                "last_name": f"L{i % 11}",
                "address1": f"{i} Main St",
                "city": rng.choice(["Berlin", "Paris", "Austin"]),
                "province": rng.choice(["TX", "BE", ""]),
                "country": rng.choice(["US", "DE", "FR"]),
                "zip": f"{10000 + i}",
                "unknown_addr_key": "x",
            }
        else:
            o["shipping_address"] = None

        items = []
        if rng.random() >= 0.3:  # ~30% empty line_items
            for j in range(rng.randint(1, 4)):
                item = {
                    "product_id": None if rng.random() < 0.1 else 9000 + (i * 7 + j) % 50,
                    "variant_id": None if rng.random() < 0.1 else 80000 + (i * 13 + j) % 90,
                    "name": f"Product {(i + j) % 50}",
                    "price": f"{rng.uniform(5, 200):.2f}",
                    "quantity": rng.randint(1, 5),
                }
                if rng.random() < 0.7:
                    item["vendor"] = rng.choice(["acme", "globex"])
                items.append(item)
        o["line_items"] = items

        r = rng.random()
        if r < 0.3:  # absent key — same as empty for the :407 guard
            pass
        elif r < 0.7:
            o["discount_codes"] = []
        else:
            o["discount_codes"] = [
                {"code": rng.choice(["SAVE10", "VIP", "SPRING"]), "amount": f"{rng.uniform(1, 30):.2f}"}
                for _ in range(rng.randint(1, 2))
            ]
        rows.append(o)

    # ~5% exact-duplicate order ids appended later with changed values
    # (repeated-page simulation, dedup guard :342-347 keeps the FIRST).
    dup_idx = rng.sample(range(n), max(1, n // 20))
    for k, idx in enumerate(sorted(dup_idx)):
        dup = json.loads(json.dumps(rows[idx]))
        dup["updated_at"] = _iso(BASE + dt.timedelta(minutes=7 * (n + k)))
        dup["total_price"] = "999999.99"  # must NOT survive keep-first
        rows.append(dup)
    return rows


def write_ndjson(rows: list[dict], path: str) -> None:
    # NDJSON serializer (S6, shopify_etl.py:105-123).
    with open(path, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))

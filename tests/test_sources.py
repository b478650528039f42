"""Paginated-source model tests (S1-S3): cursor following, page cap,
429 Retry-After handling, exponential backoff, schema'd conversion."""

from __future__ import annotations

import pytest

from shopify_youtube_etl_spark.schemas import RAW_ORDER
from shopify_youtube_etl_spark.sources.paginated import (
    RateLimited,
    fetch_all_pages,
    parse_next_url,
    read_paginated,
)
from tests.fixture_raw_orders import gen_raw_orders


class FakeShopify:
    """3-page fixture server with a one-shot 429 and one transient error."""

    def __init__(self, rows, page_size=100, fail_once_on=None, rate_limit_once_on=None):
        self.pages = [rows[i : i + page_size] for i in range(0, len(rows), page_size)]
        self.fail_once_on = fail_once_on
        self.rate_limit_once_on = rate_limit_once_on
        self.calls = []

    def fetch(self, url):
        self.calls.append(url)
        page_no = int(url.rsplit("page=", 1)[-1])
        if page_no == self.rate_limit_once_on:
            self.rate_limit_once_on = None
            raise RateLimited(retry_after=0.01)
        if page_no == self.fail_once_on:
            self.fail_once_on = None
            raise ConnectionError("boom")
        link = (
            f'<https://x.test/orders?page={page_no + 1}>; rel="next"'
            if page_no + 1 < len(self.pages)
            else None
        )
        return self.pages[page_no], link


def test_parse_next_url():
    assert parse_next_url('<https://a/b?page=2>; rel="next"') == "https://a/b?page=2"
    assert parse_next_url('<https://a/b?page=1>; rel="previous"') is None
    assert parse_next_url(None) is None


def test_fetch_follows_cursor_with_retries():
    # gen_raw_orders appends ~5% duplicate re-emits: 250 + 12 = 262 rows.
    rows = gen_raw_orders(n=250, seed=7)
    srv = FakeShopify(rows, page_size=100, fail_once_on=1, rate_limit_once_on=2)
    sleeps = []
    pages = list(
        fetch_all_pages(srv.fetch, "https://x.test/orders?page=0", sleep=sleeps.append)
    )
    assert [len(p) for p in pages] == [100, 100, 62]
    assert 3.0 in [round(s, 2) for s in sleeps]  # 3·2^0 first backoff (:324)
    assert 0.01 in sleeps  # Retry-After honored (:312-316)


def test_max_pages_cap():
    rows = gen_raw_orders(n=250, seed=7)
    srv = FakeShopify(rows, page_size=100)
    pages = list(fetch_all_pages(srv.fetch, "https://x.test/orders?page=0", max_pages=2))
    assert [len(p) for p in pages] == [100, 100]  # :291


def test_read_paginated_to_dataframe(spark):
    rows = gen_raw_orders(n=120, seed=7)  # + 6 duplicate re-emits = 126 raw
    srv = FakeShopify(rows, page_size=50)
    df = read_paginated(spark, srv.fetch, "https://x.test/orders?page=0", RAW_ORDER, sleep=lambda s: None)
    assert df.count() == 126
    assert df.schema == RAW_ORDER
    # Feeds straight into the normalization fan-out, where the dedup
    # guard collapses the repeated-page re-emits back to 120 orders.
    from shopify_youtube_etl_spark.normalize import normalize_orders

    tables = normalize_orders(df)
    assert tables["orders"].count() == 120


def test_retries_exhaust():
    def always_fail(url):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        list(fetch_all_pages(always_fail, "u", sleep=lambda s: None))


def test_persistent_rate_limit_gives_up():
    """A server that always answers 429 must exhaust max_retries and
    raise — never loop forever (reference bounds 429s at 5 attempts)."""
    import pytest

    def always_429(url):
        raise RateLimited(retry_after=0.0)

    sleeps = []
    with pytest.raises(RateLimited):
        list(fetch_all_pages(always_429, "https://x.test", max_retries=4, sleep=sleeps.append))
    assert len(sleeps) == 3  # max_retries-1 sleeps, then raise

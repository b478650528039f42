"""Paginated REST source model (SURVEY §2.1 S1-S3).

The reference fetches Shopify orders page-by-page (cursor in the
``Link: <url>; rel="next"`` header, parsed by regex ``<(.+?)>`` F11),
pushes ``updated_at_min`` server-side (S2), and wraps every request in
retry/backoff honoring 429 Retry-After (S3, shopify_etl.py:271-331).

In Spark this is inherently a DRIVER-SIDE ingestion concern: the pages
land as rows and become a DataFrame.  For the oracle-checked engine the
equivalent capability is the NDJSON drop-zone read (S8,
``normalize.read_raw_orders``); this module models the live path so the
full reference surface exists: an injectable ``fetch(url) ->
(rows, link_header)`` callable (HTTP, or a fake in tests), the
reference's retry policy constants, and chunked ``createDataFrame``
conversion.  At real scale, page fetch parallelizes by key-range
partitioning the cursor space — noted inline.
"""

from __future__ import annotations

import re
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

# Reference constants (shopify_etl.py:271-331, BASELINE.md).
PAGE_SIZE = 250
MAX_PAGES = 5000
MAX_RETRIES = 5
TIMEOUT_SEC = 30
BACKOFF_BASE = 3  # 3 · 2^attempt seconds (:324)

LINK_NEXT_RE = re.compile(r'<(.+?)>;\s*rel="next"')  # F11 :442

# fetch(url) -> (rows, link_header_or_none)
Fetcher = Callable[[str], tuple[list[dict], str | None]]


class RateLimited(Exception):
    """HTTP 429 with a Retry-After hint (:312-316)."""

    def __init__(self, retry_after: float = 60.0):
        super().__init__(f"429 rate limited, retry after {retry_after}s")
        self.retry_after = retry_after


def urllib_fetcher(
    timeout: float = TIMEOUT_SEC, headers: dict[str, str] | None = None
) -> Fetcher:
    """A live HTTP ``Fetcher`` over the stdlib urllib stack — JSON body
    + ``Link`` header out, HTTP 429 mapped to :class:`RateLimited` with
    the server's ``Retry-After`` so ``fetch_all_pages`` applies the
    reference's policy (shopify_etl.py:271-331).  Stdlib-only by
    design: no third-party HTTP client, no auth/cloud SDK — callers
    supply credentials as plain header values.  Exercised hermetically
    against a loopback http.server in tests/test_sources.py; any
    fetcher with the same ``(rows, link_header)`` contract (or a fake)
    slots in identically, which is what the oracle-checked tests use."""
    import json
    import urllib.error
    import urllib.request

    def fetch(url: str) -> tuple[list[dict], str | None]:
        req = urllib.request.Request(url, headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read()), resp.headers.get("Link")
        except urllib.error.HTTPError as err:
            if err.code == 429:
                raise RateLimited(
                    _parse_retry_after(err.headers.get("Retry-After"))
                ) from err
            raise

    return fetch


def _parse_retry_after(value: str | None, default: float = 60.0) -> float:
    """RFC 9110 §10.2.3 Retry-After: delta-seconds OR an HTTP-date.
    The reference assumes int seconds (shopify_etl.py:313-315), which
    let a date-form header raise ValueError out of the 429 handler and
    escape the retry policy entirely (r11 verdict #4) — here the date
    form maps to seconds-until-then (clamped at 0) and anything
    unparseable falls back to the reference's 60s default, so a 429 is
    ALWAYS classified as RateLimited."""
    if value is None:
        return default
    try:
        return float(value)
    except ValueError:
        pass
    import time as _time
    from email.utils import parsedate_to_datetime

    try:
        dt = parsedate_to_datetime(value)
    except (TypeError, ValueError):
        return default
    return max(0.0, dt.timestamp() - _time.time())


def parse_next_url(link_header: str | None) -> str | None:
    """Cursor extraction from the Link header (:436-449)."""
    if not link_header:
        return None
    m = LINK_NEXT_RE.search(link_header)
    return m.group(1) if m else None


def fetch_all_pages(
    fetcher: Fetcher,
    first_url: str,
    max_pages: int = MAX_PAGES,
    max_retries: int = MAX_RETRIES,
    sleep: Callable[[float], None] = time.sleep,
) -> Iterator[list[dict]]:
    """Follow cursor pagination with the reference's retry policy:
    429 → honor Retry-After; other errors → 3·2^attempt backoff, give
    up after ``max_retries`` attempts (:295-331)."""
    url: str | None = first_url
    pages = 0
    while url and pages < max_pages:  # :291 cap
        # Faithful to the reference's `for attempt in range(max_retries)`
        # (:295-331): 429 sleeps Retry-After and consumes an attempt (no
        # infinite 429 loop); other errors back off 3·2^attempt starting
        # at attempt=0 (first retry after 3 s, then 6, 12, 24).
        last_exc: Exception | None = None
        for attempt in range(max_retries):
            try:
                rows, link = fetcher(url)
                break
            except RateLimited as rl:
                last_exc = rl
                if attempt >= max_retries - 1:
                    raise
                sleep(rl.retry_after)
            except Exception as exc:
                last_exc = exc
                if attempt >= max_retries - 1:
                    raise
                sleep(BACKOFF_BASE * 2**attempt)
        else:  # pragma: no cover — loop always breaks or raises
            raise last_exc  # type: ignore[misc]
        yield rows
        url = parse_next_url(link)
        pages += 1


def read_paginated(
    spark: SparkSession,
    fetcher: Fetcher,
    first_url: str,
    schema,
    max_pages: int = MAX_PAGES,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Drain the paginated source into a schema'd DataFrame.

    Driver-side by design (matches the reference's single-threaded
    fetch).  Scale path: shard the cursor space (e.g. created_at
    ranges) and run one ``read_paginated`` per shard into the drop
    zone, then ingest with the S8 reader — the API, not Spark, is the
    bottleneck either way.
    """
    all_rows: list[dict] = []
    for page in fetch_all_pages(fetcher, first_url, max_pages=max_pages, sleep=sleep):
        all_rows.extend(page)
    return spark.createDataFrame(all_rows, schema)

"""Paginated-source model tests (S1-S3): cursor following, page cap,
429 Retry-After handling, exponential backoff, schema'd conversion."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

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


def test_paginated_source_over_real_loopback_http(spark):
    """S1-S3 against a REAL HTTP stack, hermetically: a stdlib
    http.server bound to 127.0.0.1 (loopback only — no external
    network) serves JSON pages with genuine ``Link: <url>; rel="next"``
    responses and one real 429 + Retry-After, and a stdlib urllib
    fetcher drives ``read_paginated`` end-to-end into a DataFrame.
    The injected-fetcher tests above pin the retry/backoff policy in
    isolation; this one proves the same connector semantics hold when
    actual HTTP headers, status codes, and body bytes are in the loop
    (the reference's live path, shopify_etl.py:271-331)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from email.utils import formatdate

    rows = gen_raw_orders(n=120, seed=7)  # + 6 duplicate re-emits = 126 raw
    page_size = 50
    pages = [rows[i : i + page_size] for i in range(0, len(rows), page_size)]
    state = {"hits": 0, "rate_limited_once": False, "date_limited_once": False}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            state["hits"] += 1
            page_no = int(self.path.rsplit("page=", 1)[-1])
            if page_no == 1 and not state["rate_limited_once"]:
                state["rate_limited_once"] = True
                self.send_response(429)
                self.send_header("Retry-After", "0.01")
                self.end_headers()
                return
            if page_no == 2 and not state["date_limited_once"]:
                # RFC 9110 §10.2.3 also allows an HTTP-date; the float()
                # parse raised ValueError OUT of the 429 handler until
                # r12 (r11 verdict #4), misclassifying the response.
                state["date_limited_once"] = True
                self.send_response(429)
                self.send_header("Retry-After", formatdate(usegmt=True))
                self.end_headers()
                return
            body = json.dumps(pages[page_no]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if page_no + 1 < len(pages):
                nxt = f"http://127.0.0.1:{self.server.server_port}/orders?page={page_no + 1}"
                self.send_header("Link", f'<{nxt}>; rel="next"')
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # keep pytest output clean
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        from shopify_youtube_etl_spark.sources.paginated import urllib_fetcher

        http_fetcher = urllib_fetcher(timeout=10)
        sleeps = []
        first = f"http://127.0.0.1:{server.server_port}/orders?page=0"
        df = read_paginated(spark, http_fetcher, first, RAW_ORDER, sleep=sleeps.append)
        assert df.count() == 126
        assert df.schema == RAW_ORDER
        assert 0.01 in sleeps, "real Retry-After header must reach the policy"
        # The date-form 429 must ALSO land in the policy as a rate-limit
        # sleep (seconds-until-the-date, ~0 for "now"), not the generic
        # 3·2^attempt backoff — i.e. no 3.0s entry appears.
        assert state["date_limited_once"]
        assert len(sleeps) == 2 and 3.0 not in sleeps
        assert 0.0 <= sleeps[1] <= 5.0
        # 3 pages + the two rate-limited attempts = 5 real HTTP requests.
        assert state["hits"] == 5
    finally:
        server.shutdown()
        server.server_close()


def test_retries_exhaust():
    def always_fail(url):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        list(fetch_all_pages(always_fail, "u", sleep=lambda s: None))


def test_parse_retry_after_forms():
    """RFC 9110 Retry-After: delta-seconds, HTTP-date, and garbage must
    all resolve to a usable delay (r11 verdict #4 — the date form used
    to raise ValueError out of the 429 handler)."""
    import time
    from email.utils import formatdate

    from shopify_youtube_etl_spark.sources.paginated import _parse_retry_after

    assert _parse_retry_after("30") == 30.0
    assert _parse_retry_after("1.5") == 1.5
    assert _parse_retry_after(None) == 60.0
    assert _parse_retry_after("not-a-date") == 60.0
    # Future HTTP-date → seconds until then (within test-runtime slack).
    future = formatdate(time.time() + 120, usegmt=True)
    assert 110.0 <= _parse_retry_after(future) <= 120.0
    # Past HTTP-date → clamped to 0, never negative.
    past = formatdate(time.time() - 300, usegmt=True)
    assert _parse_retry_after(past) == 0.0


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


# --- events.ts physical-type robustness (SURVEY §7 risk 4) ----------------
#
# Round-3 lesson: the loader special-cased one physical manifestation of
# the events timestamp and silently passed the others through, so a
# runtime upgrade (PySpark 4.1 delivering TIMESTAMP_NTZ) broke every
# TIMESTAMP-only consumer while tests stayed green.  Lock the contract:
# whatever parquet encoding the runtime hands us, load_table yields a
# true session-timezone TIMESTAMP with identical µs instants.


def _write_events_variant(src_rows, path, encoding):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pa.array(src_rows["ts"], type=pa.timestamp("us"))
    if encoding == "us_utc":
        ts = ts.cast(pa.timestamp("us", tz="UTC"))
    elif encoding == "us_naive":
        pass
    elif encoding == "ns_naive":
        ts = ts.cast(pa.timestamp("ns"))
    elif encoding == "int64_ns":
        ts = pa.array([v * 1000 for v in ts.cast(pa.int64()).to_pylist()], pa.int64())
    cols = {n: pa.array(src_rows[n]) for n in src_rows if n != "ts"}
    cols["ts"] = ts
    order = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pq.write_table(pa.table({n: cols[n] for n in order}), path)


@pytest.mark.parametrize("encoding", ["us_utc", "us_naive", "ns_naive", "int64_ns"])
def test_events_ts_loads_as_timestamp_under_any_physical_encoding(
    spark, sf_dir, tmp_path, encoding
):
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.types import TimestampType

    from shopify_youtube_etl_spark.plans.registry import all_queries
    from shopify_youtube_etl_spark.sources.tables import load_table

    src = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pydict()
    vdir = tmp_path / encoding
    vdir.mkdir()
    for t in os.listdir(sf_dir):  # sessionize needs only events, but keep the dir whole
        if t != "events.parquet":
            os.symlink(os.path.join(sf_dir, t), vdir / t)
    _write_events_variant(src, str(vdir / "events.parquet"), encoding)

    df = load_table(spark, str(vdir), "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"{encoding}: load_table must normalize ts to TIMESTAMP, got "
        f"{df.schema['ts'].dataType}"
    )
    # Identical instants vs the canonical sf_dir load (session tz UTC).
    base = load_table(spark, sf_dir, "events")
    agg = lambda d: d.agg(  # noqa: E731
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).first()
    assert agg(df) == agg(base), f"{encoding}: ts instants drifted"
    # The TIMESTAMP-only consumer that broke in round 3 must PLAN against
    # every encoding (AnalysisException is plan-time, so building the
    # DataFrame is the regression check) — and return identical rows.
    sess = all_queries()["sessionize_gaps_islands"]
    got = sess.fn(spark, str(vdir)).toPandas()
    want = sess.fn(spark, sf_dir).toPandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_events_ts_instants_independent_of_session_timezone(spark, sf_dir):
    """load_table must yield the same UTC instants on ANY caller
    session: the NTZ wall clock IS the UTC instant, and a plain
    cast('timestamp') would reinterpret it in the session timezone —
    shifting every instant by the tz offset on a non-UTC driver
    session (round-4 review finding)."""
    from shopify_youtube_etl_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "events").agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).first()
    pst = spark.newSession()
    pst.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        got = load_table(pst, sf_dir, "events").agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        ).first()
        assert (got["lo"], got["hi"]) == (base["lo"], base["hi"]), (
            "events.ts instants shifted under a non-UTC session"
        )
    finally:
        pst.conf.unset("spark.sql.session.timeZone")


def test_pagestore_writer_roundtrip_and_atomic_abort(spark, tmp_path):
    """The custom DataSource WRITE path: a committed write is readable
    and equal to its input; a failed write (injected task failure)
    aborts without publishing ANY page — readers see all of a write or
    none of it, and the store is byte-identical afterward."""
    import pyspark.sql.functions as F

    from shopify_youtube_etl_spark.sources.pagestore import PageStoreDataSource

    spark.dataSource.register(PageStoreDataSource)
    d = str(tmp_path / "pw_store")
    schema = "doc_id BIGINT, lang STRING"
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("l"), F.col("id") % 3).alias("lang")
    )
    df.repartition(4).write.format("pagestore").option("path", d).option(
        "page_size", "100"
    ).mode("append").save()

    back = spark.read.format("pagestore").schema(schema).option("path", d).load()
    assert back.count() == 1000
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(1000))
    import os

    visible_before = sorted(f for f in os.listdir(d) if not f.startswith("."))
    assert all(f.startswith("page-w") and f.endswith(".ndjson") for f in visible_before)

    # Failed second wave: partition 2 raises mid-job → abort → nothing
    # published, first wave untouched.
    with pytest.raises(Exception, match="injected failure|JOB_ABORTED|aborted"):
        df.repartition(4).write.format("pagestore").option("path", d).option(
            "fail_partition", "2"
        ).mode("append").save()
    visible_after = sorted(f for f in os.listdir(d) if not f.startswith("."))
    assert visible_after == visible_before
    assert spark.read.format("pagestore").schema(schema).option("path", d).load().count() == 1000


def test_pagestore_second_append_never_overwrites(spark, tmp_path):
    """ADVICE r4: final page names carry a job-unique id, so a second
    successful append to the same store ADDS pages instead of
    os.rename-ing over the first job's — the append-only contract
    holds across jobs, not just within one."""
    from shopify_youtube_etl_spark.sources.pagestore import PageStoreDataSource

    spark.dataSource.register(PageStoreDataSource)
    d = str(tmp_path / "pw2_store")
    schema = "doc_id BIGINT"
    mk = lambda lo, hi: spark.range(lo, hi).select(F.col("id").alias("doc_id"))
    # Same partitioning both times — pre-fix the second job's
    # page-w{pid}-{k} names collide exactly with the first job's.
    mk(0, 500).repartition(4).write.format("pagestore").option("path", d).mode(
        "append"
    ).save()
    mk(500, 1000).repartition(4).write.format("pagestore").option("path", d).mode(
        "append"
    ).save()
    back = spark.read.format("pagestore").schema(schema).option("path", d).load()
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(1000))


def test_pagestore_writer_rejects_overwrite(spark, tmp_path):
    from shopify_youtube_etl_spark.sources.pagestore import PageStoreDataSource

    spark.dataSource.register(PageStoreDataSource)
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(Exception, match="append-only"):
        df.write.format("pagestore").option(
            "path", str(tmp_path / "ow_store")
        ).mode("overwrite").save()


def test_pagestore_stream_writer_exactly_once_on_redelivery(spark, sf_dir, tmp_path):
    """Streaming pagestore sink: an availableNow run lands all rows;
    a FULL REDELIVERY (fresh checkpoint, identical deterministic
    batches) re-publishes the same epoch-keyed pages instead of
    duplicating — the store reads back exactly once either way."""
    import os

    import pyspark.sql.functions as F

    from shopify_youtube_etl_spark.sources.pagestore import PageStoreDataSource
    from shopify_youtube_etl_spark.sources.tables import load_table

    spark.dataSource.register(PageStoreDataSource)
    src = str(tmp_path / "ev_json")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.coalesce(2).write.mode("overwrite").json(src)
    store = str(tmp_path / "stream_store")
    schema = "event_id BIGINT, user_id BIGINT, value DOUBLE"

    def run(cp):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .writeStream.format("pagestore")
            .option("path", store)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run(str(tmp_path / "cp1"))
    n_expected = ev.count()
    back = spark.read.format("pagestore").schema(schema).option("path", store).load()
    assert back.count() == n_expected
    pages_first = sorted(os.listdir(store))

    run(str(tmp_path / "cp2"))  # full redelivery
    back2 = spark.read.format("pagestore").schema(schema).option("path", store).load()
    assert back2.count() == n_expected  # no duplicates
    assert sorted(r["event_id"] for r in back2.collect()) == sorted(
        r["event_id"] for r in ev.collect()
    )
    assert sorted(os.listdir(store)) == pages_first  # same epoch-keyed names

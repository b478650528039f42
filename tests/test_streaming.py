"""Structured-Streaming layer tests (SURVEY §2.10 / §7 Phase 4):
availableNow streaming == batch for windowed aggs; foreachBatch upsert
sink is idempotent across micro-batches; streaming dedup replaces the
driver-memory seen-set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.upsert import ParquetTable
from shopify_youtube_etl_spark.plans.windows import tumbling_agg
from shopify_youtube_etl_spark.sources.tables import load_table
from shopify_youtube_etl_spark.streaming.windows import (
    enrich_stream,
    read_event_stream,
    write_with_upsert,
)

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
)


@pytest.fixture(scope="module")
def event_json_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_json"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").json(d)
    return d


def test_streaming_tumbling_equals_batch(spark, event_json_dir, tmp_path_factory):
    stream = read_event_stream(spark, event_json_dir, EVENT_SCHEMA, watermark_delay="1 hour")
    q = (
        tumbling_agg(stream, "15 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_tumbling")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = tumbling_agg(spark.read.schema(EVENT_SCHEMA).json(event_json_dir), "15 minutes")
    got = sorted(spark.sql("SELECT * FROM stream_tumbling").collect())
    want = sorted(batch.collect())
    assert got == want and len(got) > 0


def test_foreach_batch_upsert_sink(spark, event_json_dir, tmp_path_factory):
    """Micro-batch upsert on event_id: processing the same files again
    (fresh checkpoint = redelivery) must not duplicate keys — the
    exactly-once-on-keys contract of the staging→MERGE discipline."""
    table = ParquetTable(spark, str(tmp_path_factory.mktemp("sink") / "latest_events"))

    def run_once(cpdir):
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")  # force several micro-batches
            .json(event_json_dir)
        )
        q = write_with_upsert(stream, table, ["event_id"], cpdir).trigger(availableNow=True).start()
        q.awaitTermination(180)

    run_once(str(tmp_path_factory.mktemp("cp1")))
    n_events = spark.read.schema(EVENT_SCHEMA).json(event_json_dir).count()
    assert table.read().count() == n_events
    run_once(str(tmp_path_factory.mktemp("cp2")))  # full redelivery
    assert table.read().count() == n_events
    assert table.read().select("event_id").distinct().count() == n_events

    # Write shape (r8): the sink merges via upsert_matching, so a later
    # micro-batch with key-disjoint event_ids must leave the existing
    # stats-bearing segments in the manifest BY NAME — the streaming
    # sink never rewrites the whole table per micro-batch.
    segs_before = set(table.segments())
    assert segs_before
    shifted = str(tmp_path_factory.mktemp("shifted_events"))
    (
        spark.read.schema(EVENT_SCHEMA)
        .json(event_json_dir)
        .withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
        .write.mode("overwrite")
        .json(shifted)
    )
    stream2 = spark.readStream.schema(EVENT_SCHEMA).json(shifted)
    q2 = (
        write_with_upsert(
            stream2, table, ["event_id"], str(tmp_path_factory.mktemp("cp3"))
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    assert table.read().count() == 2 * n_events
    assert segs_before <= set(table.segments()), (
        "disjoint micro-batch rewrote existing segments"
    )


def test_streaming_dedup(spark, event_json_dir, tmp_path_factory):
    """streaming_dedup (dropDuplicatesWithinWatermark) == the reference's
    cross-page processed_order_ids set (:285-347), with BOUNDED
    distributed state (evicted as the watermark advances)."""
    from shopify_youtube_etl_spark.streaming.windows import streaming_dedup

    # Duplicate every event by writing the dir twice into one source dir.
    src = str(tmp_path_factory.mktemp("dup_events"))
    df = spark.read.schema(EVENT_SCHEMA).json(event_json_dir)
    df.write.mode("append").json(src)
    df.write.mode("append").json(src)

    stream = streaming_dedup(
        read_event_stream(spark, src, EVENT_SCHEMA, watermark_delay="1 hour"),
        ["event_id"],
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream").first()
    assert out["n"] == out["d"] == df.select("event_id").distinct().count()


def test_streaming_session_window_equals_batch(spark, event_json_dir):
    """session_window merges incrementally across micro-batches; the
    availableNow run (forced multi-batch) must converge to the batch
    result — the hardest window parity (sessions can merge as late
    events arrive within the watermark)."""
    from shopify_youtube_etl_spark.plans.windows import session_agg

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .json(event_json_dir)
    )
    q = (
        session_agg(stream.withWatermark("ts", "1 hour"), "30 minutes")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = session_agg(spark.read.schema(EVENT_SCHEMA).json(event_json_dir), "30 minutes")
    got = sorted(spark.sql("SELECT * FROM stream_sessions").collect())
    want = sorted(batch.collect())
    assert got == want and len(got) > 0


def test_transform_with_state_gated_by_capability(spark):
    """transformWithStateInPandas needs google.protobuf (absent here);
    the operator must refuse cleanly instead of crashing the Python
    runner mid-query.  On a provisioned cluster the gate opens and the
    operator runs as written."""
    from shopify_youtube_etl_spark.streaming.stateful import (
        stateful_distinct_types,
        transform_with_state_available,
    )

    if transform_with_state_available():
        pytest.skip("protobuf present — covered by live runs on real clusters")
    with pytest.raises(NotImplementedError, match="protobuf"):
        dummy = spark.createDataFrame([(1, "click")], "user_id BIGINT, event_type STRING")
        stateful_distinct_types(dummy)


def test_stream_stream_interval_join_equals_batch(spark, event_json_dir):
    """Watermarked stream-stream join with a time-range condition must
    produce exactly the batch interval join — the condition is what
    lets the engine bound and expire buffered join state."""
    from shopify_youtube_etl_spark.plans.windows import interval_join_builder

    def side(event_type):
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .json(event_json_dir)
            .where(F.col("event_type") == event_type)
            .withWatermark("ts", "1 hour")
        )

    q = (
        interval_join_builder(side("purchase"), side("click"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_interval_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch_events = spark.read.schema(EVENT_SCHEMA).json(event_json_dir)
    want = sorted(
        interval_join_builder(
            batch_events.where(F.col("event_type") == "purchase"),
            batch_events.where(F.col("event_type") == "click"),
        ).collect()
    )
    got = sorted(spark.sql("SELECT * FROM stream_interval_join").collect())
    assert got == want and len(got) > 0


def test_stream_static_enrichment_equals_batch(spark, event_json_dir, sf_dir):
    """Stream-static broadcast join: every micro-batch row is enriched
    with the static dim's columns, result equal to the batch join (and
    left rows with no dim match survive with NULLs)."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    stream = read_event_stream(spark, event_json_dir, EVENT_SCHEMA)
    q = (
        enrich_stream(stream, dim, "user_id")
        .groupBy(F.window("ts", "1 hour"), "c_mktsegment")
        .agg(F.count("*").alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["window"], r["c_mktsegment"], r["n"])
        for r in spark.sql("SELECT * FROM stream_enriched").collect()
    )
    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .json(event_json_dir)
        .join(F.broadcast(dim), "user_id", "left")
        .groupBy(F.window("ts", "1 hour"), "c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    want = sorted((r["window"], r["c_mktsegment"], r["n"]) for r in batch.collect())
    assert got == want and len(got) > 0


def test_pagestore_stream_consumes_only_new_pages(spark, tmp_path):
    """The streaming pagestore source is exactly-once across restarts:
    a second availableNow run against the same checkpoint reads ONLY
    pages landed after the first run's offset watermark."""
    from shopify_youtube_etl_spark.sources.pagestore import (
        PageStoreDataSource,
        write_page_store,
    )

    store, sink, cp = (
        str(tmp_path / "store"),
        str(tmp_path / "sink"),
        str(tmp_path / "cp"),
    )
    spark.dataSource.register(PageStoreDataSource)

    def consume() -> None:
        q = (
            spark.readStream.format("pagestore")
            .schema("k BIGINT")
            .option("path", store)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    n1 = write_page_store([{"k": i} for i in range(500)], store, page_size=100)
    consume()
    out = spark.read.schema("k BIGINT").parquet(sink)
    assert out.count() == 500
    write_page_store(
        [{"k": i} for i in range(500, 700)], store, page_size=100, start_page=n1
    )
    consume()
    out = spark.read.schema("k BIGINT").parquet(sink)
    # Exactly-once: 700 rows total, every key exactly once — a replayed
    # wave-1 page would duplicate keys, a skipped wave-2 page would drop.
    assert out.count() == 700
    assert out.select("k").distinct().count() == 700


def test_stream_stream_left_outer_interval_join_equals_batch(
    spark, event_json_dir, tmp_path_factory
):
    """LEFT OUTER stream-stream join: matched rows emit like the inner
    join, but unmatched purchases emit their NULL-click row only when
    BOTH watermarks clear the purchase's join window — a far-future
    sentinel file (one purchase + one click, mtime-ordered last)
    advances both watermarks so every real unmatched row is evicted
    before availableNow drains.  Result must equal the batch left
    join exactly (sentinel rows excluded)."""
    import json
    import os
    import shutil
    import time

    from shopify_youtube_etl_spark.plans.windows import interval_left_join_builder

    d = str(tmp_path_factory.mktemp("events_lj"))
    now = time.time()
    for i, f in enumerate(sorted(os.listdir(event_json_dir))):
        if f.endswith(".json"):
            shutil.copy(os.path.join(event_json_dir, f), os.path.join(d, f))
            os.utime(os.path.join(d, f), (now - 100 + i, now - 100 + i))
    far = "2035-01-01T00:00:00.000Z"
    sentinel = os.path.join(d, "zz-sentinel.json")
    with open(sentinel, "w") as fh:
        for eid, etype in ((-1, "purchase"), (-2, "click")):
            fh.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts": far,
                        "user_id": -1,
                        "event_type": etype,
                        "value": 0.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )
    os.utime(sentinel, (now + 100, now + 100))

    def side(event_type):
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(d)
            .where(F.col("event_type") == event_type)
            .withWatermark("ts", "0 seconds")
        )

    q = (
        interval_left_join_builder(side("purchase"), side("click"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_left_interval_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch_events = spark.read.schema(EVENT_SCHEMA).json(event_json_dir)
    want = sorted(
        interval_left_join_builder(
            batch_events.where(F.col("event_type") == "purchase"),
            batch_events.where(F.col("event_type") == "click"),
        ).collect()
    )
    got = sorted(
        spark.sql(
            "SELECT * FROM stream_left_interval_join WHERE user_id >= 0"
        ).collect()
    )
    assert got == want and len(got) > 0
    assert any(r["click_id"] is None for r in got), "no watermark-evicted rows seen"


def test_chained_streaming_windows_equal_batch_hourly(
    spark, event_json_dir, tmp_path_factory
):
    """Two stateful window aggs chained in ONE streaming query (15-min
    partials → hourly finals via window_time) must equal the batch
    hourly aggregate; a far-future sentinel file closes the last hour
    so availableNow drains both state levels."""
    import json
    import os
    import shutil
    import time

    from shopify_youtube_etl_spark.streaming.windows import two_level_window_agg

    d = str(tmp_path_factory.mktemp("events_chain"))
    now = time.time()
    for i, f in enumerate(sorted(os.listdir(event_json_dir))):
        if f.endswith(".json"):
            shutil.copy(os.path.join(event_json_dir, f), os.path.join(d, f))
            os.utime(os.path.join(d, f), (now - 100 + i, now - 100 + i))
    sentinel = os.path.join(d, "zz-sentinel.json")
    with open(sentinel, "w") as fh:
        fh.write(
            json.dumps(
                {
                    "event_id": -1,
                    "ts": "2035-01-01T00:00:00.000Z",
                    "user_id": -1,
                    "event_type": "view",
                    "value": 0.0,
                    "props": "{}",
                }
            )
            + "\n"
        )
    os.utime(sentinel, (now + 100, now + 100))

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(d)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        two_level_window_agg(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_chained_windows")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = two_level_window_agg(spark.read.schema(EVENT_SCHEMA).json(event_json_dir))
    want = sorted(batch.collect())
    got = sorted(
        spark.sql(
            "SELECT * FROM stream_chained_windows WHERE hour_start < '2035'"
        ).collect()
    )
    assert got == want and len(got) > 0

"""Unit tests for the custom operators: keep-first dedup null semantics
(shopify_etl.py:496-542), MERGE-upsert properties (§5.4), atomic
parquet table swap, watermark ledger (:171-235).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.dedup import dedup_keep_first
from shopify_youtube_etl_spark.operators.upsert import ParquetTable, upsert
from shopify_youtube_etl_spark.operators.watermark import FALLBACK_START, OVERLAP, SyncControl


def test_dedup_single_key_keep_first_drops_null_keys(spark):
    df = spark.createDataFrame(
        [("a", 1, "first"), ("a", 2, "second"), (None, 3, "nullkey"), ("b", 4, "only")],
        "k STRING, arr INT, v STRING",
    )
    out = dedup_keep_first(df, ["k"], "arr").orderBy("k").collect()
    # null-key row dropped (:511); 'a' keeps arrival-1 row.
    assert [(r["k"], r["v"]) for r in out] == [("a", "first"), ("b", "only")]


def test_dedup_composite_key_keeps_null_component_rows(spark):
    df = spark.createDataFrame(
        [
            ("o1", "p1", 1, "first"),
            ("o1", "p1", 2, "dup-dropped"),
            ("o1", None, 3, "null-kept-1"),
            ("o1", None, 4, "null-kept-2"),  # ALSO kept — nulls bypass dedup :533-540
        ],
        "k1 STRING, k2 STRING, arr INT, v STRING",
    )
    out = {r["v"] for r in dedup_keep_first(df, ["k1", "k2"], "arr").collect()}
    assert out == {"first", "null-kept-1", "null-kept-2"}


def test_upsert_staging_wins_and_is_idempotent(spark):
    final = spark.createDataFrame([(1, "old"), (2, "keep")], "k INT, v STRING")
    staging = spark.createDataFrame([(1, "new"), (3, "ins")], "k INT, v STRING")
    once = upsert(final, staging, ["k"])
    assert dict((r["k"], r["v"]) for r in once.collect()) == {1: "new", 2: "keep", 3: "ins"}
    twice = upsert(once, staging, ["k"])
    assert sorted(twice.collect()) == sorted(once.collect())


def test_upsert_order_col_picks_latest_within_batch(spark):
    final = spark.createDataFrame([(1, 0, "old")], "k INT, ver INT, v STRING")
    staging = spark.createDataFrame(
        [(1, 1, "mid"), (1, 2, "latest")], "k INT, ver INT, v STRING"
    )
    out = upsert(final, staging, ["k"], order_col="ver").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "latest")]


def test_parquet_table_atomic_swap_and_truncate(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t"))
    assert not t.exists()
    df1 = spark.range(5).withColumnRenamed("id", "x")
    t.overwrite(df1)
    assert t.read().count() == 5
    gen1 = t.current_manifest()
    t.append(spark.range(5, 8).withColumnRenamed("id", "x"))
    assert t.read().count() == 8
    assert t.current_manifest() != gen1  # append commits a new manifest
    t.truncate()
    assert t.read().count() == 0
    assert [f.name for f in t.read().schema.fields] == ["x"]


def test_parquet_table_append_is_o_batch(spark, tmp_path):
    """VERDICT round-1 item #3: append must land ONLY the new batch's
    files — prior segment files are referenced by the new manifest,
    never rewritten (checked via path identity + mtime)."""
    import os

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(1000).withColumnRenamed("id", "x"))
    [seg1] = t.segments()
    files_before = {
        f: os.path.getmtime(os.path.join(seg1, f))
        for f in os.listdir(seg1)
        if f.endswith(".parquet")
    }
    t.append(spark.range(1000, 1010).withColumnRenamed("id", "x"))
    segs = t.segments()
    assert seg1 in segs and len(segs) == 2  # old segment reused as-is
    files_after = {
        f: os.path.getmtime(os.path.join(seg1, f))
        for f in os.listdir(seg1)
        if f.endswith(".parquet")
    }
    assert files_after == files_before  # byte-for-byte untouched
    assert t.read().count() == 1010


def test_parquet_table_retains_generations_for_lazy_readers(spark, tmp_path):
    """ADVICE round 1: a DataFrame read() before a concurrent overwrite
    must still scan intact files — superseded segments survive
    KEEP_GENERATIONS commits before GC."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(100).withColumnRenamed("id", "x"))
    lazy = t.read()  # unexecuted plan pinned to generation 1
    t.overwrite(spark.range(50).withColumnRenamed("id", "x"))
    assert lazy.count() == 100  # old segment still on disk
    # After KEEP_GENERATIONS more commits the gen-1 segment is GC'd.
    t.overwrite(spark.range(10).withColumnRenamed("id", "x"))
    t.overwrite(spark.range(5).withColumnRenamed("id", "x"))
    import os

    segs_on_disk = [d for d in os.listdir(t.path) if d.startswith("seg-")]
    assert len(segs_on_disk) == ParquetTable.KEEP_GENERATIONS + 1
    assert t.read().count() == 5


def test_parquet_table_compaction_and_time_travel(spark, tmp_path):
    """compact() folds N append segments into one; read_at() reads the
    retained previous generations (bounded time travel)."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).withColumnRenamed("id", "x"))
    for start in (10, 20, 30):
        t.append(spark.range(start, start + 10).withColumnRenamed("id", "x"))
    assert len(t.segments()) == 4
    t.compact()
    assert len(t.segments()) == 1
    assert t.read().count() == 40
    # Time travel: generation 1 back is the pre-compaction 4-segment view.
    assert t.read_at(1).count() == 40
    assert t.read_at(0).count() == 40
    with pytest.raises(FileNotFoundError):
        t.read_at(99)


def test_parquet_table_auto_compaction(spark, tmp_path):
    """append(auto_compact_at=N) keeps the segment count bounded."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(5).withColumnRenamed("id", "x"))
    for start in range(5, 30, 5):
        t.append(spark.range(start, start + 5).withColumnRenamed("id", "x"), auto_compact_at=3)
    assert len(t.segments()) < 3
    assert t.read().count() == 30


def test_parquet_table_concurrent_appends_lose_nothing(spark, tmp_path):
    """ADVICE r2 (medium): two writers racing appends on one table must
    both land — the commit lock makes the manifest sequence a CAS, so
    neither writer's segments are silently dropped by the other's
    pointer flip (the pre-fix failure mode: both compute the same seq,
    last os.replace wins)."""
    from concurrent.futures import ThreadPoolExecutor

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(0).withColumnRenamed("id", "x"))

    def appender(base: int) -> None:
        for k in range(8):
            t.append(
                spark.range(base + 10 * k, base + 10 * k + 10).withColumnRenamed("id", "x")
            )

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(appender, 0), pool.submit(appender, 1000)]
        for f in futs:
            f.result()

    got = {r["x"] for r in t.read().collect()}
    expected = set(range(0, 80)) | set(range(1000, 1080))
    assert got == expected  # every row from both writers survived


def test_time_travel_survives_gc_under_concurrent_reader(spark, tmp_path):
    """VERDICT r2 item #6: a reader holding generation N−1 (via read_at)
    must complete its scan after two more commits trigger generation GC
    — KEEP_GENERATIONS=2 protects exactly the advertised window."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(100).withColumnRenamed("id", "x"))  # gen 0
    t.append(spark.range(100, 150).withColumnRenamed("id", "x"))  # gen 1

    held = t.read_at(1)  # unexecuted plan pinned to gen 0's segments
    t.overwrite(spark.range(7).withColumnRenamed("id", "x"))  # gen 2 (+GC)
    t.overwrite(spark.range(3).withColumnRenamed("id", "x"))  # gen 3 (+GC)

    # gen 0 is now the oldest retained generation; the held plan scans it.
    assert held.count() == 100
    assert t.read().count() == 3
    # One more commit pushes gen 0 out of the retention window entirely.
    t.overwrite(spark.range(1).withColumnRenamed("id", "x"))  # gen 4 (+GC)
    import os

    segs = [d for d in os.listdir(t.path) if d.startswith("seg-")]
    assert len(segs) == ParquetTable.KEEP_GENERATIONS + 1


def test_compact_folds_in_concurrent_append(spark, tmp_path):
    """Review r3: a segment appended AFTER compact()'s snapshot but
    BEFORE its commit must survive — the compaction manifest is folded
    against the then-current prior list under the lock, never the stale
    snapshot (the pre-fix overwrite(read()) silently dropped it)."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).withColumnRenamed("id", "x"))
    t.append(spark.range(10, 20).withColumnRenamed("id", "x"))

    real_commit = t._commit

    def racing_commit(fold):
        # Simulate a concurrent writer landing between compact()'s
        # snapshot (already taken by the caller) and its commit.
        if not getattr(racing_commit, "fired", False):
            racing_commit.fired = True
            seg = t._write_segment(
                spark.range(100, 110).withColumnRenamed("id", "x")
            )
            real_commit(lambda prior: prior + [seg])
        return real_commit(fold)

    t._commit = racing_commit
    t.compact()
    t._commit = real_commit
    assert {r["x"] for r in t.read().collect()} == set(range(20)) | set(range(100, 110))
    # The compacted segment + the concurrent append's segment.
    assert len(t.segments()) == 2


def test_compact_aborts_on_conflicting_overwrite(spark, tmp_path):
    """Review r3: if an OVERWRITE (or another compact) replaced the
    snapshot's segments mid-compaction, folding would double-count —
    the compaction must abort, publish nothing, and delete its
    orphan segment."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).withColumnRenamed("id", "x"))
    t.append(spark.range(10, 20).withColumnRenamed("id", "x"))

    real_commit = t._commit

    def racing_commit(fold):
        if not getattr(racing_commit, "fired", False):
            racing_commit.fired = True
            seg = t._write_segment(spark.range(500, 503).withColumnRenamed("id", "x"))
            real_commit(lambda prior: [seg])  # overwrite wins the race
        return real_commit(fold)

    t._commit = racing_commit
    t.compact()
    t._commit = real_commit
    assert {r["x"] for r in t.read().collect()} == {500, 501, 502}
    import os

    # Aborted compaction's segment was cleaned up: live segs + retained
    # generations only (gen: [10], [10+10], [3]) — no extra orphan dir.
    live = {os.path.basename(s) for s in t.segments()}
    on_disk = {d for d in os.listdir(t.path) if d.startswith("seg-")}
    assert len(on_disk) == 3  # seg(10) + seg(10..20) + seg(500..503)
    assert live <= on_disk


def test_commit_self_heals_orphan_manifest(spark, tmp_path):
    """Review r3: a writer crashing between manifest creation (O_EXCL)
    and the _CURRENT pointer flip must not wedge the table — the next
    commit removes the unpointed orphan instead of colliding on the
    deterministic seq name forever, and read_at(0) never serves the
    uncommitted manifest."""
    import os

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).withColumnRenamed("id", "x"))
    cur_seq = t._manifest_seq(t.current_manifest())
    # Simulate the crash: orphan manifest at seq+1, pointer not flipped.
    orphan = os.path.join(t.path, f"manifest-{cur_seq + 1:016d}.txt")
    with open(orphan, "w") as fh:
        fh.write("seg-deadbeef\n")

    # read_at(0) must serve the COMMITTED generation, not the orphan.
    # (Pre-heal the orphan sorts newest; it is only removed on the next
    # commit, so this documents the committed-pointer contract.)
    t.append(spark.range(10, 15).withColumnRenamed("id", "x"))  # would wedge pre-fix
    assert t.read().count() == 15
    # The append's own manifest legitimately reuses the orphan's seq
    # name; what matters is the uncommitted content is gone everywhere.
    for m in os.listdir(t.path):
        if m.startswith("manifest-"):
            assert "seg-deadbeef" not in open(os.path.join(t.path, m)).read()
    assert t.read_at(0).count() == 15


def test_merge_from_applies_and_truncates(spark, tmp_path):
    final = ParquetTable(spark, str(tmp_path / "final"))
    stg = ParquetTable(spark, str(tmp_path / "stg"))
    final.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING"))
    stg.overwrite(spark.createDataFrame([(2, "B"), (2, "B"), (3, "c")], "k INT, v STRING"))
    final.merge_from(stg, ["k"])  # SELECT DISTINCT * pre-merge :575
    assert dict((r["k"], r["v"]) for r in final.read().collect()) == {1: "a", 2: "B", 3: "c"}
    assert stg.read().count() == 0


def test_sync_control_watermark_semantics(spark, tmp_path):
    sc = SyncControl(spark, str(tmp_path / "ctl"))
    assert sc.last_sync_timestamp() is None
    assert sc.start_date() == FALLBACK_START  # :205/:633 fallback

    t1 = dt.datetime(2024, 6, 1, 12, 0, tzinfo=dt.timezone.utc)
    t2 = dt.datetime(2024, 6, 1, 13, 0, tzinfo=dt.timezone.utc)
    sc.record_run("orders", t1, 10, "success")
    sc.record_run("orders", t2, 5, "error")  # errors must not advance watermark (:177)
    assert sc.last_sync_timestamp() == t1 - OVERLAP  # 1h intended rewind (F5)

    sc.record_run("orders", t2, 7, "success")
    assert sc.last_sync_timestamp() == t2 - OVERLAP
    assert sc.start_date(force_full_load=True) == FALLBACK_START


# full lane: ~9s many-generation growth probe; single-commit behavior
# stays default-covered by the sync/verb pins.
@pytest.mark.full
def test_sync_control_segments_stay_bounded(spark, tmp_path):
    """A long-lived pipeline appends one ledger row per run; the
    control table must auto-compact so reads/commits never degrade
    linearly with run count (code-review finding on O(batch) append)."""
    sc = SyncControl(spark, str(tmp_path / "ctl"))
    t0 = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    for i in range(20):
        sc.record_run("orders", t0 + dt.timedelta(hours=i), i, "success")
    assert len(sc.table.segments()) < 16
    assert sc.read().count() == 20  # nothing lost across compactions
    assert sc.last_sync_timestamp() == t0 + dt.timedelta(hours=19) - OVERLAP


def test_backup_ndjson_roundtrip(spark, tmp_path):
    """S12 export sink: NDJSON backup reloads to the identical table."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "k INT, v STRING")
    t.overwrite(df)
    t.backup(str(tmp_path / "bak"))
    back = spark.read.schema("k INT, v STRING").json(str(tmp_path / "bak"))
    assert sorted(back.collect()) == sorted(df.collect())


def test_apply_changes_upsert_delete_and_passthrough(spark):
    from shopify_youtube_etl_spark.operators.upsert import apply_changes

    final = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "k STRING, v DOUBLE"
    )
    changes = spark.createDataFrame(
        [("a", 10.0, "U"), ("b", 0.0, "D"), ("d", 4.0, "U")],
        "k STRING, v DOUBLE, op STRING",
    )
    got = {
        (r["k"], r["v"]) for r in apply_changes(final, changes, ["k"]).collect()
    }
    # a replaced, b deleted, c untouched, d inserted
    assert got == {("a", 10.0), ("c", 3.0), ("d", 4.0)}


def test_apply_changes_idempotent_and_latest_wins(spark):
    from shopify_youtube_etl_spark.operators.upsert import apply_changes

    final = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k STRING, v DOUBLE")
    # same key appears twice in the feed: seq decides (D at seq 2 wins)
    changes = spark.createDataFrame(
        [("a", 5.0, "U", 1), ("a", 0.0, "D", 2), ("b", 7.0, "U", 1)],
        "k STRING, v DOUBLE, op STRING, seq INT",
    )
    once = apply_changes(final, changes, ["k"], order_col="seq")
    twice = apply_changes(once, changes, ["k"], order_col="seq")
    got_once = {(r["k"], r["v"]) for r in once.collect()}
    got_twice = {(r["k"], r["v"]) for r in twice.collect()}
    assert got_once == {("b", 7.0)}  # a deleted by the later tombstone
    assert got_twice == got_once  # re-applying the same feed changes nothing


def test_parquet_table_history_and_read_version(spark, tmp_path):
    """history() lists retained absolute sequences; read_version(seq) is
    VERSION AS OF; expired generations raise, never silently misread."""
    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).withColumnRenamed("id", "x"))
    t.append(spark.range(10, 30).withColumnRenamed("id", "x"))
    assert t.history() == [0, 1]
    assert t.read_version(0).count() == 10
    assert t.read_version(1).count() == 30
    # Push generation 0 past the retention window.
    for start in (30, 40):
        t.append(spark.range(start, start + 10).withColumnRenamed("id", "x"))
    assert t.history() == [1, 2, 3]
    with pytest.raises(FileNotFoundError):
        t.read_version(0)
    with pytest.raises(FileNotFoundError):
        t.read_version(99)


def test_parquet_table_vacuum_removes_only_aged_orphans(spark, tmp_path):
    """vacuum() deletes crash-orphaned segments (referenced by no
    manifest) past the grace period — and NOTHING else: live segments
    and young orphans (possibly a slow writer's in-flight segment)
    survive."""
    import os as _os

    t = ParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).withColumnRenamed("id", "x"))
    t.append(spark.range(10, 20).withColumnRenamed("id", "x"))
    live = {_os.path.basename(s) for s in t.segments()}
    # Fake a crashed writer: a segment dir no manifest references.
    old_orphan = _os.path.join(t.path, "seg-deadbeef")
    _os.makedirs(old_orphan)
    _os.utime(old_orphan, (0, 0))  # ancient mtime → past any grace period
    young_orphan = _os.path.join(t.path, "seg-cafebabe")
    _os.makedirs(young_orphan)  # fresh mtime → inside grace period
    removed = t.vacuum(min_age_seconds=3600)
    assert removed == ["seg-deadbeef"]
    on_disk = {d for d in _os.listdir(t.path) if d.startswith("seg-")}
    assert live <= on_disk and "seg-cafebabe" in on_disk
    assert t.read().count() == 20


def test_upsert_evolve_schema(spark):
    """evolve_schema=True: staging's new column appears (NULL on
    untouched finals); final-only columns are NULL on staged rows."""
    final = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    staging = spark.createDataFrame([(2, "B2", 9.5)], "k INT, v STRING, score DOUBLE")
    out = upsert(final, staging, keys=["k"], evolve_schema=True)
    rows = {r["k"]: (r["v"], r["score"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("B2", 9.5)}
    # Default stays strict: new columns are dropped.
    strict = upsert(final, staging, keys=["k"])
    assert strict.columns == ["k", "v"]


def test_append_with_expectations_quarantines_violations(spark, tmp_path):
    """Good rows land in the table, violating rows in quarantine with
    every failed check named; NULL-valued checks pass (CHECK-constraint
    semantics)."""
    from pyspark.sql import functions as F

    t = ParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, -1.0)],
        "k INT, price DOUBLE",
    )
    report = t.append_with_expectations(
        df,
        {"price_positive": F.col("price") > 0, "k_small": F.col("k") < 4},
    )
    assert {r["k"] for r in t.read().collect()} == {1, 3}  # NULL price passes
    q = ParquetTable(spark, str(tmp_path / "t_quarantine")).read()
    failed = {r["k"]: sorted(r["failed_expectations"]) for r in q.collect()}
    assert failed == {2: ["price_positive"], 4: ["k_small", "price_positive"]}
    rep = {r["expectation"]: r["n_violations"] for r in report.collect()}
    assert rep == {"price_positive": 2, "k_small": 1}


def test_change_feed_replays_to_target_version(spark, sf_dir, tmp_path):
    """The CDC round trip: apply_changes(v0, change_feed(v0→v1)) == v1.
    I/U map to apply_changes 'U' (insert-or-replace), D to its
    tombstone — proving the feed is complete AND minimal (only changed
    keys appear)."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable, apply_changes
    from shopify_youtube_etl_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    )
    tbl = ParquetTable(spark, str(tmp_path / "cf"))
    v0 = cust.where(F.col("c_custkey") <= 100)
    v1 = cust.where((F.col("c_custkey") <= 120) & (F.col("c_custkey") % 3 != 0))
    tbl.overwrite(v0)
    tbl.overwrite(v1)
    s0, s1 = tbl.history()[-2], tbl.history()[-1]
    feed = tbl.change_feed(s0, s1, keys=["c_custkey"])
    # no unchanged keys in the feed
    assert feed.where(F.col("op") == "U").count() == 0  # only adds/drops here
    replayed = apply_changes(
        tbl.read_version(s0),
        feed.withColumn("op", F.when(F.col("op") == "D", "D").otherwise("U")),
        keys=["c_custkey"],
    )
    got = sorted(tuple(r) for r in replayed.collect())
    want = sorted(tuple(r) for r in tbl.read_version(s1).collect())
    assert got == want and len(want) > 0


def test_segment_stats_prune_files_not_rows(spark, sf_dir, tmp_path):
    """Stats-based skipping: a range read opens only overlapping
    segments; statless segments always survive pruning (safety), and
    the residual filter keeps results exact even when a kept segment
    straddles the range."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "skip"))
    mk = lambda lo, hi: spark.range(lo, hi).select(F.col("id").cast("long").alias("k"))
    tbl.overwrite(mk(0, 100), stats_cols=["k"])
    tbl.append(mk(100, 200), stats_cols=["k"])
    tbl.append(mk(200, 300), stats_cols=["k"])
    tbl.append(mk(300, 400))  # NO stats — must always be kept

    segs = tbl.segments_for_range("k", 120, 180)
    assert len(segs) == 2  # the [100,200) segment + the statless one
    got = sorted(r["k"] for r in tbl.read_range("k", 120, 180).collect())
    assert got == list(range(120, 181))  # residual filter exact, inclusive

    # fully-outside range: only the statless segment survives pruning
    assert len(tbl.segments_for_range("k", 5000, 6000)) == 1
    assert tbl.read_range("k", 5000, 6000).count() == 0


def test_segment_skipping_query_prunes_to_one_segment(spark, sf_dir):
    """The registered query's pruning claim, asserted directly: the
    1997 range must select exactly one of the four year segments."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable
    from shopify_youtube_etl_spark.plans.common import staging_dir
    from shopify_youtube_etl_spark.plans.registry import all_queries

    all_queries()["segment_skipping_scan"].fn(spark, sf_dir).collect()
    # staging_dir clears on REUSE, so reopen the table it just built
    import os
    import tempfile
    import hashlib

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = ParquetTable(
        spark, os.path.join(tempfile.gettempdir(), f"sye_segskip_{key}")
    )
    assert len(tbl.segments()) == 4
    assert len(tbl.segments_for_range("o_orderdate", "1997-01-01", "1997-12-31")) == 1


def test_append_rejects_schema_drift_unless_evolving(spark, tmp_path):
    """A drifted-schema append must raise (pre-fix it silently dropped
    the old column at read time); with evolve_schema=True the union
    schema surfaces via mergeSchema, NULL-filled both ways."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "drift"))
    tbl.overwrite(spark.range(3).select(F.col("id").alias("a"), F.lit("x").alias("b")))
    drifted = spark.range(3, 6).select(F.col("id").alias("a"), F.lit(1.5).alias("c"))
    with pytest.raises(ValueError, match="schema drift"):
        tbl.append(drifted)
    tbl.append(drifted, evolve_schema=True)
    out = tbl.read()
    assert set(out.columns) == {"a", "b", "c"}
    rows = {r["a"]: (r["b"], r["c"]) for r in out.collect()}
    assert rows[0] == ("x", None) and rows[5] == (None, 1.5)


def test_compact_preserves_segment_stats(spark, tmp_path):
    """Compaction must carry the stats columns of the segments it
    replaces, so read_range pruning keeps working on the compacted
    table (and prunes the whole table when the range is disjoint)."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "cstat"))
    mk = lambda lo, hi: spark.range(lo, hi).select(F.col("id").alias("k"))
    tbl.overwrite(mk(0, 100), stats_cols=["k"])
    tbl.append(mk(100, 200), stats_cols=["k"])
    tbl.compact()
    assert len(tbl.segments()) == 1
    st = tbl._segment_stats(tbl.segments()[0])
    assert st and st["k"]["min"] == 0 and st["k"]["max"] == 199
    assert tbl.segments_for_range("k", 500, 600) == []
    assert sorted(r["k"] for r in tbl.read_range("k", 50, 150).collect()) == list(
        range(50, 151)
    )


def test_compact_preserves_evolved_schema(spark, tmp_path):
    """ADVICE r4 (high): compact() must mergeSchema-read the segments it
    rewrites — without it the compacted segment silently adopts ONE
    file's schema, and once old segments are GC'd the dropped columns'
    data is gone.  auto_compact_at can trigger this implicitly right
    after an evolving append, so that path is exercised too."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "cevo"))
    tbl.overwrite(spark.range(3).select(F.col("id").alias("a"), F.lit("x").alias("b")))
    drifted = spark.range(3, 6).select(F.col("id").alias("a"), F.lit(1.5).alias("c"))
    tbl.append(drifted, evolve_schema=True, auto_compact_at=2)
    assert len(tbl.segments()) == 1  # auto-compaction fired
    out = tbl.read()
    assert set(out.columns) == {"a", "b", "c"}
    rows = {r["a"]: (r["b"], r["c"]) for r in out.collect()}
    assert rows[0] == ("x", None) and rows[5] == (None, 1.5)
    # GC the pre-compaction generations: the compacted segment is now
    # the ONLY copy — all three columns must still be there.
    for start in (6, 9, 12):
        tbl.append(
            spark.range(start, start + 3).select(
                F.col("id").alias("a"), F.lit("y").alias("b"), F.lit(2.5).alias("c")
            )
        )
    assert set(tbl.read().columns) == {"a", "b", "c"}
    assert tbl.read().where(F.col("a") == 5).collect()[0]["c"] == 1.5


def test_evolved_schema_survives_all_read_paths(spark, tmp_path):
    """ADVICE r4 (medium): read_version / read_at / read_range /
    change_feed over a schema-evolved table must surface the union
    schema, same as read()."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "revo"))
    tbl.overwrite(
        spark.range(3).select(F.col("id").alias("a"), F.lit("x").alias("b")),
        stats_cols=["a"],
    )
    drifted = spark.range(3, 6).select(F.col("id").alias("a"), F.lit(1.5).alias("c"))
    tbl.append(drifted, evolve_schema=True, stats_cols=["a"])
    seqs = tbl.history()
    assert set(tbl.read_version(seqs[-1]).columns) == {"a", "b", "c"}
    assert set(tbl.read_at(0).columns) == {"a", "b", "c"}
    rng = tbl.read_range("a", 0, 5)
    assert set(rng.columns) == {"a", "b", "c"}
    assert rng.count() == 6
    feed = tbl.change_feed(seqs[0], seqs[-1], keys=["a"])
    ins = {r["a"]: r["c"] for r in feed.where(F.col("op") == "I").collect()}
    assert ins == {3: 1.5, 4: 1.5, 5: 1.5}


def test_delete_where_removes_rows_copy_on_write(spark, tmp_path):
    """Row-level DELETE: matching rows gone from the current read,
    count returned, NULL predicate rows kept (SQL three-valued logic),
    and the pre-delete generation still readable via time travel."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "del"))
    tbl.overwrite(
        spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "k long, v double"
        )
    )
    n = tbl.delete_where(F.col("v") > 25.0)
    assert n == 2
    assert sorted(r["k"] for r in tbl.read().collect()) == [1, 2]  # NULL kept
    assert tbl.read_at(1).count() == 4  # erased rows purge via retain+vacuum
    assert tbl.delete_where(F.col("v") > 1000.0) == 0


def test_cluster_by_makes_file_envelopes_disjoint(spark, tmp_path):
    """cluster_by: after the rewrite the segment's parquet files carry
    disjoint key ranges (footer-stat skipping works) and the segment
    sidecar records min/max for read_range pruning vs future appends."""
    import pyarrow.parquet as pq

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "clu"))
    # Shuffled keys: pre-cluster, every file spans ~the full key range.
    df = spark.range(20_000).select(
        (F.xxhash64("id") % 20_000).alias("salt"), F.col("id").alias("k")
    ).orderBy("salt").drop("salt").repartition(8)
    tbl.overwrite(df)
    tbl.cluster_by(["k"], num_files=6)
    seg = tbl.segments()[0]
    envelopes = []
    for root, _dirs, files in os.walk(seg):
        for f in files:
            if f.endswith(".parquet"):
                md = pq.read_metadata(os.path.join(root, f))
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(0)
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
                envelopes.append((min(mins), max(maxs)))
    assert len(envelopes) >= 2
    envelopes.sort()
    for (_, hi), (lo2, _) in zip(envelopes, envelopes[1:]):
        assert hi < lo2, f"overlapping file envelopes: {envelopes}"
    st = tbl._segment_stats(seg)
    assert st and st["k"]["min"] == 0 and st["k"]["max"] == 19_999
    assert tbl.read().count() == 20_000


def test_cluster_by_zorder_localizes_both_dimensions(spark, tmp_path):
    """cluster_by_zorder: after the Morton rewrite, each parquet file's
    (x, y) bounding box covers a small fraction of the key plane — the
    two-dimensional skipping property a 1-D sort can't give (its
    trailing column spans the full range in every file)."""
    import pyarrow.parquet as pq

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "zclu"))
    side = 128
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    # Shuffle so the pre-cluster layout has no accidental locality.
    tbl.overwrite(grid.orderBy(F.xxhash64("x", "y")).repartition(8))
    tbl.cluster_by_zorder("x", "y", bits=8, num_files=8)
    seg = tbl.segments()[0]
    boxes = []
    for root, _dirs, files in os.walk(seg):
        for f in files:
            if f.endswith(".parquet"):
                md = pq.read_metadata(os.path.join(root, f))
                xs, ys = [], []
                for rg in range(md.num_row_groups):
                    for ci in range(md.row_group(rg).num_columns):
                        col = md.row_group(rg).column(ci)
                        name = col.path_in_schema
                        (xs if name == "x" else ys).append(
                            (col.statistics.min, col.statistics.max)
                        )
                bx = (min(a for a, _ in xs), max(b for _, b in xs))
                by = (min(a for a, _ in ys), max(b for _, b in ys))
                boxes.append((bx, by))
    assert len(boxes) >= 4
    area = sum((bx[1] - bx[0] + 1) * (by[1] - by[0] + 1) for bx, by in boxes)
    # Mean file box must cover well under half the plane — z-locality
    # in BOTH dimensions (a 1-D x-sort leaves every file's y box full).
    assert area / len(boxes) < 0.5 * side * side, boxes
    assert tbl.read().count() == side * side
    st = tbl._segment_stats(seg)
    assert st["x"]["max"] == side - 1 and st["y"]["max"] == side - 1


def test_size_tiered_compaction_folds_only_small_segments(spark, tmp_path):
    """compact(max_segment_bytes=N): the LSM/OPTIMIZE shape — micro-batch
    segments below the threshold fold into one; the already-large
    segment is NOT rewritten (its dir survives by name); data is
    unchanged; a second call with nothing small enough is a no-op."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "tiered"))
    big = spark.range(50_000).select(F.col("id").alias("k"))
    tbl.overwrite(big.repartition(4))
    big_seg = set(map(os.path.basename, tbl.segments()))
    for lo in (0, 10, 20):  # three tiny appends
        tbl.append(spark.range(50_000 + lo, 50_010 + lo).select(F.col("id").alias("k")))
    assert len(tbl.segments()) == 4
    threshold = tbl._segment_bytes(tbl.segments()[0]) // 2  # < big, > tiny
    tbl.compact(max_segment_bytes=threshold)
    live = set(map(os.path.basename, tbl.segments()))
    assert big_seg <= live, "the large segment must not be rewritten"
    assert len(live) == 2  # big + one folded segment
    assert tbl.read().count() == 50_030
    # Nothing small left below the threshold → no-op, same manifest.
    gens = len(tbl.history())
    tbl.compact(max_segment_bytes=1)
    assert len(tbl.history()) == gens


def test_change_feed_pre_images(spark, tmp_path):
    """pre_images=True emits pre_<col> columns (Delta CDF's
    update_preimage, columnar): populated for U and D, NULL for I —
    what incremental view maintenance needs to subtract the old
    contribution of an updated row."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "cfpre"))
    tbl.overwrite(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    tbl.overwrite(spark.createDataFrame([(1, 15.0), (3, 30.0)], "k long, v double"))
    seqs = tbl.history()
    feed = {r["k"]: r for r in tbl.change_feed(seqs[0], seqs[1], keys=["k"], pre_images=True).collect()}
    assert feed[1]["op"] == "U" and feed[1]["v"] == 15.0 and feed[1]["pre_v"] == 10.0
    assert feed[2]["op"] == "D" and feed[2]["v"] == 20.0 and feed[2]["pre_v"] == 20.0
    assert feed[3]["op"] == "I" and feed[3]["v"] == 30.0 and feed[3]["pre_v"] is None
    # Default stays image-only: no pre_ columns unless asked.
    assert "pre_v" not in tbl.change_feed(seqs[0], seqs[1], keys=["k"]).columns


# full lane: ~12s many-generation retention loop; single-trim behavior
# stays default-covered by the time-travel and GC pins.
@pytest.mark.full
def test_retention_policy_trims_history(spark, tmp_path):
    """r4 verdict item #8: a long-lived pipeline bounds its time-travel
    window with retain(max_generations | max_age) — manifests AND the
    segments they retire are trimmed, the current read and a
    change_feed over retained generations are unaffected, and reading
    a trimmed generation raises (the documented contract)."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "ret"), keep_generations=100)
    mk = lambda n: spark.range(n).select(F.col("id").alias("k"), F.lit(n).alias("v"))
    for n in range(1, 31):  # 30 overwrites → 30 retained generations
        tbl.overwrite(mk(n))
    assert len(tbl.history()) == 30
    segs_before = len([d for d in os.listdir(tbl.path) if d.startswith("seg-")])
    assert segs_before == 30

    out = tbl.retain(max_generations=5)
    assert len(out["dropped_generations"]) == 25
    assert len(out["removed_segments"]) == 25  # each overwrite's segment retires
    assert len(tbl.history()) == 5
    assert len([d for d in os.listdir(tbl.path) if d.startswith("seg-")]) == 5

    # Current read unaffected; change_feed over RETAINED gens works.
    assert tbl.read().count() == 30
    seqs = tbl.history()
    feed = tbl.change_feed(seqs[0], seqs[-1], keys=["k"])
    assert feed.where(F.col("op") == "I").count() == 4  # 26 → 30 rows
    # Trimmed generations raise, never silently return wrong rows.
    with pytest.raises(FileNotFoundError, match="expired or never existed"):
        tbl.read_version(out["dropped_generations"][0])

    # Age-based variant through the vacuum wiring: everything older
    # than 0s (i.e. all superseded) goes; current survives.
    tbl.vacuum(min_age_seconds=0.0, retain_age_seconds=0.0)
    assert len(tbl.history()) == 1
    assert tbl.read().count() == 30

    # Append-only tables: retain trims manifests but keeps every
    # segment the live manifest still references (data, not history).
    t2 = ParquetTable(spark, str(tmp_path / "ret2"), keep_generations=100)
    for n in range(10):
        t2.append(mk(1))
    assert len(t2.history()) == 10
    out2 = t2.retain(max_generations=2)
    assert len(t2.history()) == 2
    assert out2["removed_segments"] == []
    assert t2.read().count() == 10


def test_bloom_sidecar_prunes_point_lookups(spark, tmp_path):
    """Bloom file skipping: a point lookup opens only segments whose
    bloom admits the key; a missing key prunes everything with blooms;
    bloomless segments always survive (safety); results stay exact."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "bloom"))
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    tbl.overwrite(mk(0, 1000), bloom_cols=["k"])
    tbl.append(mk(1000, 2000), bloom_cols=["k"])
    tbl.append(mk(2000, 3000))  # bloomless — must always be kept

    segs = tbl.segments_for_point("k", 1500)
    assert len(segs) == 2  # the [1000,2000) segment + the bloomless one
    got = tbl.read_point("k", 1500).collect()
    assert [(r["k"], r["v"]) for r in got] == [(1500, 3000)]

    # absent key: both bloomed segments prune (definite miss), only
    # the bloomless segment is opened, residual filter yields nothing
    assert len(tbl.segments_for_point("k", 999_999)) == 1
    assert tbl.read_point("k", 999_999).count() == 0


def test_delete_matching_join_shaped_erasure(spark, tmp_path):
    """Join-shaped DELETE (r5 verdict #2): a 100k-row erasure request
    frame — far too large to sensibly inline as an isin list — removes
    exactly its keys via the broadcast anti-join rewrite, NULL/dup
    request rows are harmless, and the key set never rides the driver."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "delm"))
    tbl.overwrite(spark.range(200_000).select(F.col("id").alias("k")))
    requests = (
        spark.range(100_000)
        .select((F.col("id") * 2).alias("k"))  # every even key
        .unionByName(spark.sql("SELECT CAST(NULL AS LONG) AS k"))  # dropped
        .unionByName(spark.range(10).select((F.col("id") * 2).alias("k")))  # dups
    )
    n = tbl.delete_matching(requests, on="k")
    assert n == 100_000
    survivors = tbl.read()
    assert survivors.count() == 100_000
    assert survivors.where(F.col("k") % 2 == 0).count() == 0
    # A second apply is a no-op (idempotent erasure replay).
    assert tbl.delete_matching(requests, on="k") == 0
    # Shuffle-mode anti-join (broadcast=False) gives the same answer.
    tbl2 = ParquetTable(spark, str(tmp_path / "delm2"))
    tbl2.overwrite(spark.range(1_000).select(F.col("id").alias("k")))
    assert tbl2.delete_matching(spark.range(500).select(F.col("id").alias("k")), on="k", broadcast=False) == 500
    assert tbl2.read().count() == 500


def test_delete_matching_null_table_keys_survive(spark, tmp_path):
    """SQL IN semantics: a table row with a NULL key never matches a
    request row, so it survives the erasure (three-valued logic, same
    contract as delete_where's NULL-predicate rows)."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "delnull"))
    tbl.overwrite(
        spark.createDataFrame([(1,), (None,), (3,)], "k long")
    )
    n = tbl.delete_matching(spark.createDataFrame([(1,), (2,)], "k long"), on="k")
    assert n == 1
    assert sorted(
        (r["k"] if r["k"] is not None else -1) for r in tbl.read().collect()
    ) == [-1, 3]


def test_delete_rewrites_carry_sidecar_stats(spark, tmp_path):
    """ADVICE r5: delete_where/delete_matching must carry min/max and
    Bloom sidecars through their copy-on-write rewrite, exactly as
    compact does — else a DELETE silently disables read_range and
    read_point pruning until the next stats-bearing append."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "delstats"))
    tbl.overwrite(
        spark.range(10_000).select(F.col("id").alias("k")),
        stats_cols=["k"],
        bloom_cols=["k"],
    )
    tbl.delete_where(F.col("k") >= 9_000)
    seg = tbl.segments()[0]
    st = tbl._segment_stats(seg)
    assert st and "k" in st, "delete_where dropped min/max sidecars"
    bl = tbl._segment_bloom(seg)
    assert bl and "k" in bl.get("bits", {}), "delete_where dropped Bloom sidecars"
    assert tbl.read_range("k", 0, 100).count() == 101
    tbl.delete_matching(spark.range(100).select(F.col("id").alias("k")), on="k")
    seg = tbl.segments()[0]
    st = tbl._segment_stats(seg)
    assert st and "k" in st, "delete_matching dropped min/max sidecars"
    bl = tbl._segment_bloom(seg)
    assert bl and "k" in bl.get("bits", {}), "delete_matching dropped Bloom sidecars"
    assert tbl.read_point("k", 50).count() == 0
    assert tbl.read_point("k", 500).count() == 1


def test_cluster_rewrites_merge_prior_tracked_cols(spark, tmp_path):
    """ADVICE r5: cluster_by / cluster_by_zorder merge the columns the
    replaced segments already tracked instead of narrowing the stats to
    the clustering keys."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "clumerge"))
    tbl.overwrite(
        spark.range(4_096).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("w"),
        ),
        stats_cols=["w"],
        bloom_cols=["w"],
    )
    tbl.cluster_by_zorder("x", "y", bits=6, num_files=4)
    st = tbl._segment_stats(tbl.segments()[0])
    assert st and set(st) >= {"w", "x", "y"}
    bl = tbl._segment_bloom(tbl.segments()[0])
    assert bl and "w" in bl.get("bits", {})
    tbl.cluster_by(["w"], num_files=4)
    st = tbl._segment_stats(tbl.segments()[0])
    assert st and set(st) >= {"w", "x", "y"}


def _file_boxes(seg: str, col_names: list[str]) -> list[dict]:
    """Per parquet file in the segment: {col: (min, max)} footer envelopes."""
    import pyarrow.parquet as pq

    boxes = []
    for root, _dirs, files in os.walk(seg):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, f))
            acc = {c: [] for c in col_names}
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema in acc:
                        acc[col.path_in_schema].append(
                            (col.statistics.min, col.statistics.max)
                        )
            boxes.append(
                {
                    c: (min(a for a, _ in v), max(b for _, b in v))
                    for c, v in acc.items()
                    if v
                }
            )
    return boxes


def test_cluster_by_zorder_three_dimensions(spark, tmp_path):
    """r5 verdict #8: the N-D generalization — a 3-D Morton layout gives
    every parquet file a bounding BOX covering a small fraction of the
    key cube (a 1-D sort leaves two dimensions' extents full in every
    file), and all three dims get sidecar stats."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "z3"))
    side = 32
    cube = spark.range(side**3).select(
        (F.col("id") % side).alias("x"),
        ((F.col("id") / side).cast("long") % side).alias("y"),
        (F.col("id") / (side * side)).cast("long").alias("z"),
    )
    tbl.overwrite(cube.orderBy(F.xxhash64("x", "y", "z")).repartition(8))
    tbl.cluster_by_zorder("x", "y", "z", bits=5, num_files=8)
    boxes = _file_boxes(tbl.segments()[0], ["x", "y", "z"])
    assert len(boxes) >= 4
    vol = sum(
        (b["x"][1] - b["x"][0] + 1)
        * (b["y"][1] - b["y"][0] + 1)
        * (b["z"][1] - b["z"][0] + 1)
        for b in boxes
    )
    # Mean file box ≪ half the cube → locality in ALL THREE dimensions.
    assert vol / len(boxes) < 0.5 * side**3, boxes
    st = tbl._segment_stats(tbl.segments()[0])
    assert all(st[c] == {"min": 0, "max": side - 1} for c in ("x", "y", "z"))
    assert tbl.read().count() == side**3


def test_cluster_by_zorder_string_dimension(spark, tmp_path):
    """r5 verdict #8: a STRING dimension is rank-encoded against sampled
    lexicographic boundaries, so the Morton layout localizes BOTH the
    string and the numeric dimension — each file's string envelope spans
    a narrow alphabetic band and a string range predicate can skip most
    files by footer stats."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "zstr"))
    df = spark.range(16_384).select(
        F.concat(
            F.substring(F.lit("abcdefghijklmnop"), (F.col("id") % 16 + 1).cast("int"), 1),
            F.format_string("%05d", (F.col("id") / 16).cast("int")),
        ).alias("name"),
        (F.col("id") % 64).alias("v"),
    )
    tbl.overwrite(df.orderBy(F.xxhash64("name", "v")).repartition(8))
    tbl.cluster_by_zorder("name", "v", bits=6, num_files=16)
    boxes = _file_boxes(tbl.segments()[0], ["name", "v"])
    assert len(boxes) >= 8

    def first_letter_span(b):
        lo, hi = b["name"]
        lo, hi = lo.decode() if isinstance(lo, bytes) else lo, (
            hi.decode() if isinstance(hi, bytes) else hi
        )
        return ord(hi[0]) - ord(lo[0]) + 1

    # Mean file covers a narrow alphabetic band (16 letters total) AND
    # a narrow v range — two-dimensional locality with a string key.
    # (A 1-D v-sort leaves every file's name envelope at the full 16
    # letters; a 1-D name-sort leaves v at the full 64.)
    mean_letters = sum(map(first_letter_span, boxes)) / len(boxes)
    mean_v = sum(b["v"][1] - b["v"][0] + 1 for b in boxes) / len(boxes)
    assert mean_letters <= 8, [b["name"] for b in boxes]
    assert mean_v <= 40, [b["v"] for b in boxes]
    # Lexicographic locality ⇒ the stats sidecar prunes string ranges.
    st = tbl._segment_stats(tbl.segments()[0])
    assert "name" in st and "v" in st
    assert tbl.read().count() == 16_384
    # NULL string keys are legal (code 0) and survive the rewrite.
    tbl2 = ParquetTable(spark, str(tmp_path / "zstrnull"))
    tbl2.overwrite(
        spark.createDataFrame(
            [("aa", 1), (None, 2), ("zz", 3)], "name string, v long"
        )
    )
    tbl2.cluster_by_zorder("name", "v", bits=4, num_files=2)
    assert tbl2.read().count() == 3
    with pytest.raises(ValueError):
        tbl2.cluster_by_zorder("name", "v", bits=12)  # string dim bits cap
    with pytest.raises(ValueError):
        tbl2.cluster_by_zorder("name")  # N ≥ 2


def test_file_audit_reads_footers_not_data(spark, tmp_path):
    """file_audit: per-segment file/row/byte stats from parquet footers
    (no Spark job), the small-file verdict flags exactly the segments
    every one of whose files is under the threshold, and a size-tiered
    compact driven by the audit clears the flags while preserving the
    footer row totals."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "t"))
    tbl.overwrite(spark.range(0, 10000).selectExpr("id", "id * 2 AS v"))
    tbl.append(spark.range(10000, 10010).selectExpr("id", "id * 2 AS v"))
    tbl.append(spark.range(10010, 10025).selectExpr("id", "id * 2 AS v"))

    audit = {r["segment_idx"]: r for r in tbl.file_audit().collect()}
    assert len(audit) == 3
    assert sum(r["n_rows"] for r in audit.values()) == 10025
    assert all(r["n_files"] >= 1 and r["total_bytes"] > 0 for r in audit.values())
    # Default 32 MiB threshold: everything here is tiny -> all flagged.
    assert all(r["compact_candidate"] for r in audit.values())
    # A 1-byte threshold: nothing can be under it -> nothing flagged.
    assert not any(
        r["compact_candidate"] for r in tbl.file_audit(small_file_bytes=1).collect()
    )

    # Audit-driven tiering: fold everything smaller than the largest.
    thr = max(r["total_bytes"] for r in audit.values())
    tbl.compact(max_segment_bytes=thr)
    after = tbl.file_audit().collect()
    assert len(after) == 2  # big segment + one folded tail
    assert sum(r["n_rows"] for r in after) == 10025
    assert tbl.read().count() == 10025


def test_delete_segment_pruning_untouched_segments_survive_by_name(spark, tmp_path):
    """r6 verdict #3: a selective DELETE must rewrite ONLY the segments
    that MAY match — untouched segments keep their exact file names in
    the new manifest (the compact(max_segment_bytes) discipline applied
    to DELETE), so a one-key erasure never rewrites the whole table."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "delprune"))
    for lo in (0, 100, 200):
        tbl.append(
            spark.range(lo, lo + 100).select(F.col("id").alias("k")),
            stats_cols=["k"],
            bloom_cols=["k"],
        )
    segs_before = tbl.segments()
    assert len(segs_before) == 3

    # Join-shaped erasure whose key envelope [150, 160] touches only
    # the middle segment.
    n = tbl.delete_matching(
        spark.range(150, 161).select(F.col("id").alias("k")), on="k"
    )
    assert n == 11
    segs_after = set(tbl.segments())
    untouched = {segs_before[0], segs_before[2]}
    assert untouched <= segs_after, "disjoint segments were rewritten"
    assert segs_before[1] not in segs_after, "matching segment must be replaced"
    assert len(segs_after) == 3
    assert tbl.read().count() == 289

    # Range-hinted predicate DELETE: only the [200, 299] segment moves.
    segs_before = tbl.segments()
    spared = [s for s in segs_before if tbl._segment_stats(s)["k"]["max"] < 200]
    n = tbl.delete_where(
        (F.col("k") >= 250) & (F.col("k") <= 259), prune_range=("k", 250, 259)
    )
    assert n == 10
    assert set(spared) <= set(tbl.segments())
    assert tbl.read().count() == 279

    # Point-hinted DELETE prunes via the Bloom sidecar.
    segs_before = tbl.segments()
    victims = set(tbl.segments_for_point("k", 42))
    n = tbl.delete_where(F.col("k") == 42, prune_point=("k", 42))
    assert n == 1
    assert set(segs_before) - victims <= set(tbl.segments())
    assert tbl.read().count() == 278

    # Envelope fully disjoint from every segment: zero rewrites, no new
    # generation, and the table is untouched.
    segs_before = tbl.segments()
    gen_before = tbl.history()[-1]
    assert (
        tbl.delete_matching(
            spark.range(5_000, 5_010).select(F.col("id").alias("k")), on="k"
        )
        == 0
    )
    assert tbl.segments() == segs_before
    assert tbl.history()[-1] == gen_before


def test_cluster_by_incremental_rewrites_only_new_segments(spark, tmp_path):
    """OPTIMIZE must be O(new data): after a base clustering, appended
    segments fold into ONE new sorted run while the already-clustered
    run survives in the manifest by name; a second call with nothing
    to do is a metadata-only no-op (no new generation)."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "cluincr"))
    tbl.overwrite(
        spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
    )
    tbl.cluster_by(["k"], num_files=4)
    (base_seg,) = tbl.segments()
    assert tbl._segment_layout(base_seg) == ["k"]

    for lo in (10_000, 20_000):
        tbl.append(
            spark.range(lo, lo + 1_000).select(
                F.col("id").alias("k"), (F.col("id") % 97).alias("v")
            ),
            stats_cols=["k"],
        )
    appended = [s for s in tbl.segments() if s != base_seg]
    assert len(appended) == 2

    replaced = tbl.cluster_by_incremental(["k"], num_files=2)
    assert sorted(replaced) == sorted(os.path.basename(s) for s in appended)
    segs = tbl.segments()
    assert base_seg in segs, "clustered base segment was rewritten"
    assert len(segs) == 2
    new_run = next(s for s in segs if s != base_seg)
    assert tbl._segment_layout(new_run) == ["k"]
    assert tbl.read().count() == 12_000

    # Nothing left to fold: metadata-only no-op, no new generation.
    gen = tbl.history()[-1]
    assert tbl.cluster_by_incremental(["k"]) == []
    assert tbl.history()[-1] == gen

    # Pruning works across the two sorted runs: a range wholly inside
    # the appends must skip the base run.
    pruned = tbl.segments_for_range("k", 10_500, 10_600)
    assert base_seg not in pruned
    assert tbl.read_range("k", 10_500, 10_600).count() == 101

    # A different cluster key invalidates BOTH runs (layout mismatch).
    replaced = tbl.cluster_by_incremental(["v"])
    assert len(replaced) == 2
    assert tbl.read().count() == 12_000


def test_upsert_matching_prunes_untouched_segments_by_name(spark, tmp_path):
    """r7 verdict #1: the keyed MERGE must rewrite ONLY the segments the
    batch's keys can touch — the delete_matching discipline applied to
    the WRITE side.  The probe is per-segment (a batch of {150s, 500s}
    must not drag in the [200, 300) segment a single global envelope
    would cover), untouched segments keep their exact names, and the
    result is byte-equal to overwrite(upsert(...))."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable, upsert

    tbl = ParquetTable(spark, str(tmp_path / "um"))
    for lo in (0, 100, 200):
        tbl.append(
            spark.range(lo, lo + 100).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            stats_cols=["k"],
        )
    segs_before = tbl.segments()
    assert len(segs_before) == 3
    expected = upsert(
        tbl.read(),
        spark.createDataFrame(
            [(150 + i, -1) for i in range(5)] + [(500 + i, -2) for i in range(5)],
            "k long, v long",
        ),
        ["k"],
    ).collect()

    batch = spark.createDataFrame(
        [(150 + i, -1) for i in range(5)] + [(500 + i, -2) for i in range(5)],
        "k long, v long",
    )
    res = tbl.upsert_matching(batch, on="k")
    # Straddling envelope [150, 504]: only the middle segment intersects
    # the batch's ACTUAL keys — the [0,100) and [200,300) segments must
    # survive by name even though 200..299 sits inside the envelope.
    names_before = [s.split("/")[-1] for s in segs_before]
    assert res["rewritten"] == [names_before[1]]
    assert set(res["survivors"]) == {names_before[0], names_before[2]}
    segs_after = {s.split("/")[-1] for s in tbl.segments()}
    assert {names_before[0], names_before[2]} <= segs_after
    assert names_before[1] not in segs_after
    assert sorted(map(tuple, tbl.read().collect())) == sorted(map(tuple, expected))
    assert tbl.read().count() == 305  # 300 - 5 updated + 5 updated + 5 new

    # The batch segment carries min/max stats on k, so the NEXT merge
    # prunes against it: keys in [700, 704] touch nothing -> pure append,
    # every live segment survives by name.
    segs_before2 = {s.split("/")[-1] for s in tbl.segments()}
    res2 = tbl.upsert_matching(
        spark.createDataFrame([(700 + i, -3) for i in range(5)], "k long, v long"),
        on="k",
    )
    assert res2["rewritten"] == []
    assert set(res2["survivors"]) == segs_before2
    assert segs_before2 <= {s.split("/")[-1] for s in tbl.segments()}
    assert tbl.read().count() == 310

    # Empty batch: metadata no-op — no new generation, no rewrites.
    gen_before = tbl.history()[-1]
    res3 = tbl.upsert_matching(tbl.read().limit(0), on="k")
    assert res3["rewritten"] == [] and res3["appended"] is None
    assert tbl.history()[-1] == gen_before

    # Without order_col, distinct same-key rows BOTH land (upsert()'s
    # reference SELECT DISTINCT semantics)...
    tbl.upsert_matching(
        spark.createDataFrame([(700, 111), (700, 222)], "k long, v long"),
        on="k",
    )
    assert tbl.read().where("k = 700").count() == 2
    # ...while order_col picks the latest batch row per key.
    tbl2 = ParquetTable(spark, str(tmp_path / "um2"))
    tbl2.upsert_matching(
        spark.createDataFrame(
            [(1, 111, 1), (1, 222, 2)], "k long, v long, seq long"
        ),
        on="k",
        order_col="seq",
    )
    assert [tuple(r) for r in tbl2.read().collect()] == [(1, 222, 2)]


def test_concurrent_mixed_writers_never_lose_rows(spark, tmp_path):
    """Commit-protocol stress: appends, pruned merges, and a pruned
    DELETE racing from threads must serialize through the flock without
    losing a commit — final row accounting must balance exactly, and
    every generation's manifest must reference only existing segments.
    (delete/merge may legitimately ABORT with a raise on a commit race;
    aborts are retried here, mirroring the documented caller contract.)"""
    import threading

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "race"))
    tbl.overwrite(
        spark.range(0, 1000).select(F.col("id").alias("k"), F.lit(0).alias("v")),
        stats_cols=["k"],
    )
    errors = []

    def retry(fn, attempts=6):
        for i in range(attempts):
            try:
                return fn()
            except RuntimeError:
                if i == attempts - 1:
                    raise
        return None

    def appender(lo):
        try:
            tbl.append(
                spark.range(lo, lo + 100).select(
                    F.col("id").alias("k"), F.lit(1).alias("v")
                ),
                stats_cols=["k"],
            )
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errors.append(e)

    def merger(lo):
        try:
            retry(
                lambda: tbl.upsert_matching(
                    spark.range(lo, lo + 50).select(
                        F.col("id").alias("k"), F.lit(2).alias("v")
                    ),
                    on="k",
                )
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def deleter():
        try:
            retry(
                lambda: tbl.delete_matching(
                    spark.range(900, 950).select(F.col("id").alias("k")), on="k"
                )
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = (
        [threading.Thread(target=appender, args=(lo,)) for lo in (2000, 3000)]
        + [threading.Thread(target=merger, args=(lo,)) for lo in (100, 5000)]
        + [threading.Thread(target=deleter)]
    )
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    # Accounting: 1000 base - 50 deleted + 200 appended + 50 new merge
    # keys (5000-5049; the 100-149 merge replaced existing keys).
    assert tbl.read().count() == 1000 - 50 + 200 + 50
    got = {r["k"]: r["v"] for r in tbl.read().collect()}
    assert all(got[k] == 2 for k in range(100, 150))
    assert all(got[k] == 2 for k in range(5000, 5050))
    assert all(k not in got for k in range(900, 950))
    assert all(got[k] == 1 for k in range(2000, 2100))
    # Every retained manifest must reference only on-disk segments.
    import os

    for seq in tbl.history():
        for seg in tbl._manifest_segments(f"manifest-{seq:016d}.txt"):
            assert os.path.isdir(os.path.join(tbl.path, seg)), (seq, seg)


def test_upsert_matching_schema_evolution(spark, tmp_path):
    """evolve_schema=True: batch columns new to the table land in the
    batch segment and read as NULL on old segments (mergeSchema);
    table columns missing from the batch read as NULL on its rows;
    without the flag a drifted batch raises via the strict column
    select — the append/upsert governance contract on the MERGE verb."""
    import pytest

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    tbl = ParquetTable(spark, str(tmp_path / "evo"))
    tbl.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        stats_cols=["k"],
    )
    drifted = spark.createDataFrame([(2, 9.5), (3, 7.0)], "k long, score double")
    with pytest.raises(Exception):
        tbl.upsert_matching(drifted, on="k")

    tbl.upsert_matching(drifted, on="k", evolve_schema=True)
    got = {r["k"]: (r["v"], r["score"]) for r in tbl.read().collect()}
    assert got == {1: ("a", None), 2: (None, 9.5), 3: (None, 7.0)}


def test_zorder_layout_skips_more_files_than_1d_for_box_probe(spark, tmp_path):
    """The Z-order payoff, measured at the parquet-footer level: for a
    customer-band x all-time box probe, strictly fewer files intersect
    the band under the Morton layout than under the 1-D date layout
    (where every file spans the full customer range).  This is the
    physics zorder_box_scan's oracle equality can't see — equality
    proves correctness, this proves the SKIPPING."""
    import glob as g

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F2

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable
    from shopify_youtube_etl_spark.plans.common import t as _t
    from shopify_youtube_etl_spark.plans.etl import _interleave16

    sf = "/root/testdata/sf0.001"
    src = _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F2.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F2.datediff(
            F2.col("o_orderdate").cast("date"), F2.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day_num"),
    )
    b = src.agg(
        F2.min("o_custkey"), F2.max("o_custkey"), F2.min("day_num"), F2.max("day_num")
    ).first()
    c_lo, c_hi, d_lo, d_hi = b
    cn = F2.floor(
        (F2.col("o_custkey") - F2.lit(c_lo)) * 65535 / max(c_hi - c_lo, 1)
    ).cast("long")
    dn = F2.floor(
        (F2.col("day_num") - F2.lit(d_lo)) * 65535 / max(d_hi - d_lo, 1)
    ).cast("long")

    zt = ParquetTable(spark, str(tmp_path / "z"))
    zt.overwrite(src.withColumn("z", _interleave16(cn, dn)))
    zt.cluster_by(["z"], num_files=16)
    dt = ParquetTable(spark, str(tmp_path / "d1"))
    dt.overwrite(src)
    dt.cluster_by(["d"], num_files=16)

    def intersecting_files(tbl, lo, hi):
        n_total, n_hit = 0, 0
        for seg in tbl.segments():
            for f in g.glob(seg + "/*.parquet"):
                md = pq.ParquetFile(f).metadata
                fmin, fmax = None, None
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        c = md.row_group(rg).column(ci)
                        if c.path_in_schema == "o_custkey" and c.statistics:
                            s = c.statistics
                            fmin = s.min if fmin is None else min(fmin, s.min)
                            fmax = s.max if fmax is None else max(fmax, s.max)
                if fmin is None:
                    n_total += 1
                    n_hit += 1  # no stats: must scan
                    continue
                n_total += 1
                if not (fmax < lo or fmin > hi):
                    n_hit += 1
        return n_total, n_hit

    z_total, z_hit = intersecting_files(zt, 40, 80)
    d_total, d_hit = intersecting_files(dt, 40, 80)
    assert z_total >= 8 and d_total >= 8, "layouts did not fan out into files"
    assert z_hit < d_hit, (
        f"z-order should skip files the 1-D layout cannot: z {z_hit}/{z_total} "
        f"vs date {d_hit}/{d_total}"
    )
    # Row preservation under both layouts.
    assert zt.read().count() == dt.read().count() == src.count()


def test_upsert_matching_auto_compact(spark, tmp_path):
    """The merge's LSM maintenance hook: with auto_compact_at set, the
    merge whose post-commit segment count reaches the threshold folds
    the table into one segment — values identical, stats sidecars
    carried — while merges below the threshold leave history segments
    untouched by name (the append discipline, applied to the IVM
    write path that lands one batch segment per merge)."""
    from shopify_youtube_etl_spark.operators.upsert import ParquetTable, upsert

    tbl = ParquetTable(spark, str(tmp_path / "umac"))
    for lo in (0, 100):
        tbl.append(
            spark.range(lo, lo + 50).select(
                F.col("id").alias("k"), (F.col("id") * 10).alias("v")
            ),
            stats_cols=["k"],
        )
    # Below threshold: disjoint batch appends its segment, no compaction.
    batch1 = spark.range(200, 220).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    )
    res = tbl.upsert_matching(batch1, ["k"], auto_compact_at=5)
    assert len(tbl.segments()) == 3 and res["rewritten"] == []
    assert res["compacted"] is False
    # At threshold: the next merge compacts to one segment, value-equal
    # to the logical upsert over the pre-merge state.  The returned
    # names describe the PRE-compaction snapshot; the `compacted` flag
    # tells callers not to assert those names against the table state
    # (ADVICE r9).
    want = sorted(
        map(tuple, upsert(tbl.read(), batch1, ["k"]).collect())
    )
    res = tbl.upsert_matching(batch1, ["k"], auto_compact_at=3)
    assert res["compacted"] is True
    assert len(tbl.segments()) == 1
    assert sorted(map(tuple, tbl.read().collect())) == want
    # Compaction carried the key stats: a fresh disjoint merge still
    # prunes (the compacted segment survives by name).
    compacted = {os.path.basename(s) for s in tbl.segments()}
    tbl.upsert_matching(
        spark.range(300, 310).select(F.col("id").alias("k"), F.lit(-2).cast("long").alias("v")),
        ["k"],
    )
    assert compacted <= {os.path.basename(s) for s in tbl.segments()}

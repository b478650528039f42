"""Partition-per-page NDJSON ingestion as a Spark 4 Python DataSource.

SURVEY §2.1 S1 names the scale path for the reference's cursor-paginated
fetch (shopify_etl.py:271-331): "custom Python Data Source API (Spark 4)
with partition-per-page".  This implements it: a landed page store
(one NDJSON file per fetched page, ``page-*.ndjson``) is exposed as a
DataSource whose ``partitions()`` returns one InputPartition per page
file, so N pages parse on N executor cores — the distributed half of
the ingestion that ``sources/paginated.py`` models driver-side.

Parse semantics mirror the reference's load job (S8,
shopify_etl.py:130-135): unknown JSON keys are dropped, missing keys
become NULL (``ignore_unknown_values=True``).

Scale notes: the read side scales with page count (100 TB of landed
pages = millions of partitions — Spark schedules them like any file
scan).  Schema is caller-declared; no inference pass over the data.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)


class PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _parse_page(path: str, field_names: list[str]) -> Iterator[tuple]:
    """NDJSON page → rows projected to the declared fields (S8
    semantics: missing -> None, unknown keys dropped)."""
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            yield tuple(row.get(name) for name in field_names)


#: JSON-native field types whose Python values compare consistently with
#: the literal Spark hands us in a Filter — the only types the reader
#: claims natively.  Timestamps are excluded on purpose: Spark passes
#: datetime literals while NDJSON stores strings, and a silent
#: str-vs-datetime comparison would drop rows (those filters stay
#: Spark-side).
_NATIVE_FILTER_TYPES = (
    StringType,
    IntegerType,
    LongType,
    DoubleType,
    FloatType,
    BooleanType,
)

_RANGE_FILTERS = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)


def _row_pred(f: Filter):
    """Python-side evaluator for one pushed filter (SQL semantics: any
    comparison against NULL is false).  A TypeError (malformed landed
    value for the declared schema) keeps the row — such a row fails
    Arrow conversion downstream anyway, and the reader must never make
    data silently disappear on its own judgement."""
    name = f.attribute[0]
    if isinstance(f, IsNotNull):
        return lambda row: row.get(name) is not None

    def check(row, f=f, name=name):
        v = row.get(name)
        if v is None:
            return False
        try:
            if isinstance(f, EqualTo):
                return v == f.value
            if isinstance(f, GreaterThan):
                return v > f.value
            if isinstance(f, GreaterThanOrEqual):
                return v >= f.value
            if isinstance(f, LessThan):
                return v < f.value
            if isinstance(f, LessThanOrEqual):
                return v <= f.value
            if isinstance(f, In):
                return v in f.value
        except TypeError:
            return True
        return True

    return check


def _stats_path(page_path: str) -> str:
    return page_path + ".stats.json"


def _page_provably_empty(stats: dict, filters: list[Filter]) -> bool:
    """True iff the page's [min, max] envelope refutes ANY pushed
    filter — the same skip logic as the ParquetTable min/max sidecars,
    at page granularity.  Unknown columns or type mismatches never
    skip (pruning must be conservative)."""
    mins, maxs = stats.get("min", {}), stats.get("max", {})
    for f in filters:
        if isinstance(f, IsNotNull):
            continue
        name = f.attribute[0]
        lo, hi = mins.get(name), maxs.get(name)
        if lo is None or hi is None:
            continue
        try:
            if isinstance(f, EqualTo) and not (lo <= f.value <= hi):
                return True
            if isinstance(f, GreaterThan) and hi <= f.value:
                return True
            if isinstance(f, GreaterThanOrEqual) and hi < f.value:
                return True
            if isinstance(f, LessThan) and lo >= f.value:
                return True
            if isinstance(f, LessThanOrEqual) and lo > f.value:
                return True
            if isinstance(f, In) and not any(lo <= v <= hi for v in f.value):
                return True
        except TypeError:
            continue
    return False


class PageStoreReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.dir = options["path"]
        self.schema = schema
        self.pushed: list[Filter] = []

    def partitions(self) -> Sequence[PagePartition]:
        # One partition per landed page file — sorted for determinism.
        # A store with no landed pages (empty source, or a distributed
        # land where no executor partition had rows) may not even have
        # the directory yet.  Pages whose stats sidecar refutes a pushed
        # filter are skipped at planning time.
        if not os.path.isdir(self.dir):
            return []
        files = sorted(
            f for f in os.listdir(self.dir) if f.startswith("page-") and f.endswith(".ndjson")
        )
        parts = []
        for f in files:
            path = os.path.join(self.dir, f)
            if self.pushed:
                try:
                    with open(_stats_path(path), encoding="utf-8") as fh:
                        if _page_provably_empty(json.load(fh), self.pushed):
                            continue
                except (FileNotFoundError, json.JSONDecodeError):
                    pass  # no/torn sidecar -> cannot prune, read the page
            parts.append(PagePartition(path))
        return parts

    def read(self, partition: PagePartition | None) -> Iterator[tuple]:
        if partition is None:
            # Spark substitutes a single None partition when partitions()
            # returns [] — an empty store yields an empty scan, not a crash.
            return
        names = [f.name for f in self.schema.fields]
        if not self.pushed:
            yield from _parse_page(partition.path, names)
            return
        preds = [_row_pred(f) for f in self.pushed]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if all(p(row) for p in preds):
                    yield tuple(row.get(name) for name in names)


class PageStorePushdownReader(PageStoreReader):
    """Filter-pushdown variant (Spark 4.1 DataSourceReader.pushFilters),
    selected by ``.option("pushdown", "true")`` — see the gate note in
    ``PageStoreDataSource.reader``."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Claim the conjuncts this source can evaluate natively (flat
        attribute, JSON-comparable type): claimed filters both PRUNE
        whole pages via the landing-time min/max sidecars (planning
        time, zero data read — the page-store twin of parquet
        row-group stats) and filter rows inside ``read`` so non-
        matching rows never cross into the JVM.  Everything else —
        timestamps, nested paths, unknown shapes — is returned for
        Spark to evaluate post-scan.  This is the S2 contract
        (incremental predicate pushed to the source) on the
        partition-per-page scale path."""
        kept = []
        names = {
            f.name for f in self.schema.fields
            if isinstance(f.dataType, _NATIVE_FILTER_TYPES)
        }
        for f in filters:
            if (
                isinstance(f, _RANGE_FILTERS + (In, IsNotNull))
                and len(f.attribute) == 1
                and f.attribute[0] in names
            ):
                self.pushed.append(f)
            else:
                kept.append(f)
        return kept


class PageStoreStreamReader(DataSourceStreamReader):
    """Incremental page ingestion with offset tracking — the S1 fetch
    cursor fused with S9's streaming insert: pages landing in the store
    become micro-batches, one InputPartition per new page.

    The offset is the lexicographically-greatest page NAME consumed so
    far (``{"last": "page-00042.ndjson"}``), so the store's contract is
    append-only with monotonically-sorting names — exactly what
    ``write_page_store(start_page=...)`` produces.  A name watermark
    (not a file count) keeps offsets valid even if old pages are
    retention-deleted behind the watermark.  Replay safety: for fixed
    (start, end] the partition list is a pure function of the landed
    names, so a failed micro-batch re-reads identical data — the
    exactly-once half the checkpoint needs from the source."""

    def __init__(self, options: dict, schema: StructType):
        self.dir = options["path"]
        self.schema = schema

    def _pages(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            f
            for f in os.listdir(self.dir)
            if f.startswith("page-") and f.endswith(".ndjson")
        )

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        pages = self._pages()
        return {"last": pages[-1] if pages else ""}

    def partitions(self, start: dict, end: dict) -> Sequence[PagePartition]:
        lo, hi = start.get("last", ""), end.get("last", "")
        return [
            PagePartition(os.path.join(self.dir, f))
            for f in self._pages()
            if lo < f <= hi
        ]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        yield from _parse_page(partition.path, [f.name for f in self.schema.fields])

    def commit(self, end: dict) -> None:
        # Offsets live in the stream checkpoint; the store itself keeps
        # pages (retention/deletion is the landing side's concern).
        pass


class PageStoreDataSource(DataSource):
    """``spark.read.format("pagestore").schema(s).option("path", d)``;
    streaming: ``spark.readStream.format("pagestore")...`` (new pages =
    micro-batches, offset-checkpointed)."""

    @classmethod
    def name(cls) -> str:
        return "pagestore"

    def reader(self, schema: StructType) -> PageStoreReader:
        # The pushdown reader is OPTION-GATED: Spark asserts (hard
        # error) when a reader merely IMPLEMENTS pushFilters while
        # spark.sql.python.filterPushdown.enabled is false, and that
        # conf defaults false — an always-pushdown reader would break
        # every plain read in a session that never asked for pruning.
        # Callers opting in set BOTH .option("pushdown", "true") and
        # the session conf (see pagestore_pruned_ingest).
        if str(self.options.get("pushdown", "")).lower() == "true":
            return PageStorePushdownReader(self.options, schema)
        return PageStoreReader(self.options, schema)

    def streamReader(self, schema: StructType) -> PageStoreStreamReader:
        return PageStoreStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "PageStoreWriter":
        return PageStoreWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> "PageStoreStreamWriter":
        return PageStoreStreamWriter(self.options)


def _write_page_stats(page_path: str, page: list[dict], stats_cols) -> None:
    """Per-page min/max sidecar (``<page>.stats.json``) over the given
    columns, non-null values only — what ``PageStoreReader.partitions``
    prunes against.  Written tmp-then-rename so a concurrent reader
    never sees a torn sidecar (a missing one merely disables pruning
    for that page)."""
    mins: dict = {}
    maxs: dict = {}
    for row in page:
        for c in stats_cols:
            v = row.get(c)
            if v is None or (isinstance(v, float) and v != v):  # null / NaN
                continue
            if hasattr(v, "item"):  # numpy scalar (pandas landing path)
                v = v.item()
            if c not in mins or v < mins[c]:
                mins[c] = v
            if c not in maxs or v > maxs[c]:
                maxs[c] = v
    tmp = page_path + ".stats.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"min": mins, "max": maxs}, fh, default=str)
    os.replace(tmp, _stats_path(page_path))


def write_page_store(
    rows: list[dict],
    out_dir: str,
    page_size: int = 250,
    start_page: int = 0,
    stats_cols: list[str] | None = None,
) -> int:
    """Land rows as page files (the reference's 250-row pages, S1
    :274; driver-side by nature — the fetch IS driver-side).  Returns
    the page count of THIS wave.  ``start_page`` numbers a later
    landing wave after an earlier one (append-only, monotonic names —
    the PageStoreStreamReader offset contract).

    100 TB landing story: this driver-side writer is faithful to the
    reference's live-API fetch loop, but it is a DRIVER BOTTLENECK at
    scale — the corpus round-trips through one process.  At 100 TB
    pages are either (a) already landed in object storage by upstream
    fetchers, in which case executors read them directly through
    ``PageStoreDataSource`` with no driver involvement, or (b) landed
    by ``land_pages_distributed`` below — each executor writes its own
    partition's pages, O(1) driver traffic."""
    os.makedirs(out_dir, exist_ok=True)
    n_pages = 0
    for i in range(0, len(rows), page_size):
        page = rows[i : i + page_size]
        path = os.path.join(out_dir, f"page-{start_page + n_pages:05d}.ndjson")
        with open(path, "w", encoding="utf-8") as fh:
            for row in page:
                fh.write(json.dumps(row, default=str) + "\n")
        if stats_cols:
            _write_page_stats(path, page, stats_cols)
        n_pages += 1
    return n_pages


def land_pages_distributed(
    df, out_dir: str, page_size: int = 250, stats_cols: list[str] | None = None
):
    """Executor-side page landing: each partition writes its own
    ``page-<partition>-<k>.ndjson`` files from Arrow batches — the
    driver never sees a row (VERDICT r1 item #6's scale path).

    Returns a LAZY manifest DataFrame (page_path, n_rows); the caller
    must materialize it (count/collect) to force the write.  ``out_dir``
    must be visible to all executors — a shared/object store path in a
    real cluster, any local dir on local[*].

    Task-retry safety (ADVICE r2): pages are written to an
    attempt-unique temp name and os.rename'd into the final
    ``page-<partition>-<k>.ndjson`` — rename is atomic on one mount, so
    a speculative duplicate or a zombie first attempt racing its retry
    can only replace a COMPLETE page with an identical complete page; a
    reader never observes torn/interleaved NDJSON.  (On an object store
    without atomic rename, use the committer-style write-then-manifest
    protocol instead — only paths the winning attempt reported in the
    returned manifest are read.)"""
    import uuid as _uuid

    import pandas as pd

    from pyspark import TaskContext

    os.makedirs(out_dir, exist_ok=True)
    # Job-unique name component, fixed driver-side and closed over by
    # every task: a second landing into the same store appends new
    # pages instead of os.rename-ing over the first job's (the same
    # double-append hazard ADVICE r4 flagged on PageStoreWriter).
    job_id = _uuid.uuid4().hex[:12]

    def write_pages(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        k = 0
        for pdf in batches:
            for i in range(0, len(pdf), page_size):
                chunk = pdf.iloc[i : i + page_size]
                path = os.path.join(out_dir, f"page-{job_id}-{pid:05d}-{k:05d}.ndjson")
                tmp = f"{path}.attempt-{attempt}.tmp"
                chunk.to_json(tmp, orient="records", lines=True, date_format="iso")
                os.rename(tmp, path)
                if stats_cols:
                    # Same envelope the driver-side landing writes; the
                    # executor computes it from its own chunk (tmp-then-
                    # rename inside, so retries are as safe as the page).
                    _write_page_stats(
                        path, chunk.to_dict(orient="records"), stats_cols
                    )
                k += 1
                yield pd.DataFrame({"page_path": [path], "n_rows": [len(chunk)]})

    return df.mapInPandas(write_pages, "page_path string, n_rows long")


@dataclass
class PageCommitMessage(WriterCommitMessage):
    """Per-task commit message: the temp files this attempt staged."""

    staged: list[tuple[str, str]]  # (tmp_path, final_name)
    n_rows: int


class PageStoreWriter(DataSourceWriter):
    """Transactional page sink (S6/S9 as a custom DataSource WRITE
    path): tasks stage pages under attempt-unique ``.tmp-*`` names the
    reader's ``page-*.ndjson`` pattern can never match, and only the
    driver-side ``commit()`` — which runs IFF every task succeeded —
    renames staged files to visible page names.  ``abort()`` deletes
    the stage, so a failed job leaves the store byte-identical to its
    pre-write state: readers see all of a write or none of it (the
    GCS-staging-then-load discipline of shopify_etl.py:558-561,
    rebuilt on the Spark 4 writer contract).

    Speculative/zombie attempts are safe for the same reason: losers'
    temp files are never renamed (their messages don't reach commit)
    and cost only stray ``.tmp-*`` litter, swept by the next commit."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid as _uuid

        self.dir = options["path"]
        self.page_size = int(options.get("page_size", "250"))
        if overwrite:
            raise ValueError("pagestore is append-only (reference S1 contract)")
        self.fail_partition = int(options.get("fail_partition", "-1"))
        # Job-unique component for final page names (ADVICE r4): the
        # writer instance is built ONCE on the driver per write job and
        # pickled to tasks, so this id is shared by all of the job's
        # tasks but distinct across jobs — a second append to the same
        # store can never os.rename over the first append's pages, and
        # the commit-time temp sweep can be scoped to THIS job's stage
        # instead of deleting a concurrent job's staged files.
        self.job_id = _uuid.uuid4().hex[:12]

    def write(self, rows) -> PageCommitMessage:
        import uuid as _uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        if pid == self.fail_partition:
            raise RuntimeError("injected failure for abort-path test")
        os.makedirs(self.dir, exist_ok=True)
        staged: list[tuple[str, str]] = []
        n_rows, k, buf = 0, 0, []

        def flush():
            nonlocal k
            if not buf:
                return
            final = f"page-w{self.job_id}-{pid:05d}-{k:05d}.ndjson"
            tmp = os.path.join(self.dir, f".tmp-{self.job_id}-{_uuid.uuid4().hex}")
            with open(tmp, "w", encoding="utf-8") as fh:
                for r in buf:
                    fh.write(json.dumps(r.asDict(), default=str) + "\n")
            staged.append((tmp, final))
            k += 1
            buf.clear()

        for row in rows:
            buf.append(row)
            n_rows += 1
            if len(buf) >= self.page_size:
                flush()
        flush()
        return PageCommitMessage(staged=staged, n_rows=n_rows)

    def commit(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, final in m.staged:
                os.rename(tmp, os.path.join(self.dir, final))
        # Sweep stray temp files from THIS job's lost speculative
        # attempts only — a concurrent job's stage must survive.
        for f in os.listdir(self.dir):
            if f.startswith(f".tmp-{self.job_id}-"):
                try:
                    os.remove(os.path.join(self.dir, f))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is None:
                continue
            for tmp, _final in m.staged:
                try:
                    os.remove(tmp)
                except OSError:
                    pass


class PageStoreStreamWriter(DataSourceStreamWriter):
    """Streaming page sink with per-epoch idempotent publish: tasks
    stage pages under attempt-unique ``.tmp-*`` names, and the driver's
    ``commit(messages, batchId)`` publishes them as
    ``page-s{batchId:05d}-{i:05d}.ndjson`` — names keyed by EPOCH, so a
    replayed micro-batch (restart between sink commit and checkpoint
    commit, or a full redelivery against a fresh checkpoint) simply
    re-publishes the same epoch, replacing its own files instead of
    duplicating them.  Commit clears the epoch's existing pages first,
    so even a replay that repartitions differently cannot leave stale
    extras.  This is the sink half of exactly-once: deterministic
    epoch-keyed names + all-or-nothing rename publish."""

    def __init__(self, options: dict):
        self.dir = options["path"]
        self.page_size = int(options.get("page_size", "250"))

    def write(self, rows) -> "PageCommitMessage":
        import uuid as _uuid

        os.makedirs(self.dir, exist_ok=True)
        staged: list[tuple[str, str]] = []
        n_rows, buf = 0, []

        def flush():
            if not buf:
                return
            tmp = os.path.join(self.dir, f".tmp-{_uuid.uuid4().hex}")
            with open(tmp, "w", encoding="utf-8") as fh:
                for r in buf:
                    fh.write(json.dumps(r.asDict(), default=str) + "\n")
            staged.append((tmp, ""))  # final name assigned at commit
            buf.clear()

        for row in rows:
            buf.append(row)
            n_rows += 1
            if len(buf) >= self.page_size:
                flush()
        flush()
        return PageCommitMessage(staged=staged, n_rows=n_rows)

    def commit(self, messages, batchId: int) -> None:
        # Epoch replay safety: clear this epoch's previously-published
        # pages (a replay may stage a different page split), then
        # publish the staged files under epoch-keyed names.
        prefix = f"page-s{batchId:05d}-"
        if os.path.isdir(self.dir):
            for f in os.listdir(self.dir):
                if f.startswith(prefix):
                    os.remove(os.path.join(self.dir, f))
        i = 0
        for m in messages:
            if m is None:
                continue
            for tmp, _ in m.staged:
                os.rename(tmp, os.path.join(self.dir, f"{prefix}{i:05d}.ndjson"))
                i += 1

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            for tmp, _ in m.staged:
                try:
                    os.remove(tmp)
                except OSError:
                    pass

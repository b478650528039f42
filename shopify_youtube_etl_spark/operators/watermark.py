"""Watermark / sync-control ledger (SURVEY §2.10, shopify_etl.py:171-235).

The reference keeps a ``pipeline_metadata.sync_control`` table: each run
appends a row (table_name, last_sync_timestamp, records_processed,
status, run_id, notes, created_at) and the next run reads the latest
*successful* watermark (ORDER BY last_sync_timestamp DESC LIMIT 1,
:174-180) minus a 1-hour safety overlap.

NOTE on the overlap: the reference's ``timedelta`` call is dead code —
``from datetime import datetime`` (:6) makes :193 raise AttributeError,
caught at :201, so the reference *always* falls back to
2024-01-01T00:00:00+00:00 (:205).  We implement the INTENDED semantics
(watermark − 1 h) per SURVEY §7 risk 5, and keep the fallback date as
the no-watermark default (:633).
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.upsert import ParquetTable
from shopify_youtube_etl_spark.schemas import SYNC_CONTROL

FALLBACK_START = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)  # :205, :633
OVERLAP = dt.timedelta(hours=1)  # intended :191-198


class SyncControl:
    """Parquet-backed sync_control table with the reference's API."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.table = ParquetTable(spark, path)
        if not self.table.exists():
            self.table.overwrite(spark.createDataFrame([], SYNC_CONTROL))

    def read(self) -> DataFrame:
        return self.table.read()

    def last_sync_timestamp(self, table_name: str = "orders") -> dt.datetime | None:
        """get_last_sync_timestamp (:171-205): latest successful run's
        watermark minus the 1 h overlap; None when no successful run."""
        rows = (
            self.read()
            .where((F.col("table_name") == table_name) & (F.col("status") == "success"))  # P4 :177
            .orderBy(F.col("last_sync_timestamp").desc())  # O1 :174-180
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        wm = rows[0]["last_sync_timestamp"]
        if wm.tzinfo is None:
            wm = wm.replace(tzinfo=dt.timezone.utc)
        return wm - OVERLAP

    def start_date(self, table_name: str = "orders", force_full_load: bool = False) -> dt.datetime:
        """Watermark resolution at pipeline start (:632-633)."""
        if force_full_load:
            return FALLBACK_START
        return self.last_sync_timestamp(table_name) or FALLBACK_START

    def record_run(
        self,
        table_name: str,
        last_sync_timestamp: dt.datetime,
        records_processed: int,
        status: str,
        notes: str = "",
        run_id: str | None = None,
    ) -> str:
        """update_sync_timestamp (:207-235): append one ledger row.
        created_at defaults to now (CURRENT_TIMESTAMP column default,
        :262-263, via coalesce-at-insert per SURVEY §1.3)."""
        rid = run_id or str(uuid.uuid4())
        row = self.spark.createDataFrame(
            [
                (
                    table_name,
                    last_sync_timestamp,
                    records_processed,
                    status,
                    rid,
                    notes,
                    dt.datetime.now(dt.timezone.utc),
                )
            ],
            SYNC_CONTROL,
        )
        # Control tables take one tiny append per pipeline run; without a
        # compaction trigger the manifest would reference one segment per
        # run forever (O(N) reads/commits after N runs).
        self.table.append(row, auto_compact_at=16)
        return rid

    def record_error(self, table_name: str, notes: str) -> str:
        """Error-status row with zero count (:700-707)."""
        return self.record_run(table_name, FALLBACK_START, 0, "error", notes=notes)

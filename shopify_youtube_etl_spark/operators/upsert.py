"""MERGE-upsert rewrite on plain parquet (SURVEY §2.3 J3, §4 item 1).

The reference's MERGE (shopify_etl.py:558-590):

    MERGE final T USING (SELECT DISTINCT * FROM staging) S
    ON <AND-ed key equality>            -- :563-564
    WHEN MATCHED THEN UPDATE all non-key columns
    WHEN NOT MATCHED THEN INSERT all columns

Plain parquet has no ACID MERGE, so the idiomatic zero-dependency
rewrite is::

    staged  = dedup(staging, keys)                  # SELECT DISTINCT :575
    merged  = final ANTI-JOIN staged ON keys        # keep unmatched finals
              UNION ALL staged                      # updated + inserted

which is exactly MERGE's row-level semantics when the staging batch has
one row per key.  At scale both sides shuffle once on the key columns;
the anti join and the union reuse that partitioning.  For incremental
pipelines the physical write is an atomic temp-dir swap
(``ParquetTable.overwrite``) because overwriting a path that is being
read is unsafe.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert(final: DataFrame, staging: DataFrame, keys: list[str], order_col: str | None = None) -> DataFrame:
    """Pure-DataFrame MERGE: rows of ``staging`` win on key collision.

    ``order_col``: when the staging batch itself may contain several
    rows per key, which one wins.  The reference applies SELECT
    DISTINCT * (full-row, :575) then relies on load-order; we make it
    deterministic: latest ``order_col`` (or arbitrary-but-exact
    ``dropDuplicates`` when full rows are identical).
    """
    if order_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        staged = staging.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    else:
        staged = staging.distinct()  # SELECT DISTINCT * :575
    kept = final.join(staged, on=keys, how="left_anti")
    return kept.unionByName(staged.select(*final.columns))


class ParquetTable:
    """A parquet-backed table with atomic overwrite — the engine's
    stand-in for the reference's BigQuery final/staging tables (S10/S11).

    Writes go to a fresh ``data-<uuid>`` subdir and a ``_CURRENT``
    pointer file flips atomically (os.replace), so readers of the old
    generation never observe a half-written directory (SURVEY §7 risk 1).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def current_dir(self) -> str | None:
        try:
            with open(self._pointer) as fh:
                gen = fh.read().strip()
        except FileNotFoundError:
            return None
        d = os.path.join(self.path, gen)
        return d if os.path.isdir(d) else None

    def exists(self) -> bool:
        return self.current_dir() is not None

    def read(self) -> DataFrame:
        d = self.current_dir()
        if d is None:
            raise FileNotFoundError(f"table at {self.path} has no committed generation")
        return self.spark.read.parquet(d)

    def overwrite(self, df: DataFrame) -> None:
        gen = f"data-{uuid.uuid4().hex}"
        out = os.path.join(self.path, gen)
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer + ".tmp"
        old = self.current_dir()
        with open(tmp, "w") as fh:
            fh.write(gen)
        os.replace(tmp, self._pointer)  # atomic pointer flip
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)

    def append(self, df: DataFrame) -> None:
        """WRITE_APPEND semantics (U1/S8): union with current generation."""
        if self.exists():
            self.overwrite(self.read().unionByName(df))
        else:
            self.overwrite(df)

    def truncate(self, schema_source: DataFrame | None = None) -> None:
        """TRUNCATE TABLE (S11, shopify_etl.py:587-590)."""
        src = schema_source if schema_source is not None else self.read()
        self.overwrite(src.limit(0))

    def backup(self, out_dir: str) -> None:
        """Export/backup sink (S12, monitoring-guide.md:113-117):
        ``bq extract --destination_format=NEWLINE_DELIMITED_JSON`` ≡
        write the current generation as NDJSON, one file per partition."""
        self.read().write.mode("overwrite").json(out_dir)

    def merge_from(self, staging: "ParquetTable", keys: list[str], order_col: str | None = None) -> None:
        """merge_staging_to_final (shopify_etl.py:558-590): upsert then
        truncate staging — one call per table per micro-batch."""
        stg = staging.read()
        if self.exists():
            merged = upsert(self.read(), stg, keys, order_col=order_col)
        else:
            merged = upsert(stg.limit(0), stg, keys, order_col=order_col)
        # overwrite() writes the new generation while the old one still
        # exists (the merged plan scans it), then flips the pointer and
        # only then deletes the old dir — safe ordering, no cache needed.
        self.overwrite(merged)
        staging.truncate()

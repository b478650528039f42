"""Data-quality verification as first-class operators (SURVEY §5.3).

Ports the reference's runtime checks:
- ``verify_unique_records`` (shopify_etl.py:592-618): COUNT(*) vs
  COUNT(DISTINCT key...) per table, single and composite keys;
- referential-integrity anti-join probes (shopify_etl.py:717-742).

Both return DataFrames so they compose as declared queries (the driver
oracle checks them) and as pipeline assertions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniqueness_report(tables: dict[str, tuple[DataFrame, list[str]]]) -> DataFrame:
    """One row per table: total vs unique-key counts + is_unique flag.

    ``tables`` maps table_name -> (df, key_columns).  Mirrors
    shopify_etl.py:592-618; composite keys use multi-arg countDistinct
    (the Spark-native form of COUNT(DISTINCT TO_JSON_STRING(STRUCT(…))),
    SURVEY A3).
    """
    reports = []
    for name, (df, keys) in tables.items():
        rep = df.agg(
            F.count("*").alias("total_records"),
            F.countDistinct(*keys).alias("unique_records"),
        ).select(
            F.lit(name).alias("table_name"),
            "total_records",
            "unique_records",
            (F.col("total_records") == F.col("unique_records")).alias("is_unique"),
        )
        reports.append(rep)
    return reduce(lambda a, b: a.unionByName(b), reports)


def fk_orphans(child: DataFrame, parent: DataFrame, child_key: str, parent_key: str) -> DataFrame:
    """Child rows with no parent — LEFT JOIN … IS NULL planned as a
    native left-anti join (shopify_etl.py:718-733, SURVEY J1)."""
    return child.join(parent, child[child_key] == parent[parent_key], "left_anti")


def fk_report(checks: dict[str, tuple[DataFrame, DataFrame, str, str]]) -> DataFrame:
    """One row per FK check: orphan count (0 = healthy).

    ``checks`` maps check_name -> (child, parent, child_key, parent_key).
    """
    reports = []
    for name, (child, parent, ck, pk) in checks.items():
        rep = fk_orphans(child, parent, ck, pk).agg(F.count("*").alias("orphan_count")).select(
            F.lit(name).alias("check_name"), "orphan_count"
        )
        reports.append(rep)
    return reduce(lambda a, b: a.unionByName(b), reports)

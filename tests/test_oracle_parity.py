"""Oracle-differential tests (SURVEY §5 item 1): every declared query
with an oracle runs on Spark AND DuckDB at sf0.001; results must match
row-for-row (order-insensitive) — the same gate the driver applies at
sf0.01.
"""

from __future__ import annotations

import pytest

from shopify_youtube_etl_spark.plans.registry import all_queries
from tests.conftest import assert_frames_match

SPECS = all_queries()
WITH_ORACLE = sorted(name for name, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(name for name, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = SPECS[name]
    spark_df = spec.fn(spark, sf_dir)
    duck_df = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(spark_df, duck_df)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))

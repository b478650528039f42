"""Empty-input robustness sweep: every registered query must degrade to
an empty (or stats-of-nothing) result on 0-row tables — never crash.

This is the failure class that produced real round-3 bugs (pagerank on
an empty graph) and, in this round's sweep, seven more: numpy matmul on
0-row probe matrices (ann_cosine_topk), `.first()[0]` on no rows
(embedding_lsh_neardup), k-means fit on an empty corpus (ann_ivf_topk),
ANSI divide-by-zero on a wedge-free graph (triangle_count), parquet
schema inference over a file-less partitioned write
(partition_pruned_ingest), and Spark's None-partition substitution for
an empty Python DataSource (both pagestore queries).  An engine meeting
a fresh tenant, a fully-filtered branch, or a not-yet-landed feed hits
exactly these paths.
"""

from __future__ import annotations

import os

import pytest

from shopify_youtube_etl_spark.plans.registry import all_queries
from shopify_youtube_etl_spark.schemas import TESTDATA_TABLES


@pytest.fixture(scope="module")
def empty_sf(spark, sf_dir, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("empty_sf")
    for name in TESTDATA_TABLES:
        (
            spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            .limit(0)
            .write.mode("overwrite")
            .parquet(str(d / f"{name}.parquet"))
        )
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf):
    from tests.sweep_util import run_sweep

    failures = run_sweep(all_queries(), empty_sf, spark)
    assert not failures, "queries crashed on empty input:\n" + "\n".join(failures)

"""Null-injection robustness sweep: every registered query must tolerate
NULL values in nullable columns — real corpora carry missing text,
missing embeddings, and half-empty event rows, and the driver's clean
synthetic data never exercises those paths.

This round's sweep found seven crashes, all in the Python-adjacent
paths where a NULL crossing the Arrow boundary becomes None inside
numpy/pandas (np.stack over a None embedding, decode of a None payload)
or where a null/zero weight reaches ANSI division
(weighted_sample_per_group).  The fixes encode the production
semantics: null vectors/payloads are excluded at operator entry, and
zero-weight rows are unsampleable by definition.
"""

from __future__ import annotations

import os

import pytest

from shopify_youtube_etl_spark.plans.registry import all_queries
from shopify_youtube_etl_spark.schemas import TESTDATA_TABLES


@pytest.fixture(scope="module")
def nullish_sf(spark, sf_dir, tmp_path_factory) -> str:
    """Testdata plus adversarial rows: null/empty/whitespace text, a
    null embedding vector, an all-null event row."""
    d = tmp_path_factory.mktemp("nullish_sf")
    for name in TESTDATA_TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "documents":
            extra = spark.createDataFrame(
                [
                    (99991, None, "en", "web", 0),
                    (99992, "", "en", "web", 0),
                    (99993, "   ", None, None, 3),
                ],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
            df = df.unionByName(extra)
        elif name == "embeddings":
            extra = spark.createDataFrame(
                [(99991, None, 3)], "vec_id long, embedding array<float>, label int"
            )
            df = df.unionByName(extra)
        elif name == "events":
            extra = spark.createDataFrame(
                [(99991, None, None, None, None, None)],
                "event_id long, ts timestamp, user_id long, event_type string,"
                " value double, props string",
            )
            df = df.unionByName(extra)
        df.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


def test_every_query_survives_null_rows(spark, nullish_sf):
    from tests.sweep_util import run_sweep

    failures = run_sweep(all_queries(), nullish_sf, spark)
    assert not failures, "queries crashed on null rows:\n" + "\n".join(failures)

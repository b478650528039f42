"""Exactness pins for the r12 optimization shortcuts (r12 verdict #3 /
item 6): every place the engine replaced a Spark computation with a
metadata shortcut or a restructured expression leaned on an ad-hoc
parity argument — these tests commit those proofs.

- parquet FOOTER min/max (``ParquetTable._footer_stats``) == the Spark
  aggregate on a mixed-type table (ints, nullable ints, an all-null
  column, dates, strings, floats) — including the type gate: non-exact
  types must be OMITTED (fall back to the aggregate), never guessed.
- ``table_col_max`` / ``table_row_count`` == the Spark aggregates on
  real testdata parquet.
- ``ParquetTable.read_rows`` (pyarrow driver-side) == ``read().collect()``.
- the O(1) minhash array form == the former unrolled ``sig_i`` columns,
  signature AND band-bucket bit-parity.
- ``double_literal`` SQL doubles round-trip bit-exactly vs ``F.lit``
  and survive NaN/±Infinity (ADVICE r12: repr alone renders ``nanD``).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.functions.similarity import (
    double_literal,
    lsh_bands,
    minhash_signature,
)
from shopify_youtube_etl_spark.operators.upsert import ParquetTable
from shopify_youtube_etl_spark.plans.common import t, table_col_max, table_row_count


@pytest.fixture()
def mixed_table(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, 5, None, "2021-03-04", "apple", 1.5),
            (-7, None, None, "1999-12-31", "Zebra", -2.25),
            (400, 2, None, "2021-01-01", "", float("nan")),
            (0, 9, None, "2030-06-15", "ünïcode", 3.125),
        ],
        "i BIGINT, ni INT, allnull INT, d STRING, s STRING, f DOUBLE",
    ).select("i", "ni", "allnull", F.to_date("d").alias("d"), "s", "f")
    tab = ParquetTable(spark, str(tmp_path / "mixed"))
    tab.overwrite(df, stats_cols=["i", "ni", "allnull", "d", "s", "f"])
    return tab, df


def test_footer_stats_match_spark_agg_on_exact_types(spark, mixed_table):
    tab, df = mixed_table
    seg = tab.segments()[0]
    stats = tab._footer_stats(seg, ["i", "ni", "allnull", "d", "s", "f"])
    # Exact types present, with values == the Spark aggregate.
    row = df.agg(
        *[F.min(c).alias(f"min_{c}") for c in ("i", "ni", "d")],
        *[F.max(c).alias(f"max_{c}") for c in ("i", "ni", "d")],
    ).first()
    assert stats["i"] == {"min": row["min_i"], "max": row["max_i"]}
    assert stats["ni"] == {"min": row["min_ni"], "max": row["max_ni"]}
    assert stats["d"] == {"min": row["min_d"], "max": row["max_d"]}
    # Type gate: strings/floats are never served from the footer (the
    # sidecar feeds pruning; truncation/NaN ordering make them unsafe).
    assert "s" not in stats
    assert "f" not in stats


def test_footer_stats_allnull_column_matches_spark_null_skipping(spark, mixed_table):
    tab, df = mixed_table
    seg = tab.segments()[0]
    stats = tab._footer_stats(seg, ["allnull"])
    if "allnull" in stats:
        # Footer served it: must agree with Spark's null-skipping agg.
        row = df.agg(F.min("allnull").alias("lo"), F.max("allnull").alias("hi")).first()
        assert stats["allnull"] == {"min": row["lo"], "max": row["hi"]}


def test_stats_sidecar_equals_spark_aggregate_end_to_end(spark, mixed_table):
    """The committed ``_stats.json`` (footer path + Spark fallback
    combined) must equal a full Spark aggregate for every stats column,
    with the sidecar's string encoding applied."""
    import json
    import os

    tab, df = mixed_table
    seg = tab.segments()[0]
    with open(os.path.join(seg, "_stats.json")) as fh:
        sidecar = json.load(fh)
    for c in ("i", "ni", "allnull", "d", "s"):
        row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).first()
        enc = lambda v: v if isinstance(v, (int, float, type(None))) else str(v)
        assert sidecar[c] == {"min": enc(row["lo"]), "max": enc(row["hi"])}, c
    # Float column: NaN handling — whatever Spark's aggregate said is
    # what the sidecar must carry (footer never serves floats).
    row = df.agg(F.min("f").alias("lo"), F.max("f").alias("hi")).first()
    got = sidecar["f"]
    assert (got["min"] == row["lo"]) or (
        math.isnan(got["min"]) and math.isnan(row["lo"])
    )
    assert (got["max"] == row["hi"]) or (
        math.isnan(got["max"]) and math.isnan(row["hi"])
    )


def test_table_footer_helpers_match_spark_aggregates(spark, sf_dir):
    for name, col in (("documents", "doc_id"), ("events", "event_id")):
        spark_max = t(spark, sf_dir, name).agg(F.max(col)).first()[0]
        spark_n = t(spark, sf_dir, name).count()
        assert table_col_max(spark, sf_dir, name, col) == spark_max
        assert table_row_count(spark, sf_dir, name) == spark_n


def test_table_col_max_falls_back_for_non_integer_columns(spark, sf_dir):
    # 'lang' is a string column: the footer path must decline and the
    # Spark aggregate answer.
    spark_max = t(spark, sf_dir, "documents").agg(F.max("lang")).first()[0]
    assert table_col_max(spark, sf_dir, "documents", "lang") == spark_max


def test_read_rows_equals_spark_collect(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, float("-inf")), (3, "c", 0.0)],
        "k BIGINT, v STRING, x DOUBLE",
    )
    tab = ParquetTable(spark, str(tmp_path / "rows"))
    tab.overwrite(df)
    via_arrow = sorted(tab.read_rows(), key=lambda r: r["k"])
    via_spark = sorted(
        (r.asDict() for r in tab.read().collect()), key=lambda r: r["k"]
    )
    assert via_arrow == via_spark


def test_minhash_array_form_bit_parity_with_unrolled_columns(spark):
    """r12 §8's proof, committed: the transform-over-sequence signature
    array holds EXACTLY the values of the former unrolled
    ``xxhash64(lit(i), xxhash64(s))`` columns, and the band buckets
    built from its slots equal the unrolled-column band hashes."""
    docs = spark.createDataFrame(
        [
            (1, ["a b c", "b c d", "c d e"]),
            (2, ["b c d", "c d e", "d e f"]),
            (3, ["zz yy xx"]),
            (4, ["a b c", "b c d", "c d e"]),  # exact dup of 1
        ],
        "doc_id BIGINT, sh ARRAY<STRING>",
    )
    k, bands = 32, 8
    new_sig = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signature(docs, "doc_id", "sh", num_hashes=k).collect()
    }
    # The former unrolled formulation, reconstructed verbatim.
    hashed = docs.select(
        "doc_id", F.transform("sh", lambda s: F.xxhash64(s)).alias("__h")
    )
    def old_col(i: int):
        # NB: a 1-arg lambda — transform() would feed the array INDEX
        # to a second parameter, silently shadowing a default-arg i.
        return F.array_min(
            F.transform("__h", lambda x: F.xxhash64(F.lit(i), x))
        ).alias(f"sig_{i}")

    old = hashed.select("doc_id", *[old_col(i) for i in range(k)])
    old_sig = {
        r["doc_id"]: [r[f"sig_{i}"] for i in range(k)] for r in old.collect()
    }
    assert new_sig == old_sig
    # Band buckets: unrolled band hashes over sig_{b*r+j} columns.
    r_ = k // bands
    new_bands = {
        (r["doc_id"], r["band_id"]): r["band_hash"]
        for r in lsh_bands(
            minhash_signature(docs, "doc_id", "sh", num_hashes=k),
            "doc_id",
            num_hashes=k,
            bands=bands,
        ).collect()
    }
    old_bands_df = old.select(
        "doc_id",
        *[
            F.xxhash64(*[F.col(f"sig_{b * r_ + j}") for j in range(r_)]).alias(
                f"band_{b}"
            )
            for b in range(bands)
        ],
    )
    old_bands = {
        (r["doc_id"], b): r[f"band_{b}"]
        for r in old_bands_df.collect()
        for b in range(bands)
    }
    assert new_bands == old_bands


def test_double_literal_roundtrip_and_nonfinite(spark):
    vals = [
        0.0, -0.0, 1.0, -1.5, 3.141592653589793, 1e-308, -1.7976931348623157e308,
        2.2250738585072014e-308, 0.1, 1 / 3, float("nan"), float("inf"), float("-inf"),
    ]
    exprs = ", ".join(double_literal(v) for v in vals)
    via_sql = spark.sql(f"SELECT array({exprs}) AS a").first()["a"]
    via_lit = spark.range(1).select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("a")
    ).first()["a"]
    import struct

    bits = lambda x: struct.pack("<d", x)
    assert [bits(x) for x in via_sql] == [bits(x) for x in via_lit]

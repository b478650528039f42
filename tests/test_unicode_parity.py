"""Unicode cross-engine parity: the text-operator oracles must agree
between Spark (JVM UTF8String semantics) and DuckDB (RE2/UTF-8) on
non-ASCII content — accents, CJK, emoji (astral plane), Greek.

The driver's synthetic corpus is ASCII, so nothing else exercises the
semantics a real multilingual corpus lives on: code-point vs code-unit
`length()`, `\\s+` splitting around ideographic text, regex classes like
`[a-zA-Z]` against accented letters, md5 over multi-byte encodings.
Measured this round: all text-family oracles agree byte-for-byte on the
planted sample; this test keeps it that way.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from shopify_youtube_etl_spark.plans.registry import all_queries
from shopify_youtube_etl_spark.schemas import TESTDATA_TABLES

UNI_DOCS = [
    (80001, "héllo wörld héllo wörld naïve café", "fr", "web", 34),
    (80002, "日本語のテキスト 処理 パイプライン 日本語のテキスト", "ja", "wiki", 25),
    (80003, "emoji 😀😀 test 😀 emoji test ünïcödé", "en", "web", 33),
    (80004, "Ελληνικά κείμενα και ανάλυση ποιότητας δεδομένων", "el", "books", 48),
    (80005, "mixed ASCII and 中文 characters tokens 中文 test", "en", "web", 45),
]

TEXT_QUERIES = [
    "token_stats",
    "dedup_exact",
    "doc_fingerprint",
    "quality_scores",
    "lang_id_confusion",
    "doc_chunking",
    "pii_redaction",
    "vocab_top_tokens",
    "bigram_top_terms",
    "tfidf_top_terms",
    "source_lang_entropy",
    "repetition_profile",
    "token_length_histogram",
    "sequence_packing",
    "bpe_sequence_packing",
    "quality_quantile_filter",
    "cross_source_dup_matrix",
    "source_token_kl",
    "stable_sample_split",
    "incremental_dedup_report",
    "ngram_jaccard_pairs",
    "char_ngram_neardup",
    "containment_pairs",
    "benchmark_contamination",
    "unigram_logprob_score",
    "hashed_linear_quality_score",
    "media_payload_dedup",
    "duplicated_span_profile",
    # Round-5 text-family additions.
    "repeated_span_removal",
    "bm25_search_topk",
]


@pytest.fixture(scope="module")
def unicode_sf(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("unicode_sf")
    for name in TESTDATA_TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "documents":
            df = df.unionByName(
                spark.createDataFrame(
                    UNI_DOCS,
                    "doc_id long, text string, lang string, source string, n_chars long",
                )
            )
        df.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        # Spark writes parquet DIRECTORIES — DuckDB needs the file glob.
        con.execute(
            f"CREATE VIEW {name} AS SELECT *"
            f" FROM read_parquet('{d}/{name}.parquet/*.parquet')"
        )
    yield str(d), con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_text_oracles_agree_on_unicode(spark, unicode_sf):
    vdir, con = unicode_sf
    qs = all_queries()
    failures = []
    for name in TEXT_QUERIES:
        spec = qs[name]
        assert spec.oracle, f"{name} lost its oracle"
        s = _norm(spec.fn(spark, vdir).toPandas())
        o = _norm(con.execute(spec.oracle).fetchdf())
        if len(s) != len(o):
            failures.append(f"{name}: rowcount {len(s)} vs {len(o)}")
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, rtol=1e-9)
        except AssertionError as exc:
            failures.append(f"{name}: {str(exc).splitlines()[0][:150]}")
    assert not failures, "unicode parity broke:\n" + "\n".join(failures)

"""Text-analysis / dedup queries over the documents table (north-star
LLM-data-pipeline operators; SURVEY §7 Phase 5).

All built-in expressions — no Python in the hot path.  Each Spark
helper in functions/text.py documents its DuckDB equivalent; the
oracles here spell the identical logic in SQL so the value hashes must
match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.functions.text import (
    LANG_STOPWORDS,
    fingerprint,
    normalize_text,
    predicted_lang,
    quality_score,
    token_count_bpe_estimate,
    token_count_whitespace,
    words,
)
from shopify_youtube_etl_spark.plans.common import t
from shopify_youtube_etl_spark.plans.registry import query

# DuckDB fragments mirroring functions/text.py helpers.
_D_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_D_WORDS = "string_split_regex(trim(text), '\\s+')"


@query(
    "dedup_exact",
    ref="A4/A5 generalization → exact content dedup (hash-groupBy)",
    doc="Exact duplicate groups by content hash; keeper = min doc_id.",
    oracle=f"""
SELECT md5({_D_NORM})                    AS content_hash,
       CAST(min(doc_id) AS BIGINT)      AS keeper_id,
       CAST(count(*) AS BIGINT)         AS n_copies
FROM documents
GROUP BY 1
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at scale = one hash-groupBy shuffle on the 16-byte
    digest (never on the full text).  Keeper choice (min id) mirrors the
    reference's keep-first (A5) made deterministic."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy(fingerprint(F.col("text")).alias("content_hash")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count("*").alias("n_copies"),
    )


@query(
    "doc_fingerprint",
    ref="document fingerprinting (north star); F9-style hashing",
    doc="Per-document stable fingerprint + basic size stats.",
    oracle=f"""
SELECT doc_id,
       md5({_D_NORM})                                   AS fingerprint,
       CAST(strlen(text) AS BIGINT)                     AS n_bytes,
       CAST(len({_D_WORDS}) AS BIGINT)                  AS n_tokens
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fingerprint"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        token_count_whitespace(F.col("text")).cast("long").alias("n_tokens"),
    )


@query(
    "token_stats",
    ref="token counting (whitespace + BPE-ish estimate)",
    doc="Per-document token counts, distinct tokens, type-token ratio.",
    oracle=f"""
SELECT doc_id,
       CAST(len({_D_WORDS}) AS BIGINT)                   AS n_tokens,
       CAST(len(list_distinct({_D_WORDS})) AS BIGINT)    AS n_distinct,
       CAST(ceil(strlen(text) / 4.0) AS BIGINT)          AS bpe_estimate,
       round(len(list_distinct({_D_WORDS})) * 1.0
             / greatest(len({_D_WORDS}), 1), 6)          AS ttr
FROM documents
""",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    return d.select(
        "doc_id",
        token_count_whitespace(F.col("text")).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct"),
        token_count_bpe_estimate(F.col("text")).alias("bpe_estimate"),
        F.round(
            F.size(F.array_distinct(ws)) / F.greatest(F.size(ws), F.lit(1)), 6
        ).alias("ttr"),
    )


def _lang_score_sql(lang: str) -> str:
    sws = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return f"len(list_filter({_D_WORDS}, t -> list_contains([{sws}], t)))"


_SCORES = {lang: _lang_score_sql(lang) for lang in LANG_STOPWORDS}
_BEST = "greatest(" + ", ".join(_SCORES.values()) + ")"
_PRED_CASE = (
    "CASE WHEN " + _BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN {score} = {_BEST} THEN '{lang}'" for lang, score in _SCORES.items()
    )
    + " END"
)


@query(
    "lang_id_confusion",
    ref="language-ID heuristic (stopword vote) vs labeled lang",
    doc="Confusion matrix: labeled lang × predicted lang.",
    oracle=f"""
SELECT lang, {_PRED_CASE} AS predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1, 2
""",
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID; first language in inventory order wins
    ties (the oracle's CASE chain evaluates in the same order)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("lang", predicted_lang(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "quality_scores",
    ref="quality scoring (length/diversity/alpha ratios)",
    doc="Per-document composite quality score + per-source profile.",
    oracle=f"""
WITH scored AS (
    SELECT source,
           round(0.4 * least(length(text) / 500.0, 1.0)
               + 0.3 * (len(list_distinct({_D_WORDS})) * 1.0 / greatest(len({_D_WORDS}), 1))
               + 0.3 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
                        / greatest(length(text), 1)), 6) AS q
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(q), 6)         AS avg_quality,
       round(min(q), 6)         AS min_quality,
       round(max(q), 6)         AS max_quality
FROM scored
GROUP BY source
""",
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    scored = d.select("source", quality_score(F.col("text")).alias("q"))
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
        F.round(F.min("q"), 6).alias("min_quality"),
        F.round(F.max("q"), 6).alias("max_quality"),
    )


@query(
    "stable_sample_split",
    ref="training-data staple — deterministic content-hash sampling (stable train/val/test split)",
    doc="Split assignment by md5(text) bucket: reproducible across runs, engines, and partitionings.",
    oracle="""
SELECT split,
       CAST(count(*) AS BIGINT)        AS n_docs,
       CAST(sum(n_chars) AS BIGINT)    AS total_chars
FROM (
    SELECT CASE
             WHEN bucket < 204 THEN 'train'
             WHEN bucket < 230 THEN 'val'
             ELSE 'test'
           END AS split,
           n_chars
    FROM (
        SELECT n_chars,
               CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER) AS bucket
        FROM documents
    )
)
GROUP BY split
""",
)
def stable_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling that survives reprocessing: the split key is a hash of
    the CONTENT, not row position or rand() — identical rows land in
    the same split on any engine, partitioning, or run (rand()/
    TABLESAMPLE give neither).  Buckets 0-255 from the first md5 byte:
    ~80% train / ~10% val / ~10% test.  Map-side only; one tiny
    aggregate shuffle."""
    d = t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.encode("text", "UTF-8")), 1, 2), 16, 10).cast("int")
    split = (
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "doc_chunking",
    ref="training-data staple — overlapping token-window chunking (long-doc splitting)",
    doc="Split documents into 5-token chunks with stride 3 (2-token overlap), positions preserved.",
    oracle="""
WITH base AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
    FROM documents WHERE doc_id % 25 = 0
)
SELECT doc_id,
       CAST(s AS BIGINT)                                     AS chunk_start,
       array_to_string(list_slice(ws, s, s + 4), ' ')        AS chunk_text,
       CAST(len(list_slice(ws, s, s + 4)) AS BIGINT)         AS n_tokens
FROM base, unnest(generate_series(1, len(ws), 3)) AS g(s)
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document splitting for context-bounded training: stride <
    width gives overlapping windows so no boundary context is lost.
    sequence+explode+slice is all map-side (one fan-out, no shuffle);
    width/stride are the 5/3 miniature of the production 2048/1536."""
    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 25 == 0)
        .select("doc_id", words(F.col("text")).alias("ws"))
    )
    chunks = d.select(
        "doc_id",
        "ws",
        F.explode(F.sequence(F.lit(1), F.size("ws"), F.lit(3))).alias("chunk_start"),
    )
    sliced = F.slice(F.col("ws"), F.col("chunk_start"), 5)
    return chunks.select(
        "doc_id",
        F.col("chunk_start").cast("long"),
        F.array_join(sliced, " ").alias("chunk_text"),
        F.size(sliced).cast("long").alias("n_tokens"),
    )


@query(
    "vocab_top_tokens",
    ref="training-data staple — corpus vocabulary statistics (token frequency top-k)",
    doc="Top-20 tokens by corpus frequency with document frequency, deterministic tie-break.",
    oracle="""
SELECT token, n_occurrences, n_docs, rank
FROM (
    SELECT token,
           CAST(count(*) AS BIGINT)                 AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT)   AS n_docs,
           row_number() OVER (ORDER BY count(*) DESC, token) AS rank
    FROM (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
        FROM documents
    )
    GROUP BY token
)
WHERE rank <= 20
""",
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: explode is map-side; the groupBy
    shuffles (token, partial counts) — Catalyst's partial aggregation
    means each partition ships one row per distinct token it saw, not
    one per occurrence.  Top-k via row_number with a token tie-break
    so the cut is deterministic."""
    from pyspark.sql.window import Window

    tokens = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(words(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return (
        tokens.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 20)
        .select("token", "n_occurrences", "n_docs", "rank")
    )

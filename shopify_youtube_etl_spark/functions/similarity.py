"""Similarity / dedup primitives over embeddings and shingle sets.

Design for scale (100 TB):
- cosine stays a built-in expression (``zip_with`` + ``aggregate``) —
  JVM-side, codegen'd, no Python;
- brute-force top-k is the *baseline* (probe-side broadcast, one pass
  over the corpus); the scale path is LSH bucketing (``minhash_signature``
  + banding) which turns all-pairs into per-bucket joins;
- MinHash uses ``xxhash64(seed, shingle)`` — a JVM hash, one explode +
  one groupBy pass for any number of permutations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    """Cast array<float> → array<double> so dot products accumulate at
    double precision (parity with the DuckDB oracle's arithmetic)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential fold, bit-compatible
    with DuckDB's list_dot_product on double lists."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two DISTINCT-element arrays.
    DuckDB: ``len(list_intersect(a,b)) / (len(a)+len(b)-len(list_intersect(a,b)))``."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / F.greatest(union, F.lit(1))


def minhash_signature(df: DataFrame, id_col: str, shingles_col: str, num_hashes: int = 32) -> DataFrame:
    """MinHash signatures: one row per id with ``sig_0..sig_{k-1}``.

    One explode + one groupBy — a single shuffle on id regardless of k.
    h_i(s) = xxhash64(i, s): independent-enough hash family, fully
    deterministic across runs/engines (Spark's xxhash64 is seeded by the
    literal column, not the session).
    """
    exploded = df.select(F.col(id_col), F.explode(shingles_col).alias("__shingle"))
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("__shingle"))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_bands(sig_df: DataFrame, id_col: str, num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """Banding: hash each band of r = num_hashes/bands signature slots →
    (id, band_id, band_hash).  Docs sharing any (band_id, band_hash)
    bucket are candidate near-duplicates."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    rows = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * r + j}") for j in range(r)]
        rows.append(
            sig_df.select(
                F.col(id_col),
                F.lit(b).alias("band_id"),
                F.xxhash64(*cols).alias("band_hash"),
            )
        )
    out = rows[0]
    for other in rows[1:]:
        out = out.unionByName(other)
    return out


def lsh_candidate_pairs(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Self-join buckets → distinct candidate (id_a < id_b) pairs.
    The join key (band_id, band_hash) keeps this a bucket-local join —
    the whole point of LSH at scale."""
    a = bands_df.select(F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_a"))
    b = bands_df.select(F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, on=["band_id", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

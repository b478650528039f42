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

    Fully map-side — NO shuffle: each string shingle is hashed once to
    int64 (``xxhash64(s)``), then the k permutations are cheap integer
    re-hashes ``array_min(transform(h, x -> xxhash64(i, x)))``.  The
    alternative explode + groupBy(id) shuffles |shingles| rows per doc;
    at 100 TB that shuffle dwarfs the hashing.  h_i deterministic across
    runs (xxhash64 seeded by the literal, not the session).

    Rows whose shingle array is EMPTY get null signatures — filter them
    out upstream (cheaply, e.g. on token count) or every empty doc
    lands in one giant all-null LSH bucket.
    """
    hashed = df.select(
        F.col(id_col),
        F.transform(shingles_col, lambda s: F.xxhash64(s)).alias("__h"),
    )
    sig_cols = [
        F.array_min(F.transform("__h", lambda x: F.xxhash64(F.lit(i), x))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return hashed.select(id_col, *sig_cols)


def lsh_bands(sig_df: DataFrame, id_col: str, num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """Banding: hash each band of r = num_hashes/bands signature slots →
    (id, band_id, band_hash).  Docs sharing any (band_id, band_hash)
    bucket are candidate near-duplicates.

    Single-pass: the per-band hashes are built as one array-of-struct
    column and exploded — NOT one select per band unioned together,
    which would re-execute the whole upstream signature computation
    ``bands`` times (8× slower, measured)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(*[F.col(f"sig_{b * r + j}") for j in range(r)]).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
        id_col, "b.band_id", "b.band_hash"
    )


def lsh_candidate_pairs(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Bucket grouping → distinct candidate (id_a < id_b) pairs.

    groupBy + in-array pair expansion instead of a bucket self-join:
    one shuffle on (band_id, band_hash), no second evaluation of the
    upstream plan, and the pair blow-up stays bounded per bucket (LSH
    buckets are small by construction; a hot bucket means the band
    parameters are wrong, not that the join should absorb it)."""
    buckets = (
        bands_df.groupBy("band_id", "band_hash")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "filter(flatten(transform(ids, x -> transform(ids, y -> struct(x AS id_a, y AS id_b)))),"
                " p -> p.id_a < p.id_b)"
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()

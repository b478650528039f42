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
    """MinHash signatures: one row per id with a ``sig`` array of k
    slots (``sig[i]`` = what the former ``sig_i`` column held — values
    are IDENTICAL, the k permutations just live in one array column).

    Fully map-side — NO shuffle: each string shingle is hashed once to
    int64 (``xxhash64(s)``), then the k permutations are cheap integer
    re-hashes ``array_min(transform(h, x -> xxhash64(i, x)))``, built
    as ONE ``transform`` over ``sequence(0, k-1)`` rather than k
    aliased columns.  The loop form keeps the expression tree O(1) in
    k instead of O(k): with 32 unrolled sig columns Catalyst re-plans
    32 near-identical subtrees on every invocation — measured ~1s of
    pure driver planning per bench rep of the minhash query — and the
    generated code blows past JIT-friendly method sizes.  ``xxhash64``
    seeded by the sequence element hashes exactly like the former
    ``xxhash64(lit(i), x)`` (same int32/int64 input pair), so
    signatures, band hashes, and every persisted LSH structure are
    bit-identical to the unrolled form.

    The alternative explode + groupBy(id) shuffles |shingles| rows per
    doc; at 100 TB that shuffle dwarfs the hashing.  h_i deterministic
    across runs (xxhash64 seeded by the sequence element, not the
    session).

    Rows whose shingle array is EMPTY get null signature slots — filter
    them out upstream (cheaply, e.g. on token count) or every empty doc
    lands in one giant all-null LSH bucket.
    """
    hashed = df.select(
        F.col(id_col),
        F.transform(shingles_col, lambda s: F.xxhash64(s)).alias("__h"),
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(F.col("__h"), lambda x: F.xxhash64(i, x))),
    )
    return hashed.select(id_col, sig.alias("sig"))


def lsh_bands(sig_df: DataFrame, id_col: str, num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """Banding: hash each band of r = num_hashes/bands signature slots →
    (id, band_id, band_hash).  Docs sharing any (band_id, band_hash)
    bucket are candidate near-duplicates.

    Single-pass: the per-band hashes are built as one array-of-struct
    column and exploded — NOT one select per band unioned together,
    which would re-execute the whole upstream signature computation
    ``bands`` times (8× slower, measured).  Band hashes are computed
    from the ``sig`` array's slots (``sig[b*r+j]`` == former
    ``sig_{b*r+j}`` column), so bucket assignments are bit-identical
    to the unrolled-column form."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    r = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)]).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
        id_col, "b.band_id", "b.band_hash"
    )


def lsh_candidate_pairs(
    bands_df: DataFrame, id_col: str, max_bucket_size: int = 256
) -> DataFrame:
    """Bucket grouping → distinct candidate (id_a < id_b) pairs.

    groupBy + in-array pair expansion instead of a bucket self-join:
    one shuffle on (band_id, band_hash), no second evaluation of the
    upstream plan.

    Hot-bucket hardening (VERDICT r1 item #7): a bucket of n members
    expands to C(n,2) pairs — one adversarial bucket (boilerplate text,
    a degenerate band hash) could emit billions of rows from a single
    task and OOM an executor at 100 TB.  The collect_list buffer itself
    is only O(n) longs (harmless); the quadratic pair expansion is the
    risk, so buckets larger than ``max_bucket_size`` degrade to STAR
    expansion: every member pairs with the bucket's min id only (n-1
    pairs, linear).  In the CANDIDATE graph this keeps the bucket one
    connected component; note the recall caveat AFTER exact
    verification — if the hub itself fails the verify against members
    B and C, a genuine B≈C pair is not re-generated, so a hot bucket
    trades bounded memory for possible non-hub recall loss.  That is
    the intended degraded mode: a bucket this hot means the band
    parameters are mis-tuned for that data slice, and emitting C(n,2)
    candidate pairs would mostly be verify-rejected noise at OOM-scale
    cost.  Tests plant a hot bucket and assert linear output
    (tests/test_llm_ops.py).  The degradation is observable:
    ``lsh_hot_bucket_count`` reports how many buckets exceeded the cap
    (ADVICE r2 — mis-tuned band parameters should not fail silently)."""
    buckets = (
        bands_df.groupBy("band_id", "band_hash")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    all_pairs = F.expr(
        "filter(flatten(transform(ids, x -> transform(ids, y -> struct(x AS id_a, y AS id_b)))),"
        " p -> p.id_a < p.id_b)"
    )
    star_pairs = F.expr(
        "transform(filter(ids, x -> x <> array_min(ids)),"
        " x -> struct(array_min(ids) AS id_a, x AS id_b))"
    )
    pairs = buckets.select(
        F.explode(
            F.when(F.size("ids") <= max_bucket_size, all_pairs).otherwise(star_pairs)
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def capped_struct_pairs(
    members_col: str, id_field: str, max_bucket_size: int = 256
) -> Column:
    """Bucket-local pair expansion over an array<struct> column, with the
    same hot-bucket degradation contract as ``lsh_candidate_pairs`` but
    keeping each member's payload fields (e.g. a fingerprint) attached,
    so the verify step needs NO join-back.

    Returns array<struct<a, b>> where ``a.{id_field} < b.{id_field}``.
    Buckets larger than ``max_bucket_size`` degrade from C(n,2) to STAR
    expansion around the min-id member (n−1 pairs, linear) — bounding
    the worst single-task blow-up at 100 TB; see ``lsh_candidate_pairs``
    for the recall trade-off discussion.  ``lsh_hot_bucket_count`` gives
    operators the mis-tuned-band signal."""
    m = members_col
    all_pairs = (
        f"filter(flatten(transform({m}, x -> transform({m}, y -> struct(x AS a, y AS b)))),"
        f" p -> p.a.{id_field} < p.b.{id_field})"
    )
    # The hub is the (unique-id) member holding the bucket's min id, so
    # hub.{id} < x.{id} for every other member — pair order holds.  One
    # O(n) aggregate pass finds it, and the single-element transform()
    # binds it ONCE as a lambda variable — inlining the hub expression
    # into the per-member lambdas would re-evaluate it for every member,
    # turning the cap's promised linear degradation into O(n²) compute
    # on exactly the hot buckets it exists to bound (review r3).
    hub = (
        f"aggregate({m}, element_at({m}, 1),"
        f" (acc, e) -> IF(e.{id_field} < acc.{id_field}, e, acc))"
    )
    star_pairs = (
        f"flatten(transform(array({hub}), hub ->"
        f" transform(filter({m}, x -> x.{id_field} <> hub.{id_field}),"
        f" x -> struct(hub AS a, x AS b))))"
    )
    return F.when(F.size(m) <= max_bucket_size, F.expr(all_pairs)).otherwise(
        F.expr(star_pairs)
    )


def lsh_hot_bucket_count(
    bands_df: DataFrame, id_col: str, max_bucket_size: int = 256
) -> int:
    """Number of LSH buckets that exceed ``max_bucket_size`` — the
    mis-tuned-band-parameters signal (ADVICE r2): the capped pair
    expansion silently degrades those buckets to star form, so an
    operator tuning bands/permutations should watch this count (0 on
    well-tuned data).  One extra aggregation job; run it as a
    diagnostic, not inside the hot path."""
    return (
        bands_df.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > max_bucket_size)
        .count()
    )


def simhash64(token_hashes_col: str) -> Column:
    """64-bit SimHash from a MATERIALIZED array<long> token-hash column.

    Classic sign-sum: bit b of the result is 1 iff Σ_tokens (±1 by bit b
    of the token hash) > 0.  Pure SQL higher-order functions — map-side,
    no shuffle, no UDF; 64 × |tokens| integer ops per doc.

    Near-dup docs differ in few tokens ⇒ small Hamming distance
    (``hamming64``); candidate search buckets on 16-bit bands
    (``simhash_bands``) so an exact match on ANY band is required before
    pairwise verification — same LSH shape as MinHash banding.
    """
    bitsum = (
        f"aggregate({token_hashes_col}, 0, (acc2, h) ->"
        " acc2 + IF((shiftright(h, b) & 1) = 1, 1, -1))"
    )
    return F.expr(
        "aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, b) ->"
        f" acc + IF({bitsum} > 0, shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))"
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 fingerprints (bit_count(xor))."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_bands(simhash_col: Column, bands: int = 4) -> Column:
    """Split a 64-bit simhash into ``bands`` equal bit-slices as an
    array<struct<band_id,band_hash>> for LSH bucketing; docs within
    Hamming distance < bands must collide on ≥ 1 band (pigeonhole)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(k).alias("band_id"),
                F.shiftrightunsigned(simhash_col, k * width).bitwiseAND(F.lit(mask)).alias("band_hash"),
            )
            for k in range(bands)
        ]
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side
    constants, broadcast as literals — no data dependence)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def double_literal(x: float) -> str:
    """One SQL double literal that round-trips EXACTLY: ``repr`` for
    finite values (shortest-repr floats parse back bit-identical through
    Spark's double parser) and CAST forms for NaN/±Infinity, whose repr
    ('nan'/'inf') would render unparseable SQL (``nanD``) — ADVICE r12.
    The CAST forms evaluate to the same doubles ``F.lit`` produced, so
    a non-finite model value degrades to the pre-r12 behavior instead
    of an AnalysisException."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"{x!r}D"


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(v · plane_i).  Vectors with small
    angle agree on most signs ⇒ land in the same bucket.

    The plane matrix ships as ONE SQL literal (repr round-trips doubles
    exactly) instead of n_planes·dim individual ``F.lit`` py4j calls —
    the same driver-side expression-build fix as ``_ivf_dists``; the
    dot-product fold order is unchanged, so buckets are bit-identical."""
    rows = ",".join(
        "array(" + ",".join(double_literal(x) for x in p) + ")" for p in planes
    )
    planes_lit = F.expr(f"array({rows})")
    contribs = F.transform(
        planes_lit,
        lambda plane, i: (
            F.when(
                dot(vec, plane) > 0,
                F.call_function("shiftleft", F.lit(1).cast("long"), i),
            )
            .otherwise(F.lit(0))
            .cast("long")
        ),
    )
    return F.aggregate(
        contribs, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def simhash_signsum_np(hashed_df: DataFrame, id_col: str = "doc_id", th_col: str = "th") -> DataFrame:
    """Arrow-vectorized sign-sum: same fingerprints as ``simhash64``
    (bit-for-bit — asserted in tests) but the 64×|tokens| vote runs as
    one numpy pass per batch instead of a nested Catalyst fold.  Token
    hashing stays JVM-side (xxhash64); only the vote crosses to Python.

    Ragged token arrays are flattened once and reduced per-doc with
    ``np.add.reduceat`` — no per-row Python loop.  Peak memory is
    O(total_tokens): the 64 bit-planes are reduced one at a time rather
    than materializing a (tokens, 64) matrix.  Edge parity with
    ``simhash64``: empty and null arrays → 0 (the expression's IF takes
    the else branch on a NULL bitsum; reduceat with an empty segment
    would otherwise bleed the NEXT doc's votes in)."""
    import numpy as np
    import pandas as pd

    def signsum(batches):
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        for pdf in batches:
            if pdf.empty:
                continue
            th_vals = list(pdf[th_col])
            n = len(th_vals)
            out = pd.array([0] * n, dtype="Int64")
            nonempty = [
                i for i, a in enumerate(th_vals) if a is not None and len(a) > 0
            ]
            if nonempty:
                lens = np.array([len(th_vals[i]) for i in nonempty], dtype=np.int64)
                flat = np.concatenate(
                    [np.asarray(th_vals[i], dtype=np.int64) for i in nonempty]
                )
                offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                per_doc = np.empty((len(nonempty), 64), dtype=np.int64)
                for b in range(64):
                    # >> on int64 is arithmetic, matching Spark's
                    # shiftright on negative hashes; one (tokens,) temp
                    # per bit-plane instead of a (tokens, 64) matrix.
                    bits = ((flat >> b) & 1) * 2 - 1
                    per_doc[:, b] = np.add.reduceat(bits, offsets)
                packed = ((per_doc > 0).astype(np.uint64) * weights).sum(axis=1)
                signed = packed.astype(np.int64)  # two's-complement reinterpret
                for j, i in enumerate(nonempty):
                    out[i] = int(signed[j])
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "sh": out})

    return hashed_df.select(id_col, th_col).mapInPandas(signsum, f"{id_col} long, sh long")

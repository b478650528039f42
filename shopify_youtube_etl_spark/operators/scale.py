"""Shuffle-shaping operators for cluster scale: salting and bucketing.

The reference never faces skew (BigQuery's planner owns it); at 100 TB
on Spark these are the two levers the engine must supply itself:

- **Salted join** — when one join key carries a disproportionate share
  of rows (a viral order, a bot user), the task holding that key
  becomes the straggler.  Salting splits the hot key across
  ``salt_buckets`` tasks: the large side gets a deterministic salt,
  the small side is replicated once per salt value.  AQE's skew-join
  handles moderate skew automatically (``spark.sql.adaptive.skewJoin``);
  salting is the explicit fallback for extreme single-key skew where a
  key exceeds one executor's memory.

- **Bucketed co-located join** — two fact tables bucketed on the join
  key join with ZERO shuffle: bucket n of the left matches bucket n of
  the right by layout.  At 100 TB this converts the dominant
  lineitem⋈orders exchange (both sides shuffled every query) into a
  one-time write-side cost amortized over every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``large`` rows get a deterministic salt
    (hash of the whole row via all columns — uniform, reproducible),
    ``small`` is replicated ``salt_buckets``× so every (key, salt) pair
    finds its match.  Result is row-identical to ``large.join(small,
    key, how)``; only the shuffle layout changes.  Replication cost:
    |small| · salt_buckets rows — use for small-to-medium build sides.

    Only probe-side-preserving join types are allowed: for right/full
    outer, unmatched ``small`` rows would surface once per salt replica
    (salt_buckets duplicates), so those types are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side rows "
            f"would duplicate once per salt replica (allowed: inner/left/semi/anti)"
        )
    salted_large = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*large.columns), F.lit(salt_buckets)).cast("int")
    )
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    salted_small = small.withColumn(SALT_COL, F.explode(salts))
    out = salted_large.join(salted_small, [key, SALT_COL], how)
    return out.drop(SALT_COL)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_key: str, n_buckets: int = 8
) -> None:
    """Persist a table bucketed+sorted on its join key so later joins
    on that key are exchange-free (Spark bucketing works on the
    in-memory catalog; no Hive metastore needed)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys; with
    matching bucketing the physical plan has no Exchange on either side
    (verified in tests/test_scale.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])


def zorder_value(*cols: str, bits: int = 16) -> "F.Column":
    """Morton (Z-order) interleave of N ≥ 2 non-negative integer
    columns — the multi-dimensional clustering key Delta's OPTIMIZE
    ZORDER BY computes.  Bit b of dimension j lands at position
    N·b + j, so rows close in EVERY dimension get close z-values;
    writing with ``repartitionByRange(z).sortWithinPartitions(z)``
    then gives every parquet file a narrow min/max envelope on ALL
    columns and the reader prunes on any predicate.  (For N=2 this is
    the classic 2b / 2b+1 interleave, bit-compatible with the previous
    two-arg signature.)

    Pure JVM higher-order expression (one fold over ``bits`` positions,
    no UDF, no shuffle); column args are names/SQL expressions, same
    convention as functions/text.py.  Inputs must fit in ``bits`` bits
    — mask beforehand (``F.col(c) % (1 << bits)``) or the interleave
    silently aliases distant values.  N·bits must fit a BIGINT
    (≤ 63)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_value needs at least two columns")
    if n * bits > 63:
        raise ValueError(
            f"{n} dims × {bits} bits = {n * bits} interleaved bits "
            "overflows BIGINT (max 63); lower bits or drop a dimension"
        )
    terms = " + ".join(
        f"shiftleft(CAST(shiftright({c}, b) & 1 AS BIGINT), {n}*b+{j})"
        for j, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), CAST(0 AS BIGINT),"
        f" (acc, b) -> acc + {terms})"
    )


def prefilter_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_buckets: int = 1 << 16,
    how: str = "inner",
) -> DataFrame:
    """Runtime-filter join: prune the probe side with a broadcast
    approximate-membership set of the build side's key hashes BEFORE
    the shuffle join — the explicit form of Spark's runtime bloom
    filter (spark.sql.optimizer.runtime.bloomFilter), which only
    triggers under planner heuristics; this one always applies.

    The filter is the distinct set of ``xxhash64(key) % n_buckets``
    build-side buckets (≤ n_buckets rows regardless of build size,
    broadcast as a hash set → O(1) JVM probe per row).  False
    positives pass through and are eliminated by the exact join that
    follows; false negatives are impossible (a true match always
    shares its key's bucket), so the result is row-identical to the
    plain join.  At 100 TB the win is shuffle volume: probe rows with
    no possible match never enter the exchange — for a selective
    build side (e.g. one month of orders against 7 years of lineitem)
    that is most of the table.

    Only ``inner`` and ``left_semi`` are legal: the semi prune drops
    probe rows with no build match, which those join types discard
    anyway — any outer/anti variant would need them kept.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"prefilter_join supports how='inner'/'left_semi', got {how!r}: "
            "the bucket prune removes unmatched probe rows that "
            "outer/anti joins must keep"
        )
    b = F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets))
    buckets = small.select(b.alias("__bucket")).distinct()
    pruned = large.join(
        F.broadcast(buckets), b == F.col("__bucket"), "left_semi"
    )
    return pruned.join(small, key, how)


def choose_join_strategy(
    large: DataFrame,
    key: str,
    sample_fraction: float = 0.05,
    hot_share_factor: float = 4.0,
    seed: int = 42,
) -> dict:
    """Pre-flight skew probe deciding plain vs salted join (the
    key_skew_profile diagnostic wired into a decision).

    Samples the large side (bounded cost at 100 TB: the sample never
    shuffles the full table — partial aggregation reduces to one row per
    sampled key), finds the hottest key's share of rows, and flags
    "salted" when that share exceeds ``hot_share_factor / shuffle
    partitions`` — i.e. when one key's rows would overfill its hash
    task by ~4× the average, the straggler signature AQE skew-split
    may still catch, but a key bigger than one executor's memory
    cannot wait for runtime replanning.

    Returns a decision record (strategy, observed top-key share,
    threshold, sampled row count) — metadata, one driver-side row, the
    same class of statistic AQE itself collects.
    """
    spark = large.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # Cap at 0.5: with few shuffle partitions factor/n_part can reach or
    # exceed 1.0, which no share can beat — yet a key holding half the
    # table is a straggler at ANY partition count.
    threshold = min(hot_share_factor / max(n_part, 1), 0.5)
    sampled = (
        large.sample(fraction=sample_fraction, seed=seed)
        if sample_fraction < 1.0
        else large
    )
    row = (
        sampled.groupBy(key)
        .count()
        .agg(F.max("count").alias("top"), F.sum("count").alias("tot"))
        .first()
    )
    top, tot = row["top"] or 0, row["tot"] or 0
    share = (top / tot) if tot else 0.0
    return {
        "strategy": "salted" if share > threshold else "plain",
        "top_key_share": round(share, 6),
        "threshold": round(threshold, 6),
        "sampled_rows": tot,
    }


def adaptive_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = 16,
    sample_fraction: float = 0.05,
    hot_share_factor: float = 4.0,
) -> DataFrame:
    """Skew-adaptive equi-join: profile the large side's key
    distribution (``choose_join_strategy``), then route through
    ``salted_join`` when one key is hot enough to straggle, else the
    plain Catalyst join (which AQE may still broadcast or skew-split).
    Result is row-identical either way — only the shuffle layout
    differs — so the registered query's oracle is the PLAIN join.

    The probe costs one sampled partial-agg job before planning; at
    100 TB that is noise next to the straggler it prevents, and the
    operator is the form a user actually calls — the profile and the
    salt lever were previously two separate demonstrated pieces.
    """
    # Validate `how` up front against the salted branch's constraint —
    # otherwise a right/full-outer call would succeed or raise
    # DEPENDING ON THE SAMPLED KEY DISTRIBUTION (plain branch accepts
    # it, salted branch rejects it): data-dependent API behavior.
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"adaptive_join does not support how={how!r}: the salted route "
            f"cannot preserve unmatched small-side rows (allowed: {sorted(allowed)})"
        )
    decision = choose_join_strategy(
        large, key, sample_fraction=sample_fraction, hot_share_factor=hot_share_factor
    )
    if decision["strategy"] == "salted":
        return salted_join(large, small, key, salt_buckets=salt_buckets, how=how)
    return large.join(small, key, how)

"""Skew-salting and bucketing: correctness + plan-shape proof."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.scale import (
    bucketed_join,
    prefilter_join,
    salted_join,
    write_bucketed,
)
from shopify_youtube_etl_spark.sources.tables import load_table


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def skewed(spark):
    """95% of fact rows share one key — the straggler scenario."""
    hot = spark.range(9500).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    cold = spark.range(500).select((F.col("id") % 100).alias("k"), F.col("id").alias("payload"))
    fact = hot.unionByName(cold)
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
    return fact, dim


def test_salted_join_row_identical(spark, skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k").select("k", "payload", "name")
    salted = salted_join(fact, dim, "k", salt_buckets=8).select("k", "payload", "name")
    assert salted.count() == plain.count() == 10000
    assert salted.subtract(plain).count() == 0
    assert plain.subtract(salted).count() == 0


def test_salted_join_spreads_hot_key(spark, skewed):
    """The hot key must land in >1 shuffle partition after salting."""
    fact, _ = skewed
    from shopify_youtube_etl_spark.operators.scale import SALT_COL

    salted = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*fact.columns), F.lit(8)).cast("int")
    )
    n_salts = (
        salted.where(F.col("k") == 7).select(SALT_COL).distinct().count()
    )
    assert n_salts > 1  # hot key split across salt buckets


def test_salted_join_splits_hot_key_across_tasks(spark, skewed):
    """VERDICT r2 item #7: the salted PLAN (not just the salt column)
    must place the planted hot key's rows in ≥2 shuffle tasks, with no
    single task holding a straggler share — while the plain shuffle
    join provably lands all of them in ONE task.  Broadcast and AQE are
    disabled so the join is the shuffled kind salting exists for (a
    broadcastable dim needs no salting in the first place)."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact, dim = skewed

        def hot_key_histogram(df):
            rows = (
                df.where(F.col("k") == 7)
                .groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            return {r["pid"]: r["count"] for r in rows}

        plain_hist = hot_key_histogram(fact.join(dim, "k"))
        assert len(plain_hist) == 1  # the straggler: one task, 9500 rows

        salted_hist = hot_key_histogram(salted_join(fact, dim, "k", salt_buckets=8))
        assert len(salted_hist) >= 2, f"hot key not split: {salted_hist}"
        total = sum(salted_hist.values())
        assert total == 9505  # 9500 hot + 5 cold rows with id % 100 == 7
        assert max(salted_hist.values()) / total < 0.5, salted_hist
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    """Matching bucket layout ⇒ SortMergeJoin with no Exchange on
    either side (the amortized-shuffle claim)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_bkt", "o_orderkey", n_buckets=4)
    write_bucketed(li, "lineitem_bkt", "l_orderkey", n_buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "lineitem_bkt", "orders_bkt", "l_orderkey", "o_orderkey")
        plan = _explain(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it still computes the right thing
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + status filter ⇒ PartitionFilters in the
    scan, so non-matching directories are never opened (the partition-
    pruning contract every 100 TB layout depends on)."""
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)

    pruned = spark.read.parquet(out).where(F.col("o_orderstatus") == "O")
    plan = _explain(pruned)
    import re

    assert re.search(r"PartitionFilters: \[.*o_orderstatus#\d+ = O\)", plan)
    assert pruned.count() == orders.where(F.col("o_orderstatus") == "O").count()


def test_chunked_write_max_records(spark, tmp_path):
    """S7 chunked staging (10k-row objects, shopify_etl.py:100-103) via
    maxRecordsPerFile — bounded file sizes without a repartition."""
    out = str(tmp_path / "chunks")
    spark.range(25000).coalesce(1).write.option("maxRecordsPerFile", 10000).json(out)
    import glob

    files = glob.glob(out + "/part-*")
    assert len(files) == 3  # 10k + 10k + 5k


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A filtered dim joined on the fact's partition column must inject
    a dynamicpruning expression into the fact scan — at 100 TB this is
    what keeps a dim-filtered star join from reading every partition."""
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "fact_by_status")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "filled"), ("P", "pending")], "st string, label string"
    )
    j = fact.join(dim.where(F.col("label") == "open"), fact.o_orderstatus == dim.st)
    plan = _explain(j)
    assert "dynamicpruning" in plan.lower()
    assert j.count() == orders.where(F.col("o_orderstatus") == "O").count()


def test_prefilter_join_matches_plain_join(spark, skewed):
    """Bucket prune only drops rows the inner join would drop anyway:
    result must be row-identical to the plain join, including under
    heavy bucket collisions (n_buckets=4 ≪ 100 keys)."""
    fact, dim = skewed
    sparse = dim.where(F.col("k") % 10 == 3)  # selective build side
    for n_buckets in (4, 1 << 16):
        got = prefilter_join(fact, sparse, "k", n_buckets=n_buckets)
        want = fact.join(sparse, "k")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_prefilter_join_rejects_outer_joins(spark, skewed):
    """The semi prune drops unmatched probe rows, so any join type
    that must keep them is rejected loudly instead of corrupted."""
    fact, dim = skewed
    for how in ("left", "right", "full", "left_anti"):
        with pytest.raises(ValueError, match="prefilter_join"):
            prefilter_join(fact, dim, "k", how=how)


def test_hll_rollup_union_matches_exact_within_5pct(spark, sf_dir):
    """The sketch-rollup contract: union of per-day sketches estimates
    the global distinct within HLL_4 lgK=12 error (≪5% at these
    cardinalities), and merging daily sketches equals sketching the
    whole table directly (associativity — the property that makes the
    pre-agg valid at any grain)."""
    from shopify_youtube_etl_spark.plans.registry import all_queries

    row = all_queries()["hll_daily_users_rollup"].fn(spark, sf_dir).collect()[0]
    exact = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert abs(row["union_est"] - exact) <= max(1, 0.05 * exact), (row, exact)
    direct = (
        load_table(spark, sf_dir, "events")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("long").alias("e"))
        .collect()[0]["e"]
    )
    assert row["union_est"] == direct
    assert row["sum_daily_est"] >= row["union_est"]  # repeat visitors double-count


def test_adaptive_join_picks_salted_on_planted_skew(spark, skewed):
    """The decision gate: planted 95%-hot-key skew must route through
    the salted layout, and the result must stay row-identical to the
    plain join (the registered query's oracle contract)."""
    from shopify_youtube_etl_spark.operators.scale import (
        SALT_COL,
        adaptive_join,
        choose_join_strategy,
    )

    fact, dim = skewed
    decision = choose_join_strategy(fact, "k", sample_fraction=1.0)
    assert decision["strategy"] == "salted"
    assert decision["top_key_share"] > decision["threshold"]

    out = adaptive_join(fact, dim, "k", sample_fraction=1.0)
    # plan proof: the salted branch materializes the salt column
    assert SALT_COL in _explain(out)
    plain = fact.join(dim, "k").select("k", "payload", "name")
    routed = out.select("k", "payload", "name")
    assert routed.count() == plain.count()
    assert routed.subtract(plain).count() == 0
    assert plain.subtract(routed).count() == 0


def test_adaptive_join_picks_plain_on_uniform_keys(spark):
    """Uniform keys must NOT pay the salt replication: strategy probe
    says plain and the physical plan carries no salt column."""
    from shopify_youtube_etl_spark.operators.scale import (
        SALT_COL,
        adaptive_join,
        choose_join_strategy,
    )

    fact = spark.range(10000).select((F.col("id") % 100).alias("k"), F.col("id").alias("payload"))
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name"))
    decision = choose_join_strategy(fact, "k", sample_fraction=1.0)
    assert decision["strategy"] == "plain"
    out = adaptive_join(fact, dim, "k", sample_fraction=1.0)
    assert SALT_COL not in _explain(out)
    assert out.count() == 10000


def test_theta_overlap_matches_exact_within_5pct(spark, sf_dir):
    """Theta set algebra vs exact distincts: union, intersection, and
    difference estimates must each land within 5% (at these
    cardinalities the sketch is exact or near-exact)."""
    from shopify_youtube_etl_spark.plans.registry import all_queries

    rows = all_queries()["theta_audience_overlap"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert rows
    for r in rows[:4]:  # bound runtime: 4 pairs × 3 exact set ops
        ua = ev.where(F.col("event_type") == r["type_a"]).select("user_id").distinct()
        ub = ev.where(F.col("event_type") == r["type_b"]).select("user_id").distinct()
        exact_union = ua.union(ub).distinct().count()
        exact_both = ua.intersect(ub).count()
        exact_only_a = ua.exceptAll(ub).count()
        for est, exact in (
            (r["union_users"], exact_union),
            (r["both_users"], exact_both),
            (r["only_a_users"], exact_only_a),
        ):
            assert abs(est - exact) <= max(1, 0.05 * exact), (r, exact)


def test_kll_monthly_quantiles_within_rank_error(spark, sf_dir):
    """Merged per-day KLL sketches must reproduce each month's exact
    p50/p95 within a 2% rank band (KLL k=200 normalized rank error
    ≈1.6%): the estimated quantile VALUE must sit between the exact
    48th-52nd (93rd-97th) percentile values."""
    from shopify_youtube_etl_spark.plans.registry import all_queries

    rows = all_queries()["kll_daily_value_quantiles"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    assert rows
    for r in rows:
        vals = ev.where(F.date_format("ts", "yyyy-MM") == r["month"])
        for q, est in ((0.5, r["p50"]), (0.95, r["p95"])):
            lo, hi = vals.agg(
                F.percentile("value", max(0.0, q - 0.02)).alias("lo"),
                F.percentile("value", min(1.0, q + 0.02)).alias("hi"),
            ).first()
            assert lo - 1e-9 <= est <= hi + 1e-9, (r["month"], q, est, lo, hi)


def test_approx_top_terms_agrees_with_exact_census(spark, sf_dir):
    """The frequent-items sketch must surface the true heavy hitters:
    every token in the EXACT top-10 (ties broken by count only) appears
    in the sketch's top-20, and at this vocabulary size (well inside
    maxItemsTracked) the sketch counts are exact."""
    from pyspark.sql import functions as F

    from shopify_youtube_etl_spark.functions.text import words
    from shopify_youtube_etl_spark.plans.registry import all_queries

    got = {
        r["token"]: r["approx_count"]
        for r in all_queries()["approx_top_terms_sketch"].fn(spark, sf_dir).collect()
    }
    exact = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(F.explode(words(F.col("text"))).alias("tok"))
        .where(F.length("tok") >= 4)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc())
        .limit(10)
        .collect()
    )
    for r in exact:
        assert r["tok"] in got, f"true heavy hitter {r['tok']} missing"
        assert got[r["tok"]] == r["n"], (r["tok"], got[r["tok"]], r["n"])


def test_incremental_hll_maintenance_equals_full_and_reads_state(spark, sf_dir):
    """Sketch-state IVM: (1) the incrementally-maintained per-day
    estimates are EXACTLY the full-recompute estimates (HLL union is
    associative — no approximation drift between the two paths);
    (2) poison pin: dropping a day from the persisted state makes that
    day vanish from the report — the state is genuinely read, never
    silently rebuilt from raw history."""
    import shutil

    from shopify_youtube_etl_spark.plans import scale_ops as so
    from shopify_youtube_etl_spark.plans.common import day_str
    from shopify_youtube_etl_spark.plans.registry import all_queries

    specs = all_queries()
    split = so._hll_split(spark, sf_dir)
    st = so._hll_state_table(spark, sf_dir, split)
    shutil.rmtree(st.path, ignore_errors=True)  # fresh state for this test
    try:
        got = sorted(
            map(
                tuple,
                specs["incremental_hll_maintenance"].fn(spark, sf_dir).collect(),
            )
        )
        full = sorted(
            map(
                tuple,
                load_table(spark, sf_dir, "events")
                .select(day_str(F.col("ts")).alias("day"), "user_id")
                .groupBy("day")
                .agg(
                    F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
                    .cast("long")
                    .alias("users_est")
                )
                .collect(),
            )
        )
        assert got == full

        # Steady state: the first run merged the batch days into state
        # via the segment-pruned upsert; a SECOND run must leave every
        # segment the batch's days don't touch in the manifest by name
        # (the r7-verdict write-amplification fix) and return the same
        # report.
        segs_before = set(st.segments())
        got_again = sorted(
            map(
                tuple,
                specs["incremental_hll_maintenance"].fn(spark, sf_dir).collect(),
            )
        )
        assert got_again == got
        batch_days = {
            r["day"]
            for r in load_table(spark, sf_dir, "events")
            .where(F.col("event_id") >= split)
            .select(day_str(F.col("ts")).alias("day"))
            .distinct()
            .collect()
        }
        def day_range(s):
            return (st._segment_stats(s) or {}).get("day")

        untouched = {
            s
            for s in segs_before
            if day_range(s) is not None
            and not any(
                day_range(s)["min"] <= d <= day_range(s)["max"] for d in batch_days
            )
        }
        assert untouched, "expected at least one day segment the batch misses"
        assert untouched <= set(st.segments()), (
            "day segments the batch doesn't touch were rewritten"
        )

        # Poison: remove the earliest day from the state.  The batch
        # slice (top 20% of event ids) holds only the newest days, so
        # a genuinely-read state means that day VANISHES from the
        # report; a silent rebuild would resurrect it.  (The merge DOES
        # write — it persists the batch days — but only raw history
        # could resurrect the dropped day.)
        first_day = min(d for d, _ in got)
        st.overwrite(st.read().where(F.col("day") != first_day))
        got2 = dict(
            map(
                tuple,
                specs["incremental_hll_maintenance"].fn(spark, sf_dir).collect(),
            )
        )
        assert first_day not in got2, "dropped state day was rebuilt from raw events"
        unpoisoned = {d: e for d, e in got if d != first_day}
        assert got2 == unpoisoned
    finally:
        shutil.rmtree(st.path, ignore_errors=True)


def test_incremental_kll_maintenance_band_poison_and_write_shape(spark, sf_dir):
    """KLL sketch-state IVM pins: (1) per-day maintained p50/p95 sit
    inside the KLL rank-error band of the exact percentiles (exact at
    these per-day cardinalities, where the sketch stores all values);
    (2) n_events is EXACT and totals the corpus; (3) a re-run is
    idempotent (the partials ledger replaces its own batch rows rather
    than double-merging); (4) the history partials segment (batch_id
    -1, disjoint from every batch id) survives the re-run in the
    manifest BY NAME; (5) poison: dropping a history day's partial
    makes the day's counts shrink to the batch's contribution — state
    is read, never rebuilt."""
    import shutil

    from shopify_youtube_etl_spark.plans import scale_ops as so
    from shopify_youtube_etl_spark.plans.common import day_str
    from shopify_youtube_etl_spark.plans.registry import all_queries

    specs = all_queries()
    split = so._hll_split(spark, sf_dir)
    st = so._kll_state_table(spark, sf_dir, split)
    shutil.rmtree(st.path, ignore_errors=True)
    try:
        got = {
            r["day"]: r
            for r in specs["incremental_kll_maintenance"].fn(spark, sf_dir).collect()
        }
        ev = (
            load_table(spark, sf_dir, "events")
            .where(F.col("value").isNotNull())
            .select(day_str(F.col("ts")).alias("day"), "value")
        )
        exact = {
            r["day"]: r
            for r in ev.groupBy("day")
            .agg(
                F.count("*").alias("n"),
                F.expr("percentile(value, 0.5)").alias("p50"),
                F.expr("percentile(value, 0.95)").alias("p95"),
            )
            .collect()
        }
        assert set(got) == set(exact)
        for day, r in got.items():
            e = exact[day]
            assert r["n_events"] == e["n"], (day, r, e)
            # KLL k=200 normalized rank error ~1.65%; per-day counts here
            # are far below the exact-mode threshold, so the estimate
            # must land within a couple of ranks of the true quantile.
            vals = sorted(
                v["value"] for v in ev.where(F.col("day") == day).collect()
            )
            for q, col in ((0.5, "p50"), (0.95, "p95")):
                n = len(vals)
                lo = vals[max(0, int((q - 0.04) * n) - 1)]
                hi = vals[min(n - 1, int((q + 0.04) * n) + 1)]
                assert lo <= r[col] <= hi, (day, col, r[col], lo, hi)

        hist_segs = {
            s
            for s in st.segments()
            if (st._segment_stats(s) or {}).get("batch_id", {}).get("max") == -1
        }
        assert hist_segs, "expected a stats-bearing history partials segment"
        rerun = {
            r["day"]: r
            for r in specs["incremental_kll_maintenance"].fn(spark, sf_dir).collect()
        }
        assert {d: tuple(r) for d, r in rerun.items()} == {
            d: tuple(r) for d, r in got.items()
        }, "re-merge double-counted the batch"
        assert hist_segs <= set(st.segments()), (
            "history partials were rewritten by a disjoint batch merge"
        )

        # Poison: drop the earliest day's HISTORY partial.  The day had
        # history events, so a genuinely-read state under-counts it now;
        # a silent rebuild would restore the full count.
        first_day = min(got)
        st.overwrite(
            st.read().where(
                ~((F.col("batch_id") == -1) & (F.col("day") == first_day))
            )
        )
        got2 = {
            r["day"]: r
            for r in specs["incremental_kll_maintenance"].fn(spark, sf_dir).collect()
        }
        hist_n = (
            load_table(spark, sf_dir, "events")
            .where(
                (F.col("event_id") < split)
                & F.col("value").isNotNull()
                & (day_str(F.col("ts")) == first_day)
            )
            .count()
        )
        assert hist_n > 0, "poison day has no history contribution to lose"
        if first_day in got2:
            assert got2[first_day]["n_events"] == got[first_day]["n_events"] - hist_n
        else:
            assert got[first_day]["n_events"] == hist_n
    finally:
        shutil.rmtree(st.path, ignore_errors=True)

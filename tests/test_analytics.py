"""Semantic properties of the analytic-SQL extension queries.

Oracle parity is the driver's job; these tests pin the properties the
hash can't see — as-of causality, session monotonicity, grouping-set
plan shape — on sf0.001 for speed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shopify_youtube_etl_spark.plans.registry import all_queries

SPECS = all_queries()


def test_asof_attribution_is_causal(spark, sf_dir):
    """Every attributed click must exist, be by the same user, and be
    at-or-before the purchase — the defining as-of property."""
    out = SPECS["asof_click_attribution"].fn(spark, sf_dir)
    from shopify_youtube_etl_spark.sources.tables import load_table

    clicks = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("last_click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = out.where(F.col("last_click_id").isNotNull()).join(clicks, "last_click_id", "left")
    bad = joined.where(
        F.col("cu").isNull()
        | (F.col("cu") != F.col("user_id"))
        | (F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS") > F.col("purchase_ts"))
    ).count()
    assert bad == 0

    n_purchases = (
        load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase").count()
    )
    assert out.count() == n_purchases  # every purchase exactly once


def test_sessionize_bounds(spark, sf_dir):
    rows = SPECS["sessionize_gaps_islands"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_sessions"] <= r["n_events"]
        assert r["max_session_events"] <= r["n_events"]


def test_grouping_sets_single_expand(spark, sf_dir):
    """All three granularities must come from ONE Expand+Aggregate —
    not a UNION of three scans (the 100 TB scan-saving claim)."""
    df = SPECS["grouping_sets_revenue"].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "Expand" in plan and "Union" not in plan
    # formatted mode prints each scan twice (tree + detail); Location
    # lines appear once per physical scan: orders + customer + nation.
    assert plan.count("Location: InMemoryFileIndex") == 3


def test_set_ops_disjoint(spark, sf_dir):
    """INTERSECT and EXCEPT of the same two sets must be disjoint and
    together cover the 1996 buyer set exactly."""
    inter = {r["o_custkey"] for r in SPECS["intersect_repeat_buyers"].fn(spark, sf_dir).collect()}
    exc = {r["o_custkey"] for r in SPECS["except_churned_buyers"].fn(spark, sf_dir).collect()}
    assert not (inter & exc)
    from shopify_youtube_etl_spark.sources.tables import load_table

    y96 = {
        r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01"))
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert inter | exc == y96

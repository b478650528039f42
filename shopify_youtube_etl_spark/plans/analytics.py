"""Analytic-SQL extensions (SURVEY.md §2.4/§2.5 extension scope).

The reference's analytics ambitions (README.md:49-52 "revenue trends,
customer behavior") stop at GROUP BY because BigQuery supplies the
rest; these queries declare the rest natively: grouping sets / cube,
running totals, lag/lead deltas, rank/ntile, pivot, exact percentiles,
as-of join, range join, gaps-and-islands sessionization, and
INTERSECT/EXCEPT — all stock Catalyst plans with DuckDB oracles.

Scale notes are per-query; the common theme is one shuffle on the
partition/grouping key and window functions only over already-reduced
or per-key data (never a global unpartitioned window over raw rows —
except day-grain series whose cardinality is ~365·years regardless of
input scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shopify_youtube_etl_spark.functions.text import words
from shopify_youtube_etl_spark.plans.common import day_str, epoch_day, money, t, ts_str
from shopify_youtube_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Grouping sets / cube
# ---------------------------------------------------------------------------


@query(
    "cube_status_priority",
    ref="SURVEY §2.4 extension (cube is free in Spark); generalizes A1/A7",
    doc="CUBE(status, priority) with grouping_id disambiguating subtotal levels.",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')    AS status,
       coalesce(o_orderpriority, 'ALL')  AS priority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT)          AS n_orders,
       round(sum(o_totalprice), 2)       AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping_id() distinguishes a real NULL group from a subtotal
    row — required for correct sentinel-filling (the ROLLUP query
    relies on the data having no NULL keys; this one does not)."""
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.col("gid").cast("long"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "grouping_sets_revenue",
    ref="SURVEY §2.4 extension (grouping sets)",
    doc="Explicit GROUPING SETS ((segment, nation), (segment), ()) over a broadcast star join.",
    oracle="""
SELECT coalesce(c_mktsegment, 'ALL') AS segment,
       coalesce(n_name, 'ALL')       AS nation,
       CAST(count(*) AS BIGINT)      AS n_orders,
       round(sum(o_totalprice), 2)   AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), ())
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 DataFrame.groupingSets — one shuffle produces all three
    granularities (Catalyst expands to a single Expand+Aggregate, not
    three scans; at 100 TB that's a 3× scan saving over UNION ALL)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.groupingSets(
            [["c_mktsegment", "n_name"], ["c_mktsegment"], []],
            "c_mktsegment",
            "n_name",
        )
        .agg(F.count("*").alias("n_orders"), money(F.sum("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Analytic window functions
# ---------------------------------------------------------------------------


@query(
    "running_revenue_by_day",
    ref="SURVEY §2.5 extension — running total over the A7 day series",
    doc="Cumulative daily revenue: agg to day grain, then windowed running sum.",
    oracle="""
SELECT day,
       daily_value,
       round(sum(daily_value) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
FROM (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           round(sum(value), 2)                        AS daily_value
    FROM events
    GROUP BY 1
)
""",
)
def running_revenue_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unpartitioned window runs over the ALREADY-AGGREGATED day
    series (~30 rows/month regardless of raw scale), so the single-
    partition window stage is O(days), never O(events)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(day_str(F.col("ts")).alias("day"))
        .agg(money(F.sum("value")).alias("daily_value"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select("day", "daily_value", money(F.sum("daily_value").over(w)).alias("running_value"))


@query(
    "day_over_day_delta",
    ref="SURVEY §2.5 extension — lag/lead over the A7 day series",
    doc="Day-over-day event-count delta and next-day preview via lag/lead.",
    oracle="""
SELECT day,
       n_events,
       CAST(n_events - lag(n_events) OVER (ORDER BY day) AS BIGINT)  AS delta_vs_prev,
       CAST(lead(n_events) OVER (ORDER BY day) AS BIGINT)            AS next_day_events
FROM (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT)                    AS n_events
    FROM events
    GROUP BY 1
)
""",
)
def day_over_day_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(day_str(F.col("ts")).alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n_events",
        (F.col("n_events") - F.lag("n_events").over(w)).cast("long").alias("delta_vs_prev"),
        F.lead("n_events").over(w).cast("long").alias("next_day_events"),
    )


@query(
    "ranked_customers_per_segment",
    ref="SURVEY §2.5 extension — rank family partitioned by key",
    doc="Top-5 customers by balance per market segment with rank/dense_rank/ntile.",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal, rnk, drnk, quartile
FROM (
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile,
           row_number()      OVER w            AS rn
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
)
WHERE rn <= 5
""",
)
def ranked_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on the segment key serves all four rank functions
    (same WINDOW spec ⇒ Catalyst computes them in a single Window
    physical node)."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Pivot / percentiles
# ---------------------------------------------------------------------------


@query(
    "pivot_status_counts",
    ref="SURVEY §2.4 extension — pivot (conditional aggregation)",
    doc="Order counts per priority pivoted by status (= FILTERed aggregates).",
    oracle="""
SELECT o_orderpriority                                            AS priority,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT)      AS n_f,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT)      AS n_o,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT)      AS n_p,
       round(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 2)   AS open_value
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot-value list ('F','O','P') keeps the plan a single
    partial-aggregating pass — omitting it would force a distinct-scan
    to discover values first (two jobs; never do that at 100 TB)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_o"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_p"),
        money(F.sum(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")))).alias("open_value"),
    )


@query(
    "percentile_order_value",
    ref="SURVEY §2.4 extension — exact percentiles per group",
    doc="Exact continuous p50/p90/p99 of order value per status.",
    oracle="""
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
       round(avg(o_totalprice), 4)                 AS mean
FROM orders
GROUP BY o_orderstatus
""",
)
def percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact `percentile` (interpolated, matches quantile_cont) for
    oracle parity; at 100 TB swap to approx_percentile — same plan
    shape, sketch-mergeable instead of full-sort-per-group."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
            F.round(F.avg("o_totalprice"), 4).alias("mean"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join / range join / sessionization
# ---------------------------------------------------------------------------


@query(
    "asof_click_attribution",
    ref="custom-operator class (b): as-of join as a composition of DataFrame ops",
    doc="For each purchase, the latest click by the same user at-or-before it (as-of backward join).",
    oracle="""
SELECT event_id AS purchase_id,
       user_id,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       last_click_id
FROM (
    SELECT event_id, user_id, ts, is_probe,
           last_value(CASE WHEN is_probe = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, is_probe, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id
    FROM (
        SELECT event_id, user_id, ts, 0 AS is_probe FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, user_id, ts, 1 AS is_probe FROM events WHERE event_type = 'purchase'
    )
)
WHERE is_probe = 1
""",
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join via the union-and-carry-forward pattern:
    union both sides tagged probe/build, ONE shuffle on the join key,
    sort within partition by (ts, tag), carry the last build row
    forward with last(ignorenulls).  This is the scalable formulation —
    the naive inequality join (probe × all-earlier-build) is O(n·m)
    per key; this is O((n+m) log(n+m)) and never widens rows.
    Ties: a click at exactly the purchase ts attributes (tag orders the
    click first), matching DuckDB ASOF >= semantics."""
    e = t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_probe")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_probe")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(purchases).withColumn(
        "last_click_id",
        F.last(F.when(F.col("is_probe") == 0, F.col("event_id")), ignorenulls=True).over(w),
    )
    return carried.where(F.col("is_probe") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        ts_str(F.col("ts")).alias("purchase_ts"),
        "last_click_id",
    )


@query(
    "range_join_value_bands",
    ref="custom-operator class (a): range join against a broadcast band table",
    doc="Events bucketed into value bands via inequality join (lo <= value < hi).",
    oracle="""
SELECT band,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2)     AS band_value
FROM events
JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1000.0))
     AS bands(band, lo, hi)
  ON value >= lo AND value < hi
GROUP BY band
""",
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The band table is a literal — broadcast it so the inequality
    join plans as BroadcastNestedLoopJoin over 3 rows (per-row band
    probe), never a shuffle CartesianProduct.  Equivalently at scale:
    a width_bucket-style CASE projection; the join form generalizes to
    data-driven band tables."""
    bands = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1000.0)],
        "band string, lo double, hi double",
    )
    e = t(spark, sf_dir, "events")
    return (
        e.join(F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_events"), money(F.sum("value")).alias("band_value"))
    )


@query(
    "sessionize_gaps_islands",
    ref="SURVEY §2.10 sessionization, batch form (gaps-and-islands)",
    doc="Per-user session stats with 30-minute inactivity gap (lag + cumulative flag sum).",
    oracle="""
SELECT user_id,
       CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT)                   AS n_events,
       CAST(max(session_len) AS BIGINT)           AS max_session_events
FROM (
    SELECT user_id, session_id, count(*) OVER (PARTITION BY user_id, session_id) AS session_len
    FROM (
        SELECT user_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             <= INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS is_new
            FROM events
        )
    )
)
GROUP BY user_id
""",
)
def sessionize_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin of session_window_30m: flag rows whose gap from
    the previous event exceeds 30 min, cumulative-sum the flags into
    session ids.  All three windows share PARTITION BY user_id ⇒ one
    shuffle total; per-user data sorts once in-partition."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Compare at microsecond precision (unix_micros), NOT cast-to-long
    # seconds: truncation would misclassify sub-second gaps straddling
    # the 30-minute boundary and break parity with the oracle's exact
    # interval comparison.
    us = F.unix_micros(F.col("ts"))
    gap_ok = us - F.lag(us).over(by_user) <= 1_800_000_000
    sessions = (
        t(spark, sf_dir, "events")
        .withColumn("is_new", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)))
        .withColumn(
            "session_id",
            F.sum("is_new").over(by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    per_session = Window.partitionBy("user_id", "session_id")
    return (
        sessions.withColumn("session_len", F.count("*").over(per_session))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
            F.max("session_len").alias("max_session_events"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations / semi joins
# ---------------------------------------------------------------------------


@query(
    "union_distinct_active_keys",
    ref="SURVEY §2.7 gap (UNION DISTINCT) — completes the set-op family",
    doc="UNION DISTINCT of customer keys active in 1996 or 1997 (dedup across branches).",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                               AND o_orderdate <  TIMESTAMP '1997-01-01'
UNION
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                               AND o_orderdate <  TIMESTAMP '1998-01-01'
""",
)
def union_distinct_active_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) = unionByName + distinct; Catalyst plans the
    dedup as one hash aggregate over the concatenated inputs — same
    single shuffle as a plain distinct, not one per branch."""
    o = t(spark, sf_dir, "orders")
    y96 = o.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    y97 = o.where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    return y96.unionByName(y97).distinct()


@query(
    "intersect_repeat_buyers",
    ref="SURVEY §2.7 gap (INTERSECT) — customers active in both 1996 and 1997",
    doc="INTERSECT of per-year customer key sets.",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                               AND o_orderdate <  TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                               AND o_orderdate <  TIMESTAMP '1998-01-01'
""",
)
def intersect_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    y96 = o.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    y97 = o.where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    return y96.intersect(y97)


@query(
    "except_churned_buyers",
    ref="SURVEY §2.7 gap (EXCEPT) — 1996 customers gone in 1997",
    doc="EXCEPT of per-year customer key sets (distinct semantics).",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                               AND o_orderdate <  TIMESTAMP '1997-01-01'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                               AND o_orderdate <  TIMESTAMP '1998-01-01'
""",
)
def except_churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    y96 = o.where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    y97 = o.where(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_custkey")
    return y96.subtract(y97)


@query(
    "below_avg_quantity_revenue",
    ref="SURVEY §2.4 extension — correlated aggregate filter (per-key avg as join)",
    doc="Revenue from line items whose quantity is under 20% of their part's average (decorrelated as agg + join).",
    oracle="""
SELECT CAST(count(*) AS BIGINT)                 AS n_items,
       round(sum(l_extendedprice) / 7.0, 2)     AS avg_yearly
FROM lineitem
JOIN (
    SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_cut
    FROM lineitem
    GROUP BY l_partkey
) ON l_partkey = pk
WHERE l_quantity < qty_cut
""",
)
def below_avg_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-subquery pattern (`WHERE qty < (SELECT 0.2*avg
    ... same part)`) decorrelated the way Catalyst itself would: one
    partial-aggregating pass builds the per-key cutoff, then an
    equi-join filters the fact side — two shuffles on the same key,
    AQE-coalesced.  Never a per-row subquery execution."""
    li = t(spark, sf_dir, "lineitem")
    cuts = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(cuts, li.l_partkey == cuts.pk)
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
        )
    )


@query(
    "order_count_distribution",
    ref="SURVEY §2.4 extension — distribution of per-key counts (left join + double group)",
    doc="How many customers placed exactly N orders, including N=0 (left outer join, two-level group).",
    oracle="""
SELECT n_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM (
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
GROUP BY n_orders
""",
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(col) over a left join counts only matched rows, so
    customers with no orders land in the N=0 bucket — the null-aware
    aggregate the anti-join queries (J1/J2) special-case."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


# One SQL text, two engines: the reference's entire relational layer is
# SQL strings issued to BigQuery (SURVEY §3 "query IR is f-string SQL");
# this query keeps that entry point alive — spark.sql() over registered
# views runs the IDENTICAL string DuckDB runs as the oracle.
_NATION_RANK_SQL = """
WITH nation_rev AS (
    SELECT n_name                                            AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)        AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
)
SELECT nation, revenue, n_orders,
       CAST(rank() OVER (ORDER BY revenue DESC) AS BIGINT) AS rev_rank
FROM nation_rev
"""


@query(
    "sql_nation_rank",
    ref="SURVEY §3 — SQL-text entry point (the reference's query IR), run via spark.sql",
    doc="CTE + star join + window rank submitted as raw SQL text; the oracle runs the identical string.",
    oracle=_NATION_RANK_SQL,
)
def sql_nation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst parses/optimizes the same text DuckDB runs — SQL and
    DataFrame APIs converge on the same logical plan, so every plan
    property (pushdown, broadcast, rank-sort) holds here too.  Only the
    four referenced tables are registered, through the SHARED
    ``ensure_views`` state (sources/tables.py): profiling at sf0.1
    showed the 4× parquet footer read cost ~0.4 s/call, but a private
    memo went stale the moment another caller (register_testdata_views)
    re-pointed the same view names at a different sf_dir — the shared
    per-view bookkeeping plus a catalog existence check (covers
    newSession, where temp views don't carry over) keeps the saving
    without the staleness."""
    from shopify_youtube_etl_spark.sources.tables import ensure_views

    ensure_views(spark, sf_dir, ("lineitem", "orders", "customer", "nation"))
    return spark.sql(_NATION_RANK_SQL)


@query(
    "param_sql_segment_topk",
    ref="D1 (shopify_etl.py:212-229 ScalarQueryParameter) — parameterized SQL text with NAMED parameters, the injection-safe form the reference uses for its INSERT",
    doc="Top-5 customers by account balance within a parameterized market segment and balance floor, via spark.sql(sql, args={...}); oracle inlines the same literals.",
    oracle="""
SELECT c_custkey,
       c_name,
       round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 1000.0
ORDER BY c_acctbal DESC, c_custkey
LIMIT 5
""",
)
def param_sql_segment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference binds its INSERT values through
    ScalarQueryParameter rather than string formatting
    (shopify_etl.py:219-226); Spark's equivalent is named-parameter
    ``spark.sql`` — parameter markers typed and bound engine-side, so
    a segment name with a quote in it can't break the statement.  The
    markers land in the plan as LITERALS (a filter Catalyst pushes into
    the scan, a limit that plans as TakeOrderedAndProject), identical
    to the inlined form the oracle runs — parameterization is a
    binding-safety feature, never a plan barrier."""
    from shopify_youtube_etl_spark.sources.tables import ensure_views

    ensure_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
SELECT c_custkey,
       c_name,
       round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_mktsegment = :segment AND c_acctbal >= :floor
ORDER BY c_acctbal DESC, c_custkey
LIMIT :k
""",
        args={"segment": "BUILDING", "floor": 1000.0, "k": 5},
    )


@query(
    "pipe_syntax_revenue",
    ref="SURVEY §3 SQL-text entry point, Spark 4 pipe-syntax form — the linear |> dialect lowered onto the same Catalyst plan as the ANSI form",
    doc="Filter |> join |> extend |> aggregate |> select |> order written in SQL pipe syntax; the oracle is the equivalent ANSI statement.",
    oracle="""
SELECT c_mktsegment                        AS segment,
       CAST(count(*) AS BIGINT)            AS n_orders,
       round(sum(o_totalprice * 0.9), 2)   AS net_revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= DATE '1995-01-01'
GROUP BY c_mktsegment
""",
)
def pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-shaped SQL dialect (Spark 4 pipe operators): each
    ``|>`` stage consumes the previous stage's rows, so the text reads
    in EXECUTION order — the form ETL authors actually think in.  The
    stages here cover the operator chain end to end: WHERE before the
    JOIN (so the pushdown is syntactically explicit), EXTEND for the
    derived column, AGGREGATE/GROUP BY, a renaming SELECT, ORDER BY.
    Catalyst lowers the pipe form to exactly the logical plan the ANSI
    statement produces — same pushed filter, same broadcast-able join,
    same partial aggregation — which the oracle equality demonstrates:
    the dialect is surface syntax, not a different engine path."""
    from shopify_youtube_etl_spark.sources.tables import ensure_views

    ensure_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
FROM orders
|> WHERE o_orderdate >= DATE '1995-01-01'
|> JOIN customer ON o_custkey = c_custkey
|> EXTEND o_totalprice * 0.9 AS net_price
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(SUM(net_price), 2) AS net_revenue
   GROUP BY c_mktsegment
|> SELECT c_mktsegment AS segment, n_orders, net_revenue
"""
    )


@query(
    "moving_average_7d",
    ref="SURVEY §2.5 extension — RANGE-framed window (value-based frame vs ROWS)",
    doc="7-day moving average of daily revenue using a RANGE frame over day numbers (gaps in the series handled correctly).",
    oracle="""
SELECT day,
       daily_value,
       round(avg(daily_value) OVER (ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma_7d
FROM (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')             AS day,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(min(CAST(ts AS TIMESTAMP)) AS DATE)) AS BIGINT) AS day_num,
           round(sum(value), 2)                                    AS daily_value
    FROM events
    GROUP BY 1
)
""",
)
def moving_average_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame, not ROWS: a missing day in the series
    still bounds the window to the true 7 calendar days — the ROWS
    formulation silently widens over gaps.  Ordering key is the epoch
    day number so the frame arithmetic is numeric on both engines."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(day_str(F.col("ts")).alias("day"))
        .agg(
            epoch_day(F.min(F.col("ts").cast("date"))).alias("day_num"),
            money(F.sum("value")).alias("daily_value"),
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day", "daily_value", F.round(F.avg("daily_value").over(w), 4).alias("ma_7d")
    )


@query(
    "edit_distance_pairs",
    ref="near-dup family — character-level edit distance (levenshtein)",
    doc="Pairwise Levenshtein distance + normalized similarity over 80-char prefixes of a probe slice.",
    oracle="""
WITH p AS (
    SELECT doc_id,
           regexp_replace(substr(text, 1, 80), '[^\\x00-\\x7F]', '?', 'g') AS prefix
    FROM documents WHERE doc_id % 100 = 0
)
SELECT a.doc_id AS id_a,
       b.doc_id AS id_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist,
       round(1.0 - levenshtein(a.prefix, b.prefix)
             / greatest(strlen(a.prefix), strlen(b.prefix), 1), 6) AS similarity
FROM p a JOIN p b ON a.doc_id < b.doc_id
""",
)
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup: O(n·m) per pair, so inputs are bounded
    (80-char prefixes, probe slice) — the production pattern gates
    expensive edit distance BEHIND a cheap candidate filter (LSH or
    fingerprint equality), never all-pairs over full texts."""
    p = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 100 == 0)
        .select(
            "doc_id",
            # ASCII-sanitize: DuckDB levenshtein/strlen count BYTES,
            # Spark's count CHARS — identical only when every char is
            # one byte, so non-ASCII folds to '?' on both engines.
            F.regexp_replace(F.substring("text", 1, 80), r"[^\x00-\x7F]", "?").alias("prefix"),
        )
    )
    a = p.select(F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = p.select(F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    lev = F.levenshtein(F.col("pa"), F.col("pb"))
    return (
        F.broadcast(a)
        .crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            lev.cast("long").alias("edit_dist"),
            F.round(
                1.0 - lev / F.greatest(F.length("pa"), F.length("pb"), F.lit(1)), 6
            ).alias("similarity"),
        )
    )


@query(
    "datetime_functions",
    ref="F6/F7 generalization — calendar function pack (trunc, ISO week/dow, quarter, epoch days)",
    doc="Calendar projections of order dates: week start, ISO week/day-of-week, quarter, epoch day number.",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d')                          AS order_day,
       strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')      AS week_start,
       CAST(week(o_orderdate) AS BIGINT)                          AS iso_week,
       CAST(isodow(o_orderdate) AS BIGINT)                        AS iso_dow,
       CAST(quarter(o_orderdate) AS BIGINT)                       AS qtr,
       CAST(date_diff('day', DATE '1970-01-01',
                      CAST(o_orderdate AS DATE)) AS BIGINT)       AS epoch_day
FROM orders
WHERE o_orderkey % 20 = 0
""",
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar functions with cross-engine-identical conventions:
    date_trunc('week') → Monday on both; Spark weekday() is 0=Monday so
    +1 matches DuckDB isodow; weekofyear is ISO week on both."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        day_str(d).alias("order_day"),
        F.date_format(F.date_trunc("week", d), "yyyy-MM-dd").alias("week_start"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        (F.weekday(d) + 1).cast("long").alias("iso_dow"),
        F.quarter(d).cast("long").alias("qtr"),
        epoch_day(d.cast("date")).alias("epoch_day"),
    )


@query(
    "array_functions",
    ref="SURVEY §2.8 extension — array + higher-order functions (collect, sort, filter, fold)",
    doc="Per-customer order-total arrays: sorted collect, lambda filter, lambda fold — the array surface as one query.",
    oracle="""
SELECT o_custkey,
       CAST(len(totals) AS BIGINT)                                     AS n_orders,
       round(totals[1], 2)                                             AS smallest,
       round(list_aggregate(list_filter(totals, x -> x > 100000),
                            'sum'), 2)                                 AS big_order_sum
FROM (
    SELECT o_custkey, list_sort(list(o_totalprice)) AS totals
    FROM orders
    GROUP BY o_custkey
)
WHERE o_custkey % 10 = 0
""",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is UNORDERED (shuffle arrival order) — array_sort
    immediately after is what makes the array deterministic and
    hash-comparable; the lambda filter/fold then run map-side over the
    materialized array.  Note DuckDB list_aggregate('sum') of an empty
    list yields NULL, as does folding nothing here (start NULL-safe)."""
    agg = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 10 == 0)
        .groupBy("o_custkey")
        .agg(F.array_sort(F.collect_list("o_totalprice")).alias("totals"))
    )
    big = F.filter(F.col("totals"), lambda x: x > 100000)
    return agg.select(
        "o_custkey",
        F.size("totals").cast("long").alias("n_orders"),
        money(F.element_at("totals", 1)).alias("smallest"),
        money(
            F.when(
                F.size(big) > 0,
                F.aggregate(big, F.lit(0.0), lambda acc, x: acc + x),
            )
        ).alias("big_order_sum"),
    )


@query(
    "json_extraction",
    ref="F9/F10 generalization — semi-structured JSON column extraction + aggregate",
    doc="Parse the events.props JSON string, extract $.k, aggregate per event type.",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT)                              AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6)       AS k_avg
FROM events
GROUP BY event_type
""",
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured metadata parsing — the training-pipeline staple.
    get_json_object extracts without declaring a full schema; at scale
    prefer from_json with an explicit schema once the shape is known
    (single parse, typed columns, Catalyst pruning)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("k_sum"),
        F.round(F.avg(k), 6).alias("k_avg"),
    )


@query(
    "stats_profile",
    ref="SURVEY §2.4 extension — statistical aggregates (stddev/variance/corr/covar)",
    doc="Per-returnflag dispersion and correlation statistics over lineitem.",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)                            AS n_rows,
       round(stddev_samp(l_extendedprice), 4)              AS price_stddev,
       round(var_samp(l_quantity), 4)                      AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6)         AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4)   AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
""",
)
def stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion + bivariate stats in one grouped pass — all
    sketch-mergeable aggregates (sum/sum-of-squares/cross-products), so
    Catalyst computes them with ordinary partial aggregation: one
    shuffle of tiny per-group states regardless of input size."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
    )


@query(
    "posexplode_tokens",
    ref="N1 generalization — ordinal explode (position-preserving array fan-out)",
    doc="posexplode of document token arrays: one row per (doc, position, token).",
    oracle="""
WITH base AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
    FROM documents WHERE doc_id % 50 = 0
)
SELECT doc_id,
       CAST(r['pos'] AS BIGINT) AS pos,
       r['word']                AS token
FROM (
    SELECT doc_id,
           unnest(list_transform(ws, (w, i) -> {'pos': i - 1, 'word': w})) AS r
    FROM base
)
""",
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode — position survives the fan-out, which plain
    explode discards; required whenever downstream logic is
    order-sensitive (n-gram reconstruction, positional features)."""
    return (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 50 == 0)
        .select("doc_id", F.posexplode(words(F.col("text"))).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("long"), "token")
    )


@query(
    "semi_join_urgent_customers",
    ref="SURVEY §2.3 gap (semi join) — EXISTS as left_semi",
    doc="Customers with at least one urgent open order, via left-semi join.",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
""",
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi returns each probe row at most once without widening —
    Catalyst never materializes the match, so no post-join distinct is
    needed (the EXISTS plan, natively)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@query(
    "funnel_conversion",
    ref="SURVEY §2.5 extension — ordered event funnel (view → click → purchase)",
    doc="Users reaching each funnel stage in time order, with conversion rates.",
    oracle="""
WITH v AS (
    SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
    GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT)            AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT)            AS n_view_click,
       CAST((SELECT count(*) FROM p) AS BIGINT)            AS n_full_funnel,
       round((SELECT count(*) FROM c) * 1.0
             / greatest((SELECT count(*) FROM v), 1), 6)   AS view_to_click,
       round((SELECT count(*) FROM p) * 1.0
             / greatest((SELECT count(*) FROM c), 1), 6)   AS click_to_purchase
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with ONE shuffle: three window passes over the
    same user_id partitioning compute first-view, first-click-after-
    view, first-purchase-after-click without re-shuffling (the oracle's
    three-CTE join chain states the same semantics relationally).  The
    final global rollup reduces per-user flags map-side to a single
    row, so the unpartitioned stage sees O(partitions) rows — the
    standard product-analytics funnel at event-log scale."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.max(F.col("t_view").isNotNull()).alias("has_view"),
            F.max(F.col("t_click").isNotNull()).alias("has_click"),
            F.max(F.col("t_purchase").isNotNull()).alias("has_purchase"),
        )
    )
    n_view = F.sum(F.col("has_view").cast("long"))
    n_click = F.sum(F.col("has_click").cast("long"))
    n_purch = F.sum(F.col("has_purchase").cast("long"))
    return staged.agg(
        n_view.alias("n_view"),
        n_click.alias("n_view_click"),
        n_purch.alias("n_full_funnel"),
        F.round(n_click / F.greatest(n_view, F.lit(1)), 6).alias("view_to_click"),
        F.round(n_purch / F.greatest(n_click, F.lit(1)), 6).alias("click_to_purchase"),
    )


@query(
    "rolling_distinct_users_7d",
    ref="SURVEY §2.5 extension — rolling exact distinct over a calendar range",
    doc="Per day: exact distinct users active in the trailing 7-day window.",
    oracle="""
WITH du AS (
    SELECT DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d, user_id
    FROM events
),
days AS (SELECT DISTINCT d FROM du)
SELECT strftime(days.d, '%Y-%m-%d')              AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS users_7d
FROM days JOIN du
  ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY 1
""",
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) has no window form in either engine, so the
    rolling window is expressed as a range join of the (tiny) day
    spine against the deduplicated (day, user) pairs — the join fans
    each pair out at most 7×, then one exact distinct agg per day.
    Scale shape: |du| ≤ days × daily_actives (already deduplicated —
    NOT the raw event log), the day spine broadcasts, and the agg
    shuffles on day.  For approximate needs at extreme scale, swap the
    exact distinct for per-day HLL sketch unions."""
    e = t(spark, sf_dir, "events")
    du = e.select(
        epoch_day(F.col("ts")).alias("d"), day_str(F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = du.select("d", "day").distinct()
    pairs = F.broadcast(days.select(F.col("d").alias("spine_d"), "day")).join(
        du.select("d", "user_id"),
        (F.col("d") >= F.col("spine_d") - 6) & (F.col("d") <= F.col("spine_d")),
    )
    return (
        pairs.groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select("day", "users_7d")
    )


@query(
    "lateral_top3_orders_per_customer",
    ref="SURVEY §2.3 extension — correlated LATERAL subquery with per-group LIMIT",
    doc="Each customer's top-3 orders by price via LATERAL (decorrelated by Catalyst).",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 3
) o
""",
)
def lateral_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-surface twin of the window-function top-k: Catalyst
    decorrelates the LATERAL subquery into a join + per-key window
    (no per-customer re-execution), so the physical plan matches the
    hand-written row_number formulation — same single shuffle on the
    correlation key at scale.  Registered to prove the engine's SQL
    entry point covers correlated table subqueries, not just the
    DataFrame API."""
    from shopify_youtube_etl_spark.sources.tables import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) o
        """
    )


@query(
    "order_value_extremes_per_segment",
    ref="SURVEY §2.5 completion — first_value/last_value/nth_value over full frames",
    doc="Per market segment: cheapest, priciest, and second-cheapest order via value-window functions.",
    oracle="""
SELECT DISTINCT c_mktsegment,
       round(first_value(o_totalprice) OVER w, 2)    AS cheapest,
       round(nth_value(o_totalprice, 2) OVER w, 2)   AS second_cheapest,
       round(last_value(o_totalprice) OVER w, 2)     AS priciest
FROM orders JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def order_value_extremes_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-window functions over an explicit UNBOUNDED/UNBOUNDED frame
    — the family (first_value, last_value, nth_value) the rank/offset
    queries don't touch, with the classic last_value pitfall handled:
    the default frame stops at CURRENT ROW, so last_value would echo
    each row's own value unless the full frame is spelled out.  Orders
    shuffle once on the (broadcast-joined) segment key; the tie-break
    on o_orderkey makes every output deterministic."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            money(F.first("o_totalprice").over(w)).alias("cheapest"),
            money(F.nth_value("o_totalprice", 2).over(w)).alias("second_cheapest"),
            money(F.last("o_totalprice").over(w)).alias("priciest"),
        )
        .distinct()
    )


@query(
    "scd2_status_history",
    ref="warehouse staple the reference's final tables lack — slowly-changing-dimension type 2 from an event log",
    doc="SCD2 validity intervals per customer from order-status changes; per status: version count, open versions, closed days.",
    oracle="""
WITH h AS (
    SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
           lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_status
    FROM orders
),
chg AS (
    SELECT * FROM h WHERE prev_status IS NULL OR prev_status <> o_orderstatus
),
v AS (
    SELECT o_custkey, o_orderstatus,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS DATE) AS valid_to
    FROM chg
)
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(count(*) FILTER (WHERE valid_to IS NULL) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 0
                     ELSE date_diff('day', valid_from, valid_to) END)
            AS BIGINT) AS closed_days
FROM v GROUP BY status
""",
)
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from a change log: a
    customer's order-status runs collapse into versioned rows with
    [valid_from, valid_to) — valid_to NULL for the open version — then
    a compact per-status profile so the hash is stable.  The change
    detection is lag() over (customer, orderdate, orderkey) — the
    deterministic tie-break matters, or same-day orders would make the
    version set engine-dependent.  Scale: both windows share ONE
    partitioning (o_custkey), so Catalyst plans a single shuffle +
    sort and the lead() reuses the lag()'s sort order."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .where(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
    )
    versions = chg.select(
        "o_custkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("valid_from"),
        F.to_date(F.lead("o_orderdate").over(w)).alias("valid_to"),
    )
    return versions.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n_versions"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias("n_open"),
        F.sum(
            F.when(F.col("valid_to").isNull(), 0).otherwise(
                F.datediff("valid_to", "valid_from")
            )
        ).alias("closed_days"),
    )


_PAGERANK_ITER_SQL = """
SELECT n.node,
       (1 - 0.85) / (SELECT n FROM nn)
       + 0.85 * (coalesce(c.c, 0)
                 + (SELECT coalesce(sum(r.rank), 0) FROM {prev} r
                    WHERE r.node NOT IN (SELECT src FROM p)) / (SELECT n FROM nn))
       AS rank
FROM nodes n
LEFT JOIN (
    SELECT p.dst AS node, sum(r.rank * p.p) AS c
    FROM p JOIN {prev} r ON p.src = r.node GROUP BY p.dst
) c ON n.node = c.node
"""


@query(
    "pagerank_nation_trade",
    ref="iterative graph ranking (operators/components.py::pagerank) — the domain-authority primitive for crawl-corpus weighting; extends the components family",
    doc="Weighted PageRank (5 iterations, d=0.85) over the customer-nation → supplier-nation trade graph; oracle is 5 chained CTE iterations in DuckDB.",
    oracle="""
WITH e AS (
    SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS DOUBLE) AS w
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN supplier ON l_suppkey   = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
),
p AS (
    SELECT e.src, e.dst, e.w / ow.ow AS p
    FROM e JOIN (SELECT src, sum(w) AS ow FROM e GROUP BY src) ow ON e.src = ow.src
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
r1 AS (%s), r2 AS (%s), r3 AS (%s), r4 AS (%s), r5 AS (%s)
SELECT node AS nation, round(rank, 6) AS pagerank FROM r5
"""
    % tuple(
        _PAGERANK_ITER_SQL.format(prev=f"r{i}") for i in range(5)
    ),
)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-flow authority: which supplier nations absorb the most
    purchasing attention, transitively.  Edges are customer-nation →
    supplier-nation weighted by lineitem count (integer-valued weights
    so edge construction is FP-exact on both engines); the iterative
    rank runs through operators/components.py::pagerank — per
    iteration one contribution shuffle + a broadcast one-row dangling
    aggregate, lineage truncated per round.  Fixed 5 iterations keeps
    the result closed-form enough for a chained-CTE SQL oracle —
    the same reason production rank jobs pin iteration counts: a
    convergence-tested rank is not reproducible across cluster sizes
    once FP summation order enters the stopping test.  Ranks rounded
    to 6dp at the END only."""
    from shopify_youtube_etl_spark.operators.components import pagerank

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("src"))),
            "c_nationkey",
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("dst"))),
            "s_nationkey",
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )
    ranks = pagerank(edges, damping=0.85, iterations=5)
    return ranks.select(
        F.col("node").alias("nation"), F.round("rank", 6).alias("pagerank")
    )


# ---------------------------------------------------------------------------
# Time-series: gap fill + forward fill, cohort retention, transitions
# ---------------------------------------------------------------------------


@query(
    "gap_fill_daily_revenue",
    ref="extension per SURVEY §2.5 — calendar densification + forward fill, the resample/ffill every time-series consumer runs",
    doc="Dense daily spine over the event range; missing days get n_events=0 and carry the last seen cumulative revenue forward.",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS TIMESTAMP)::DATE       AS d,
           CAST(count(*) AS BIGINT)          AS n_events,
           round(sum(value), 2)              AS revenue
    FROM events
    GROUP BY 1
), spine AS (
    SELECT unnest(generate_series((SELECT min(d) FROM daily),
                                  (SELECT max(d) FROM daily),
                                  INTERVAL 1 DAY))::DATE AS d
)
SELECT strftime(spine.d, '%Y-%m-%d')                        AS day,
       CAST(coalesce(daily.n_events, 0) AS BIGINT)          AS n_events,
       coalesce(daily.revenue, 0.0)                         AS revenue,
       last_value(daily.revenue IGNORE NULLS) OVER (
           ORDER BY spine.d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_ffill
FROM spine LEFT JOIN daily USING (d)
""",
)
def gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: aggregate to day grain FIRST (the only
    pass over raw events — one shuffle on day), then build the spine
    with ``sequence(min, max)`` exploded from the one-row bounds agg
    and left-join the day series back.  Everything after the first agg
    is O(days) — a few thousand rows no matter the input scale — so
    the unpartitioned forward-fill window (``last(ignorenulls)``) is
    deliberately cheap, never a window over raw rows.  The bounds join
    is a broadcast of one row."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count("*").alias("n_events"),
            money(F.sum("value")).alias("revenue"),
        )
    )
    spine = (
        daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(daily, "d", "left")
        .select(
            day_str(F.col("d")).alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_ffill"),
        )
    )


@query(
    "cohort_retention",
    ref="extension per SURVEY §2.4 — first-touch cohort × month-offset retention, the classic customer-behavior matrix (README.md:49-52 'customer behavior')",
    doc="Customers grouped by first-order month; distinct buyers per (cohort, months-since-first) with retention ratio.",
    oracle="""
WITH firsts AS (
    SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort_m
    FROM orders GROUP BY 1
), hits AS (
    SELECT f.cohort_m,
           date_diff('month', f.cohort_m, date_trunc('month', o.o_orderdate)) AS month_offset,
           o.o_custkey
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
), sized AS (
    SELECT cohort_m, CAST(count(DISTINCT o_custkey) AS BIGINT) AS cohort_size
    FROM hits WHERE month_offset = 0 GROUP BY 1
)
SELECT strftime(h.cohort_m, '%Y-%m')                       AS cohort_month,
       CAST(h.month_offset AS BIGINT)                      AS month_offset,
       CAST(count(DISTINCT h.o_custkey) AS BIGINT)         AS n_active,
       s.cohort_size,
       round(count(DISTINCT h.o_custkey) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM hits h JOIN sized s USING (cohort_m)
GROUP BY h.cohort_m, h.month_offset, s.cohort_size
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix in two shuffles over orders: (1) groupBy
    customer for the first-order month, (2) groupBy (cohort, offset)
    for distinct actives.  The firsts side is one row per customer —
    at 100 TB that's the dimension-sized side of a shuffle join on
    o_custkey (co-partitioned with the first agg, so AQE reuses the
    exchange).  Cohort sizes are the offset-0 slice re-joined by
    cohort month (~tens of rows, broadcast)."""
    o = t(spark, sf_dir, "orders").select("o_custkey", F.trunc("o_orderdate", "month").alias("m"))
    firsts = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    hits = o.join(firsts, "o_custkey").select(
        "o_custkey",
        "cohort_m",
        (F.months_between(F.col("m"), F.col("cohort_m"))).cast("long").alias("month_offset"),
    )
    grid = hits.groupBy("cohort_m", "month_offset").agg(
        F.countDistinct("o_custkey").alias("n_active")
    )
    sized = (
        grid.where(F.col("month_offset") == 0)
        .select("cohort_m", F.col("n_active").alias("cohort_size"))
    )
    return grid.join(F.broadcast(sized), "cohort_m").select(
        F.date_format("cohort_m", "yyyy-MM").alias("cohort_month"),
        "month_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size").cast("double"), 6).alias("retention"),
    )


@query(
    "event_transition_matrix",
    ref="extension per SURVEY §2.5 — per-user event-type Markov transitions (sessionize sibling; 'customer behavior' README.md:49-52)",
    doc="Per-user consecutive event-type pairs with counts and row-normalized transition probability.",
    oracle="""
WITH seq AS (
    SELECT user_id,
           event_type AS dst,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS src
    FROM events
)
SELECT src, dst,
       CAST(count(*) AS BIGINT) AS n_transitions,
       round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY src) AS DOUBLE), 6) AS p_transition
FROM seq WHERE src IS NOT NULL
GROUP BY src, dst
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: one shuffle on user_id orders each
    user's stream (tie-broken by event_id so the lag is deterministic
    under equal timestamps), lag pairs consecutive types, then the
    (src, dst) count agg reduces to |types|² rows.  The normalizing
    window runs over that tiny matrix, not raw events.  At 100 TB the
    per-user window is the sessionize shuffle shape — bounded by the
    user-key distribution, AQE-skew-splittable."""
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).where(F.col("src").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count("*").alias("n_transitions"))
    wn = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wn).cast("double"), 6
        ).alias("p_transition"),
    )


# ---------------------------------------------------------------------------
# Graph structure: triangle census
# ---------------------------------------------------------------------------


@query(
    "triangle_count_copurchase",
    ref="iterative-graph family sibling (components/pagerank, operators/components.py) — triangle census, the community-density primitive",
    doc="Triangle census of the part co-purchase graph: nodes, edges, ordered wedges, triangles, wedge closure rate.",
    oracle="""
WITH ip AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
    SELECT DISTINCT a.p AS u, b.p AS v
    FROM ip a JOIN ip b ON a.o = b.o AND a.p < b.p
),
nodes AS (SELECT u AS x FROM e UNION SELECT v FROM e),
wt AS (
    SELECT CAST(count(*) AS BIGINT)   AS n_wedges,
           CAST(count(c.u) AS BIGINT) AS n_triangles
    FROM (SELECT a.u, a.v, b.v AS w FROM e a JOIN e b ON a.v = b.u) t
    LEFT JOIN e c ON c.u = t.u AND c.v = t.w
)
SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT)     AS n_edges,
       n_wedges,
       n_triangles,
       round(CAST(n_triangles AS DOUBLE) / n_wedges, 6) AS closure_rate
FROM wt
""",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting by edge orientation (u < v), the standard
    shuffle-bounded formulation: orienting every edge low→high makes
    each triangle appear as EXACTLY one wedge u<v<w plus one closing
    edge (u,w), so the count is a self-join chain, never an all-pairs
    enumeration.  The wedge join and its closing probe share one
    LEFT join pass — count(*) is the wedge total, count(closing.u)
    the triangle total — so the heavy intermediate is scanned once.
    Scale shape: wedge volume is Σ deg(v)² — the quadratic lives on
    hot vertices, exactly where salting/AQE skew split applies to the
    a.v = b.u shuffle; at 100 TB you'd materialize `edges` once
    (localCheckpoint/table) instead of letting the three self-join
    arms recompute the co-purchase pairing, and cap ultra-hot vertices
    (celebrity parts) with the same degree-threshold star cut the LSH
    path uses.  Closure rate = triangles / ordered wedges, the
    density signal community detection thresholds on."""
    ip = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = (
        ip.alias("a")
        .join(ip.alias("b"), (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    wedges = (
        edges.alias("x")
        .join(edges.alias("y"), F.col("x.v") == F.col("y.u"))
        .select(F.col("x.u").alias("wu"), F.col("y.v").alias("ww"))
    )
    wedge_stats = (
        wedges.join(
            edges.alias("z"),
            (F.col("z.u") == F.col("wu")) & (F.col("z.v") == F.col("ww")),
            "left",
        )
        .agg(
            F.count("*").alias("n_wedges"),
            F.count(F.col("z.u")).alias("n_triangles"),
        )
    )
    n_nodes = (
        edges.select(F.col("u").alias("x"))
        .union(edges.select(F.col("v").alias("x")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count("*").alias("n_edges"))
    return (
        n_nodes.join(F.broadcast(n_edges))
        .join(F.broadcast(wedge_stats))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            # NULL (not an ANSI divide-by-zero crash) on a wedge-free
            # graph — empty input must degrade, not throw.
            F.when(
                F.col("n_wedges") > 0,
                F.round(F.col("n_triangles").cast("double") / F.col("n_wedges"), 6),
            ).alias("closure_rate"),
        )
    )


@query(
    "copurchase_components",
    ref="iterative-graph family capstone — connected components of the part co-purchase graph with an EXTERNALLY-CHECKED oracle (DuckDB recursive-CTE label reachability): the first external hash proof of operators/components.py, whose other consumers (neardup_components, the funnel) are hash-family rows-only",
    doc="Component-size census of the bulk co-purchase graph (lines with l_quantity >= 48 — bulk-order affinity, which keeps the graph sparse and the census discriminating instead of one giant component) under star edges (every part in an order links to the order's min part — same components as the all-pairs clique, O(lines) edges): per component size, the number of components; parts with no bulk line count as size-1 isolates.",
    oracle="""
WITH RECURSIVE li AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p
    FROM lineitem
    WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      AND l_quantity >= 48
),
anchor AS (SELECT o, min(p) AS src FROM li GROUP BY o),
e AS (
    SELECT DISTINCT anchor.src, li.p AS dst
    FROM li JOIN anchor USING (o) WHERE li.p <> anchor.src
),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (
    SELECT DISTINCT p_partkey AS node FROM part WHERE p_partkey IS NOT NULL
),
reach(node, lab) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.node
),
labels AS (SELECT node, min(lab) AS label FROM reach GROUP BY node),
sizes AS (SELECT label, count(*) AS sz FROM labels GROUP BY label)
SELECT CAST(sz AS BIGINT)       AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz
""",
)
def copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a graph whose EDGES are themselves
    SQL-derivable, which is what finally makes the iterative operator
    externally checkable: DuckDB reproduces the components with a
    recursive-CTE reachability closure (min reachable seed per node),
    while Spark runs operators/components.py — the same min-label
    machinery every dedup-clustering query uses.  A green driver row is
    therefore an external equivalence proof for the component operator
    itself, not just a row count.

    Star edges, not cliques: linking each part to its order's MIN part
    yields the same connectivity as the within-order all-pairs clique
    at O(lines) edges instead of O(Σ basket²) — the scale trick that
    keeps a 100-item basket from minting 4950 pairs.  The bulk filter
    (l_quantity >= 48) is the graph's semantic: bulk-bought-together
    affinity — and the sparsity it buys is what makes the census
    discriminating (sizes 1..10 at sf0.01) rather than one giant
    component, and the oracle's reachability closure O(Σ size²)-cheap.
    Size census out (sizes grain, bounded); isolates enter as size-1
    components via the operator's node set, and the oracle seeds
    reachability from every part identically."""
    from shopify_youtube_etl_spark.operators.components import connected_components

    li = (
        t(spark, sf_dir, "lineitem")
        .where(
            F.col("l_orderkey").isNotNull()
            & F.col("l_partkey").isNotNull()
            & (F.col("l_quantity") >= 48)
        )
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = _bulk_star_edges(li)
    nodes = (
        t(spark, sf_dir, "part")
        .where(F.col("p_partkey").isNotNull())
        .select("p_partkey")
    )
    labels = connected_components(edges, nodes)
    sizes = labels.groupBy("label").agg(F.count("*").alias("component_size"))
    return sizes.groupBy("component_size").agg(
        F.count("*").alias("n_components")
    )


@query(
    "tpch_q3_shipping_priority",
    ref="TPC-H Q3 shape (filter both join sides on disjoint date ranges → star join → top-k agg) — the canonical BI plan the engine must nail",
    doc="Top-10 unshipped BUILDING-segment orders by revenue at the 1998-05-01 cutoff.",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-05-01'
  AND l_shipdate  > TIMESTAMP '1998-05-01'
GROUP BY l_orderkey, orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted to the testdata columns (o_orderpriority for the
    missing o_shippriority): both date filters sit on base columns so
    they push into the parquet scans, the customer-segment dim side
    broadcasts, and the top-10 compiles to TakeOrderedAndProject —
    no global sort of the aggregate.  Tie-break on l_orderkey keeps
    the LIMIT cut hash-stable across engines."""
    cust = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < "1998-05-01")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > "1998-05-01")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            day_str(F.col("o_orderdate")).alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q18_large_orders",
    ref="TPC-H Q18 shape (agg-HAVING subquery feeding a star join) — the group-filter-then-enrich plan",
    doc="Orders whose total quantity exceeds 300, enriched with customer and order facts.",
    oracle="""
SELECT c_name,
       CAST(o_custkey AS BIGINT)  AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2)     AS o_totalprice,
       CAST(total_qty AS BIGINT)  AS total_qty
FROM (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the HAVING subquery reduces lineitem to a tiny
    order-key set BEFORE any join — one partial-agg shuffle on
    l_orderkey, then the survivors (~0.3% of orders at threshold 300)
    broadcast against orders and customer, so the big table is
    touched exactly once.  The inverted plan (join first, filter
    after) would shuffle the full fact join — the difference between
    one scan and a 100 TB exchange."""
    big = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            day_str(F.col("o_orderdate")).alias("orderdate"),
            money(F.col("o_totalprice")).alias("o_totalprice"),
            F.col("total_qty").cast("long").alias("total_qty"),
        )
    )


@query(
    "daily_anomaly_mad",
    ref="ops/monitoring extension — robust outlier detection on the daily series (monitoring-guide.md's regression alerts, made statistical)",
    doc="Per-day revenue with a median/MAD robust z-score and outlier flag.",
    oracle="""
WITH daily AS (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           round(sum(value), 2) AS rev
    FROM events GROUP BY 1
),
med AS (SELECT quantile_cont(rev, 0.5) AS m FROM daily),
mad AS (
    SELECT quantile_cont(abs(rev - (SELECT m FROM med)), 0.5) AS d FROM daily
)
SELECT day, rev,
       CASE WHEN (SELECT d FROM mad) > 0
            THEN round((rev - (SELECT m FROM med)) / (1.4826 * (SELECT d FROM mad)), 4)
       END AS robust_z,
       CASE WHEN (SELECT d FROM mad) > 0
            THEN abs(rev - (SELECT m FROM med)) > 3 * 1.4826 * (SELECT d FROM mad)
       END AS is_outlier
FROM daily
""",
)
def daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's monitoring runbook alerts on fixed thresholds
    (monitoring-guide.md: ±25%, 50% of daily avg); this is the robust
    version a pipeline actually wants: median/MAD tolerate the very
    anomalies being hunted (mean/stddev get dragged by them).  Scale
    shape: the day-grain rollup is one partial-agg shuffle; the
    median/MAD run over the ~365·years-row daily frame (size
    independent of input scale) and come back as one broadcast row —
    `percentile` here is EXACT on that reduced frame, never on raw
    events."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(day_str(F.col("ts")).alias("day"))
        .agg(money(F.sum("value")).alias("rev"))
    )
    med = daily.agg(F.expr("percentile(rev, 0.5)").alias("m"))
    with_med = daily.join(F.broadcast(med))
    mad = with_med.agg(F.expr("percentile(abs(rev - m), 0.5)").alias("d"))
    return (
        with_med.join(F.broadcast(mad))
        .select(
            "day",
            "rev",
            # NULL (not an ANSI divide-by-zero crash) when MAD is 0 — a
            # one-day series or a half-constant one degenerates, and a
            # robust score is undefined there by construction.
            F.when(
                F.col("d") > 0,
                F.round((F.col("rev") - F.col("m")) / (1.4826 * F.col("d")), 4),
            ).alias("robust_z"),
            F.when(
                F.col("d") > 0,
                F.abs(F.col("rev") - F.col("m")) > 3 * 1.4826 * F.col("d"),
            ).alias("is_outlier"),
        )
    )


@query(
    "segment_price_quantiles",
    ref="§2.4 extension — EXACT grouped quantiles (the precise twin of approx_quantiles_profile's GK sketches)",
    doc="Per market segment: exact p25/p50/p75/p90 of order value (continuous interpolation) and order count.",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT)                       AS n_orders,
       round(quantile_cont(o_totalprice, 0.25), 4)    AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4)    AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4)    AS p75,
       round(quantile_cont(o_totalprice, 0.90), 4)    AS p90
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def segment_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group — `percentile` (continuous
    interpolation, matching DuckDB's quantile_cont) buffers each
    group's values, which is exactly why the GK-sketch twin
    (approx_quantiles_profile) exists for 100 TB; this query is the
    precision baseline the sketch is pinned against.  Segment dim
    broadcasts; one shuffle on the 5-segment grouping key."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
    )


@query(
    "tpch_q5_local_supplier_volume",
    ref="TPC-H Q5 shape — 6-table snowflake join with a cross-dimension equality (customer and supplier in the SAME nation)",
    doc="Revenue per ASIA nation from 1997 orders where the supplier is local to the customer.",
    oracle="""
SELECT n_name AS nation,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deepest join chain in the classic suite, plus the wrinkle
    that makes Q5 a planner test: the supplier join carries a SECOND
    equality against the customer's nation, correlating two dimension
    hops.  Scale shape: region→nation prune first (explicit broadcast
    — these two are FIXED at 5/25 rows at any scale factor), the date
    filter pushes into the orders scan, and supplier/customer carry NO
    broadcast hint on purpose: at bench scale AQE broadcasts them
    anyway, while at 100 TB (customer ~10^10 rows) the same plan
    degrades gracefully to a shuffle join instead of OOMing on a
    forced broadcast.  Group key is the 5-nation name: the final agg
    is a rounding error next to the joins."""
    region = (
        t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    )
    nation = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )


@query(
    "scd2_pointintime_join",
    ref="feature-store staple — point-in-time (as-of interval) lookup against the SCD2 dimension (completes scd2_status_history: building the history is half the pattern; joining facts to the version valid AT event time is the half that prevents feature leakage)",
    doc="Each shipped lineitem joined to the customer-status version valid at ship date; revenue per at-ship status.",
    oracle="""
WITH h AS (
    SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
           lag(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS prev_status
    FROM orders
),
chg AS (
    SELECT * FROM h WHERE prev_status IS NULL OR prev_status <> o_orderstatus
),
v AS (
    SELECT o_custkey, o_orderstatus,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS DATE) AS valid_to
    FROM chg
),
f AS (
    SELECT o_custkey AS custkey,
           CAST(l_shipdate AS DATE) AS ship_day,
           l_extendedprice * (1 - l_discount) AS rev
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT v.o_orderstatus               AS status_at_ship,
       CAST(count(*) AS BIGINT)      AS n_items,
       round(sum(f.rev), 2)          AS revenue
FROM f
JOIN v ON f.custkey = v.o_custkey
      AND v.valid_from <= f.ship_day
      AND (v.valid_to IS NULL OR f.ship_day < v.valid_to)
GROUP BY v.o_orderstatus
""",
)
def scd2_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage-safe feature lookup: facts join the dimension version
    whose [valid_from, valid_to) interval contains the FACT's own
    timestamp — using today's dimension value for yesterday's training
    example is the classic feature-leakage bug this join shape exists
    to prevent.  Scale shape: the versions table is |changes| rows
    (orders of magnitude smaller than facts) and broadcasts, so the
    interval condition rides on the custkey equi-join hash probe —
    the fact table is scanned once, shuffled only for its own
    orders join.  Intervals are half-open and tie-broken exactly like
    scd2_status_history, so every fact matches exactly one version."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .where(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
    )
    versions = chg.select(
        F.col("o_custkey").alias("v_custkey"),
        "o_orderstatus",
        F.to_date("o_orderdate").alias("valid_from"),
        F.to_date(F.lead("o_orderdate").over(w)).alias("valid_to"),
    )
    facts = (
        t(spark, sf_dir, "lineitem")
        .join(o.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.to_date("l_shipdate").alias("ship_day"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    joined = facts.join(
        F.broadcast(versions),
        (F.col("custkey") == F.col("v_custkey"))
        & (F.col("valid_from") <= F.col("ship_day"))
        & (F.col("valid_to").isNull() | (F.col("ship_day") < F.col("valid_to"))),
    )
    return joined.groupBy(F.col("o_orderstatus").alias("status_at_ship")).agg(
        F.count("*").alias("n_items"),
        money(F.sum("rev")).alias("revenue"),
    )


@query(
    "tpch_q10_returned_items",
    ref="TPC-H Q10 shape (returned-item revenue top-k) — aggregate-before-join so the dim join sees per-customer rows, not the fact table",
    doc="Top-20 customers by Q4-1997 returned-lineitem revenue, enriched with account and nation facts.",
    oracle="""
SELECT CAST(c_custkey AS BIGINT)  AS c_custkey,
       c_name,
       round(revenue, 2)          AS revenue,
       round(c_acctbal, 2)        AS acctbal,
       n_name
FROM (
    SELECT o_custkey, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_custkey
) r
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 with the join order a 100 TB plan needs: the lineitem⋈
    orders fact join reduces to ONE row per buying customer BEFORE any
    dimension join, so customer and nation join against ~|customers
    with returns| rows instead of the raw fact stream (the canonical
    group-by-five-dim-columns formulation shuffles every fact row wide
    with all dim attributes attached).  Both date predicates and the
    returnflag filter sit on base columns → parquet-pushed; nation
    broadcasts; the final top-20 compiles to TakeOrderedAndProject."""
    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-10-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            money(F.col("rev")).alias("revenue"),
            money(F.col("c_acctbal")).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "exists_late_shipment_priority",
    ref="TPC-H Q4 shape (correlated EXISTS with a non-equi predicate → left-semi hash join) — the decorrelation pattern below_avg_quantity_revenue doesn't cover",
    doc="Q3-1997 order counts by priority, keeping only orders with at least one lineitem shipped >60 days after the order date.",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def exists_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS decorrelated the way Catalyst does it: a
    LEFT SEMI hash join on the equi key (l_orderkey = o_orderkey) with
    the correlated non-equi predicate (l_shipdate > o_orderdate + 60d)
    evaluated as a join residual — one pass over each table, no
    per-order subquery re-execution, and the probe side never
    duplicates orders however many late lineitems match.  The date
    window pushes into the orders scan, so at 100 TB the semi join
    probes with one quarter's orders only."""
    orders = (
        t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-07-01")
            & (F.col("o_orderdate") < "1997-10-01")
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "acctbal_rank_profile",
    ref="SURVEY §2.5 extension — relative-rank window family (percent_rank / cume_dist), completing rank/dense_rank/ntile coverage",
    doc="Top-5%-by-account-balance customers per market segment with their exact relative rank and cumulative distribution.",
    oracle="""
SELECT segment,
       CAST(c_custkey AS BIGINT) AS c_custkey,
       round(acctbal, 2)         AS acctbal,
       round(pr, 6)              AS pr,
       round(cd, 6)              AS cd
FROM (
    SELECT c_mktsegment AS segment,
           c_custkey,
           c_acctbal    AS acctbal,
           percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS pr,
           cume_dist()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cd
    FROM customer
)
WHERE pr >= 0.95
ORDER BY segment, c_custkey
""",
)
def acctbal_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist over per-segment balance order — both
    are pure functions of the value multiset (tie-stable), so the
    result is deterministic across engines without a tiebreak column.
    One shuffle on the segment key; the window runs per-partition.  At
    100 TB a 5-segment partition key is too coarse (each window lands
    on one task) — the scale variant pre-aggregates per (segment,
    balance-bucket) histograms and derives ranks from cumulative
    bucket counts, which is exactly what approx_quantiles_profile
    demonstrates; this query keeps the exact per-row semantics."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    ranked = t(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.percent_rank().over(w).alias("pr_raw"),
        F.cume_dist().over(w).alias("cd_raw"),
    )
    return (
        ranked.where(F.col("pr_raw") >= 0.95)
        .select(
            "segment",
            "c_custkey",
            money(F.col("acctbal")).alias("acctbal"),
            F.round("pr_raw", 6).alias("pr"),
            F.round("cd_raw", 6).alias("cd"),
        )
        .orderBy("segment", "c_custkey")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    ref="TPC-H Q17 shape — correlated scalar-aggregate subquery (per-part avg) decorrelated into an aggregate join",
    doc="Average yearly revenue lost if Brand#12 orders below 20% of the part's average quantity were not taken.",
    oracle="""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12'),
pa AS (
    SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
    FROM lineitem JOIN bp ON l_partkey = p_partkey
    GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN pa USING (l_partkey)
WHERE l_quantity < qty_cut
""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's correlated scalar subquery (per-part AVG compared
    against each lineitem of the same part), written as Catalyst
    decorrelates it: the brand's part keys broadcast into lineitem,
    the per-part quantity cutoff is ONE partial-agg shuffle over that
    reduced slice, and the cutoff frame (≤ |parts-in-brand| rows)
    broadcasts back — the fact table is scanned once and never
    shuffled.  A naive per-row subquery would be O(facts) scalar
    lookups; this is two broadcast joins and one small agg."""
    bp = (
        t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(F.broadcast(bp), li.l_partkey == bp.p_partkey)
    cut = brand_li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        brand_li.join(F.broadcast(cut), "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(money(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q19_disjunctive_revenue",
    ref="TPC-H Q19 shape — disjunctive (OR-of-conjunctions) predicate spanning both join sides",
    doc="Revenue from three brand/size/quantity bands OR-ed together.",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT)                          AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's planner test: an OR-of-conjunctions that mixes
    columns from BOTH sides of the join.  Catalyst extracts the
    side-local residues — part rows must match SOME brand/size band,
    lineitems SOME quantity band — and pushes each into its own scan
    (visible as PushedFilters on both), so the join only sees
    pre-filtered rows; the full disjunction re-applies post-join for
    exactness.  Getting this prune wrong reads 100 TB to answer a
    query about three brands."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    bands = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(bands)
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    ref="TPC-H Q21 shape — double-correlated EXISTS / NOT EXISTS, rewritten as one per-order supplier census",
    doc="Suppliers who were the ONLY late shipper on multi-supplier orders (late = shipped >60 days after order date), top 20.",
    oracle="""
WITH li AS (
    SELECT l_orderkey, l_suppkey,
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
census AS (
    SELECT l_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
    FROM li GROUP BY l_orderkey
),
blamed AS (
    SELECT DISTINCT li.l_orderkey, li.l_suppkey
    FROM li JOIN census USING (l_orderkey)
    WHERE li.is_late = 1 AND census.n_supp >= 2 AND census.n_late_supp = 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 is the classic double-correlation: EXISTS(another
    supplier on the order) AND NOT EXISTS(another LATE supplier).
    The scalable rewrite replaces both correlated probes with ONE
    per-order census — distinct suppliers and distinct late
    suppliers per order in a single partial-agg shuffle — then
    `n_supp >= 2 AND n_late_supp = 1` reproduces the EXISTS/NOT
    EXISTS pair exactly for late rows.  The plan costs two
    column-pruned scans of lineitem's 3-column projection (census +
    blame pass) — deliberately NOT a cache/checkpoint of the joined
    frame, which at 100 TB would materialize the whole fact table to
    save one cheap scan; the original EXISTS form scans three times
    AND correlates per row.  The census joins back on the SAME
    l_orderkey the agg just
    shuffled on (census is order-count-sized — never broadcastable at
    scale — so co-partitioned hash join, no extra exchange of the
    fact side); top-20 compiles to TakeOrderedAndProject."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            # INTERVAL, not date_add: date_add truncates the timestamp
            # to DATE while the DuckDB oracle's `+ INTERVAL 60 DAY`
            # keeps time-of-day — they diverge on any non-midnight
            # o_orderdate (ADVICE r4).
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .cast("int")
            .alias("is_late"),
        )
    )
    census = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    blamed = (
        li.where(F.col("is_late") == 1)
        .join(
            census.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "tpch_q22_idle_rich_customers",
    ref="TPC-H Q22 shape — global-average scalar subquery + NOT EXISTS anti join",
    doc="Per nation: count and total balance of above-average-balance customers with no orders since 2000-01-01.",
    oracle="""
WITH cut AS (
    SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
),
idle AS (
    SELECT c_nationkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT a FROM cut)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
)
SELECT n_name,
       CAST(count(*) AS BIGINT)  AS numcust,
       round(sum(c_acctbal), 2)  AS totacctbal
FROM idle JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's two planner features: a scalar aggregate subquery
    (the positive-balance average) that must evaluate ONCE and
    broadcast — never per-row — and a NOT EXISTS that Catalyst turns
    into a LEFT ANTI hash join against the recent-order customer
    keys (the recency filter pushes into the orders scan, so the anti
    build side is key-sized, not order-sized); the rich-customer
    filter applies BEFORE the anti join so the probe side is already
    small.
    Same anti-join machinery as the reference's orphan checks (J1),
    pointed the other way."""
    cust = t(spark, sf_dir, "customer")
    cut = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    rich = (
        cust.join(F.broadcast(cut))
        .where(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    recent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    idle = rich.join(recent, "c_custkey", "left_anti")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            money(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


# Shared text for the recursive reachability query — Spark 4.1's
# WITH RECURSIVE (UNION ALL + explicit hop bound; UNION-distinct
# recursion is not yet supported, so the dedup happens in the outer
# GROUP BY) runs the IDENTICAL string DuckDB runs as the oracle.
_NATION_REACH_SQL = """
WITH RECURSIVE trade AS (
    SELECT DISTINCT cn.n_name AS src, sn.n_name AS dst
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
),
reach(nation, hop) AS (
    SELECT 'NATION_0' AS nation, 0 AS hop
    UNION ALL
    SELECT t.dst, r.hop + 1
    FROM reach r JOIN trade t ON t.src = r.nation
    WHERE r.hop < 2
)
SELECT nation,
       CAST(min(hop) AS BIGINT)  AS min_hops,
       CAST(count(*) AS BIGINT)  AS n_paths
FROM reach
GROUP BY nation
"""


@query(
    "recursive_nation_reach",
    ref="SURVEY §3 SQL-text entry point × graph family — WITH RECURSIVE (Spark 4.x) multi-hop reachability over the nation trade graph",
    doc="Nations reachable from NATION_0 within 2 hops of the customer→supplier trade graph: min hop distance and path multiplicity.",
    oracle=_NATION_REACH_SQL,
)
def recursive_nation_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's recursive CTE, used the way it stays safe at 100 TB:
    the corpus-sized work is the DISTINCT trade-edge aggregation (one
    shuffle over the star join), which reduces everything to a
    FIXED-size graph (≤25 nations, ≤600 edges) — the recursion then
    iterates over that reduced frame, so its cost is independent of
    input scale.  UNION ALL recursion enumerates paths (multiplicity
    is part of the result); the explicit hop bound is load-bearing —
    without it a cyclic graph recurses forever.  For unbounded-depth
    closure over DATA-sized graphs, `connected_components`
    (operators/components.py) with its O(log d) label propagation is
    the right operator, not a recursive CTE."""
    from shopify_youtube_etl_spark.sources.tables import ensure_views

    ensure_views(
        spark, sf_dir, ("lineitem", "orders", "customer", "nation", "supplier")
    )
    return spark.sql(_NATION_REACH_SQL)


@query(
    "tpch_q6_forecast_revenue",
    ref="TPC-H Q6 shape — pure scan-aggregate with three conjunctive range predicates, ALL pushed to the parquet scan",
    doc="Forecast revenue change: sum(extendedprice*discount) for 1997 shipments with discount 0.05-0.07 and quantity < 24.",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT)                    AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pushdown stress test: no join, no window — the whole query
    is whether the three range predicates reach the scan (they show as
    PushedFilters; row groups whose stats are disjoint never
    decompress) and whether the agg is map-side partial.  At 100 TB
    Q6 is effectively free when pushdown works and a full-table
    decompress when it doesn't — the largest single constant factor
    in the suite."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q7_volume_shipping",
    ref="TPC-H Q7 shape — symmetric two-nation predicate (OR of nation pairs) across customer and supplier dimension chains",
    doc="Trade volume between NATION_1 and NATION_2 by direction and ship year.",
    oracle="""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT)                  AS ship_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS volume
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
   OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7's planner feature: the nation restriction is an OR across
    TWO different dimension chains (customer's nation vs supplier's
    nation), so neither single-chain filter alone may drop a row —
    but each chain's filter to {NATION_1, NATION_2} IS implied and
    prunes both broadcast dims to 2 rows before the fact join; the
    full cross-pair predicate re-applies after both attaches.  The
    fact table joins two tiny broadcast chains and shuffles once for
    the group-by."""
    pair = ["NATION_1", "NATION_2"]
    nat = t(spark, sf_dir, "nation")
    cust_n = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.where(F.col("n_name").isin(pair))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    supp_n = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.where(F.col("n_name").isin(pair))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_n), F.col("o_custkey") == cust_n.c_custkey)
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "volume"
            )
        )
    )


@query(
    "tpch_q8_market_share",
    ref="TPC-H Q8 shape — conditional-aggregate ratio (market share) over a region-restricted star",
    doc="NATION_3 suppliers' share of PROMO-part revenue to ASIA customers, by order year.",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN customer  ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region    ON cn.n_regionkey = r_regionkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN part      ON l_partkey = p_partkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY year(o_orderdate)
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8's two lessons: the numerator restriction (supplier nation)
    must NOT filter rows — it lives inside a conditional aggregate so
    the denominator sees every qualifying sale — while the row-level
    restrictions (customer region, part type) prune the broadcast
    dims before the fact join.  One fact pass, one group-by shuffle,
    ratio computed in the agg."""
    nat = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(region),
                    nat.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = (
        t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q14_promo_revenue",
    ref="TPC-H Q14 shape — conditional-aggregate percentage over a time-sliced fact join",
    doc="PROMO parts' percentage of 1997-H1 revenue.",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       CAST(count(*) AS BIGINT)                            AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: the date slice pushes into the fact scan, the (whole) part
    dim broadcasts — p_type can't pre-filter because the denominator
    needs every part — and the percentage is one conditional
    aggregate.  Same one-row-out shape as Q6 plus a broadcast
    attach."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    ref="TPC-H Q13 shape — left-join count then count-of-counts (the two-level distribution aggregate)",
    doc="Distribution of customers by order count, INCLUDING zero-order customers via the left join.",
    oracle="""
WITH c_orders AS (
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
""",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13's planner exercise: the LEFT join (zero-order customers must
    appear with c_count 0 — an inner join silently drops them, the
    classic Q13 bug) feeding a count-of-counts.  Plan: one shuffle on
    c_custkey for the join+first agg (AQE coalesces the co-partitioned
    pair), then a second tiny shuffle on the ~|distinct counts| keys.
    count(o_orderkey) — not count(*) — so the null row of an orderless
    customer counts 0, matching SQL semantics exactly."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    ref="TPC-H Q15 shape — windowed revenue view + scalar-max equality (ties kept)",
    doc="Supplier(s) achieving the maximum lineitem revenue in 1996-Q1, with the revenue (rounded before the max compare on both engines).",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the revenue 'view' is one pushed-down date-slice scan +
    groupBy on l_suppkey; the scalar max evaluates ONCE and broadcasts
    back against the same (supplier-count-sized) frame — no second
    fact scan, no window sort.  Revenue is rounded BEFORE the max
    equality so both engines compare the same 2-dp value (float
    residue can't elect different winners); ties all surface, as in
    the spec."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q2_min_cost_supplier",
    ref="TPC-H Q2 shape adapted to the available tables — argmin-per-group via min-join (the testdata has no partsupp; supplier part costs derive from lineitem unit-price history)",
    doc="Cheapest supplier(s) per STANDARD-type part by observed unit price (min over lineitem history), ties kept.",
    oracle="""
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           min(round(l_extendedprice / l_quantity, 2)) AS unit_cost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT l_partkey, min(unit_cost) AS min_cost FROM cost GROUP BY l_partkey
)
SELECT p_partkey, p_name, s_suppkey, s_name, c.unit_cost AS min_unit_cost
FROM cost c
JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
JOIN part ON p_partkey = c.l_partkey AND p_type = 'STANDARD'
JOIN supplier ON s_suppkey = c.l_suppkey
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's essence — the correlated 'supplier with the minimum cost
    for this part' subquery — rewritten as the scalable argmin-per-
    group: ONE pass builds per-(part, supplier) unit costs, a second
    part-keyed partial agg finds each part's minimum, and the equality
    join back recovers the argmin rows (ties kept, like the spec's
    ORDER BY over equal-cost suppliers).  The testdata has no partsupp
    table, so observed lineitem unit prices stand in for ps_supplycost
    — the adaptation is in the cost source, not the plan shape.  Both
    aggs shuffle on keys the join reuses (AQE coalesces); part and
    supplier dims broadcast."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey",
                                             "l_extendedprice", "l_quantity")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias(
            "unit_cost"
        )
    )
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost")).select(
        F.col("l_partkey").alias("b_partkey"), "min_cost"
    )
    part = (
        t(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_name")
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        cost.join(
            best,
            (cost.l_partkey == F.col("b_partkey"))
            & (cost.unit_cost == F.col("min_cost")),
        )
        .join(F.broadcast(part), cost.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), cost.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name",
            F.col("unit_cost").alias("min_unit_cost"),
        )
    )


@query(
    "tpch_q11_important_parts",
    ref="TPC-H Q11 shape adapted to the available tables — grouped value vs a scalar fraction of the grand total (HAVING over a scalar subquery); partsupp value stands in as national lineitem trade value",
    doc="Parts whose NATION_7-supplied trade value exceeds 0.075% of that nation's total, with the value.",
    oracle="""
WITH v AS (
    SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS val
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, round(val, 2) AS part_value
FROM v
WHERE val > 0.00075 * (SELECT sum(val) FROM v)
""",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's planner exercise: a grouped aggregate filtered by a
    SCALAR FRACTION of its own grand total — the total derives from
    the already-reduced per-part frame (one extra partial agg), never
    from a second fact scan, and broadcasts into the HAVING
    comparison.  The unrounded values feed the comparison on both
    engines (rounding only the output), so threshold membership is
    decided identically.  Nation filter pushes through the broadcast
    supplier dim into the fact scan side."""
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val")
        )
    )
    tot = v.agg(F.sum("val").alias("tv"))
    return (
        v.join(F.broadcast(tot))
        .where(F.col("val") > 0.00075 * F.col("tv"))
        .select(F.col("l_partkey").alias("p_partkey"), money(F.col("val")).alias("part_value"))
    )


@query(
    "fuzzy_blocked_join",
    ref="entity resolution — blocked fuzzy join (prefix blocking + Levenshtein post-filter), the record-linkage shape that avoids the O(n²) cross product",
    doc="Clean customers matched against a deterministically-perturbed dirty copy: block on the 17-char name prefix, keep pairs within edit distance 1.",
    oracle="""
WITH clean AS (
    SELECT c_custkey, c_name FROM customer WHERE c_custkey IS NOT NULL
),
dirty AS (
    SELECT c_custkey + 10000000 AS d_custkey,
           CASE WHEN c_custkey % 3 = 0
                    THEN substr(c_name, 1, length(c_name) - 1) || 'X'
                WHEN c_custkey % 3 = 1 THEN c_name || '!'
                ELSE c_name END AS d_name
    FROM clean
)
SELECT c.c_custkey, d.d_custkey,
       CAST(levenshtein(c.c_name, d.d_name) AS BIGINT) AS dist
FROM clean c
JOIN dirty d ON substr(c.c_name, 1, 17) = substr(d.d_name, 1, 17)
WHERE levenshtein(c.c_name, d.d_name) <= 1
""",
)
def fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage done the scalable way: an all-pairs Levenshtein
    between two customer sources is O(n²) and dead at 100 TB; BLOCKING
    on a stable key (here the 17-char name prefix — in production a
    phonetic code, sorted-neighborhood key, or MinHash bucket) turns
    it into an equi-join whose cost is Σ|block|², with the expensive
    edit-distance evaluated only INSIDE blocks as a post-join filter.
    The dirty side is a deterministic perturbation of the clean names
    (tail-char swap / appended char — edits chosen to fall after the
    blocking prefix, the property a real blocking key must have), so
    both engines compute the identical candidate set and distances.
    Plan: one shuffle of each side on the block key into a hash join;
    levenshtein runs JVM-side inside codegen — no UDF."""
    clean = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey").isNotNull())
        .select("c_custkey", "c_name")
    )
    key3 = F.col("c_custkey") % 3
    dirty = clean.select(
        (F.col("c_custkey") + 10_000_000).alias("d_custkey"),
        F.when(
            key3 == 0,
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
            ),
        )
        .when(key3 == 1, F.concat(F.col("c_name"), F.lit("!")))
        .otherwise(F.col("c_name"))
        .alias("d_name"),
    )
    joined = clean.join(
        dirty,
        F.substring("c_name", 1, 17) == F.substring("d_name", 1, 17),
    )
    dist = F.levenshtein(F.col("c_name"), F.col("d_name"))
    return (
        joined.where(dist <= 1)
        .select("c_custkey", "d_custkey", dist.cast("long").alias("dist"))
    )


# ---------------------------------------------------------------------------
# Synthesized partsupp + the real TPC-H Q2 / Q11 / Q16 / Q20 shapes
# (r5 verdict item #7: the driver testdata ships no partsupp table, so
# BOTH engines derive the SAME deterministic one — Spark from part with
# an integer-arithmetic explode, DuckDB from an identical CTE — making
# the genuine partsupp-dependent query shapes oracle-checkable.)
# ---------------------------------------------------------------------------

_PARTSUPP_SQL = """partsupp AS (
    SELECT p_partkey                                             AS ps_partkey,
           (p_partkey * 4 + i) % (SELECT count(*) FROM supplier) AS ps_suppkey,
           CAST((p_partkey * 7 + i * 13) % 9999 + 1 AS INT)      AS ps_availqty,
           CAST((p_partkey * 31 + i * 7919) % 100000 AS DOUBLE)
               / 100.0 + 1.0                                     AS ps_supplycost
    FROM part, UNNEST([0, 1, 2, 3]) AS t(i)
)"""


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp (TPC-H 4.2.3's '4 suppliers per part'
    shape): ps_suppkey/availqty/supplycost are pure integer arithmetic
    over (p_partkey, i∈0..3), so Spark and DuckDB (``_PARTSUPP_SQL``)
    derive bit-identical tables with no shared staging file.  The
    (4·p+i) mod |supplier| spread guarantees the 4 suppliers of a part
    are distinct (|supplier| ≥ 4) and every generated key exists
    (supplier keys are dense 0..N−1 in the testdata; asserted cheap).
    supplycost = (int % 100000)/100.0 + 1.0 uses identical IEEE ops on
    identical integers in both engines, so equality joins on it are
    exact.  Scale shape: a 4-way map-side explode of part — partsupp
    is fact-sized and NEVER collected; only the one-row supplier count
    touches the driver."""
    from shopify_youtube_etl_spark.plans.common import table_row_count

    # Footer row count (exact, no Spark job); `or 1` = empty-table guard (ANSI % 0).
    n_supp = table_row_count(spark, sf_dir, "supplier") or 1
    i = F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("i")
    return t(spark, sf_dir, "part").select("p_partkey", i).select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") * 4 + F.col("i")) % n_supp).alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + F.col("i") * 13) % 9999 + 1)
        .cast("int")
        .alias("ps_availqty"),
        (
            ((F.col("p_partkey") * 31 + F.col("i") * 7919) % 100000).cast("double")
            / 100.0
            + 1.0
        ).alias("ps_supplycost"),
    )


@query(
    "tpch_q2_real",
    ref="TPC-H Q2 (genuine shape, synthesized partsupp): min-cost supplier per part within a region, correlated-min subquery as argmin join",
    doc="EUROPE suppliers offering the regional minimum supplycost for mid-size STANDARD parts, ordered by account balance.",
    oracle=f"""
WITH {_PARTSUPP_SQL},
eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
offers AS (
    SELECT ps_partkey, ps_suppkey, ps_supplycost
    FROM partsupp JOIN eu ON ps_suppkey = s_suppkey
),
best AS (
    SELECT ps_partkey, min(ps_supplycost) AS min_cost
    FROM offers GROUP BY ps_partkey
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       p_partkey, p_name, round(o.ps_supplycost, 2) AS min_supplycost
FROM offers o
JOIN best ON o.ps_partkey = best.ps_partkey AND o.ps_supplycost = best.min_cost
JOIN part ON p_partkey = o.ps_partkey AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
JOIN eu   ON s_suppkey = o.ps_suppkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, o.ps_suppkey
LIMIT 100
""",
)
def tpch_q2_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuine Q2: the spec's correlated ``ps_supplycost = (SELECT
    min(ps_supplycost) … WHERE ps_partkey = p_partkey AND region)``
    rewritten as the scalable argmin — ONE pass over the regional
    offers builds per-part minima, and the equality join back recovers
    the argmin rows (ties kept, as the spec's ORDER BY implies).  The
    region→nation→supplier dim chain broadcasts into partsupp, the two
    part-keyed aggs reuse one shuffle key (AQE coalesces), and the
    size/type part filter broadcasts as a dim prune.  ORDER BY is a
    TOTAL key (…, p_partkey, ps_suppkey) so LIMIT 100 is deterministic
    on both engines."""
    eu = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = synth_partsupp(spark, sf_dir).join(
        F.broadcast(eu.select("s_suppkey")),
        F.col("ps_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    best = offers.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    part = (
        t(spark, sf_dir, "part")
        .where(F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    return (
        offers.join(
            best.withColumnRenamed("ps_partkey", "b_partkey"),
            (F.col("ps_partkey") == F.col("b_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("ps_supplycost", 2).alias("min_supplycost"),
            "ps_suppkey",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "ps_suppkey"
        )
        .limit(100)
        .drop("ps_suppkey")
    )


@query(
    "tpch_q11_real",
    ref="TPC-H Q11 (genuine shape, synthesized partsupp): national inventory value vs a scalar fraction of its own total",
    doc="NATION_7 partsupp inventory value (supplycost x availqty) per part, kept where it exceeds 0.1% of the national total.",
    oracle=f"""
WITH {_PARTSUPP_SQL},
v AS (
    SELECT ps_partkey, sum(ps_supplycost * ps_availqty) AS val
    FROM partsupp
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY ps_partkey
)
SELECT ps_partkey, round(val, 2) AS part_value
FROM v
WHERE val > 0.001 * (SELECT sum(val) FROM v)
""",
)
def tpch_q11_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuine Q11 over the synthesized partsupp: per-part
    inventory value restricted to one nation's suppliers, HAVING a
    scalar fraction of the same aggregate's grand total.  The total
    derives from the already-reduced per-part frame (one extra partial
    agg — NEVER a second partsupp scan) and broadcasts into the
    comparison; the nation filter pushes through the broadcast
    supplier dim so non-NATION_7 rows never enter the value shuffle.
    Unrounded doubles feed the threshold on both engines (identical
    IEEE arithmetic on identical inputs); rounding is output-only."""
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    v = (
        synth_partsupp(spark, sf_dir)
        .join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"))
    )
    tot = v.agg(F.sum("val").alias("tv"))
    return (
        v.join(F.broadcast(tot))
        .where(F.col("val") > 0.001 * F.col("tv"))
        .select("ps_partkey", F.round("val", 2).alias("part_value"))
    )


@query(
    "tpch_q16_supplier_counts",
    ref="TPC-H Q16 (genuine shape, synthesized partsupp): distinct-supplier census by part attributes with a NOT-IN supplier exclusion",
    doc="Distinct supplier count per (brand, type, size) for selected sizes, excluding Brand#2, MEDIUM parts, and delinquent (negative-balance) suppliers.",
    oracle=f"""
WITH {_PARTSUPP_SQL}
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#2'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 9, 15, 23, 31, 39, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuine Q16 shape: partsupp × part attribute census with a
    NOT IN supplier exclusion — the spec's '%Customer%Complaints%'
    comment scan adapted to negative account balance (the testdata
    supplier has no comment column; the EXCLUSION-SUBQUERY shape is
    the point).  The NOT IN rewrites as a broadcast LEFT ANTI join
    (s_suppkey is non-null, so anti-join ≡ NOT IN here); the part
    attribute filter broadcasts; the only fact-sized shuffle is the
    final distinct-count partial agg on (brand, type, size)."""
    bad = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = (
        t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#2")
            & ~F.col("p_type").startswith("MEDIUM")
            & F.col("p_size").isin(1, 9, 15, 23, 31, 39, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        synth_partsupp(spark, sf_dir)
        .join(F.broadcast(bad), F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_surplus_suppliers",
    ref="TPC-H Q20 (genuine shape, synthesized partsupp): suppliers holding surplus stock of promo-name parts vs a year's shipments",
    doc="AMERICA suppliers whose availqty for a 'small%' part exceeds 150x that part's 1996 shipped quantity.",
    oracle=f"""
WITH {_PARTSUPP_SQL},
shipped AS (
    SELECT l_partkey, sum(l_quantity) AS qty
    FROM lineitem
    WHERE l_shipdate >= make_timestamp(1996, 1, 1, 0, 0, 0)
      AND l_shipdate <  make_timestamp(1997, 1, 1, 0, 0, 0)
    GROUP BY l_partkey
),
surplus AS (
    SELECT DISTINCT ps_suppkey
    FROM partsupp
    JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') p
         ON ps_partkey = p_partkey
    JOIN shipped ON l_partkey = ps_partkey
    WHERE ps_availqty > 150 * qty
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
JOIN surplus ON s_suppkey = ps_suppkey
""",
)
def tpch_q20_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuine Q20 shape: the spec's correlated ``ps_availqty >
    (SELECT 0.5·sum(l_quantity) …)`` decorrelates into a shipped-
    quantity aggregate joined back to partsupp — an inner join,
    because the spec's correlated comparison is NULL (row dropped)
    when nothing shipped, and both engines encode that identically.
    Two calibrations to the synthesized partsupp, documented: the
    shipped aggregate is at PART grain (lineitem's supplier
    assignment is independent of the synthesized pairs, so the
    pair-grain join would be near-empty by construction) and the
    spec's 0.5 multiplier becomes 150 (availqty is uniform [1,9999]
    while a part's year-volume median is ~110 — 150× keeps the
    surplus predicate genuinely discriminative: ~40% of suppliers
    qualify, not ~0% or ~100%).  Scale shape: lineitem reduces
    map-side-partial on l_partkey BEFORE the join (the only
    fact-sized shuffle); the 'small%' part prune and the
    region-filtered supplier dim both broadcast; DISTINCT collapses
    suppliers before the tiny final semi-join."""
    shipped = (
        t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    small = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    surplus = (
        synth_partsupp(spark, sf_dir)
        .join(F.broadcast(small), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(shipped, F.col("ps_partkey") == F.col("l_partkey"))
        .where(F.col("ps_availqty") > 150 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    am_nations = t(spark, sf_dir, "nation").join(
        F.broadcast(t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
        "left_semi",
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(am_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .join(F.broadcast(surplus), F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q9_product_profit",
    ref="TPC-H Q9 (genuine shape, synthesized partsupp): product-type profit by nation and order year — the 5-way fact-dim star with a computed measure spanning two fact-side tables",
    doc="Per (nation, order year): total profit on 'widget' parts = revenue minus supplycost x quantity, over lineitems whose (part, supplier) pair exists in the synthesized partsupp.",
    oracle=f"""
WITH {_PARTSUPP_SQL}
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - ps_supplycost * l_quantity), 2)    AS sum_profit
FROM lineitem
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%widget%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuine Q9: profit = revenue − supply cost, where the cost
    side comes from partsupp keyed by the lineitem's OWN (part,
    supplier) pair — the query that exists to punish engines that
    can't join two fact-grain tables efficiently.  Plan shape: the
    'widget' part prune broadcasts into the lineitem scan FIRST
    (shrinking the fact side before anything wide), partsupp joins on
    the composite (partkey, suppkey) — at 100 TB both sides bucket on
    partkey so this is the co-located join bucketed_join_no_shuffle
    proves — then orders attaches on orderkey (the one remaining
    fact-sized shuffle) and supplier/nation broadcast.  Note the
    synthesized partsupp covers ~4% of lineitem pairs (its supplier
    spread is arithmetic, not the generator's), so the profit base is
    the matched subset — deterministic and identical in both engines.
    Output rounding only; unrounded doubles never compared."""
    part_w = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("widget"))
        .select("p_partkey")
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .join(F.broadcast(part_w), F.col("l_partkey") == F.col("p_partkey"))
    )
    ps = synth_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", "ps_supplycost"
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("ps_supplycost") * F.col("l_quantity")
                ),
                2,
            ).alias("sum_profit")
        )
    )


@query(
    "tpch_q4_priority_census",
    ref="TPC-H Q4 shape — quarter-sliced order census gated by a decorrelated EXISTS over the fact table",
    doc="Orders placed in 1996-Q3 with at least one late lineitem (shipped >90 days after the order date), counted per order priority; late-commit columns absent from the testdata, so lateness is ship-lag-based (the EXISTS-decorrelation shape is the point).",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
""",
)
def tpch_q4_priority_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4's planner feature: a correlated EXISTS against the fact table
    that must decorrelate into a LEFT SEMI join — never a per-row
    subquery.  The correlation predicate references BOTH sides
    (l_shipdate > o_orderdate + 90d), so the semi join carries it as a
    join condition rather than a pushable filter; the quarter slice
    prunes orders before the join, and at 100 TB both sides shuffle on
    orderkey once (or not at all when bucketed — the layout
    ``bucketed_join_no_shuffle`` proves).  EXISTS semantics mean the
    fact side needs NO pre-aggregation: semi join short-circuits on
    first match, the census groupBy runs on the already-small filtered
    orders.  Reference parity: the spec's l_commitdate < l_receiptdate
    lateness is untestable here (columns absent); ship-lag lateness
    keeps the predicate fact-side and ~30% selective."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q12_late_lines_by_class",
    ref="TPC-H Q12 shape — fact-dim join feeding a two-way conditional aggregate over a category slice",
    doc="1997-shipped lineitems in return classes R/A that shipped >90 days late, split per class into high-priority (1-URGENT/2-HIGH) and low-priority order counts; l_shipmode absent from the testdata, so l_returnflag plays the category (the dual-CASE census shape is the point).",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
""",
)
def tpch_q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shape: every single-side predicate (category IN-list, ship
    year) pushes into the lineitem SCAN — only the survivors join to
    orders — while the cross-side lateness predicate rides the join
    condition; the final census is ONE pass of two conditional sums,
    never two filtered joins.  At 100 TB the orderkey join is the sole
    fact-sized shuffle (both sides bucket on orderkey in the engine's
    layout); the dual CASE keeps high/low priority in the same
    aggregation buffer.  Reference parity: l_shipmode and the
    commit/receipt dates are absent from the testdata, so l_returnflag
    is the category axis and lateness is ship-lag-based — the operator
    composition (pushed slice + join-condition predicate + dual
    conditional agg) is exactly the spec's."""
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "sql_script_recent_rollup",
    ref="SURVEY §3 orchestration — the reference sequences its SQL statements from Python (shopify_etl.py run() issuing dependent statements); SQL scripting (Spark 4 BEGIN…END) moves that sequencing into the engine",
    doc="Multi-statement SQL script (DECLARE / SET from scalar subquery / IF-ELSE branch / final rollup) run as one compound statement; oracle folds the taken branch into a CASE.",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS mx FROM orders),
cut AS (
    SELECT CASE WHEN mx >= TIMESTAMP '1995-06-01' THEN mx - INTERVAL 90 DAY
                ELSE mx - INTERVAL 180 DAY END AS cutoff
    FROM mx
)
SELECT c_mktsegment                   AS segment,
       CAST(count(*) AS BIGINT)       AS n_orders,
       round(sum(o_totalprice), 2)    AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
CROSS JOIN cut
WHERE o_orderdate >= cutoff
GROUP BY c_mktsegment
""",
)
def sql_script_recent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pipeline is a Python function issuing dependent
    SQL statements in order (compute a cursor, then query with it);
    SQL scripting is the engine-native form of that control flow — the
    compound ``BEGIN…END`` block owns the variables and the branch, so
    the orchestration travels WITH the query text instead of living in
    client code.  Scripting is a driver-side control layer only: each
    statement inside the block is planned by Catalyst exactly as if
    issued alone (the rollup below keeps its pushed filter and
    broadcast-able join; variables bind as literals, like named-param
    SQL).  The oracle proves branch equivalence by folding the IF into
    a CASE-derived cutoff — same rows either way, so the scripted and
    declarative forms are interchangeable."""
    from shopify_youtube_etl_spark.sources.tables import ensure_views

    ensure_views(spark, sf_dir, ("orders", "customer"))
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
BEGIN
    DECLARE mx TIMESTAMP;
    DECLARE cutoff TIMESTAMP;
    SET mx = (SELECT max(o_orderdate) FROM orders);
    IF mx >= TIMESTAMP '1995-06-01' THEN
        SET cutoff = mx - INTERVAL 90 DAY;
    ELSE
        SET cutoff = mx - INTERVAL 180 DAY;
    END IF;
    SELECT c_mktsegment                AS segment,
           CAST(count(*) AS BIGINT)    AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= cutoff
    GROUP BY c_mktsegment;
END
"""
    )


@query(
    "top_event_paths",
    ref="product-analytics path operator — the sessionize/transition-matrix family extended to ORDERED ENTRY PATHS (the Sankey-source aggregation): per-user first-3-event sequences counted corpus-wide",
    doc="Each user's first three events (by ts, event_id) joined into a '>' path string; users with fewer than 3 events excluded; count of users per path.",
    oracle="""
WITH r AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
),
p AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) AS path,
           count(*) AS n
    FROM r WHERE rn <= 3
    GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_users
FROM p WHERE n = 3
GROUP BY path
""",
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-path census: what do users DO first?  The transition
    matrix (event_transition_matrix) loses order beyond pairs; this
    keeps the ordered prefix — the aggregation a Sankey/onboarding
    funnel view consumes.

    One hash shuffle total on user_id: the row_number window and the
    per-user path aggregation share the same partitioning (Catalyst
    plans one Exchange for both — the scd2/sessionize discipline), and
    the final path census groups a |users|-sized 3-token frame.  The
    prefix cap means per-user state is 3 rows regardless of history
    length — the property that keeps the operator viable on an
    unbounded events table."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_type", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
    )
    paths = (
        r.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path"),
            F.count("*").alias("n"),
        )
        .where(F.col("n") == 3)
    )
    return paths.groupBy("path").agg(F.count("*").alias("n_users"))


@query(
    "weighted_median_price",
    ref="custom-operator class (a) — WEIGHTED median as a composition of window ops (Spark has percentile/median but no weighted form; this is the cumulative-weight crossing construction)",
    doc="Per return flag: quantity-weighted median of extended price — first price whose running quantity reaches half the group total (deterministic tie-break on orderkey, linenumber) — plus the total weight.",
    oracle="""
WITH w AS (
    SELECT l_returnflag AS rf,
           l_extendedprice AS p,
           sum(l_quantity) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ) AS cw,
           sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
    FROM lineitem
)
SELECT rf                                        AS returnflag,
       CAST(max(tw) AS BIGINT)                   AS total_qty,
       round(min(CASE WHEN cw >= tw / 2.0 THEN p END), 2) AS weighted_median_price
FROM w
GROUP BY rf
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted median (half the QUANTITY ships below this price,
    half above) — the pricing question the unweighted median answers
    wrongly whenever line sizes vary.  No engine primitive exists, so
    it is composed from what Catalyst already optimizes: a cumulative
    weight over the price order and the grand total share ONE
    partition-key exchange (same-window discipline as scd2), and the
    crossing row is a conditional min — no self-join, no sort of the
    group into the driver, no UDF.  The tie-break keys make the
    cumulative order — and therefore the crossing — deterministic on
    both engines, which is what lets a rank-statistic carry a value
    hash rather than a tolerance check."""
    from pyspark.sql.window import Window

    ordered = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    whole = Window.partitionBy("l_returnflag")
    w = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_extendedprice").alias("p"),
        F.sum("l_quantity").over(ordered).alias("cw"),
        F.sum("l_quantity").over(whole).alias("tw"),
    )
    return w.groupBy(F.col("rf").alias("returnflag")).agg(
        F.max("tw").cast("long").alias("total_qty"),
        F.round(
            F.min(F.when(F.col("cw") >= F.col("tw") / 2.0, F.col("p"))), 2
        ).alias("weighted_median_price"),
    )


@query(
    "seasonal_decompose_daily",
    ref="time-series extension of the daily-rollup family (A7/moving_average_7d) — classical additive decomposition: trend (centered MA) + weekly seasonal + residual, the series triage a metrics pipeline runs before anomaly thresholds",
    doc="Daily order revenue decomposed into a centered 7-day trend, a weekday-of-cycle seasonal mean, and the residual; trend only where the window is complete.",
    oracle="""
WITH daily AS (
    SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS day,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(min(o_orderdate) AS DATE)) AS BIGINT)      AS day_num,
           round(sum(o_totalprice), 2)                          AS daily_rev
    FROM orders GROUP BY 1
),
tr AS (
    SELECT day, day_num, daily_rev,
           CASE WHEN count(*) OVER w = 7
                THEN round(avg(daily_rev) OVER w, 4) END AS trend
    FROM daily
    WINDOW w AS (ORDER BY day_num ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
seas AS (
    SELECT day_num % 7 AS dow, round(avg(daily_rev - trend), 4) AS seasonal
    FROM tr WHERE trend IS NOT NULL GROUP BY 1
)
SELECT day, daily_rev, trend, seasonal,
       round(daily_rev - trend - seasonal, 4) AS residual
FROM tr JOIN seas ON tr.day_num % 7 = seas.dow
""",
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition y = trend + seasonal + residual — the
    split that turns "is today's revenue weird?" into a residual test
    instead of a raw-value test (daily_anomaly_mad's natural upstream).
    Trend is a CENTERED 7-row moving average, emitted only where all 7
    rows exist (edges stay NULL rather than biasing toward the series
    interior); the seasonal term is the per-weekday mean of the
    detrended series, where "weekday" is epoch-day mod 7 — a calendar-
    free index that both engines compute identically (dayofweek()
    origin conventions differ between engines; modulo arithmetic
    doesn't).  Scale: the raw table reduces to day grain in ONE
    partial-agg shuffle; every window and join after that runs on a
    ~365·years-row frame regardless of input size, and the 7-row
    seasonal table broadcasts back.  Components are rounded BEFORE the
    residual subtraction so both engines difference the same
    representable values."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(day_str(F.col("o_orderdate")).alias("day"))
        .agg(
            epoch_day(F.min(F.col("o_orderdate").cast("date"))).alias("day_num"),
            money(F.sum("o_totalprice")).alias("daily_rev"),
        )
    )
    w = Window.orderBy("day_num").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "day_num",
        "daily_rev",
        F.when(
            F.count("*").over(w) == 7, F.round(F.avg("daily_rev").over(w), 4)
        ).alias("trend"),
    )
    seas = (
        tr.where(F.col("trend").isNotNull())
        .groupBy((F.col("day_num") % 7).alias("dow"))
        .agg(F.round(F.avg(F.col("daily_rev") - F.col("trend")), 4).alias("seasonal"))
    )
    return tr.join(F.broadcast(seas), tr["day_num"] % 7 == seas["dow"]).select(
        "day",
        "daily_rev",
        "trend",
        "seasonal",
        F.round(F.col("daily_rev") - F.col("trend") - F.col("seasonal"), 4).alias(
            "residual"
        ),
    )


@query(
    "market_basket_lift",
    ref="co-occurrence analytics next to triangle_count_copurchase — association mining at brand grain: support / confidence / lift for brand pairs sharing an order",
    doc="Brand pairs co-occurring in ≥ 40 orders, with support, directional confidence, and lift against independence.",
    oracle="""
WITH baskets AS (
    SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT CAST(count(DISTINCT okey) AS DOUBLE) AS n_orders FROM baskets),
marg AS (
    SELECT brand, CAST(count(*) AS DOUBLE) AS n_brand FROM baskets GROUP BY brand
),
pairs AS (
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(count(*) AS DOUBLE) AS n_pair
    FROM baskets a JOIN baskets b
      ON a.okey = b.okey AND a.brand < b.brand
    GROUP BY 1, 2
)
SELECT brand_a, brand_b,
       CAST(n_pair AS BIGINT)                            AS n_orders_both,
       round(n_pair / n.n_orders, 6)                     AS support,
       round(n_pair / ma.n_brand, 6)                     AS confidence_a_to_b,
       round(n_pair * n.n_orders / (ma.n_brand * mb.n_brand), 6) AS lift
FROM pairs
JOIN marg ma ON pairs.brand_a = ma.brand
JOIN marg mb ON pairs.brand_b = mb.brand
CROSS JOIN n
WHERE n_pair >= 40
""",
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: does brand A in an order
    make brand B more likely than independence predicts (lift > 1)?
    The scale discipline is the REDUCTION ORDER: lineitems collapse to
    DISTINCT (order, brand) first — bounding the self-join fan-out at
    brands-per-order (≤ |brand| = 25), not items-per-order squared —
    then the pair census shuffles on the order key both sides already
    share.  The brand marginals (≤ 25 rows) and the one-row order
    count broadcast into the scoring join, so support/confidence/lift
    are computed without any second pass over data-sized frames.  A
    min-support gate (≥ 40 co-orders) is applied AFTER counting — the
    standard a-priori pruning point where, at 100 TB, the surviving
    candidate set collapses to broadcastable size.

    Plan note: the oracle's self-join formulation would re-shuffle the
    basket frame twice more (re-exchange on the order key both sides,
    then the pair census); instead baskets collapse to ONE sorted-set
    row per order in a single order-key shuffle and the pairs are
    generated MAP-SIDE from each set with higher-order array functions
    (sorted => brand_a < brand_b by construction) - leaving the
    bounded-key pair census as the only other exchange."""
    per_order = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )
    n = per_order.agg(F.count("*").cast("double").alias("n_orders"))
    marg = (
        per_order.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").cast("double").alias("n_brand"))
    )
    pair_expr = F.expr(
        "flatten(transform(brands, (x, i) -> "
        "transform(slice(brands, i + 2, size(brands)), "
        "y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pairs = (
        per_order.select(F.explode(pair_expr).alias("pr"))
        .select("pr.brand_a", "pr.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("double").alias("n_pair"))
        .where(F.col("n_pair") >= 40)
    )
    ma = marg.select(F.col("brand").alias("brand_a"), F.col("n_brand").alias("na"))
    mb = marg.select(F.col("brand").alias("brand_b"), F.col("n_brand").alias("nb"))
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .join(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_pair").cast("long").alias("n_orders_both"),
            F.round(F.col("n_pair") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("na"), 6).alias("confidence_a_to_b"),
            F.round(
                F.col("n_pair") * F.col("n_orders") / (F.col("na") * F.col("nb")), 6
            ).alias("lift"),
        )
    )


@query(
    "skyline_pareto_parts",
    ref="multi-objective frontier (skyline) operator — non-dominated set over (minimize price, maximize size), the 'best tradeoffs' query optimizers and catalog UIs both ask",
    doc="Pareto frontier of parts over (retail price ↓ better, size ↑ better): per size the min price, kept only where no larger size is as cheap; with the count of parts achieving each frontier point.",
    oracle="""
WITH per_size AS (
    SELECT p_size AS size, min(p_retailprice) AS best_price
    FROM part GROUP BY p_size
),
frontier AS (
    SELECT size, best_price,
           min(best_price) OVER (ORDER BY size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS better_above
    FROM per_size
)
SELECT f.size,
       round(f.best_price, 2)        AS best_price,
       CAST(count(*) AS BIGINT)      AS n_parts_at_point,
       CAST(min(p.p_partkey) AS BIGINT) AS example_partkey
FROM frontier f
JOIN part p ON p.p_size = f.size AND p.p_retailprice = f.best_price
WHERE f.better_above IS NULL OR f.best_price < f.better_above
GROUP BY 1, 2
""",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Börzsönyi et al.'s SKYLINE OF): the set of parts no
    other part beats on BOTH price and size.  The naive formulation is
    a quadratic NOT EXISTS self-join; this plan uses the dominance
    structure instead: any skyline point must be the min price within
    its size (same-size-cheaper dominates), so the table first reduces
    to one row per size in a partial-agg shuffle — after which the
    frontier test is a running min over the size-descending order
    (strictly cheaper than every larger size) on a |distinct size|-row
    frame.  At 100 TB that reduction is the whole story: the window
    runs on ≤ a-few-thousand rows no matter the input, and the
    join-back that counts parts AT each frontier point broadcasts the
    frontier.  Equal-price ties at different sizes resolve to the
    larger size (strict <), matching strict Pareto dominance."""
    per_size = (
        t(spark, sf_dir, "part")
        .groupBy(F.col("p_size").alias("size"))
        .agg(F.min("p_retailprice").alias("best_price"))
    )
    w = Window.orderBy(F.col("size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = per_size.select(
        "size", "best_price", F.min("best_price").over(w).alias("better_above")
    ).where(
        F.col("better_above").isNull() | (F.col("best_price") < F.col("better_above"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    return (
        p.join(
            F.broadcast(frontier),
            (p["p_size"] == frontier["size"])
            & (p["p_retailprice"] == frontier["best_price"]),
        )
        .groupBy("size", F.round("best_price", 2).alias("best_price"))
        .agg(
            F.count("*").alias("n_parts_at_point"),
            F.min("p_partkey").alias("example_partkey"),
        )
    )


@query(
    "cusum_daily_drift",
    ref="monitoring family next to daily_anomaly_mad — CUSUM change-point detection (Page 1954) over the daily value series, the drift alarm a metrics pipeline runs on ingest volume",
    doc="Daily event-value means with one-sided upper/lower CUSUM statistics (allowance k = 0.5σ, threshold h = 4σ) and drift flags; the recursion is rewritten as prefix-sum minus running extremum so it is pure window algebra.",
    oracle="""
WITH daily AS (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(min(CAST(ts AS TIMESTAMP)) AS DATE)) AS BIGINT) AS day_num,
           avg(value) AS daily_mean
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1
),
g AS (
    SELECT avg(daily_mean) AS mu, stddev_samp(daily_mean) AS sigma FROM daily
),
c AS (
    SELECT day, day_num, daily_mean, mu, sigma,
           sum(daily_mean - mu - 0.5 * sigma)
               OVER (ORDER BY day_num) AS c_up,
           sum(daily_mean - mu + 0.5 * sigma)
               OVER (ORDER BY day_num) AS c_dn
    FROM daily CROSS JOIN g
),
s AS (
    SELECT day, daily_mean, mu, sigma,
           c_up - least(0, min(c_up) OVER (ORDER BY day_num
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s_up,
           greatest(0, max(c_dn) OVER (ORDER BY day_num
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - c_dn AS s_dn
    FROM c
)
SELECT day,
       round(daily_mean, 4)                   AS daily_mean,
       round(s_up, 4)                         AS cusum_up,
       round(s_dn, 4)                         AS cusum_down,
       (s_up > 4 * sigma OR s_dn > 4 * sigma) AS drift
FROM s
""",
)
def cusum_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM is textbook-recursive (S_t = max(0, S_{t-1} + y_t)) —
    which looks like a sequential loop until the reflected-walk
    identity turns it into window algebra: S_t = C_t − min(0, min_{j<t}
    C_j) where C is the plain prefix sum of the allowanced deviations.
    That identity is what makes the drift detector DISTRIBUTABLE: one
    day-grain reduction shuffle, then two running sums and two running
    extrema over the ~365·years-row series — no UDF, no iteration, no
    state.  The global mean/σ (the in-control model) broadcast from a
    one-row aggregate; k = 0.5σ allowance and h = 4σ threshold are the
    ARL-standard defaults.  Upper and lower statistics run in the same
    window pass; the lower is the mirrored identity."""
    daily = (
        t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(day_str(F.col("ts")).alias("day"))
        .agg(
            epoch_day(F.min(F.col("ts").cast("date"))).alias("day_num"),
            F.avg("value").alias("daily_mean"),
        )
    )
    g = daily.agg(
        F.avg("daily_mean").alias("mu"), F.stddev_samp("daily_mean").alias("sigma")
    )
    run = Window.orderBy("day_num")
    # The running extremum INCLUDES the current row: S_t = C_t -
    # min(0, min_{j<=t} C_j).  With j<t only, a new prefix minimum
    # below zero would drive S_t negative where Page's recursion
    # clamps to 0 (pinned by the window-identity property test).
    prev = Window.orderBy("day_num").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.join(F.broadcast(g)).select(
        "day",
        "day_num",
        "daily_mean",
        "mu",
        "sigma",
        F.sum(F.col("daily_mean") - F.col("mu") - 0.5 * F.col("sigma"))
        .over(run)
        .alias("c_up"),
        F.sum(F.col("daily_mean") - F.col("mu") + 0.5 * F.col("sigma"))
        .over(run)
        .alias("c_dn"),
    )
    s_up = F.col("c_up") - F.least(F.lit(0.0), F.min("c_up").over(prev))
    s_dn = F.greatest(F.lit(0.0), F.max("c_dn").over(prev)) - F.col("c_dn")
    return c.select(
        "day",
        F.round("daily_mean", 4).alias("daily_mean"),
        F.round(s_up, 4).alias("cusum_up"),
        F.round(s_dn, 4).alias("cusum_down"),
        ((s_up > 4 * F.col("sigma")) | (s_dn > 4 * F.col("sigma"))).alias("drift"),
    )


@query(
    "gini_segment_inequality",
    ref="distribution-shape family next to segment_price_quantiles — Gini coefficient of order value per market segment, the one-number inequality summary",
    doc="Per market segment: order count, mean value, and the Gini coefficient computed by the rank formula G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx).",
    oracle="""
WITH r AS (
    SELECT c_mktsegment AS segment,
           o_totalprice AS x,
           row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY o_totalprice, o_orderkey) AS rk
    FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT segment,
       CAST(count(*) AS BIGINT)  AS n_orders,
       round(avg(x), 2)          AS mean_value,
       round((2.0 * sum(rk * x) - (count(*) + 1) * sum(x))
             / (count(*) * sum(x)), 6) AS gini
FROM r GROUP BY segment
""",
)
def gini_segment_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is revenue concentrated in a few whale orders or spread evenly?
    Gini answers in one number per segment, and the rank formula makes
    it a WINDOW + AGG — no pairwise |x_i − x_j| double sum (the naive
    definition is a self-join this plan never does).  The rank and the
    aggregation PARTITION BY the same segment key, so Catalyst runs
    both on a single exchange (the same-window discipline as scd2 /
    weighted_median).  Ties in x make Σ rank·x invariant to tie order
    (swapping equal values doesn't change the sum), so the orderkey
    tie-break is for rank determinism only — the statistic itself is
    well-defined.  At 100 TB: one shuffle on segment, window within
    partitions, 5-row output."""
    r = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice").alias("x"),
            F.row_number()
            .over(
                Window.partitionBy("c_mktsegment").orderBy(
                    "o_totalprice", "o_orderkey"
                )
            )
            .alias("rk"),
        )
    )
    n, sx = F.count("*"), F.sum("x")
    return r.groupBy("segment").agg(
        n.alias("n_orders"),
        F.round(F.avg("x"), 2).alias("mean_value"),
        F.round(
            (2.0 * F.sum(F.col("rk") * F.col("x")) - (n + 1) * sx) / (n * sx), 6
        ).alias("gini"),
    )


@query(
    "ab_test_conversion",
    ref="experimentation readout — two-proportion z-test on user-grain conversion between hash-assigned arms, the A/B significance call every growth pipeline renders",
    doc="Users split into arms by user_id parity; conversion = heavy buyer (purchase count above the global per-user mean). Per arm the user count and rate, plus the pooled two-proportion z statistic and |z| > 1.96 verdict (one row; z NULL if pooled variance degenerates).",
    oracle="""
WITH pc AS (
    SELECT user_id, user_id % 2 AS arm,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
),
g AS (SELECT avg(np) AS mnp FROM pc),
a AS (
    SELECT arm, CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CASE WHEN np > g.mnp THEN 1 ELSE 0 END) AS DOUBLE) AS conv
    FROM pc CROSS JOIN g GROUP BY arm
),
w AS (
    SELECT max(CASE WHEN arm = 0 THEN n END)    AS n0,
           max(CASE WHEN arm = 0 THEN conv END) AS c0,
           max(CASE WHEN arm = 1 THEN n END)    AS n1,
           max(CASE WHEN arm = 1 THEN conv END) AS c1
    FROM a
),
z AS (
    SELECT n0, n1, c0, c1,
           (c1 / n1 - c0 / n0)
           / nullif(sqrt(((c0 + c1) / (n0 + n1)) * (1 - (c0 + c1) / (n0 + n1))
                         * (1 / n0 + 1 / n1)), 0) AS zs
    FROM w
)
SELECT CAST(n0 AS BIGINT) AS n_users_control,
       CAST(n1 AS BIGINT) AS n_users_treatment,
       round(c0 / n0, 6)  AS rate_control,
       round(c1 / n1, 6)  AS rate_treatment,
       round(zs, 6)       AS z_score,
       abs(zs) > 1.96     AS significant
FROM z
""",
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The readout that closes an experiment: is the treatment arm's
    conversion DIFFERENT beyond chance?  Assignment is deterministic
    (user_id parity — the hash-bucket assignment real platforms use,
    so re-runs agree); the unit of analysis is the USER, not the
    event, so events first collapse to user-grain purchase counts in
    one user-key shuffle — double-counting multi-purchase users is THE
    classic A/B bug and this reduction is the guard.  "Converted"
    means a purchase count above the global per-user mean (a relative
    threshold that stays non-degenerate at any corpus size, unlike
    any-purchase, which saturates).  Arm totals pivot through a
    conditional agg into one row; the pooled two-proportion z is plain
    arithmetic on that row, with the degenerate pooled-variance case
    (all or none converted) surfaced as NULL via try_divide — the
    ansi_safe_arithmetic discipline — rather than a job-killing
    divide-by-zero five hours into a 100 TB run."""
    pc = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np")
        )
        .select("user_id", (F.col("user_id") % 2).alias("arm"), "np")
    )
    g = pc.agg(F.avg("np").alias("mnp"))
    a = (
        pc.join(F.broadcast(g))
        .groupBy("arm")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.when(F.col("np") > F.col("mnp"), 1).otherwise(0))
            .cast("double")
            .alias("conv"),
        )
    )
    w = a.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    p0, p1 = F.col("c0") / F.col("n0"), F.col("c1") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1"))
    z = F.try_divide(
        p1 - p0,
        F.nullif(
            F.sqrt(pp * (1 - pp) * (1 / F.col("n0") + 1 / F.col("n1"))), F.lit(0.0)
        ),
    )
    return w.select(
        F.col("n0").cast("long").alias("n_users_control"),
        F.col("n1").cast("long").alias("n_users_treatment"),
        F.round(p0, 6).alias("rate_control"),
        F.round(p1, 6).alias("rate_treatment"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@query(
    "benford_law_audit",
    ref="audit family next to expectations_report — Benford's-law first-digit screen over order values, the classic books-cooking / synthetic-data detector",
    doc="Per leading digit 1-9 of o_totalprice: count, observed frequency, the Benford expectation log10(1+1/d), and the chi-square contribution.",
    oracle="""
WITH d AS (
    SELECT CAST(substr(CAST(CAST(trunc(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                AS BIGINT) AS digit
    FROM orders WHERE o_totalprice >= 1
),
o AS (
    SELECT digit, CAST(count(*) AS DOUBLE) AS n FROM d GROUP BY digit
),
tot AS (SELECT sum(n) AS total FROM o)
SELECT digit,
       CAST(n AS BIGINT)                                   AS n_orders,
       round(n / total, 6)                                 AS observed_freq,
       round(log10(1 + 1.0 / digit), 6)                    AS benford_freq,
       round(pow(n / total - log10(1 + 1.0 / digit), 2)
             / log10(1 + 1.0 / digit) * total, 4)          AS chi2_term
FROM o CROSS JOIN tot
""",
)
def benford_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naturally-arising monetary amounts follow Benford's law (digit d
    leads with probability log10(1+1/d)); fabricated or templated
    values don't — so the first-digit histogram is a one-pass fraud /
    synthetic-data screen.  The leading digit comes from the STRING of
    the truncated integer part, not floor(x/10^floor(log10 x)):
    log10's last-ulp behavior at exact powers of ten differs between
    libm implementations, while integer truncation + substring is
    bit-exact on both engines (DuckDB CAST(double AS BIGINT) ROUNDS,
    hence the explicit trunc).  Plan: one scan reduced to ≤ 9 groups
    map-side, one-row total broadcast back — nothing downstream of the
    scan is data-sized."""
    d = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.col("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
    )
    o = d.groupBy("digit").agg(F.count("*").cast("double").alias("n"))
    tot = o.agg(F.sum("n").alias("total"))
    benford = F.log10(1 + 1.0 / F.col("digit"))
    freq = F.col("n") / F.col("total")
    return o.join(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("long").alias("n_orders"),
        F.round(freq, 6).alias("observed_freq"),
        F.round(benford, 6).alias("benford_freq"),
        F.round(F.pow(freq - benford, 2) / benford * F.col("total"), 4).alias(
            "chi2_term"
        ),
    )


@query(
    "chi_square_independence",
    ref="statistical-test family next to ab_test_conversion — chi-square test of independence on the segment × order-priority contingency table",
    doc="One row: the chi-square statistic for independence of customer market segment and order priority, with degrees of freedom and the n it was computed from.",
    oracle="""
WITH obs AS (
    SELECT c_mktsegment AS seg, o_orderpriority AS pri,
           CAST(count(*) AS DOUBLE) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
),
rm AS (SELECT seg, sum(n) AS rn FROM obs GROUP BY seg),
cm AS (SELECT pri, sum(n) AS cn FROM obs GROUP BY pri),
tot AS (SELECT sum(n) AS total FROM obs)
SELECT round(sum(pow(obs.n - rm.rn * cm.cn / tot.total, 2)
                 / (rm.rn * cm.cn / tot.total)), 4) AS chi2,
       CAST((count(DISTINCT obs.seg) - 1)
            * (count(DISTINCT obs.pri) - 1) AS BIGINT) AS dof,
       CAST(max(tot.total) AS BIGINT) AS n_orders
FROM obs
JOIN rm USING (seg)
JOIN cm USING (pri)
CROSS JOIN tot
""",
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are order priorities distributed the same way in every market
    segment?  The chi-square independence statistic answers from the
    CONTINGENCY TABLE alone — so the corpus reduces to |seg|×|pri|
    cells in one partial-agg shuffle, and everything after (marginals,
    expected counts, the statistic) is arithmetic over a ≤ 25-row
    frame with broadcast joins.  The zero-expected-cell case cannot
    arise (marginals of observed cells are positive by construction).
    The same shape scales to any two low-cardinality columns at
    100 TB: the data pass is the cell census; the test is free."""
    obs = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").cast("double").alias("n"))
    )
    rm = obs.groupBy("seg").agg(F.sum("n").alias("rn"))
    cm = obs.groupBy("pri").agg(F.sum("n").alias("cn"))
    tot = obs.agg(F.sum("n").alias("total"))
    exp = F.col("rn") * F.col("cn") / F.col("total")
    return (
        obs.join(F.broadcast(rm), "seg")
        .join(F.broadcast(cm), "pri")
        .join(F.broadcast(tot))
        .agg(
            F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias("chi2"),
            (
                (F.countDistinct("seg") - 1) * (F.countDistinct("pri") - 1)
            ).cast("long").alias("dof"),
            F.max("total").cast("long").alias("n_orders"),
        )
    )


@query(
    "sql_scalar_udf_revenue",
    ref="Spark 4 SQL scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURN expr) — the declarative UDF tier ABOVE even Arrow: the body is SQL, so Catalyst inlines it into the plan and it runs as JVM codegen, not as any Python boundary at all",
    doc="Revenue by return flag computed through two SQL scalar UDFs (discounted price, tax-inclusive price); the oracle inlines the same expressions — proving the UDF layer adds no semantics, only naming.",
    oracle="""
SELECT l_returnflag                                        AS returnflag,
       CAST(count(*) AS BIGINT)                            AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS disc_revenue,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                           AS charged_revenue
FROM lineitem
GROUP BY l_returnflag
""",
)
def sql_scalar_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDF ladder's TOP rung: a SQL-bodied function is not an
    escape hatch at all — ``CREATE TEMPORARY FUNCTION f(...) RETURN
    expr`` registers a name whose body Catalyst INLINES before
    optimization, so the aggregate below compiles to the identical
    whole-stage-codegen plan as writing the expression out (TPC-H Q1's
    disc_price/charged_price idiom, which the reference's BigQuery SQL
    would express the same way).  Functions are session-temporary and
    CREATE OR REPLACE is idempotent, so re-running the query re-binds
    harmlessly.  The reuse win at 100 TB is organizational — one
    vetted money formula instead of N copies drifting apart — at zero
    plan cost, which the oracle proves by inlining the body."""
    from shopify_youtube_etl_spark.sources.tables import ensure_views

    ensure_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sye_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sye_charged_price("
        "p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DOUBLE RETURN sye_disc_price(p, d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag                                  AS returnflag,
               count(*)                                      AS n_lines,
               round(sum(sye_disc_price(l_extendedprice, l_discount)), 2)
                                                             AS disc_revenue,
               round(sum(sye_charged_price(l_extendedprice, l_discount, l_tax)), 2)
                                                             AS charged_revenue
        FROM lineitem
        GROUP BY l_returnflag
        """
    )


@query(
    "dictionary_encode_types",
    ref="storage/codec operator family next to zorder_locality_profile — frequency-ranked dictionary encoding of a low-cardinality string column, the layout decision columnar writers make per row-group",
    doc="The p_type dictionary ordered by (frequency desc, value): per entry its code, occurrence count, and cumulative share; plus the implied per-row byte cost of code vs raw string.",
    oracle="""
WITH freq AS (
    SELECT p_type AS value,
           CAST(count(*) AS BIGINT)       AS n,
           CAST(avg(length(p_type)) AS DOUBLE) AS raw_len
    FROM part GROUP BY p_type
),
coded AS (
    SELECT value, n, raw_len,
           CAST(row_number() OVER (ORDER BY n DESC, value) - 1 AS BIGINT) AS code,
           CAST(sum(n) OVER () AS DOUBLE) AS total
    FROM freq
)
SELECT code, value, n,
       round(sum(n) OVER (ORDER BY code) / total, 6)  AS cum_share,
       round(raw_len, 2)                              AS raw_bytes_per_row,
       CAST(CASE WHEN (SELECT count(*) FROM freq) <= 256 THEN 1 ELSE 2 END
            AS BIGINT)                                AS code_bytes_per_row
FROM coded
""",
)
def dictionary_encode_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary encoding is THE columnar-codec decision: replace a
    repeated string with a small integer code and the column's bytes
    collapse by raw_len/code_len.  The operator here builds the
    dictionary the way writers do — codes assigned by FREQUENCY RANK
    (hot values get small codes, which also helps downstream RLE) with
    a deterministic value tie-break — and reports the evidence a
    layout optimizer needs: cumulative share (how few codes cover the
    data) and per-row byte cost at the implied code width.  Plan: the
    column reduces to |distinct| rows in one partial-agg shuffle; the
    rank and cumulative share are windows over that dictionary-sized
    frame.  At 100 TB the dictionary for any sane column is KB-sized;
    the encode join-back (not materialized here) is a broadcast."""
    from pyspark.sql.window import Window

    freq = (
        t(spark, sf_dir, "part")
        .groupBy(F.col("p_type").alias("value"))
        .agg(
            F.count("*").alias("n"),
            F.avg(F.length("p_type")).alias("raw_len"),
        )
    )
    everything = Window.partitionBy()
    coded = freq.select(
        "value",
        "n",
        "raw_len",
        (
            F.row_number().over(Window.orderBy(F.col("n").desc(), "value")) - 1
        ).cast("long").alias("code"),
        F.sum("n").over(everything).cast("double").alias("total"),
        F.count("*").over(everything).alias("n_values"),
    )
    return coded.select(
        "code",
        "value",
        "n",
        F.round(
            F.sum("n").over(Window.orderBy("code")) / F.col("total"), 6
        ).alias("cum_share"),
        F.round("raw_len", 2).alias("raw_bytes_per_row"),
        F.when(F.col("n_values") <= 256, 1).otherwise(2).cast("long").alias(
            "code_bytes_per_row"
        ),
    )


@query(
    "conversion_lag_percentiles",
    ref="funnel-timing analytics next to funnel_conversion — the first-touch to first-purchase latency distribution, per arrival cohort",
    doc="Per first-event weekday cohort (epoch-day mod 7): converting-user count and exact p50/p90 of the hours from a user's first event to their first purchase.",
    oracle="""
WITH u AS (
    SELECT user_id,
           min(CAST(ts AS TIMESTAMP)) AS first_ts,
           min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
               AS first_purchase
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY user_id
),
lag AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(first_ts AS DATE)) % 7
                AS BIGINT) AS cohort_dow,
           date_diff('second', first_ts, first_purchase) / 3600.0 AS lag_h
    FROM u
    WHERE first_purchase IS NOT NULL AND first_purchase >= first_ts
)
SELECT cohort_dow,
       CAST(count(*) AS BIGINT)               AS n_converting_users,
       round(quantile_cont(lag_h, 0.5), 4)    AS p50_hours,
       round(quantile_cont(lag_h, 0.9), 4)    AS p90_hours
FROM lag GROUP BY cohort_dow
""",
)
def conversion_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """funnel_conversion counts WHO converts; this measures HOW LONG
    conversion takes — the latency distribution growth teams act on.
    The unit is the user, so events collapse to (first event, first
    purchase) in ONE user-key shuffle of min aggregates (conditional
    min for the purchase leg — no second scan, no join between event
    types); the lag percentiles then aggregate a users-sized frame by
    a 7-value cohort key.  Cohort = epoch-day mod 7 of the user's
    first touch (the calendar-free weekday index, as in
    seasonal_decompose_daily).  Exact percentiles for oracle parity;
    approx_percentile is the same plan at 100 TB."""
    u = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase"),
        )
    )
    lag = u.where(
        F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_ts"))
    ).select(
        (epoch_day(F.col("first_ts").cast("date")) % 7).alias("cohort_dow"),
        (
            (
                F.unix_timestamp("first_purchase") - F.unix_timestamp("first_ts")
            ).cast("double")
            / 3600.0
        ).alias("lag_h"),
    )
    return lag.groupBy("cohort_dow").agg(
        F.count("*").alias("n_converting_users"),
        F.round(F.percentile("lag_h", F.lit(0.5)), 4).alias("p50_hours"),
        F.round(F.percentile("lag_h", F.lit(0.9)), 4).alias("p90_hours"),
    )


@query(
    "equi_depth_histogram",
    ref="optimizer-statistics family next to column_profile_orders — the equi-depth (equi-height) histogram ANALYZE builds for selectivity estimation",
    doc="An 8-bucket equi-depth histogram of o_totalprice: per bucket its quantile boundaries, exact row count within, and the distinct-ish value spread (max-min).",
    oracle="""
WITH b AS (
    SELECT quantile_cont(o_totalprice,
               [0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0]) AS qs
    FROM orders
),
edges AS (
    SELECT k AS bucket,
           round(qs[k + 1], 6) AS lo,
           round(qs[k + 2], 6) AS hi
    FROM b, UNNEST(range(0, 8)) AS s(k)
)
SELECT bucket, lo, hi,
       CAST((SELECT count(*) FROM orders
             WHERE o_totalprice >= lo
               AND (o_totalprice < hi OR (bucket = 7 AND o_totalprice <= hi)))
            AS BIGINT) AS n_rows,
       round(hi - lo, 6) AS width
FROM edges
""",
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histograms are what ANALYZE actually stores for
    selectivity: equal ROW mass per bucket, so skew shows up as
    bucket WIDTH (a whale bucket is wide, a dense region narrow).
    Boundaries are one mergeable percentile aggregate (9 cuts, rounded
    before use so both engines bin identically); counting rows per
    bucket is a range join of the corpus against an 8-row broadcast
    edge table — half-open buckets with the top bucket closed, the
    textbook convention, so boundary-equal rows land deterministically.
    The exact counts differ from n/8 only through boundary ties —
    which is precisely the diagnostic an optimizer wants surfaced."""
    o = t(spark, sf_dir, "orders").select("o_totalprice")
    cuts = [i / 8.0 for i in range(9)]
    b = o.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(c) for c in cuts])).alias("qs")
    )
    edges = b.select(F.posexplode("qs").alias("k", "v")).select(
        "k", F.round("v", 6).alias("v")
    )
    lo = edges.select(F.col("k").alias("bucket"), F.col("v").alias("lo")).where(
        F.col("bucket") < 8
    )
    hi = edges.select((F.col("k") - 1).alias("bucket"), F.col("v").alias("hi")).where(
        F.col("bucket") >= 0
    )
    e = lo.join(hi, "bucket")
    # LEFT join from the 8-row edge frame so an EMPTY bucket (possible
    # when tie-heavy data collapses two rounded boundaries) still
    # emits its row with n_rows = 0 — the oracle's scalar-subquery
    # form always returns all 8 buckets, and so must this plan.
    joined = F.broadcast(e).join(
        o,
        (F.col("o_totalprice") >= F.col("lo"))
        & (
            (F.col("o_totalprice") < F.col("hi"))
            | ((F.col("bucket") == 7) & (F.col("o_totalprice") <= F.col("hi")))
        ),
        "left",
    )
    return joined.groupBy("bucket", "lo", "hi").agg(
        F.count("o_totalprice").alias("n_rows"),
        F.round(F.col("hi") - F.col("lo"), 6).alias("width"),
    ).select("bucket", "lo", "hi", "n_rows", "width")


@query(
    "robust_trend_theil_sen",
    ref="robust-statistics family next to cusum_daily_drift — Theil–Sen slope + Mann–Kendall trend test over the daily revenue series: the outlier-proof answer to 'is revenue trending?'",
    doc="One row: day count, Theil–Sen slope (median of all pairwise day-slopes), Mann–Kendall S and z, and the 5%-level trend verdict.",
    oracle="""
WITH daily AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01',
                CAST(min(o_orderdate) AS DATE)) AS BIGINT) AS d,
           round(sum(o_totalprice), 2)                     AS rev
    FROM orders GROUP BY strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')
),
pairs AS (
    SELECT (b.rev - a.rev) / (b.d - a.d) AS slope,
           CASE WHEN b.rev > a.rev THEN 1
                WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
    FROM daily a JOIN daily b ON a.d < b.d
),
agg AS (
    SELECT (SELECT CAST(count(*) AS DOUBLE) FROM daily) AS n,
           quantile_cont(slope, 0.5)                     AS sen,
           CAST(sum(sgn) AS DOUBLE)                      AS s
    FROM pairs
)
SELECT CAST(n AS BIGINT)   AS n_days,
       round(sen, 4)       AS sen_slope,
       CAST(s AS BIGINT)   AS mk_s,
       round((s - sign(s)) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0), 4) AS mk_z,
       CASE WHEN abs((s - sign(s)) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0)) <= 1.96
            THEN 'no-trend'
            WHEN s > 0 THEN 'increasing' ELSE 'decreasing' END AS verdict
FROM agg
""",
)
def robust_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS trend (zipf_alpha_fit's regr_slope) buys efficiency with
    fragility: one whale day drags the fit.  Theil–Sen — the MEDIAN of
    all pairwise slopes — has a 29% breakdown point, and Mann–Kendall
    turns the same pair signs into a distribution-free significance
    test.  The O(n²) pair join is safe for exactly the reason the
    module docstring reserves global windows for day-grain frames: the
    corpus reduces to ~365·years rows FIRST (one shuffle of partial
    sums), so the self-join is millions of pairs at worst regardless
    of input scale — and the slope median is one exact-percentile
    aggregate over those pairs.  MK variance uses the no-ties closed
    form; the continuity-corrected z and a 5%-level verdict make the
    output decision-shaped.  Rounded daily revenue feeds both engines
    the same pair slopes."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(day_str(F.col("o_orderdate")).alias("day"))
        .agg(
            epoch_day(F.min(F.col("o_orderdate").cast("date"))).alias("d"),
            money(F.sum("o_totalprice")).alias("rev"),
        )
        .select("d", "rev")
    )
    a = daily.select(F.col("d").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("d").alias("db"), F.col("rev").alias("rb"))
    pairs = a.join(b, F.col("da") < F.col("db")).select(
        ((F.col("rb") - F.col("ra")) / (F.col("db") - F.col("da"))).alias("slope"),
        F.signum(F.col("rb") - F.col("ra")).alias("sgn"),
    )
    n_row = daily.agg(F.count("*").cast("double").alias("n"))
    agg = pairs.agg(
        F.percentile("slope", F.lit(0.5)).alias("sen"),
        F.sum("sgn").alias("s"),
    ).join(F.broadcast(n_row))
    z = (F.col("s") - F.signum("s")) / F.sqrt(
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0
    )
    return agg.select(
        F.col("n").cast("long").alias("n_days"),
        F.round("sen", 4).alias("sen_slope"),
        F.col("s").cast("long").alias("mk_s"),
        F.round(z, 4).alias("mk_z"),
        F.when(F.abs(z) <= 1.96, "no-trend")
        .when(F.col("s") > 0, "increasing")
        .otherwise("decreasing")
        .alias("verdict"),
    )


@query(
    "winsorized_mean_profile",
    ref="robust-statistics family — winsorized and trimmed means per order status: the tail-insensitive location estimates a metrics pipeline reports next to the raw mean",
    doc="Per order status: n, raw mean, 5/95-winsorized mean (tails clamped to the percentile bounds), and the 5/95-trimmed mean (tails dropped).",
    oracle="""
WITH b AS (
    SELECT o_orderstatus AS status,
           o_totalprice  AS x,
           quantile_cont(o_totalprice, 0.05) OVER (PARTITION BY o_orderstatus) AS p05,
           quantile_cont(o_totalprice, 0.95) OVER (PARTITION BY o_orderstatus) AS p95
    FROM orders
)
SELECT status,
       CAST(count(*) AS BIGINT)                             AS n_orders,
       round(avg(x), 4)                                     AS raw_mean,
       round(avg(least(greatest(x, p05), p95)), 4)          AS winsorized_mean,
       round(avg(CASE WHEN x >= p05 AND x <= p95 THEN x END), 4) AS trimmed_mean
FROM b GROUP BY status
""",
)
def winsorized_mean_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw mean answers to every outlier; winsorizing clamps the
    tails to the 5th/95th percentile bounds and trimming drops them —
    the two standard robustifications, reported side by side so the
    gap itself measures tail influence.  Engine shape: the percentile
    BOUNDS come from an exact-percentile window over the SAME status
    partition the final rollup groups by, so bounds, clamp, and
    aggregate all ride one exchange (the same-window discipline) —
    no separate bounds-frame join, no second scan.  At 100 TB swap the
    exact window percentile for approx_percentile computed in a
    pre-agg and broadcast back; the clamp arithmetic is unchanged."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderstatus")
    b = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("x"),
        F.percentile("o_totalprice", F.lit(0.05)).over(w).alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95)).over(w).alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("x"), F.col("p05")), F.col("p95"))
    return b.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("x"), 4).alias("raw_mean"),
        F.round(F.avg(clamped), 4).alias("winsorized_mean"),
        F.round(
            F.avg(F.when((F.col("x") >= F.col("p05")) & (F.col("x") <= F.col("p95")), F.col("x"))),
            4,
        ).alias("trimmed_mean"),
    )


@query(
    "allocation_proportional",
    ref="finance-ETL allocation operator — spread an order-level rebate across its lineitems proportionally, in integer cents, with largest-remainder correction so every order's allocations sum EXACTLY to its rebate",
    doc="Per order: the 2% rebate in cents, the sum of per-line allocations (provably equal), line count, and the max/min line allocation — the sum-preserving proportional split.",
    oracle="""
WITH li AS (
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
    FROM lineitem
),
o AS (
    SELECT l_orderkey,
           CAST(sum(price_c) AS DOUBLE)                 AS total_c,
           CAST(round(sum(price_c) * 0.02) AS BIGINT)   AS rebate_c
    FROM li GROUP BY l_orderkey
),
raw AS (
    SELECT li.l_orderkey, li.l_linenumber, o.rebate_c,
           floor(o.rebate_c * li.price_c / o.total_c)            AS fl,
           o.rebate_c * li.price_c - floor(o.rebate_c * li.price_c / o.total_c) * o.total_c
                                                                 AS rem
    FROM li JOIN o USING (l_orderkey)
),
ranked AS (
    SELECT l_orderkey, rebate_c, fl,
           row_number() OVER (PARTITION BY l_orderkey
               ORDER BY rem DESC, l_linenumber)                  AS rk,
           rebate_c - sum(fl) OVER (PARTITION BY l_orderkey)     AS residual
    FROM raw
),
alloc AS (
    SELECT l_orderkey, rebate_c,
           CAST(fl + CASE WHEN rk <= residual THEN 1 ELSE 0 END AS BIGINT) AS a
    FROM ranked
)
SELECT l_orderkey            AS orderkey,
       CAST(max(rebate_c) AS BIGINT) AS rebate_cents,
       CAST(sum(a) AS BIGINT)        AS allocated_cents,
       CAST(count(*) AS BIGINT)      AS n_lines,
       CAST(max(a) AS BIGINT)        AS max_line_cents,
       CAST(min(a) AS BIGINT)        AS min_line_cents
FROM alloc GROUP BY l_orderkey
""",
)
def allocation_proportional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional money splits have a trap: round each share to
    cents independently and the pieces no longer sum to the whole —
    the classic penny-leak a finance close cannot tolerate.  The
    largest-remainder (Hamilton) method fixes it deterministically:
    floor every share in INTEGER CENTS, then hand the leftover cents
    to the lines with the largest discarded remainders (line-number
    tie-break).  Everything is integer arithmetic carried in doubles
    well inside the 2^53 exact range, so both engines compute
    identical floors and remainders — which is what lets an
    ALLOCATION, normally a tolerance-checked quantity, carry a value
    hash.  One order-key exchange does it all: the totals window, the
    remainder rank, and the residual sum share the same partition key
    (the scd2/weighted-median discipline).  allocated == rebate on
    every row BY CONSTRUCTION — the oracle and the invariant test both
    say so."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
    )
    per_order = Window.partitionBy("l_orderkey")
    withtot = li.select(
        "l_orderkey",
        "l_linenumber",
        "price_c",
        F.sum("price_c").over(per_order).cast("double").alias("total_c"),
    ).withColumn(
        "rebate_c", F.round(F.col("total_c") * 0.02).cast("long")
    )
    fl = F.floor(F.col("rebate_c") * F.col("price_c") / F.col("total_c"))
    raw = withtot.select(
        "l_orderkey",
        "l_linenumber",
        "rebate_c",
        fl.alias("fl"),
        (F.col("rebate_c") * F.col("price_c") - fl * F.col("total_c")).alias("rem"),
    )
    ranked = raw.select(
        "l_orderkey",
        "rebate_c",
        "fl",
        F.row_number()
        .over(per_order.orderBy(F.col("rem").desc(), "l_linenumber"))
        .alias("rk"),
        (F.col("rebate_c") - F.sum("fl").over(per_order)).alias("residual"),
    )
    alloc = ranked.select(
        "l_orderkey",
        "rebate_c",
        (
            F.col("fl") + F.when(F.col("rk") <= F.col("residual"), 1).otherwise(0)
        ).cast("long").alias("a"),
    )
    return alloc.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.max("rebate_c").cast("long").alias("rebate_cents"),
        F.sum("a").cast("long").alias("allocated_cents"),
        F.count("*").alias("n_lines"),
        F.max("a").cast("long").alias("max_line_cents"),
        F.min("a").cast("long").alias("min_line_cents"),
    )


@query(
    "bom_explosion",
    ref="hierarchical-data operator next to recursive_nation_reach — bill-of-materials explosion: recursive descent with MULTIPLIED quantities along the path, the query MRP systems run",
    doc="Explode the synthetic part hierarchy (parent = partkey/10, per-edge qty 1 + partkey mod 3) from root part 1: per level the component count and total extended quantity.",
    oracle="""
WITH RECURSIVE bom AS (
    SELECT CAST(1 AS BIGINT) AS partkey, 0 AS lvl, CAST(1 AS DOUBLE) AS ext_qty
    UNION ALL
    SELECT p.p_partkey, bom.lvl + 1,
           bom.ext_qty * (1 + p.p_partkey % 3)
    FROM part p JOIN bom ON p.p_partkey // 10 = bom.partkey
    WHERE p.p_partkey > bom.partkey
)
SELECT lvl                               AS level,
       CAST(count(*) AS BIGINT)          AS n_components,
       CAST(sum(ext_qty) AS BIGINT)      AS total_extended_qty
FROM bom GROUP BY lvl
""",
)
def bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recursive_nation_reach walks edges; a BOM explosion must also
    ACCUMULATE along the path — each component's extended quantity is
    the PRODUCT of per-edge quantities from the root, the number MRP
    uses to size a build.  The hierarchy is synthetic but structural
    (parent = partkey/10 gives a natural 10-ary tree over the real
    part table; per-edge qty = 1 + partkey mod 3), and the recursion
    is a Spark 4 recursive CTE — each iteration is one distributed
    join of the previous frontier against part, the frontier carrying
    (partkey, level, ext_qty); depth is the key-width, so iterations
    are O(log10 |part|) regardless of table size.  Quantities stay
    exact integers inside doubles (≤ 3^depth · 1).  Level-grain
    output keeps the result decision-shaped (how much of WHAT level to
    procure)."""
    from shopify_youtube_etl_spark.sources.tables import ensure_views

    ensure_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        WITH RECURSIVE bom AS (
            SELECT CAST(1 AS BIGINT) AS partkey, 0 AS lvl, CAST(1 AS DOUBLE) AS ext_qty
            UNION ALL
            SELECT p.p_partkey, bom.lvl + 1,
                   bom.ext_qty * (1 + p.p_partkey % 3)
            FROM part p JOIN bom ON CAST(p.p_partkey / 10 AS BIGINT) = bom.partkey
            WHERE p.p_partkey > bom.partkey
        )
        SELECT lvl                          AS level,
               count(*)                     AS n_components,
               CAST(sum(ext_qty) AS BIGINT) AS total_extended_qty
        FROM bom GROUP BY lvl
        """
    )


@query(
    "rfm_segmentation",
    ref="marketing-analytics operator — RFM (recency / frequency / monetary) quintile scoring per customer, then the segment census a CRM acts on",
    doc="Customers scored 1-5 on recency (newest last order = 5), frequency (order count), and monetary (total spend in exact cents) via deterministic ntile; output is the per-RFM-code census with exact-integer totals.",
    oracle="""
WITH cust AS (
    SELECT o_custkey,
           max(o_orderdate)            AS last_order,
           CAST(count(*) AS BIGINT)    AS freq,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                                       AS mon_c
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT ntile(5) OVER (ORDER BY last_order, o_custkey) AS r,
           ntile(5) OVER (ORDER BY freq, o_custkey)       AS f,
           ntile(5) OVER (ORDER BY mon_c, o_custkey)      AS m,
           freq, mon_c
    FROM cust
)
SELECT r, f, m,
       CAST(count(*) AS BIGINT)                    AS n_customers,
       CAST(sum(freq) AS BIGINT)                   AS total_orders,
       CAST(sum(mon_c) AS BIGINT)                  AS total_spend_cents,
       CAST(floor(sum(mon_c) / count(*)) AS BIGINT) AS avg_spend_cents
FROM scored GROUP BY r, f, m
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CRM classic: score every customer 1-5 on how RECENTLY they
    bought, how OFTEN, and how MUCH, and the 125 possible codes become
    actionable segments (5-5-5 champions, 1-5-5 at-risk whales).  The
    corpus collapses to customer grain in one shuffle; each quintile
    is an ntile window over that customer-sized frame — ntile needs a
    TOTAL order to be deterministic, so every ORDER BY carries the
    custkey tie-break (two customers with equal spend must land in the
    same bucket on both engines every run).  Higher scores mean better
    on all three axes (newest last-order date sorts last = bucket 5).
    The census output is code-grain (≤125 rows) — the shape a
    downstream campaign join broadcasts."""
    from pyspark.sql.window import Window

    # Monetary is carried in EXACT integer cents: sums and averages of
    # integers below 2^53 are order-independent in doubles, so the
    # quintile boundaries and the census averages cannot drift by a
    # summation-order ulp at a rounding boundary (the failure mode raw
    # double sums exhibited on one census cell).
    cust = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("double")
            .alias("mon_c"),
        )
    )
    # Three quintile axes, each a two-phase distributed row_number +
    # closed-form NTILE (integer-exact, bit-identical to the NTILE
    # window) — the customer frame never funnels through one task.
    from shopify_youtube_etl_spark.plans.common import (
        distributed_row_number,
        ntile_from_rank,
    )

    s, n = distributed_row_number(
        cust, [F.col("last_order").asc(), F.col("o_custkey").asc()], "rn_r"
    )
    s, _ = distributed_row_number(
        s, [F.col("freq").asc(), F.col("o_custkey").asc()], "rn_f"
    )
    s, _ = distributed_row_number(
        s, [F.col("mon_c").asc(), F.col("o_custkey").asc()], "rn_m"
    )
    scored = s.select(
        ntile_from_rank("rn_r", n, 5).alias("r"),
        ntile_from_rank("rn_f", n, 5).alias("f"),
        ntile_from_rank("rn_m", n, 5).alias("m"),
        "freq",
        "mon_c",
    )
    # Census outputs stay EXACT integers (totals + a floored average):
    # an average in cents can land exactly on a half-cent tie, where
    # the engines' round() tie rules legitimately disagree — floor of
    # an exact rational cannot.
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        F.sum("freq").cast("long").alias("total_orders"),
        F.sum("mon_c").cast("long").alias("total_spend_cents"),
        F.floor(F.sum("mon_c") / F.count("*")).cast("long").alias(
            "avg_spend_cents"
        ),
    )


@query(
    "percent_of_parent_share",
    ref="hierarchical-share analytics next to grouping_sets_revenue — each nation's revenue as a share of its region and of the world, the drill-down ratio every BI hierarchy renders",
    doc="Per (region, nation): customer-side order revenue, the nation's share of its region, and the region's share of the total.",
    oracle="""
WITH rev AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           sum(o.o_totalprice) AS rev
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
)
SELECT region, nation,
       round(rev, 2)                                          AS revenue,
       round(rev / sum(rev) OVER (PARTITION BY region), 6)    AS share_of_region,
       round(sum(rev) OVER (PARTITION BY region)
             / sum(rev) OVER (), 6)                           AS region_share_of_total
FROM rev
""",
)
def percent_of_parent_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent is the ratio a drill-down UI shows at every
    level, and computing it needs NO second aggregation pass: the
    corpus reduces to (region, nation) grain once — ~hundreds of rows
    forever — and both parent totals are windows over that reduced
    frame (region partition, then the global frame).  The dimension
    joins broadcast (region/nation are bounded); the one data-sized
    shuffle is the grain reduction.  Shares round at 6dp after exact
    double division on identically-grouped sums."""
    from pyspark.sql.window import Window

    rev = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name", "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region").select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    by_region = Window.partitionBy("region")
    world = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(by_region), 6).alias(
            "share_of_region"
        ),
        F.round(
            F.sum("rev").over(by_region) / F.sum("rev").over(world), 6
        ).alias("region_share_of_total"),
    )


@query(
    "price_elasticity_by_brand",
    ref="econometric analytics — log-log OLS price elasticity of demand per brand (regr_slope of ln quantity on ln unit price), the pricing team's first regression",
    doc="Per brand: lineitem count and the fitted elasticity (slope of ln(quantity) on ln(unit price)) with R²; brands with fewer than 200 lines excluded.",
    oracle="""
WITH x AS (
    SELECT p_brand AS brand,
           ln(l_extendedprice / l_quantity) AS ln_price,
           ln(l_quantity)                   AS ln_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_quantity > 0 AND l_extendedprice > 0
)
SELECT brand,
       CAST(count(*) AS BIGINT)                 AS n_lines,
       round(regr_slope(ln_qty, ln_price), 6)   AS elasticity,
       round(regr_r2(ln_qty, ln_price), 6)      AS r2
FROM x GROUP BY brand
HAVING count(*) >= 200
""",
)
def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does demand move when price does?  The log-log slope
    IS the elasticity, and SQL:2003's regr_slope/regr_r2 fit it as
    single-pass MERGEABLE moment aggregates — no iteration, no driver
    fit, no UDF (the zipf_alpha_fit machinery pointed at an economic
    question).  Unit price derives per line (extended/quantity — the
    guard drops degenerate rows on both engines identically); one
    brand-key shuffle carries five moments per group, and the ≥200-line
    HAVING keeps only statistically meaningful fits.  At 100 TB this
    is the cheapest regression there is: the moments fold map-side."""
    x = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .select(
            F.col("p_brand").alias("brand"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("ln_price"),
            F.log("l_quantity").alias("ln_qty"),
        )
    )
    return (
        x.groupBy("brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.regr_slope("ln_qty", "ln_price"), 6).alias("elasticity"),
            F.round(F.regr_r2("ln_qty", "ln_price"), 6).alias("r2"),
        )
        .where(F.col("n_lines") >= 200)
    )


@query(
    "window_funnel_depths",
    ref="sequential-funnel operator (ClickHouse windowFunnel semantics) — the deepest view → click → purchase chain each user completes within a 1-hour horizon of the first step",
    doc="Census of per-user funnel depth (0-3): depth 1 = viewed, 2 = clicked at-or-after the first view within 1 h of it, 3 = purchased at-or-after that click within the same horizon.",
    oracle="""
WITH v AS (
    SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
    FROM events WHERE user_id IS NOT NULL AND event_type = 'view'
    GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND CAST(e.ts AS TIMESTAMP) >= v.t1
      AND CAST(e.ts AS TIMESTAMP) <= v.t1 + INTERVAL 1 HOUR
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
    FROM events e
    JOIN v ON e.user_id = v.user_id
    JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND CAST(e.ts AS TIMESTAMP) >= c.t2
      AND CAST(e.ts AS TIMESTAMP) <= v.t1 + INTERVAL 1 HOUR
    GROUP BY e.user_id
),
du AS (
    SELECT u.user_id,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                WHEN v.user_id IS NOT NULL THEN 1
                ELSE 0 END AS depth
    FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL) u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_users
FROM du GROUP BY depth
""",
)
def window_funnel_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """funnel_conversion asks WHETHER steps happened; windowFunnel asks
    whether they happened IN ORDER, WITHIN A HORIZON — the semantics
    ClickHouse ships a dedicated function for, composed here from
    anchored conditional minima: the first view anchors the horizon,
    the first qualifying click must follow it inside the hour, the
    purchase must follow THAT click inside the same hour.  Each stage
    is one user-key aggregate joined back on the user key, so every
    join and agg rides the same partitioning (Catalyst collapses them
    onto shared exchanges); no per-user event arrays are ever
    materialized, which is what makes the shape safe when one bot user
    has a million events.  Depth census out — the funnel chart's
    input."""
    e = (
        t(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("user_id", "ts", "event_type")
    )
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    horizon = F.col("t1") + F.expr("INTERVAL 1 HOUR")
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") >= F.col("t1")) & (F.col("ts") <= horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .join(c, "user_id")
        .where((F.col("ts") >= F.col("t2")) & (F.col("ts") <= horizon))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = e.select("user_id").distinct()
    du = (
        users.join(v.select("user_id", F.lit(1).alias("d1")), "user_id", "left")
        .join(c.select("user_id", F.lit(1).alias("d2")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("d3")), "user_id", "left")
        .select(
            F.when(F.col("d3").isNotNull(), 3)
            .when(F.col("d2").isNotNull(), 2)
            .when(F.col("d1").isNotNull(), 1)
            .otherwise(0)
            .alias("depth")
        )
    )
    return du.groupBy("depth").agg(F.count("*").alias("n_users"))


@query(
    "cohort_ltv_curve",
    ref="growth analytics next to cohort_retention — the cumulative lifetime-value curve: per signup-year cohort, cumulative spend per member through each year of age",
    doc="Per (first-order-year cohort, years-since-first-order): active buyers, period spend in exact cents, cumulative spend, and cumulative spend per cohort member.",
    oracle="""
WITH first_order AS (
    SELECT o_custkey,
           min(year(CAST(o_orderdate AS TIMESTAMP))) AS cohort
    FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
),
sized AS (
    SELECT cohort, CAST(count(*) AS DOUBLE) AS cohort_size
    FROM first_order GROUP BY cohort
),
spend AS (
    SELECT f.cohort,
           year(CAST(o.o_orderdate AS TIMESTAMP)) - f.cohort AS age,
           CAST(count(DISTINCT o.o_custkey) AS BIGINT)       AS active_buyers,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                                                             AS spend_c
    FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
    GROUP BY f.cohort, age
)
SELECT cohort,
       CAST(age AS BIGINT)                    AS age_years,
       active_buyers,
       CAST(spend_c AS BIGINT)                AS period_spend_cents,
       CAST(sum(spend_c) OVER (PARTITION BY cohort ORDER BY age) AS BIGINT)
                                              AS cum_spend_cents,
       CAST(floor(sum(spend_c) OVER (PARTITION BY cohort ORDER BY age)
                  / cohort_size) AS BIGINT)   AS cum_ltv_cents_per_member
FROM spend JOIN sized USING (cohort)
""",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention says who CAME BACK; LTV says what they were WORTH:
    the cumulative spend curve per acquisition cohort is the payback
    chart CAC decisions read.  Spend is carried in exact integer cents
    (the rfm_segmentation discipline — integer sums are
    summation-order-proof, and the per-member average floors an exact
    rational instead of rounding at a possible half-cent tie).  Plan:
    first-order year per customer (one customer shuffle), spend
    reduced to (cohort, age) grain riding the same key, then the
    cumulative window runs over a cohorts×ages-sized frame with the
    cohort-size one-rower broadcast in.  Curve length is bounded by
    the calendar, never the corpus."""
    from pyspark.sql.window import Window

    # The explicit null-key filter is what makes the customer-reduce
    # exchange REUSED at runtime: the spend branch's inner join pushes
    # IsNotNull(o_custkey) into its scan, so without the same filter on
    # the sized branch the two scans differ and Spark executes the
    # customer shuffle twice (caught by the ReusedExchange runtime pin).
    first_order = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(F.min(F.year("o_orderdate")).alias("cohort"))
    )
    sized = first_order.groupBy("cohort").agg(
        F.count("*").cast("double").alias("cohort_size")
    )
    spend = (
        t(spark, sf_dir, "orders")
        .join(first_order, "o_custkey")
        .groupBy(
            "cohort", (F.year("o_orderdate") - F.col("cohort")).alias("age")
        )
        .agg(
            F.countDistinct("o_custkey").alias("active_buyers"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("double")
            .alias("spend_c"),
        )
    )
    cum = Window.partitionBy("cohort").orderBy("age")
    return spend.join(F.broadcast(sized), "cohort").select(
        "cohort",
        F.col("age").cast("long").alias("age_years"),
        "active_buyers",
        F.col("spend_c").cast("long").alias("period_spend_cents"),
        F.sum("spend_c").over(cum).cast("long").alias("cum_spend_cents"),
        F.floor(F.sum("spend_c").over(cum) / F.col("cohort_size"))
        .cast("long")
        .alias("cum_ltv_cents_per_member"),
    )


@query(
    "exact_stratified_split_manifest",
    ref="training-data split discipline — stable_sample_split's hash buckets hit 80/10/10 only in expectation; this manifest hits the proportions EXACTLY per stratum: largest-remainder (Hamilton) seat allocation over a deterministic content-hash order",
    doc="Per (lang, split): the exact Hamilton-allocated document count for 80/10/10 — per-stratum split sizes sum to the stratum size and each deviates from its ideal share by less than one document.",
    oracle="""
WITH ranked AS (
    SELECT lang,
           row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS r,
           count(*)    OVER (PARTITION BY lang)                             AS n
    FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
),
quota AS (
    SELECT lang, r, n,
           floor(n * 0.8)                         AS f_tr,
           floor(n * 0.1)                         AS f_va,
           n - floor(n * 0.8) - 2 * floor(n * 0.1) AS residual,
           n * 0.8 - floor(n * 0.8)               AS rem_tr,
           n * 0.1 - floor(n * 0.1)               AS rem_va
    FROM ranked
),
sized AS (
    -- Hamilton seats, tie order train > val > test.  Note the test
    -- remainder EQUALS the val remainder (same 0.1 share), so:
    -- 1 leftover seat: train iff rem_tr >= rem_va, else val;
    -- 2 leftover seats: val always seats (2nd behind train, or 1st
    -- alongside test), train iff rem_tr >= rem_va, else test.
    SELECT lang, r,
           f_tr + CASE WHEN residual >= 1 AND rem_tr >= rem_va THEN 1
                       ELSE 0 END AS n_tr,
           f_va + CASE WHEN residual = 1 AND rem_tr < rem_va THEN 1
                       WHEN residual = 2 THEN 1
                       ELSE 0 END AS n_va
    FROM quota
)
SELECT lang,
       CASE WHEN r <= n_tr THEN 'train'
            WHEN r <= n_tr + n_va THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs
FROM sized
GROUP BY 1, 2
""",
)
def exact_stratified_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-bucket splits (stable_sample_split) are reproducible but
    only EXPECTED to be 80/10/10 — a small stratum can land 70/20/10
    and silently skew per-language eval sets.  This operator makes the
    proportions exact per stratum: documents rank in a deterministic
    content-hash order (md5 + doc_id tie — reproducible across runs,
    engines, partitionings), and split SIZES come from
    largest-remainder seat allocation (the allocation_proportional
    operator applied to dataset governance), so every stratum's splits
    sum exactly to the stratum and each is within one document of its
    ideal share.  One lang-key exchange carries the rank, size, and
    quota windows; the census output is strata x 3 rows.  Remainder
    comparisons are doubles both engines derive from the same integer
    n — identical bit patterns, identical seating."""
    from pyspark.sql.window import Window

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select("lang", "doc_id", "text")
    )
    by_lang = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        F.row_number()
        .over(by_lang.orderBy(F.md5("text"), "doc_id"))
        .alias("r"),
        F.count("*").over(by_lang).alias("n"),
    )
    f_tr, f_va = F.floor(F.col("n") * 0.8), F.floor(F.col("n") * 0.1)
    residual = F.col("n") - f_tr - 2 * f_va
    rem_tr = F.col("n") * 0.8 - f_tr
    rem_va = F.col("n") * 0.1 - f_va
    n_tr = f_tr + F.when((residual >= 1) & (rem_tr >= rem_va), 1).otherwise(0)
    n_va = f_va + F.when((residual == 1) & (rem_tr < rem_va), 1).when(
        residual == 2, 1
    ).otherwise(0)
    sized = ranked.select(
        "lang",
        "r",
        n_tr.alias("n_tr"),
        n_va.alias("n_va"),
    )
    return sized.select(
        "lang",
        F.when(F.col("r") <= F.col("n_tr"), "train")
        .when(F.col("r") <= F.col("n_tr") + F.col("n_va"), "val")
        .otherwise("test")
        .alias("split"),
    ).groupBy("lang", "split").agg(F.count("*").alias("n_docs"))


@query(
    "lorenz_curve_points",
    ref="distribution-shape family — the Lorenz curve behind gini_segment_inequality: cumulative spend share by customer decile per segment, the concentration chart the one-number Gini summarizes",
    doc="Per (market segment, spend decile 1-10): customer count, decile spend in exact cents, and the cumulative share of segment spend — the Lorenz curve's plotted points.",
    oracle="""
WITH cust AS (
    SELECT c.c_mktsegment AS segment,
           o.o_custkey,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               AS spend_c
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_custkey
),
decd AS (
    SELECT segment, spend_c,
           ntile(10) OVER (PARTITION BY segment
               ORDER BY spend_c, o_custkey) AS decile
    FROM cust
),
agg AS (
    SELECT segment, decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           sum(spend_c)             AS dec_spend
    FROM decd GROUP BY segment, decile
)
SELECT segment, decile, n_customers,
       CAST(dec_spend AS BIGINT) AS decile_spend_cents,
       round(sum(dec_spend) OVER (PARTITION BY segment ORDER BY decile)
             / sum(dec_spend) OVER (PARTITION BY segment), 6) AS cum_share
FROM agg
""",
)
def lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini compresses concentration to one number; the Lorenz curve
    is the picture behind it — sort customers by spend, and plot what
    share of the total the bottom k/10 hold (a 45° line is perfect
    equality; the bow's depth IS the Gini).  Deciles come from a
    tie-broken ntile per segment; spend rides in exact integer cents
    (summation-order-proof — the rfm discipline), so the only rounding
    is the final share of two exactly-equal-both-engines sums.  Plan:
    customer-grain reduce, one segment exchange shared by the decile
    window and the cumulative windows over the 10-row-per-segment
    aggregate."""
    from pyspark.sql.window import Window

    cust = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("o_custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("double")
            .alias("spend_c")
        )
    )
    decd = cust.select(
        "segment",
        "spend_c",
        F.ntile(10)
        .over(Window.partitionBy("segment").orderBy("spend_c", "o_custkey"))
        .alias("decile"),
    )
    agg = decd.groupBy("segment", "decile").agg(
        F.count("*").alias("n_customers"),
        F.sum("spend_c").alias("dec_spend"),
    )
    seg = Window.partitionBy("segment")
    cum = seg.orderBy("decile")
    return agg.select(
        "segment",
        "decile",
        "n_customers",
        F.col("dec_spend").cast("long").alias("decile_spend_cents"),
        F.round(
            F.sum("dec_spend").over(cum) / F.sum("dec_spend").over(seg), 6
        ).alias("cum_share"),
    )


@query(
    "hhi_market_concentration",
    ref="concentration analytics next to gini/lorenz — the Herfindahl–Hirschman index of brand share within each region's lineitem revenue, the antitrust-grade concentration number",
    doc="Per region: participating brand count, revenue in exact cents, and the HHI (sum of squared percentage shares, 0–10000) with the concentration verdict at the DOJ 1500/2500 thresholds.",
    oracle="""
WITH cell AS (
    SELECT r.r_name AS region, p.p_brand AS brand,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               AS rev_c
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, p.p_brand
),
tot AS (
    SELECT region, sum(rev_c) AS total_c FROM cell GROUP BY region
)
SELECT cell.region,
       CAST(count(*) AS BIGINT)                        AS n_brands,
       CAST(max(tot.total_c) AS BIGINT)                AS revenue_cents,
       round(sum(pow(100.0 * rev_c / tot.total_c, 2)), 4) AS hhi,
       CASE WHEN sum(pow(100.0 * rev_c / tot.total_c, 2)) > 2500 THEN 'high'
            WHEN sum(pow(100.0 * rev_c / tot.total_c, 2)) > 1500 THEN 'moderate'
            ELSE 'competitive' END                      AS concentration
FROM cell JOIN tot USING (region)
GROUP BY cell.region
""",
)
def hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini measures inequality among participants; HHI measures how
    CONCENTRATED the whole market is (a monopoly scores 10000, perfect
    25-way split 400) — the number merger review runs on.  The corpus
    reduces to (region, brand) cells in one shuffle behind broadcast
    dimension joins; shares square and sum over a ≤ regions×brands
    frame with the per-region totals joined back from a 5-row
    aggregate.  Revenue rides exact integer cents (summation-order-
    proof), so the squared shares are identical doubles on both
    engines before the single 4dp rounding.  Verdict thresholds are
    the DOJ's 1500/2500 guideline bands."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cell = (
        li.join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region").select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("double")
            .alias("rev_c")
        )
    )
    tot = cell.groupBy("region").agg(F.sum("rev_c").alias("total_c"))
    share2 = F.pow(100.0 * F.col("rev_c") / F.col("total_c"), 2)
    return (
        cell.join(F.broadcast(tot), "region")
        .groupBy("region")
        .agg(
            F.count("*").alias("n_brands"),
            F.max("total_c").cast("long").alias("revenue_cents"),
            F.round(F.sum(share2), 4).alias("hhi"),
            F.when(F.sum(share2) > 2500, "high")
            .when(F.sum(share2) > 1500, "moderate")
            .otherwise("competitive")
            .alias("concentration"),
        )
    )


@query(
    "new_vs_returning_revenue",
    ref="growth decomposition next to cohort_ltv_curve — each year's revenue split between first-year (new) and returning customers, the acquisition-vs-retention mix",
    doc="Per order year: revenue in exact cents from customers whose FIRST order fell in that year vs returning customers, with the new-revenue share.",
    oracle="""
WITH first_order AS (
    SELECT o_custkey,
           min(year(CAST(o_orderdate AS TIMESTAMP))) AS first_year
    FROM orders GROUP BY o_custkey
),
tagged AS (
    SELECT year(CAST(o.o_orderdate AS TIMESTAMP)) AS yr,
           CASE WHEN year(CAST(o.o_orderdate AS TIMESTAMP)) = f.first_year
                THEN 'new' ELSE 'returning' END AS kind,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
),
split AS (
    SELECT yr,
           CAST(sum(CASE WHEN kind = 'new' THEN cents ELSE 0 END) AS DOUBLE)
               AS new_c,
           CAST(sum(CASE WHEN kind = 'returning' THEN cents ELSE 0 END) AS DOUBLE)
               AS ret_c
    FROM tagged GROUP BY yr
)
SELECT yr                                  AS order_year,
       CAST(new_c AS BIGINT)               AS new_revenue_cents,
       CAST(ret_c AS BIGINT)               AS returning_revenue_cents,
       round(new_c / (new_c + ret_c), 6)   AS new_share
FROM split
""",
)
def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is growth coming from acquisition or from the base?  Tag every
    order by whether its year IS the customer's first-order year, and
    the yearly revenue mix answers directly.  One customer-grain
    reduce finds first years; the tag join rides the same customer
    key; the split is a conditional agg to a years-sized frame.
    Revenue in exact integer cents; the only rounding is the final
    share of two exactly-equal-both-engines sums."""
    first_order = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min(F.year("o_orderdate")).alias("first_year"))
    )
    tagged = (
        t(spark, sf_dir, "orders")
        .join(first_order, "o_custkey")
        .select(
            F.year("o_orderdate").alias("yr"),
            (F.year("o_orderdate") == F.col("first_year")).alias("is_new"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    split = tagged.groupBy("yr").agg(
        F.sum(F.when(F.col("is_new"), F.col("cents")).otherwise(0))
        .cast("double")
        .alias("new_c"),
        F.sum(F.when(~F.col("is_new"), F.col("cents")).otherwise(0))
        .cast("double")
        .alias("ret_c"),
    )
    return split.select(
        F.col("yr").alias("order_year"),
        F.col("new_c").cast("long").alias("new_revenue_cents"),
        F.col("ret_c").cast("long").alias("returning_revenue_cents"),
        F.round(F.col("new_c") / (F.col("new_c") + F.col("ret_c")), 6).alias(
            "new_share"
        ),
    )


@query(
    "duplicate_payment_audit",
    ref="audit family next to benford_law_audit — the duplicate-payment screen: same customer, amounts within $1000, within a year; the band-blocked self-join every AP audit runs, band-straddle complete via a ±1-band probe",
    doc="Order pairs by the same customer with amounts within $1000 of each other within a year: the pair keys, both amounts, and the day gap — ordered-pair output (earlier key first); the $1000-band block probes band±1 so a $999.99/$1000.01 straddle pair is not silently missed.",
    oracle="""
WITH o AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS band,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(o_orderdate AS DATE)) AS BIGINT) AS d
    FROM orders
)
SELECT a.o_orderkey               AS orderkey_a,
       b.o_orderkey               AS orderkey_b,
       a.o_custkey                AS custkey,
       round(a.o_totalprice, 2)   AS amount_a,
       round(b.o_totalprice, 2)   AS amount_b,
       CAST(abs(b.d - a.d) AS BIGINT) AS day_gap
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey
 AND a.band BETWEEN b.band - 1 AND b.band + 1
 AND a.o_orderkey < b.o_orderkey
WHERE abs(b.d - a.d) <= 365
  AND abs(b.o_totalprice - a.o_totalprice) <= 1000
""",
)
def duplicate_payment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accounts-payable classic: two orders by the same customer
    for a near-identical amount days apart are the screen's duplicate
    candidates.  The join is BLOCKED on (customer, $1000 amount band) —
    an equi-join Catalyst hashes, never an all-pairs scan (the
    fuzzy_blocked_join discipline applied to an audit).  A single-band
    block silently misses straddle pairs ($999.99 vs $1000.01 land in
    adjacent bands), so the probe side explodes each row to bands
    {b-1, b, b+1}; any pair with |Δamount| <= 1000 has bands at most 1
    apart, so the three-probe block is COMPLETE for the tolerance, and
    each qualifying pair matches exactly one probe value (the build
    row's own band) — no dedup needed.  The year gap and the $1000
    amount tolerance are cheap post-filters on the block's handful of
    rows.  Ordered pairs (earlier orderkey first) keep each duplicate
    reported once, hash-stably.  At 100 TB the block key's cardinality
    is what makes this linear-ish; a same-amount block bigger than a
    few rows is itself the finding."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        epoch_day(F.col("o_orderdate").cast("date")).alias("d"),
    )
    o = o.withColumn("band", F.floor(F.col("o_totalprice") / 1000).cast("long"))
    a = o.select(
        F.col("o_orderkey").alias("orderkey_a"),
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").alias("amount_a"),
        F.col("band"),
        F.col("d").alias("da"),
    )
    b = o.select(
        F.col("o_orderkey").alias("orderkey_b"),
        F.col("o_custkey").alias("ck_b"),
        F.col("o_totalprice").alias("amount_b"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("probe_band"),
        F.col("d").alias("db"),
    )
    return (
        a.join(
            b,
            (F.col("custkey") == F.col("ck_b"))
            & (F.col("band") == F.col("probe_band"))
            & (F.col("orderkey_a") < F.col("orderkey_b")),
        )
        .where(
            (F.abs(F.col("db") - F.col("da")) <= 365)
            & (F.abs(F.col("amount_b") - F.col("amount_a")) <= 1000)
        )
        .select(
            "orderkey_a",
            "orderkey_b",
            "custkey",
            F.round("amount_a", 2).alias("amount_a"),
            F.round("amount_b", 2).alias("amount_b"),
            F.abs(F.col("db") - F.col("da")).cast("long").alias("day_gap"),
        )
    )


@query(
    "pvm_decomposition",
    ref="finance-analytics capstone — price/volume/mix decomposition of year-over-year revenue change per brand: WHY revenue moved, not just that it did",
    doc="Per brand, 1997→1998: revenue delta in exact cents split into a volume effect (quantity change at old price) and a price effect (unit-price change at new quantity); the two effects sum to the delta by construction.",
    oracle="""
WITH yr AS (
    SELECT p.p_brand AS brand,
           year(CAST(l.l_shipdate AS TIMESTAMP)) AS y,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               AS rev_c,
           CAST(sum(l.l_quantity) AS DOUBLE) AS qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE year(CAST(l.l_shipdate AS TIMESTAMP)) IN (1997, 1998)
    GROUP BY p.p_brand, y
),
w AS (
    SELECT brand,
           max(CASE WHEN y = 1997 THEN rev_c END) AS r0,
           max(CASE WHEN y = 1997 THEN qty   END) AS q0,
           max(CASE WHEN y = 1998 THEN rev_c END) AS r1,
           max(CASE WHEN y = 1998 THEN qty   END) AS q1
    FROM yr GROUP BY brand
    HAVING max(CASE WHEN y = 1997 THEN qty END) > 0
       AND max(CASE WHEN y = 1998 THEN qty END) > 0
)
SELECT brand,
       CAST(r1 - r0 AS BIGINT)                      AS delta_cents,
       round((q1 - q0) * (r0 / q0), 2)              AS volume_effect_cents,
       round((r1 / q1 - r0 / q0) * q1, 2)           AS price_effect_cents
FROM w
""",
)
def pvm_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue moved — was it selling MORE (volume) or selling DEARER
    (price)?  The standard two-factor bridge: volume effect =
    quantity change at the OLD average unit price, price effect =
    unit-price change at the NEW quantity; the two sum exactly to the
    delta (delta = q1·p1 − q0·p0 = (q1−q0)·p0 + (p1−p0)·q1), so the
    bridge reconciles by construction — an analyst's waterfall that
    must add up.  One (brand, year) reduce behind a broadcast part
    join, a 25-row conditional pivot, pure arithmetic after.  Revenue
    rides exact integer cents; effects round at 2 only at output."""
    yr = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .where(F.year("l_shipdate").isin(1997, 1998))
        .groupBy(
            F.col("p_brand").alias("brand"), F.year("l_shipdate").alias("y")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("double")
            .alias("rev_c"),
            F.sum("l_quantity").cast("double").alias("qty"),
        )
    )
    w = (
        yr.groupBy("brand")
        .agg(
            F.max(F.when(F.col("y") == 1997, F.col("rev_c"))).alias("r0"),
            F.max(F.when(F.col("y") == 1997, F.col("qty"))).alias("q0"),
            F.max(F.when(F.col("y") == 1998, F.col("rev_c"))).alias("r1"),
            F.max(F.when(F.col("y") == 1998, F.col("qty"))).alias("q1"),
        )
        .where((F.col("q0") > 0) & (F.col("q1") > 0))
    )
    return w.select(
        "brand",
        (F.col("r1") - F.col("r0")).cast("long").alias("delta_cents"),
        F.round((F.col("q1") - F.col("q0")) * (F.col("r0") / F.col("q0")), 2).alias(
            "volume_effect_cents"
        ),
        F.round(
            (F.col("r1") / F.col("q1") - F.col("r0") / F.col("q0")) * F.col("q1"), 2
        ).alias("price_effect_cents"),
    )


@query(
    "supply_concentration_risk",
    ref="supply-chain analytics over the synthesized partsupp — per-part supplier concentration (largest supplier's share of available quantity), rolled up to brand-grain risk",
    doc="Per brand: part count, parts whose single largest supplier holds > 40% of available quantity, and the average largest-supplier share — the single-source supply-risk screen.",
    oracle=f"""
WITH {_PARTSUPP_SQL},
per_part AS (
    SELECT ps_partkey,
           CAST(max(ps_availqty) AS DOUBLE) / sum(ps_availqty) AS max_share
    FROM partsupp GROUP BY ps_partkey
)
SELECT p_brand                                            AS brand,
       CAST(count(*) AS BIGINT)                           AS n_parts,
       CAST(sum(CASE WHEN max_share > 0.4 THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_concentrated,
       round(avg(max_share), 6)                           AS avg_max_share
FROM per_part JOIN part ON ps_partkey = p_partkey
GROUP BY p_brand
""",
)
def supply_concentration_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four suppliers per part is resilience only if quantity is
    SPREAD: a part whose largest supplier holds most of the available
    quantity fails with that one supplier.  The screen reduces
    partsupp (the deterministic synthesized table both engines derive
    identically — see synth_partsupp) to one max-share ratio per part
    in a single part-key aggregate — max and sum of INTEGER quantities,
    so the ratio is identical doubles on both engines — then rolls the
    risk census to brand grain behind a broadcast part join.  At
    100 TB partsupp is fact-sized; the plan touches it exactly once."""
    per_part = (
        synth_partsupp(spark, sf_dir)
        .groupBy("ps_partkey")
        .agg(
            (
                F.max("ps_availqty").cast("double") / F.sum("ps_availqty")
            ).alias("max_share")
        )
    )
    return (
        per_part.join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("ps_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_parts"),
            F.sum(F.when(F.col("max_share") > 0.4, 1).otherwise(0)).alias(
                "n_concentrated"
            ),
            F.round(F.avg("max_share"), 6).alias("avg_max_share"),
        )
    )


@query(
    "order_cycle_time_percentiles",
    ref="SLA analytics next to conversion_lag_percentiles — the order-to-final-shipment cycle-time distribution per priority class, the fulfillment promise a priority tier is supposed to buy",
    doc="Per order priority: completed-order count and exact p50/p90/max of days from order date to the order's LAST line shipment.",
    oracle="""
WITH cycle AS (
    SELECT o.o_orderpriority AS priority,
           date_diff('day', CAST(o.o_orderdate AS DATE),
                     CAST(max(l.l_shipdate) AS DATE)) AS days
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
)
SELECT priority,
       CAST(count(*) AS BIGINT)            AS n_orders,
       round(quantile_cont(days, 0.5), 4)  AS p50_days,
       round(quantile_cont(days, 0.9), 4)  AS p90_days,
       CAST(max(days) AS BIGINT)           AS max_days
FROM cycle GROUP BY priority
""",
)
def order_cycle_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does paying for URGENT actually ship faster?  Cycle time is
    order date to the LAST line leaving the dock (the customer's view
    of done), so lineitems first reduce to one max-shipdate row per
    order on the order key the join already shuffled on; the day lags
    then aggregate to a 5-row priority frame with exact percentiles
    (approx_percentile at 100 TB, same plan).  Integer day arithmetic
    end to end — no timestamp subtraction residue to round."""
    c = (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .join(
            t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("last_ship").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days"),
        )
    )
    return c.groupBy("priority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.percentile("days", F.lit(0.5)), 4).alias("p50_days"),
        F.round(F.percentile("days", F.lit(0.9)), 4).alias("p90_days"),
        F.max("days").cast("long").alias("max_days"),
    )


def _ccl_split(spark: SparkSession, sf_dir: str) -> int:
    """History/batch boundary for component IVM: orders with
    l_orderkey below the split are the already-labeled history, the
    top 20% of the id range is the newly-landed batch (a fraction, not
    a constant — the llm_text._funnel_split rationale)."""
    from shopify_youtube_etl_spark.plans.common import table_col_max

    mx = table_col_max(spark, sf_dir, "lineitem", "l_orderkey")
    return int((mx + 1) * 4 // 5) if mx is not None else 0


def _ccl_state(spark: SparkSession, sf_dir: str, split: int):
    """Persisted (node, label) component state for the bulk co-purchase
    graph, keyed by (corpus dir, split) like every other IVM state
    store here."""
    import hashlib
    import os
    import tempfile

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    key = hashlib.md5(f"{sf_dir}|ccl|{split}".encode()).hexdigest()[:8]
    return ParquetTable(
        spark, os.path.join(tempfile.gettempdir(), f"sye_cclivm_{key}")
    )


def _bulk_star_edges(li: DataFrame) -> DataFrame:
    """Star edges of the bulk co-purchase graph for the given line
    set — shared by the full build and the batch path so increment and
    rebuild derive edges from the same expression."""
    anchor = li.groupBy("o").agg(F.min("p").alias("src"))
    return (
        li.join(anchor, "o")
        .where(F.col("p") != F.col("src"))
        .select("src", F.col("p").alias("dst"))
        .distinct()
    )


@query(
    "incremental_component_maintenance",
    ref="IVM of the graph family (the bm25/funnel/attribution discipline applied to copurchase_components) — persisted labels updated by contracting each batch's edges onto them and merging at the LABEL level; the oracle recomputes components from scratch over the full corpus, so a green row externally proves increment ≡ rebuild for the graph operator",
    doc="Component-size census of the bulk co-purchase graph served FROM persisted (node, label) state: the base 80% of the order-id range is labeled once; a batch's star edges are contracted onto current labels, the label-level graph (batch-bounded) is union-found, and only nodes in merged components relabel — byte-identical to the from-scratch recursive-CTE answer.",
    oracle="""
WITH RECURSIVE li AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p
    FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      AND l_quantity >= 48
),
anchor AS (SELECT o, min(p) AS src FROM li GROUP BY o),
e AS (
    SELECT DISTINCT anchor.src, li.p AS dst
    FROM li JOIN anchor USING (o) WHERE li.p <> anchor.src
),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (
    SELECT DISTINCT p_partkey AS node FROM part WHERE p_partkey IS NOT NULL
),
reach(node, lab) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.node
),
labels AS (SELECT node, min(lab) AS label FROM reach GROUP BY node),
sizes AS (SELECT label, count(*) AS sz FROM labels GROUP BY label)
SELECT CAST(sz AS BIGINT)       AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz
""",
)
def incremental_component_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adding edges can only MERGE components — that monotonicity is
    what makes graph labeling incrementally maintainable without
    deletes.  The batch path never touches history edges:

    * the batch's star edges map each endpoint to its CURRENT label
      (two broadcast-friendly joins against state);
    * the CONTRACTED graph — edges between distinct labels — is
      batch-bounded (at most one node per touched component), and
      union-finding it yields an (old label → merged label) mapping;
    * only rows whose label appears in that mapping relabel (a
      broadcast join + keyed upsert); every other (node, label) row in
      state is untouched — per-batch work is O(batch + touched
      components), never O(graph).

    The census aggregates STATE, while the oracle recomputes the
    components from scratch with the recursive-CTE closure — the
    increment ≡ rebuild proof, externally hash-checked (the same
    discipline as bm25_incremental_index / incremental_attribution_
    revenue, applied to the one operator family that had no IVM path).
    Pytest adds a state poison and a planted batch order that BRIDGES
    two history components (tests/test_analytics.py)."""
    from shopify_youtube_etl_spark.operators.components import connected_components

    split = _ccl_split(spark, sf_dir)
    li = (
        t(spark, sf_dir, "lineitem")
        .where(
            F.col("l_orderkey").isNotNull()
            & F.col("l_partkey").isNotNull()
            & (F.col("l_quantity") >= 48)
        )
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    nodes = (
        t(spark, sf_dir, "part")
        .where(F.col("p_partkey").isNotNull())
        .select("p_partkey")
    )
    state = _ccl_state(spark, sf_dir, split)
    if state.current_manifest() is None:
        base = connected_components(
            _bulk_star_edges(li.where(F.col("o") < split)), nodes
        )
        state.overwrite(base, stats_cols=["node"])

    batch_edges = _bulk_star_edges(li.where(F.col("o") >= split))
    cur = state.read()
    lab_of = lambda side: cur.select(  # noqa: E731 — two aliased probes
        F.col("node").alias(side), F.col("label").alias(f"{side}_lab")
    )
    contracted = (
        batch_edges.join(lab_of("src"), "src")
        .join(lab_of("dst"), "dst")
        .where(F.col("src_lab") != F.col("dst_lab"))
        .select(F.col("src_lab").alias("src"), F.col("dst_lab").alias("dst"))
        .distinct()
    )
    merged = connected_components(
        contracted,
        contracted.select(F.col("src").alias("n"))
        .unionByName(contracted.select(F.col("dst").alias("n")))
        .distinct(),
    )
    mapping = merged.where(F.col("node") != F.col("label")).select(
        F.col("node").alias("old_label"), F.col("label").alias("new_label")
    )
    relabeled = (
        cur.join(F.broadcast(mapping), cur["label"] == mapping["old_label"])
        .select("node", F.col("new_label").alias("label"))
    )
    # Segment-pruned keyed MERGE (r7 verdict #1): only state segments
    # whose node envelope a relabeled node actually hits are rewritten;
    # every other (node, label) segment survives in the manifest by
    # name — the write is O(touched segments + batch), matching the
    # O(batch + touched components) compute.  An empty relabel batch
    # (no merging edges) is a metadata no-op instead of a full rewrite.
    state.upsert_matching(relabeled, ["node"], auto_compact_at=64)

    sizes = state.read().groupBy("label").agg(F.count("*").alias("component_size"))
    return sizes.groupBy("component_size").agg(
        F.count("*").alias("n_components")
    )


def _ccd_split(spark: SparkSession, sf_dir: str) -> int:
    """Tombstone boundary for delete-capable component IVM: orders with
    l_orderkey at or above the top 10% of the id range are the DELETED
    batch (returns/erasures) — a fraction, not a constant, for the same
    reason as _ccl_split."""
    from shopify_youtube_etl_spark.plans.common import table_col_max

    mx = table_col_max(spark, sf_dir, "lineitem", "l_orderkey")
    return int((mx + 1) * 9 // 10) if mx is not None else 0


def _ccd_state(spark: SparkSession, sf_dir: str, split: int):
    import hashlib
    import os
    import tempfile

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    key = hashlib.md5(f"{sf_dir}|ccd|{split}".encode()).hexdigest()[:8]
    return ParquetTable(
        spark, os.path.join(tempfile.gettempdir(), f"sye_ccdivm_{key}")
    )


@query(
    "incremental_component_delete",
    ref="delete-capable graph IVM (r7 verdict #4) — edge REMOVALS can SPLIT components, which monotone merge-only IVM (incremental_component_maintenance) cannot express; the touched components are recomputed from the surviving edge set and every untouched component's labels persist; the oracle recomputes components from scratch over the post-delete edges, so a green row externally proves delete-maintenance ≡ rebuild",
    doc="Component-size census of the bulk co-purchase graph AFTER a tombstone batch (orders in the top 10% of the id range are returned/erased), served from persisted (node, label) state: only components that lost an edge are recomputed from the surviving edges and relabeled via the segment-pruned keyed merge — byte-identical to the from-scratch recursive-CTE answer over the post-delete graph.",
    oracle="""
WITH RECURSIVE dsplit AS (
    SELECT (max(l_orderkey) + 1) * 9 // 10 AS s FROM lineitem
),
li AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p
    FROM lineitem, dsplit WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
      AND l_quantity >= 48 AND l_orderkey < dsplit.s
),
anchor AS (SELECT o, min(p) AS src FROM li GROUP BY o),
e AS (
    SELECT DISTINCT anchor.src, li.p AS dst
    FROM li JOIN anchor USING (o) WHERE li.p <> anchor.src
),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (
    SELECT DISTINCT p_partkey AS node FROM part WHERE p_partkey IS NOT NULL
),
reach(node, lab) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.node
),
labels AS (SELECT node, min(lab) AS label FROM reach GROUP BY node),
sizes AS (SELECT label, count(*) AS sz FROM labels GROUP BY label)
SELECT CAST(sz AS BIGINT)       AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz
""",
)
def incremental_component_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feeds this engine applies carry DELETES
    (apply_changes 'D', operators/upsert.py) — and edge removal is the
    one graph mutation merge-monotone IVM cannot absorb, because losing
    a bridge SPLITS a component.  The delete path bounds the damage to
    the components that actually lost an edge:

    * the tombstone batch's candidate edges (stars of the deleted
      orders) are anti-joined against the SURVIVING edge set — an edge
      also contributed by a surviving order is not really gone;
    * the labels of the truly-deleted edges' endpoints name the
      touched components (batch-bounded: <= 2 labels per deleted edge);
    * ONLY those components' surviving edges and member nodes are
      re-labeled from scratch (connected_components over the touched
      subgraph — O(touched), never O(graph));
    * the relabeled members merge back via the segment-pruned keyed
      upsert; every untouched component's (node, label) rows — and at
      scale, their state segments — persist by name.

    The census aggregates STATE while the oracle recomputes components
    over the post-delete edge set from scratch: a green row is the
    external delete-maintenance ≡ rebuild proof.  A planted
    bridge-delete (one tombstone order whose removal splits a
    component in two) is pinned in tests/test_analytics.py.

    Scale note: the surviving-star recompute here derives per-order
    stars only for orders that still exist; at 100 TB the candidate
    anti-join and the touched-subgraph filter are the only joins that
    touch the edge universe, and both are key-pruned (order ids /
    component labels)."""
    from shopify_youtube_etl_spark.operators.components import connected_components

    dsplit = _ccd_split(spark, sf_dir)
    li = (
        t(spark, sf_dir, "lineitem")
        .where(
            F.col("l_orderkey").isNotNull()
            & F.col("l_partkey").isNotNull()
            & (F.col("l_quantity") >= 48)
        )
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    nodes = (
        t(spark, sf_dir, "part")
        .where(F.col("p_partkey").isNotNull())
        .select("p_partkey")
    )
    state = _ccd_state(spark, sf_dir, dsplit)
    if state.current_manifest() is None:
        full = connected_components(_bulk_star_edges(li), nodes)
        state.overwrite(full, stats_cols=["node"])

    # Surviving edges are consumed twice (anti-join probe + touched-
    # subgraph filter): checkpoint once so the star derivation runs once.
    keep_edges = _bulk_star_edges(li.where(F.col("o") < dsplit)).localCheckpoint()
    cand = _bulk_star_edges(li.where(F.col("o") >= dsplit))
    deleted = cand.join(keep_edges, ["src", "dst"], "left_anti")

    cur = state.read()
    touched_labels = (
        deleted.select(F.col("src").alias("node"))
        .unionByName(deleted.select(F.col("dst").alias("node")))
        .distinct()
        .join(cur, "node")
        .select("label")
        .distinct()
        .localCheckpoint()  # two consumers: member pull + edge filter
    )
    touched_nodes = cur.join(F.broadcast(touched_labels), "label").select("node")
    sub_edges = (
        keep_edges.join(
            cur.select(F.col("node").alias("src"), F.col("label").alias("src_lab")),
            "src",
        )
        .join(
            F.broadcast(touched_labels.withColumnRenamed("label", "src_lab")),
            "src_lab",
            "left_semi",
        )
        .select("src", "dst")
    )
    relabeled = connected_components(sub_edges, touched_nodes)
    state.upsert_matching(relabeled, ["node"], auto_compact_at=64)

    sizes = state.read().groupBy("label").agg(F.count("*").alias("component_size"))
    return sizes.groupBy("component_size").agg(
        F.count("*").alias("n_components")
    )


# ---------------------------------------------------------------------------
# Smoothing / stochastic-process / survival extensions (round 8)
# ---------------------------------------------------------------------------


@query(
    "ewma_daily_revenue",
    ref="smoothing family next to moving_average_7d — exponentially weighted moving average of daily revenue (RiskMetrics/Hunter EWMA), the standard recency-weighted trend line",
    doc="Daily order revenue with a 30-lag truncated EWMA (decay 0.8 per day of distance, gap-aware): weights pow(0.8, day distance), missing days contribute nothing to numerator or denominator.",
    oracle="""
WITH daily AS (
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
           sum(o_totalprice) AS rev
    FROM orders GROUP BY 1, 2
),
contrib AS (
    SELECT d.day_num + gs.off      AS target_num,
           d.rev * pow(0.8, gs.off) AS wx,
           pow(0.8, gs.off)         AS w
    FROM daily d, generate_series(0, 29) AS gs(off)
)
SELECT d.day,
       round(min(d.rev), 2)           AS daily_revenue,
       round(sum(c.wx) / sum(c.w), 2) AS ewma_30d
FROM daily d JOIN contrib c ON c.target_num = d.day_num
GROUP BY d.day
""",
)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA looks recursive (S_t = αx_t + (1-α)S_{t-1}) — a sequential
    trap at scale.  Truncating at 29 lags (residual mass 0.8^30 ≈ 0.1%)
    turns it into pure relational algebra, and the bounded INTERVAL
    join it implies is rewritten as an EQUI-join: each source day
    explodes into 30 (target_day, weight) contributions via
    ``sequence(0, 29)``, so Catalyst plans a plain hash join instead of
    a BroadcastNestedLoopJoin range probe — the standard
    bounded-range-join-to-equijoin rewrite.  Decay is GAP-AWARE: the
    lag distance is calendar days (day_num delta), not row index, so a
    quiet day genuinely ages the history out; days absent from the
    series contribute to neither numerator nor denominator and the
    weight sum renormalizes.  At 100 TB the day-grain reduction
    happens FIRST (one shuffle), and the 30× fan-out touches only the
    ~365·years-row series — constant work regardless of input scale."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(day_str(F.col("o_orderdate")).alias("day"))
        .agg(
            epoch_day(F.min(F.col("o_orderdate").cast("date"))).alias("day_num"),
            F.sum("o_totalprice").alias("rev"),
        )
    )
    contrib = daily.select(
        "day_num", "rev", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("off")
    ).select(
        (F.col("day_num") + F.col("off")).alias("target_num"),
        (F.col("rev") * F.pow(F.lit(0.8), F.col("off"))).alias("wx"),
        F.pow(F.lit(0.8), F.col("off")).alias("w"),
    )
    return (
        daily.join(contrib, daily["day_num"] == contrib["target_num"])
        .groupBy("day")
        .agg(
            money(F.min("rev")).alias("daily_revenue"),
            money(F.sum("wx") / F.sum("w")).alias("ewma_30d"),
        )
    )


@query(
    "daily_revenue_autocorr",
    ref="time-series-diagnostics family next to seasonal_decompose_daily / cusum_daily_drift — lag-k autocorrelation of the daily revenue series (the ACF values an ARIMA order pick or seasonality check reads first)",
    doc="Pearson autocorrelation of daily order revenue at lags 1, 7, and 28 days, computed over calendar-aligned pairs (both days present), with the pair count per lag.",
    oracle="""
WITH daily AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01',
                CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
           sum(o_totalprice) AS rev
    FROM orders GROUP BY 1
),
pairs AS (
    SELECT k.lag_days, cur.rev AS rev_t, prev.rev AS rev_lag
    FROM (SELECT UNNEST([1, 7, 28]) AS lag_days) k
    JOIN daily cur ON TRUE
    JOIN daily prev ON prev.day_num = cur.day_num - k.lag_days
)
SELECT CAST(lag_days AS BIGINT)      AS lag_days,
       CAST(count(*) AS BIGINT)      AS n_pairs,
       round(corr(rev_t, rev_lag), 6) AS autocorr
FROM pairs GROUP BY lag_days
""",
)
def daily_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACF question — does today's revenue echo yesterday's, last
    week's, last month's? — as pure relational algebra: the lag pairing
    is a SELF-EQUI-JOIN on day_num − k (calendar-aligned, so a missing
    day drops the pair instead of silently shifting the series the way
    a row-offset lag would), and Pearson r is the SQL:2003 ``corr``
    aggregate — single-pass mergeable moments, no centering pass, no
    driver math.  The three lags fan out from a 3-row inline table, so
    one scan of the day-grain series serves all of them.  At 100 TB
    the day-grain reduction is the only big shuffle; the self-join
    touches ~365·years rows regardless of input scale and the output
    is exactly 3 rows."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(epoch_day(F.col("o_orderdate").cast("date")).alias("day_num"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    lags = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(7), F.lit(28))).alias("lag_days")
    )
    cur = daily.select(
        F.col("day_num"), F.col("rev").alias("rev_t")
    ).crossJoin(F.broadcast(lags))
    prev = daily.select(
        F.col("day_num").alias("prev_num"), F.col("rev").alias("rev_lag")
    )
    pairs = cur.join(
        prev, cur["day_num"] - cur["lag_days"] == prev["prev_num"]
    )
    return pairs.groupBy(F.col("lag_days").cast("long").alias("lag_days")).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.corr("rev_t", "rev_lag"), 6).alias("autocorr"),
    )


@query(
    "longest_active_streak",
    ref="gaps-and-islands family next to sessionize_gaps_islands — longest consecutive-active-day streak per user, censused; the engagement metric every retention dashboard carries",
    doc="Census of users by their longest run of consecutive active calendar days (distinct event days; islands via day_num minus row_number).",
    oracle="""
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(ts AS DATE)) AS BIGINT) AS day_num
    FROM events WHERE ts IS NOT NULL
),
isl AS (
    SELECT user_id,
           day_num - row_number() OVER (PARTITION BY user_id
               ORDER BY day_num) AS grp
    FROM days
),
streaks AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len
    FROM isl GROUP BY user_id, grp
),
longest AS (
    SELECT user_id, max(streak_len) AS longest_streak
    FROM streaks GROUP BY user_id
)
SELECT longest_streak, CAST(count(*) AS BIGINT) AS n_users
FROM longest GROUP BY longest_streak
""",
)
def longest_active_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calendar-grain sibling of sessionization: a streak is an
    island of CONSECUTIVE day numbers, found by the classic constant-
    difference trick (day_num − row_number is invariant exactly while
    days are consecutive — no lag, no flag, no cumulative sum).  The
    DISTINCT collapses intraday volume first, so the window runs over
    at most one row per (user, day); every stage shares the user_id
    partition key, so Catalyst plans ONE shuffle for distinct + window
    + both per-user reductions, then a final tiny census shuffle.
    All-integer output — no float residue anywhere.  At 100 TB: work
    is bounded by active (user, day) pairs, output by the longest
    streak in the corpus."""
    days = (
        t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", epoch_day(F.col("ts").cast("date")).alias("day_num"))
        .distinct()
    )
    by_user = Window.partitionBy("user_id").orderBy("day_num")
    streaks = (
        days.withColumn("grp", F.col("day_num") - F.row_number().over(by_user))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("streak_len"))
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak")
    )
    return longest.groupBy("longest_streak").agg(F.count("*").alias("n_users"))


@query(
    "repeat_purchase_hazard",
    ref="survival-analysis family next to cohort_ltv_curve / conversion_lag_percentiles — discrete-time hazard of the next repeat order by 30-day bucket (life-table method), the reorder-propensity curve",
    doc="For each 30-day gap bucket (capped at 12): repeat-order events landing in the bucket, customers-at-risk (reverse cumulative count), and the discrete hazard rate events/at_risk.",
    oracle="""
WITH gaps AS (
    SELECT date_diff('day',
               CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS DATE),
               CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
),
b AS (
    SELECT CAST(least(gap_days // 30, 12) AS BIGINT) AS bucket
    FROM gaps WHERE gap_days IS NOT NULL
),
ev AS (
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_events
    FROM b GROUP BY bucket
)
SELECT bucket,
       n_events,
       CAST(sum(n_events) OVER (ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS at_risk,
       round(n_events * 1.0 / CAST(sum(n_events) OVER (ORDER BY bucket
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT), 6) AS hazard
FROM ev
""",
)
def repeat_purchase_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Life-table survival analysis without a stats library: each
    inter-order gap is an observed 'death' (the repeat purchase
    happened) in its 30-day bucket; at-risk for bucket b is everyone
    whose gap reached b — a REVERSE cumulative sum over the bucket
    census, so hazard(b) = events(b) / at_risk(b) is the discrete
    Kaplan-Meier hazard.  The lag runs inside one customer-keyed
    shuffle; buckets cap at 12 (360+ days pools into the tail), so the
    windows after the census run over ≤13 rows.  Ratio of exact
    counts — bit-stable across engines.  At 100 TB: one shuffle on
    o_custkey, one ≤13-row reduction; the curve is the output."""
    by_cust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = t(spark, sf_dir, "orders").select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate")).over(by_cust).cast("date"),
        ).alias("gap_days")
    )
    ev = (
        gaps.where(F.col("gap_days").isNotNull())
        .groupBy(
            F.least(F.floor(F.col("gap_days") / 30), F.lit(12))
            .cast("long")
            .alias("bucket")
        )
        .agg(F.count("*").alias("n_events"))
    )
    rev_cum = Window.orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return ev.select(
        "bucket",
        "n_events",
        F.sum("n_events").over(rev_cum).alias("at_risk"),
        F.round(F.col("n_events") / F.sum("n_events").over(rev_cum), 6).alias(
            "hazard"
        ),
    )


@query(
    "seasonal_naive_backtest",
    ref="forecast-evaluation family next to seasonal_decompose_daily / daily_revenue_autocorr — per-weekday backtest of the seasonal-naive forecast (ŷ_t = y_{t-7}), the accuracy floor any real revenue forecast must beat",
    doc="Per weekday: calendar-aligned (t, t-7) revenue pairs, MAPE, RMSE, and mean bias of the seasonal-naive one-week-ahead forecast.",
    oracle="""
WITH daily AS (
    SELECT CAST(date_diff('day', DATE '1970-01-01',
                CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
           sum(o_totalprice) AS rev
    FROM orders GROUP BY 1
),
pairs AS (
    SELECT cur.day_num % 7 AS weekday, cur.rev AS actual, prev.rev AS forecast
    FROM daily cur JOIN daily prev ON prev.day_num = cur.day_num - 7
)
SELECT CAST(weekday AS BIGINT)                                   AS weekday,
       CAST(count(*) AS BIGINT)                                  AS n_pairs,
       round(avg(abs(actual - forecast) / actual) * 100, 4)      AS mape_pct,
       round(sqrt(avg((actual - forecast) * (actual - forecast))), 2) AS rmse,
       round(avg(forecast - actual), 2)                          AS mean_bias
FROM pairs GROUP BY weekday
""",
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every forecasting effort needs its null model scored first:
    seasonal-naive (predict this day with the same weekday last week)
    is the standard baseline, and its backtest is pure relational
    algebra — a calendar-aligned self-equi-join on day_num − 7 (a
    missing day drops the pair rather than mis-aligning the season the
    way a row-offset lag would), then mergeable error aggregates per
    weekday slot.  Revenue is never zero on a trading day, so MAPE's
    division is safe; weekday derives from the epoch-day modulus so
    both engines bucket identically with no locale-dependent dayname.
    At 100 TB: the day-grain reduction is the only input-sized
    shuffle; the join and aggregates touch ~365·years rows and the
    output is exactly 7."""
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(epoch_day(F.col("o_orderdate").cast("date")).alias("day_num"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    cur = daily.select("day_num", F.col("rev").alias("actual"))
    prev = daily.select(
        F.col("day_num").alias("prev_num"), F.col("rev").alias("forecast")
    )
    pairs = cur.join(prev, cur["day_num"] - F.lit(7) == prev["prev_num"]).select(
        (F.col("day_num") % 7).alias("weekday"), "actual", "forecast"
    )
    err = F.col("actual") - F.col("forecast")
    return pairs.groupBy(F.col("weekday").cast("long").alias("weekday")).agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(F.abs(err) / F.col("actual")) * 100, 4).alias("mape_pct"),
        F.round(F.sqrt(F.avg(err * err)), 2).alias("rmse"),
        F.round(F.avg(F.col("forecast") - F.col("actual")), 2).alias("mean_bias"),
    )


@query(
    "abc_xyz_classification",
    ref="supply-chain segmentation next to rfm_segmentation / supply_concentration_risk — the ABC (cumulative revenue share) x XYZ (demand variability) part classification every inventory policy starts from",
    doc="Census of parts by ABC class (cumulative revenue share: A<=80%, B<=95%, C) x XYZ class (monthly-demand coefficient of variation: X<0.5, Y<1.0, Z or single-month), with part counts and revenue.",
    oracle="""
WITH per_part AS (
    SELECT l_partkey AS partkey, sum(l_extendedprice) AS revenue
    FROM lineitem GROUP BY 1
),
abc AS (
    SELECT partkey, revenue,
           round(sum(revenue) OVER (ORDER BY revenue DESC, partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / sum(revenue) OVER (), 9) AS cum_share
    FROM per_part
),
monthly AS (
    SELECT l_partkey AS partkey,
           strftime(l_shipdate, '%Y-%m') AS month,
           sum(l_quantity) AS qty
    FROM lineitem GROUP BY 1, 2
),
xyz AS (
    SELECT partkey,
           stddev_samp(qty) / avg(qty) AS cv
    FROM monthly GROUP BY partkey
),
classed AS (
    SELECT a.partkey, a.revenue,
           CASE WHEN a.cum_share <= 0.80 THEN 'A'
                WHEN a.cum_share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CASE WHEN x.cv IS NULL THEN 'Z'
                WHEN x.cv < 0.5 THEN 'X'
                WHEN x.cv < 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM abc a JOIN xyz x ON a.partkey = x.partkey
)
SELECT abc_class, xyz_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(sum(revenue), 2)   AS revenue
FROM classed GROUP BY abc_class, xyz_class
""",
)
def abc_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-axis inventory matrix: ABC ranks parts by cumulative
    revenue share (the Pareto cut — A carries 80% of revenue), XYZ
    buckets them by demand regularity (coefficient of variation of
    monthly quantity; a part seen in one month has no sample stddev
    and lands in Z, the unforecastable class).  Both axes reduce to
    part grain FIRST — one shuffle each.  The global running share is
    then a TWO-PHASE distributed prefix sum, never a single-partition
    window: range-partition the part-grain frame on the sort key
    (revenue desc, partkey tie-break), prefix-sum WITHIN each range
    partition, and add each partition's exclusive offset — a ≤32-row
    bounded collect of per-partition totals, the classic scan
    parallelization.  At 100 TB the part frame is billions of rows and
    a global-ORDER-BY window would funnel all of them through one
    task; this shape keeps every stage partition-parallel.  Final
    census is a 9-cell rollup."""
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("l_extendedprice").alias("revenue")
    )
    # localCheckpoint: two consumers (the totals probe and the final
    # plan) would otherwise re-run the lineitem reduction, and the
    # nondeterministic range-sampler could assign different pids per run.
    ranked = (
        per_part.repartitionByRange(32, F.col("revenue").desc(), "partkey")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = sorted(
        ranked.groupBy("pid").agg(F.sum("revenue").alias("s")).collect(),
        key=lambda r: r["pid"],
    )
    grand_total = sum(r["s"] for r in totals)
    offsets, acc = [], 0.0
    for r in totals:
        offsets.append((r["pid"], acc))
        acc += r["s"]
    off = spark.createDataFrame(offsets, "pid INT, offset DOUBLE")
    run = (
        Window.partitionBy("pid")
        .orderBy(F.col("revenue").desc(), "partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Round BEFORE banding (the behavior_entropy_census discipline): the
    # two engines accumulate the prefix sum in different float orders,
    # so a share within ulps of the 0.80/0.95 cut could band differently
    # un-rounded; 9 dp is far above float error, far below share grain.
    abc = ranked.join(F.broadcast(off), "pid").select(
        "partkey",
        "revenue",
        F.round(
            (F.col("offset") + F.sum("revenue").over(run)) / F.lit(grand_total), 9
        ).alias("cum_share"),
    )
    monthly = li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
    ).agg(F.sum("l_quantity").alias("qty"))
    xyz = monthly.groupBy("partkey").agg(
        (F.stddev_samp("qty") / F.avg("qty")).alias("cv")
    )
    classed = abc.join(xyz, "partkey").select(
        "revenue",
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(F.col("cv").isNull(), "Z")
        .when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return classed.groupBy("abc_class", "xyz_class").agg(
        F.count("*").alias("n_parts"),
        money(F.sum("revenue")).alias("revenue"),
    )


@query(
    "dau_mau_stickiness",
    ref="engagement family next to longest_active_streak / cohort_retention — the DAU/MAU stickiness ratio per month, the product-health number every growth dashboard leads with",
    doc="Per month: average daily distinct active users, monthly distinct active users, and the DAU/MAU stickiness ratio.",
    oracle="""
WITH daily AS (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
per_month_daily AS (
    SELECT month, avg(dau) AS avg_dau FROM daily GROUP BY month
),
monthly AS (
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS month,
           CAST(count(DISTINCT user_id) AS BIGINT) AS mau
    FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT d.month,
       round(d.avg_dau, 4)          AS avg_dau,
       m.mau                        AS mau,
       round(d.avg_dau / m.mau, 6)  AS stickiness
FROM per_month_daily d JOIN monthly m ON d.month = m.month
""",
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness = how much of the monthly audience shows up on an
    average day.  Both distinct counts reduce the raw stream to
    (period, user) pairs before counting — the standard two-stage
    exact-distinct discipline (dedup shuffle, then a count that
    needs no distinct tracking) — and the month join attaches a
    ~12·years-row frame to another, so everything after the first
    reduction is metadata-sized.  The ratio divides an exact average
    of integers by an exact integer.  At 100 TB: two (period, user)
    dedup shuffles, nothing else input-sized."""
    ev = (
        t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            F.date_format("ts", "yyyy-MM").alias("month"),
            day_str(F.col("ts")).alias("day"),
            "user_id",
        )
    )
    daily = ev.groupBy("month", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    per_month_daily = daily.groupBy("month").agg(F.avg("dau").alias("avg_dau"))
    monthly = ev.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    return per_month_daily.join(monthly, "month").select(
        "month",
        F.round("avg_dau", 4).alias("avg_dau"),
        "mau",
        F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
    )


@query(
    "brand_substitution_screen",
    ref="assortment analytics next to market_basket_lift (complements) and price_elasticity_by_brand — the cross-brand weekly-demand correlation matrix whose negative cells flag substitution candidates",
    doc="For every unordered brand pair: number of aligned demand weeks and the Pearson correlation of weekly quantities (negative = substitution candidate, positive = co-moving demand).",
    oracle="""
WITH weekly AS (
    SELECT p_brand AS brand,
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(l_shipdate AS DATE)) // 7 AS BIGINT) AS week,
           sum(l_quantity) AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
)
SELECT a.brand                        AS brand_a,
       b.brand                        AS brand_b,
       CAST(count(*) AS BIGINT)       AS n_weeks,
       round(corr(a.qty, b.qty), 6)   AS demand_corr
FROM weekly a JOIN weekly b ON a.week = b.week AND a.brand < b.brand
GROUP BY a.brand, b.brand
""",
)
def brand_substitution_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substitutes steal each other's demand week by week; complements
    move together.  The screen reduces lineitem to a (brand, week)
    demand series FIRST (one shuffle on a ~25-brand x ~360-week key),
    then self-joins on week — the join's frame is |brands|·|weeks|
    rows regardless of input scale, and the a.brand < b.brand
    inequality keeps each unordered pair once without a post-dedup.
    Pearson r is the mergeable SQL:2003 corr aggregate, same as the
    ACF query.  All 300 pairs are returned with their week support
    (no data-dependent threshold, so the row set is stable across
    engines); the analyst cuts at whatever r they trust.  At 100 TB:
    one brand-week reduction, then constant-size work."""
    weekly = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.floor(epoch_day(F.col("l_shipdate").cast("date")) / 7)
            .cast("long")
            .alias("week"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    a = weekly.select(
        F.col("brand").alias("brand_a"), "week", F.col("qty").alias("qty_a")
    )
    b = weekly.select(
        F.col("brand").alias("brand_b"),
        F.col("week").alias("week_b"),
        F.col("qty").alias("qty_b"),
    )
    pairs = a.join(
        b,
        (F.col("week") == F.col("week_b"))
        & (F.col("brand_a") < F.col("brand_b")),
    )
    return pairs.groupBy("brand_a", "brand_b").agg(
        F.count("*").alias("n_weeks"),
        F.round(F.corr("qty_a", "qty_b"), 6).alias("demand_corr"),
    )


@query(
    "segment_migration_matrix",
    ref="CRM dynamics next to rfm_segmentation — the year-over-year value-quintile migration matrix (who moved up, who churned down), the transition view a retention program is judged by",
    doc="For customers active in consecutive years: (quintile last year, quintile this year) transition counts and the row-normalized migration probability; quintiles are exact per-year NTILE(5) on annual spend in integer cents.",
    oracle="""
WITH per_cy AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_c
    FROM orders GROUP BY 1, 2
),
seg AS (
    SELECT o_custkey, yr,
           CAST(ntile(5) OVER (PARTITION BY yr
               ORDER BY spend_c, o_custkey) AS BIGINT) AS q
    FROM per_cy
)
SELECT a.q AS seg_from,
       b.q AS seg_to,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY a.q), 6)
           AS p_migrate
FROM seg a JOIN seg b ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
GROUP BY a.q, b.q
""",
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation is a snapshot; retention economics live in the
    TRANSITIONS.  Per-year value quintiles are exact NTILE — but a
    PARTITION BY year window still funnels every customer of a year
    through one task, so the rank comes from ONE global two-phase
    row_number over (year, spend, custkey) and each year's within-year
    rank is global rank minus the year's exclusive row offset (a
    year-grain census, ≤|years| rows, broadcast back) — integer-exact,
    bit-identical to the partitioned NTILE.  Spend is integer cents
    (order-independent sums, no float tie at a bucket boundary).  The
    year-over-year self-join runs on (custkey, year) and the output is
    the ≤25-cell matrix with row-normalized migration probabilities —
    ratios of exact counts.  At 100 TB: one customer-year reduction,
    the two-phase rank, one self-join on the reduced frame."""
    from shopify_youtube_etl_spark.plans.common import (
        distributed_row_number,
        ntile_from_rank_cols,
    )

    per_cy = (
        t(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "spend_c"
            )
        )
    )
    ranked, _ = distributed_row_number(
        per_cy,
        [F.col("yr").asc(), F.col("spend_c").asc(), F.col("o_custkey").asc()],
        "grn",
    )
    yw = Window.orderBy("yr").rowsBetween(Window.unboundedPreceding, -1)
    year_offsets = (
        ranked.groupBy("yr")
        .agg(F.count("*").alias("y_n"))
        .select(
            "yr",
            "y_n",
            F.coalesce(F.sum("y_n").over(yw), F.lit(0)).alias("y_off"),
        )
    )
    # localCheckpoint: the year-over-year self-join consumes seg twice;
    # without it the rank/offset subtree plans (and shuffles) twice.
    seg = (
        ranked.join(F.broadcast(year_offsets), "yr")
        .select(
            "o_custkey",
            "yr",
            ntile_from_rank_cols(F.col("grn") - F.col("y_off"), F.col("y_n"), 5)
            .cast("long")
            .alias("q"),
        )
        .localCheckpoint()
    )
    a = seg.select(
        "o_custkey", F.col("yr").alias("yr_a"), F.col("q").alias("seg_from")
    )
    b = seg.select(
        "o_custkey", F.col("yr").alias("yr_b"), F.col("q").alias("seg_to")
    )
    trans = a.join(b, "o_custkey").where(F.col("yr_b") == F.col("yr_a") + 1)
    per_from = Window.partitionBy("seg_from")
    return (
        trans.groupBy("seg_from", "seg_to")
        .agg(F.count("*").alias("n_customers"))
        .select(
            "seg_from",
            "seg_to",
            "n_customers",
            F.round(
                F.col("n_customers") / F.sum("n_customers").over(per_from), 6
            ).alias("p_migrate"),
        )
    )


@query(
    "sliding_distinct_users_7d",
    ref="engagement family next to dau_mau_stickiness / two_stage_distinct_daily_users — EXACT trailing-7-day distinct users per active day (the WAU curve), the sliding COUNT(DISTINCT) that naive windowing cannot express at scale",
    doc="For each day with events: that day's exact distinct users and the exact distinct users over the trailing 7 days (day-6 .. day).",
    oracle="""
WITH pairs AS (
    SELECT DISTINCT
           CAST(date_diff('day', DATE '1970-01-01',
                CAST(ts AS DATE)) AS BIGINT) AS day_num,
           user_id
    FROM events WHERE ts IS NOT NULL
),
days AS (
    SELECT day_num, CAST(count(*) AS BIGINT) AS dau
    FROM pairs GROUP BY day_num
),
win AS (
    SELECT d.day_num, p.user_id
    FROM days d JOIN pairs p
      ON p.day_num BETWEEN d.day_num - 6 AND d.day_num
)
SELECT w.day_num,
       min(d.dau)                               AS dau,
       CAST(count(DISTINCT w.user_id) AS BIGINT) AS users_7d
FROM win w JOIN days d ON d.day_num = w.day_num
GROUP BY w.day_num
""",
)
def sliding_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counts don't decompose, so the trailing-7-day user
    count can't come from summing daily counts — and a RANGE window
    with COUNT(DISTINCT) doesn't exist in either engine.  The exact
    form: dedupe to (day, user) pairs FIRST (the big reduction), then
    rewrite the bounded range join as an EQUI-join by exploding each
    pair into its 7 target windows (the EWMA trick), and run the
    second-stage distinct per window.  Work is 7x the deduped pair
    count — the honest exact cost, bounded and shuffle-friendly; the
    mergeable-HLL rollup family is the registered approximate path
    when 7x pairs is too much.  All-integer output."""
    pairs = (
        t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            epoch_day(F.col("ts").cast("date")).alias("day_num"), "user_id"
        )
        .distinct()
    )
    days = pairs.groupBy("day_num").agg(F.count("*").alias("dau"))
    fan = pairs.select(
        "day_num", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    ).select((F.col("day_num") + F.col("off")).alias("target_num"), "user_id")
    win = fan.join(
        days.select(F.col("day_num").alias("target_num"), "dau"), "target_num"
    )
    return (
        win.groupBy(F.col("target_num").alias("day_num"))
        .agg(
            F.min("dau").alias("dau"),
            F.countDistinct("user_id").alias("users_7d"),
        )
    )


@query(
    "fulfillment_sla_attainment",
    ref="operations family next to order_cycle_time_percentiles — SLA attainment by order priority: the share of orders whose FIRST shipment left within 7/30/90 days, the ops scorecard a fulfillment team is graded on",
    doc="Per order priority: order count and the exact share of orders first-shipped within 7, 30, and 90 days of order date (orders with no lineitems excluded).",
    oracle="""
WITH first_ship AS (
    SELECT l_orderkey AS okey,
           min(CAST(l_shipdate AS DATE)) AS first_ship
    FROM lineitem GROUP BY 1
),
lag AS (
    SELECT o_orderpriority AS priority,
           date_diff('day', CAST(o_orderdate AS DATE), f.first_ship) AS lag_days
    FROM orders JOIN first_ship f ON o_orderkey = f.okey
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(CASE WHEN lag_days <= 7  THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS within_7d,
       round(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS within_30d,
       round(sum(CASE WHEN lag_days <= 90 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS within_90d
FROM lag GROUP BY priority
""",
)
def fulfillment_sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles say how slow the tail is; an SLA scorecard says how
    much of the book met the PROMISE — the number an ops review
    actually reads.  First-shipment date reduces lineitem to order
    grain (one shuffle on the natural join key, shared with the order
    attach), lag buckets are conditional partial aggregates (no
    second pass per threshold), and the output is one row per
    priority.  Shares are ratios of exact counts — bit-stable.  At
    100 TB: one orderkey-shuffle pair, 5-row output."""
    first_ship = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("first_ship"))
    )
    lag = (
        t(spark, sf_dir, "orders")
        .join(first_ship, F.col("o_orderkey") == F.col("okey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("first_ship"), F.col("o_orderdate").cast("date")
            ).alias("lag_days"),
        )
    )
    share = lambda d: F.round(  # noqa: E731
        F.sum(F.when(F.col("lag_days") <= d, 1).otherwise(0)) / F.count("*"), 6
    )
    return lag.groupBy("priority").agg(
        F.count("*").alias("n_orders"),
        share(7).alias("within_7d"),
        share(30).alias("within_30d"),
        share(90).alias("within_90d"),
    )


@query(
    "behavior_entropy_census",
    ref="behavioral-diversity family next to event_transition_matrix / source_lang_entropy — Shannon entropy of each user's event-type mix, censused into diversity bands: one-trick users vs explorers",
    doc="Users bucketed by the Shannon entropy (nats) of their event-type distribution — bands at 1.55/1.58/1.60, chosen inside the corpus's observed 1.51-1.61 range so the census discriminates — with user counts and mean events per user per band.",
    oracle="""
WITH mix AS (
    SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS n
    FROM events WHERE ts IS NOT NULL
    GROUP BY user_id, event_type
),
tot AS (
    SELECT user_id, sum(n) AS total FROM mix GROUP BY user_id
),
ent AS (
    SELECT m.user_id,
           min(t.total) AS n_events,
           round(-sum((m.n / t.total) * ln(m.n / t.total)), 6) AS entropy
    FROM mix m JOIN tot t ON m.user_id = t.user_id
    GROUP BY m.user_id
),
banded AS (
    SELECT CASE WHEN entropy < 1.55 THEN '0_low'
                WHEN entropy < 1.58 THEN '1_mid'
                WHEN entropy < 1.60 THEN '2_high'
                ELSE '3_max' END AS entropy_band,
           n_events
    FROM ent
)
SELECT entropy_band,
       CAST(count(*) AS BIGINT)        AS n_users,
       round(avg(n_events), 4)          AS mean_events_per_user
FROM banded GROUP BY entropy_band
""",
)
def behavior_entropy_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How varied is each user's behavior?  Shannon entropy of the
    per-user event-type mix is the one-number answer (0 = a single
    repeated action, ln(5) ≈ 1.61 = uniform across all five types) —
    the feature a churn or bot model reaches for first.  The mix and
    the per-user total share one user-keyed reduction chain; entropy
    is a per-user sum over ≤|event types| rows, and the band census is
    a 4-row rollup.  The entropy is rounded BEFORE banding, so a
    summation-order ulp cannot flip a user across a band edge on one
    engine only.  At 100 TB: one (user, type) reduction, one user
    reduction, 4-row output."""
    mix = (
        t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").cast("double").alias("n"))
    )
    tot = mix.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n") / F.col("total")
    ent = (
        mix.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("total").alias("n_events"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )
    banded = ent.select(
        F.when(F.col("entropy") < 1.55, "0_low")
        .when(F.col("entropy") < 1.58, "1_mid")
        .when(F.col("entropy") < 1.60, "2_high")
        .otherwise("3_max")
        .alias("entropy_band"),
        "n_events",
    )
    return banded.groupBy("entropy_band").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg("n_events"), 4).alias("mean_events_per_user"),
    )

"""Relational-parity queries (SURVEY.md §2.1-2.8, Phase 0-1).

Each query re-expresses a reference operator as a declarative DataFrame
plan (Catalyst handles pushdown/pruning/join strategy) with a DuckDB
oracle.  Reference operator ids (S*, P*, J*, A*, O*, U*, F*) cite
SURVEY.md §2 which cites shopify-etl/shopify_etl.py lines.

Scale notes: every query here is a pure shuffle-on-key agg/join plan —
no driver-side loops, no UDFs, no collect.  Small-dimension joins
(customer at 150·sf rows) stay under the autoBroadcast threshold so
Catalyst broadcasts them automatically; verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shopify_youtube_etl_spark.plans.common import day_str, money, t, ts_str
from shopify_youtube_etl_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Phase 0 — flagship
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue",
    ref="S2,S8,J3-analog,A1,A7,O1; README.md:49-52 revenue analytics",
    doc="Revenue by return-flag × order-status since 1998: scan → pushed filter → join → agg → sort.",
    oracle="""
SELECT l_returnflag,
       o_orderstatus,
       CAST(count(*) AS BIGINT)                         AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(avg(l_quantity), 6)                         AS avg_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1998-01-01'
GROUP BY l_returnflag, o_orderstatus
""",
)
def flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's purpose is revenue analytics over orders + items
    (README.md:49-52); this is that query on the testdata star schema.

    The date filter is written on the probe side so Catalyst pushes it
    into the orders parquet scan (PushedFilters) — the Spark analog of
    the reference pushing ``updated_at_min`` into the source API (S2,
    shopify_etl.py:274-276).
    """
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "1998-01-01")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag", "o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Filters / projections
# ---------------------------------------------------------------------------


@query(
    "filter_conjunction",
    ref="P4 (shopify_etl.py:177)",
    doc="Equality-conjunction filter, projected — WHERE a = x AND b = y.",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
""",
)
def filter_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .where((F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "scalar_functions",
    ref="F1,F2,F3,F6,F7,F9,F11,F13 (casts, yes/no encode, date_format, to_json(struct), regexp_extract, concat)",
    doc="One projection exercising the reference's scalar-function surface.",
    oracle="""
SELECT CAST(o_orderkey AS VARCHAR)                                   AS order_id_str,
       CASE WHEN o_totalprice > 200000 THEN 'yes' ELSE 'no' END      AS big_spender,
       strftime(o_orderdate, '%Y-%m-%d')                             AS order_day,
       CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS BIGINT) AS priority_num,
       CAST(to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS VARCHAR) AS json_info,
       concat_ws('-', o_orderstatus, CAST(o_orderkey AS VARCHAR))    AS status_key
FROM orders
WHERE o_orderkey % 10 = 0
""",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 str() casts, F3 boolean→'yes'/'no' (shopify_etl.py:419), F6/F7
    timestamp format, F9 TO_JSON_STRING(STRUCT(...)) (:605), F11 regex
    extract (:442), F13 concat."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return o.select(
        F.col("o_orderkey").cast("string").alias("order_id_str"),
        F.when(F.col("o_totalprice") > 200000, "yes").otherwise("no").alias("big_spender"),
        day_str(F.col("o_orderdate")).alias("order_day"),
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1).cast("long").alias("priority_num"),
        F.to_json(F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s"))).alias("json_info"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderkey").cast("string")).alias("status_key"),
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "uniqueness_profile",
    ref="A1,A2,A3 (shopify_etl.py:592-618 verify_unique_records)",
    doc="COUNT(*) vs COUNT(DISTINCT key) vs composite-key distinct count.",
    oracle="""
SELECT CAST(count(*) AS BIGINT)                                AS total_records,
       CAST(count(DISTINCT l_orderkey) AS BIGINT)              AS unique_orders,
       CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS unique_lines
FROM lineitem
""",
)
def uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts — the reference's uniqueness verification
    (A2 single key :598; A3 composite via TO_JSON_STRING(STRUCT(..))
    :603-607, which Spark expresses directly as multi-arg countDistinct)."""
    return t(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("total_records"),
        F.countDistinct("l_orderkey").alias("unique_orders"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("unique_lines"),
    )


@query(
    "distinct_projection",
    ref="A4 (SELECT DISTINCT, shopify_etl.py:575)",
    doc="SELECT DISTINCT over a projection.",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "duplicate_inspection",
    ref="A6 (shopify_etl.py:463-481, dead code made live)",
    doc="Per-key count, filtered to duplicates — the reference's duplicate report.",
    oracle="""
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS duplicate_count
FROM events
GROUP BY user_id, event_type
HAVING count(*) > 1
""",
)
def duplicate_inspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("duplicate_count"))
        .where(F.col("duplicate_count") > 1)
    )


@query(
    "events_daily_rollup",
    ref="A7/S4 (fetch_youtube_data.py:29-35 — remote GROUP BY day)",
    doc="Day-grain metrics rollup — the YouTube Analytics query computed locally.",
    oracle="""
SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')  AS day,
       CAST(count(*) AS BIGINT)                     AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT)      AS n_users,
       round(sum(value), 2)                         AS total_value
FROM events
GROUP BY 1
""",
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4's ``dimensions=day, metrics=views,likes,...`` is a remote GROUP
    BY day; computed natively here over the events table (SURVEY §2.1 S4)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(day_str(F.col("ts")).alias("day")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        money(F.sum("value")).alias("total_value"),
    )


@query(
    "status_priority_rollup",
    ref="extension per SURVEY §2.4 (grouping sets are free in Spark)",
    doc="ROLLUP(status, priority) with sentinel-filled subtotal rows.",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL')                AS status,
       coalesce(o_orderpriority, 'ALL')              AS priority,
       CAST(count(*) AS BIGINT)                      AS n_orders,
       round(sum(o_totalprice), 2)                   AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
)
def status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), money(F.sum("o_totalprice")).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "approx_distinct_profile",
    ref="extension per SURVEY §2.4 (approx_count_distinct at scale)",
    doc="HLL++ approximate distinct — the 100 TB-scale answer to A2; rows-only check (sketches aren't oracle-portable).",
    oracle=None,
)
def approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB an exact COUNT(DISTINCT) shuffles every key; HLL++ is
    the scale path.  DuckDB's approx sketch differs, so this is a
    rows-only check; tests assert the estimate is within 5% of exact."""
    return t(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "customers_without_orders",
    ref="J1 (shopify_etl.py:718-733 — LEFT JOIN + IS NULL ⇒ anti-join)",
    doc="Referential-integrity orphan probe as a native left-anti join.",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference writes LEFT JOIN ... WHERE right IS NULL; Catalyst
    plans the same thing from an explicit left_anti join (SURVEY J1)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "orders_without_lineitems",
    ref="J2 (monitoring-guide.md:91-95)",
    doc="Reverse-direction orphan probe: orders with no line items.",
    oracle="""
SELECT o_orderkey, o_orderstatus
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
)
def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select("o_orderkey", "o_orderstatus")


@query(
    "star_join_revenue_by_nation",
    ref="J broadcast-dim star join (SURVEY §2.3 'broadcast joins via Catalyst')",
    doc="3-way star join with broadcast dims: revenue per nation.",
    oracle="""
SELECT n_name                                            AS nation,
       CAST(count(*) AS BIGINT)                          AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer/nation are small dims — F.broadcast keeps the big
    fact-side shuffle-free for those hops even if stats are missing
    (at 100 TB only lineitem⋈orders shuffles, on the join key)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_items"),
            money(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "latest_event",
    ref="O1 (shopify_etl.py:174-180 — ORDER BY DESC LIMIT 1 watermark read)",
    doc="Top-1 by timestamp with deterministic tie-break — the watermark read.",
    oracle="""
SELECT event_id,
       user_id,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 1
""",
)
def latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst plans orderBy+limit as TakeOrderedAndProject — a
    per-partition top-k then driver merge, no full sort at scale."""
    e = t(spark, sf_dir, "events")
    return (
        e.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
        .select("event_id", "user_id", ts_str(F.col("ts")).alias("ts_str"))
    )


@query(
    "topk_orders",
    ref="O1 generalization + §2.5 window machinery",
    doc="Deterministic top-10 orders by total price (row_number tie-break).",
    oracle="""
SELECT o_orderkey, o_totalprice, rank
FROM (
    SELECT o_orderkey, o_totalprice,
           row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
    FROM orders
)
WHERE rank <= 10
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy().limit(10) FIRST so Catalyst plans TakeOrderedAndProject
    (per-partition top-10 heaps merged on 10 rows), then the rank window
    runs over the already-cut 10-row frame — never a global row_number
    over every order through one task (the single-partition-window
    anti-pattern this repo's scan-parallel rank helper exists for;
    here the k-row cut makes the window trivially bounded instead)."""
    top = (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return top.select(
        "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rank")
    )


@query(
    "latest_order_per_customer",
    ref="§2.5 extension — latest-per-key generalizing the control-table read",
    doc="row_number() over (partition by key order by ts desc) = 1.",
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day
FROM (
    SELECT o_custkey, o_orderkey, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
)
WHERE rn = 1
""",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-key generalization of O1 (SURVEY §2.5): one shuffle on
    the partition key, no self-join — survives skew via AQE."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", day_str(F.col("o_orderdate")).alias("order_day"))
    )


@query(
    "keep_first_dedup",
    ref="A5 (shopify_etl.py:496-542 keep-first hash dedup) + O2 arrival order",
    doc="Keep-FIRST-occurrence dedup via row_number over explicit arrival order.",
    oracle="""
SELECT user_id, event_id,
       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
FROM (
    SELECT user_id, event_id, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
)
WHERE rn = 1
""",
)
def keep_first_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's dropDuplicates keeps an *arbitrary* row; the reference's
    set-based dedup keeps the FIRST arrival (:507-516).  Faithful
    semantics = row_number over arrival order (SURVEY A5) — here ts is
    the arrival order (the reference fetches order=asc, O2 :274)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", ts_str(F.col("ts")).alias("first_ts"))
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "union_append",
    ref="U1 (shopify_etl.py:133,544-553 — WRITE_APPEND accumulation)",
    doc="UNION ALL of two incremental slices, then re-aggregated.",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(o_totalprice), 2) AS total_price
FROM (
    SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT * FROM orders WHERE o_totalprice > 250000
)
GROUP BY o_orderstatus
""",
)
def union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    big = o.where(F.col("o_totalprice") > 250000)
    return (
        urgent.unionByName(big)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"), money(F.sum("o_totalprice")).alias("total_price"))
    )


@query(
    "tpch_q1_pricing_summary",
    ref="A1/A7/§2.4 canonical form — TPC-H Q1 pricing summary (full aggregate battery)",
    doc="Classic Q1: per (returnflag, linestatus) sums/avgs with tax and discount terms.",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(l_quantity) AS BIGINT)                     AS sum_qty,
       round(sum(l_extendedprice), 2)                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)                           AS avg_qty,
       round(avg(l_extendedprice), 6)                      AS avg_price,
       round(avg(l_discount), 6)                           AS avg_disc,
       CAST(count(*) AS BIGINT)                            AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical OLAP aggregation benchmark query, stated 1:1: a
    pushed ship-date filter, then eight aggregates over two low-
    cardinality keys — pure map-side partial aggregation into a ~6-row
    shuffle, the shape Catalyst + Tungsten handle at any scale.  The
    ship-date literal is Q1's spec value (DATE '1998-12-01' - 90 days)."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        money(F.sum("l_extendedprice")).alias("sum_base_price"),
        money(F.sum(disc)).alias("sum_disc_price"),
        money(F.sum(disc * (1 + F.col("l_tax")))).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "except_all_multiset_diff",
    ref="U1/§2.7 completion — EXCEPT ALL / INTERSECT ALL (multiset semantics)",
    doc="Multiset difference of order-status rows: high-value minus urgent, duplicates preserved.",
    oracle="""
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows
FROM (
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_totalprice > 150000
    EXCEPT ALL
    SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY o_orderstatus
""",
)
def except_all_multiset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the set-operation family with the ALL variants:
    ``exceptAll`` keeps multiplicity (a row occurring m times on the
    left and n on the right survives max(m−n, 0) times), which the
    DISTINCT variants destroy.  Spark plans it as a counted aggregation
    + generate — one shuffle on the full row, no join explosion."""
    o = t(spark, sf_dir, "orders")
    high = o.where(F.col("o_totalprice") > 150000).select("o_orderstatus", "o_orderpriority")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderstatus", "o_orderpriority"
    )
    return (
        high.exceptAll(urgent)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "approx_quantiles_profile",
    ref="extension per SURVEY §2.4 — the sketch answer to exact percentiles at 100 TB (rows-only: GK sketches aren't oracle-portable)",
    doc="percentile_approx p50/p90/p99 of order value per segment-ish status; tolerance vs exact twin pytest-checked.",
    oracle=None,
)
def approx_quantiles_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles: mergeable fixed-size
    sketches, one partial-agg shuffle — versus exact percentiles,
    which at 100 TB need a full sort per group.  accuracy=10000 bounds
    rank error to n/10000; the pytest twin checks each estimate falls
    within the exact rank±0.5% value band.  Rows-only for the driver
    (DuckDB's approx_quantile is t-digest — a different sketch)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("q"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("q")[0], 2).alias("p50"),
            F.round(F.col("q")[1], 2).alias("p90"),
            F.round(F.col("q")[2], 2).alias("p99"),
            "n_orders",
        )
    )


@query(
    "regr_price_by_size",
    ref="extension per SURVEY §2.4 — SQL:2003 linear-regression aggregates (the trend-fit behind README.md:49 'revenue trends')",
    doc="Per-brand OLS fit of retail price on part size: slope, intercept, r², corr, n.",
    oracle="""
SELECT p_brand,
       round(regr_slope(p_retailprice, p_size), 6)     AS slope,
       round(regr_intercept(p_retailprice, p_size), 6) AS intercept,
       round(regr_r2(p_retailprice, p_size), 6)        AS r2,
       round(corr(p_retailprice, p_size), 6)           AS correlation,
       CAST(count(*) AS BIGINT)                        AS n_parts
FROM part
GROUP BY p_brand
""",
)
def regr_price_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression as an AGGREGATE, not a solver: regr_slope/intercept/
    r2 are single-pass mergeable moment sketches (sums of x, y, xy,
    x², y²), so the whole fit is one partial-agg shuffle producing one
    row per brand — the distributed-OLS shape that replaces collecting
    points to a driver-side fit.  6dp rounding absorbs the engines'
    different summation orders on the moment sums."""
    p = t(spark, sf_dir, "part")
    y, x = F.col("p_retailprice"), F.col("p_size").cast("double")
    return p.groupBy("p_brand").agg(
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.corr(y, x), 6).alias("correlation"),
        F.count("*").alias("n_parts"),
    )


@query(
    "ntile_value_quartiles",
    ref="extension per SURVEY §2.5 — NTILE bucketing (rank family sibling of ranked_customers_per_segment)",
    doc="Customers split into 4 account-balance quartiles (deterministic tie-break); per-quartile size and balance stats.",
    oracle="""
SELECT quartile,
       CAST(count(*) AS BIGINT)     AS n_customers,
       round(min(c_acctbal), 2)     AS min_bal,
       round(max(c_acctbal), 2)     AS max_bal,
       round(sum(c_acctbal), 2)     AS total_bal
FROM (
    SELECT c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
    FROM customer
)
GROUP BY quartile
""",
)
def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE over a total order (balance, then key — ties broken so
    both engines cut identical buckets), computed WITHOUT the
    single-partition NTILE window: a two-phase distributed row_number
    (range partitions + exact integer count offsets) feeds the
    SQL-standard closed-form bucket assignment — bit-identical to the
    engine's NTILE, partition-parallel at any scale.  The sketch-cut
    sibling (approx_quantiles_profile) remains the cheap approximate
    path; this is the exact one."""
    from shopify_youtube_etl_spark.plans.common import (
        distributed_row_number,
        ntile_from_rank,
    )

    ranked, n = distributed_row_number(
        t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey"),
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        "rn",
    )
    return (
        ranked.select(
            "c_acctbal", ntile_from_rank("rn", n, 4).cast("long").alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "unpivot_part_metrics",
    ref="extension per SURVEY §2.1 — UNPIVOT/melt (inverse of pivot_status_counts; wide→long reshape P1 family)",
    doc="Part numeric columns melted to (metric, value) rows; per-metric profile.",
    oracle="""
SELECT metric,
       CAST(count(*) AS BIGINT) AS n_values,
       round(avg(value), 6)     AS mean_value,
       round(min(value), 2)     AS min_value,
       round(max(value), 2)     AS max_value
FROM (
    SELECT 'p_retailprice' AS metric, p_retailprice AS value FROM part
    UNION ALL
    SELECT 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
)
GROUP BY metric
""",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long without N scans: Spark's UNPIVOT plans one Expand
    node over a single pass (each row fans out to one output row per
    value column map-side), where the naive UNION ALL form re-reads
    the table per metric.  The agg then reduces map-side to |metrics|
    rows — the profile the reshape exists to feed."""
    p = t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").cast("double"), F.col("p_size").cast("double")
    )
    return (
        p.unpivot("p_partkey", ["p_retailprice", "p_size"], "metric", "value")
        .groupBy("metric")
        .agg(
            F.count("*").alias("n_values"),
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


@query(
    "iqr_outlier_profile",
    ref="extension per SURVEY §2.4 — Tukey-fence outlier screen (data-quality sibling of groupwise_quality_zscore, exact-percentile family)",
    doc="Per-status exact quartiles, IQR fence at q3+1.5·IQR, and the count/value share of outliers above it.",
    oracle="""
WITH bounds AS (
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.25) AS q1,
           quantile_cont(o_totalprice, 0.75) AS q3
    FROM orders GROUP BY 1
)
SELECT o.o_orderstatus                     AS status,
       b.q1                                AS q1,
       b.q3                                AS q3,
       b.q3 + 1.5 * (b.q3 - b.q1)          AS hi_fence,
       CAST(count(*) FILTER (WHERE o.o_totalprice > b.q3 + 1.5 * (b.q3 - b.q1)) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT)            AS n_orders
FROM orders o JOIN bounds b USING (o_orderstatus)
GROUP BY o.o_orderstatus, b.q1, b.q3
""",
)
def iqr_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two passes: exact per-group quartiles (one agg shuffle), then
    the fence re-applied to the fact rows via a BROADCAST join of the
    |statuses|-row bounds — the outlier count is a conditional agg in
    the same second pass, so no row-level outlier set is ever
    materialized.  Spark's ``percentile`` and DuckDB's quantile_cont
    share the p·(n−1) linear-interpolation definition, so the raw
    doubles are BIT-identical across engines — which is why these
    outputs are deliberately NOT rounded: percentiles of 2-dp money
    land on exact decimal midpoints (….765, ….425) where Spark
    (BigDecimal over the exact binary expansion) and DuckDB (shortest
    decimal repr) round HALF-UP to different sides — a real mismatch
    caught by the sf0.1 sweep, round 4.  Rounding exists to absorb
    summation-order float residue; order-independent exact values
    don't have any, and rounding them is what breaks parity."""
    o = t(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    bounds = o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    fence = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        o.join(F.broadcast(bounds), "o_orderstatus")
        .groupBy("o_orderstatus", "q1", "q3")
        .agg(
            F.sum(F.when(F.col("o_totalprice") > fence, 1).otherwise(0)).alias("n_outliers"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            "q1",
            "q3",
            fence.alias("hi_fence"),
            "n_outliers",
            "n_orders",
        )
    )


@query(
    "value_histogram",
    ref="extension per SURVEY §2.4 — fixed-width histogram (distribution profile the reference's monitoring guide eyeballs via ad-hoc GROUP BY)",
    doc="20 equal-width buckets over order value: per-bucket bounds, count, and value share.",
    oracle="""
WITH rng AS (
    SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
), b AS (
    SELECT CAST(least(floor(((o_totalprice - mn) * 20.0) / (mx - mn)), 19.0) AS BIGINT) AS bucket,
           o_totalprice, mn, mx
    FROM orders, rng
)
SELECT bucket,
       mn + bucket * (mx - mn) / 20.0       AS lo,
       mn + (bucket + 1) * (mx - mn) / 20.0 AS hi,
       CAST(count(*) AS BIGINT)             AS n_orders
FROM b
GROUP BY bucket, mn, mx
""",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram in two passes: a one-row min/max agg
    BROADCAST back over the facts (never a driver collect), bucket id
    computed with the identical ((v−mn)·20)/(mx−mn) expression tree on
    both engines so IEEE rounding can't split a boundary value, then
    the count agg reduces map-side to ≤20 rows.  This is the scan-
    shaped distribution profile — at 100 TB it's exactly two scans, or
    one if the bounds come from catalog stats."""
    o = t(spark, sf_dir, "orders").select("o_totalprice")
    rng = o.agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
    bucket = F.least(
        F.floor(((F.col("o_totalprice") - F.col("mn")) * F.lit(20.0)) / (F.col("mx") - F.col("mn"))),
        F.lit(19).cast("long"),
    )
    return (
        o.join(F.broadcast(rng))
        .select(bucket.alias("bucket"), "o_totalprice", "mn", "mx")
        .groupBy("bucket", "mn", "mx")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "bucket",
            # Unrounded on purpose: lo/hi are exact expression results
            # (identical tree both engines → bit-identical doubles);
            # (mx−mn)/20 of 2-dp money yields 0.0005-multiples whose
            # 2-dp rounding is an exact midpoint — the cross-engine
            # HALF-UP split the IQR query hit (see iqr_outlier_profile).
            (F.col("mn") + F.col("bucket") * (F.col("mx") - F.col("mn")) / 20.0).alias("lo"),
            (F.col("mn") + (F.col("bucket") + 1) * (F.col("mx") - F.col("mn")) / 20.0).alias("hi"),
            "n_orders",
        )
    )


@query(
    "column_profile_orders",
    ref="ANALYZE-style whole-table column profiling — the statistics pass a warehouse runs before choosing layouts, the generalization of uniqueness_profile's key audit to every column",
    doc="Per orders column: null count, exact distinct count, and min/max rendered to canonical strings (timestamps as yyyy-MM-dd HH:mm:ss, doubles 2dp).",
    oracle="""
SELECT 'o_orderkey' AS column_name,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_orderkey) AS BIGINT)   AS n_distinct,
       CAST(min(o_orderkey) AS VARCHAR)             AS min_val,
       CAST(max(o_orderkey) AS VARCHAR)             AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       min(o_orderstatus), max(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(count(*) - count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       CAST(round(min(o_totalprice), 2) AS VARCHAR),
       CAST(round(max(o_totalprice), 2) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(count(*) - count(o_orderdate) AS BIGINT),
       CAST(count(DISTINCT o_orderdate) AS BIGINT),
       strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
       strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       min(o_orderpriority), max(o_orderpriority)
FROM orders
""",
)
def column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column statistics in ONE scan: every column's null
    count, exact distinct count, and min/max computed in a single
    multi-aggregate pass — Catalyst's Expand operator replicates each
    row once per distinct-counted column (6× map-side width, zero
    extra scans), exactly how ANALYZE TABLE ... COMPUTE STATISTICS FOR
    ALL COLUMNS executes.  The row-per-column shape comes from
    stacking the one aggregate row AFTER aggregation (a 1-row unpivot,
    driver-free) — never from six scans like the naive UNION ALL the
    oracle spells out for DuckDB's benefit.  At 100 TB this is the
    layout-planning pass: n_distinct picks Z-order/bucket candidates
    (cluster_by), null rates pick NOT NULL enforcement, min/max seed
    the segment-stat sidecars ``read_range`` prunes with.  Min/max
    render to canonical strings per type (timestamps second-precision,
    doubles 2dp) so one schema carries every column."""
    o = t(spark, sf_dir, "orders")

    def stats(c: str, fmt):
        return [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__null"),
            F.countDistinct(c).cast("long").alias(f"{c}__dist"),
            fmt(F.min(c)).alias(f"{c}__min"),
            fmt(F.max(c)).alias(f"{c}__max"),
        ]

    as_str = lambda x: x.cast("string")
    as_money = lambda x: F.round(x, 2).cast("string")
    as_ts = lambda x: F.date_format(x, "yyyy-MM-dd HH:mm:ss")
    agg = o.agg(
        *stats("o_orderkey", as_str),
        *stats("o_custkey", as_str),
        *stats("o_orderstatus", as_str),
        *stats("o_totalprice", as_money),
        *stats("o_orderdate", as_ts),
        *stats("o_orderpriority", as_str),
    )
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__dist").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in (
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        )
    ]
    return agg.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


@query(
    "two_stage_distinct_daily_users",
    ref="skew-resistant exact COUNT(DISTINCT) — the two-stage rewrite (pre-aggregate the pair grain, count the reduced frame) that replaces the single-key distinct shuffle at 100 TB; result-identical twin of the direct countDistinct",
    doc="Distinct event users per day via groupBy(day, user) then count per day — exactly the direct COUNT(DISTINCT user) answer.",
    oracle="""
SELECT strftime(ts, '%Y-%m-%d')          AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
WHERE user_id IS NOT NULL
GROUP BY strftime(ts, '%Y-%m-%d')
""",
)
def two_stage_distinct_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT key) GROUP BY g executed as TWO ordinary
    aggregations: groupBy(g, key) — which map-side-combines and spreads
    a hot group's keys across ALL partitions of the (g, key) shuffle —
    then groupBy(g) count on the already-distinct frame.  The direct
    form hash-partitions on g alone, so one viral day lands every one
    of its users on a single reducer: the classic straggler that kills
    exact-distinct dashboards at 100 TB.  Here both stages stay
    whole-stage-codegen HashAggregates and the second input is
    |distinct pairs|, not |events|.  This is the same pre-reduce
    discipline as ``hll_daily_users_rollup``'s sketch path, but EXACT —
    register both, pick by error budget.  Result-identical to the
    direct ``events_daily_rollup``-style countDistinct by construction
    (the oracle is the direct form)."""
    e = t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    pairs = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), F.col("user_id")
    ).agg(F.lit(1).alias("_one"))
    return pairs.groupBy("day").agg(F.count("*").cast("long").alias("n_users"))


@query(
    "ansi_safe_arithmetic",
    ref="Spark 4 ANSI-mode discipline — the try_* function family (try_divide/try_add): errors become NULLs the query accounts for EXPLICITLY, instead of either silent nulls (legacy mode) or job-killing exceptions (raw ANSI)",
    doc="Per order status: average unit price via try_divide(extendedprice, quantity-10) — divisions whose adjusted quantity hits zero surface as a counted null bucket, not a crash.",
    oracle="""
SELECT o_orderstatus                         AS status,
       CAST(count(*) AS BIGINT)              AS n_lines,
       CAST(sum(CASE WHEN l_quantity = 10 THEN 1 ELSE 0 END) AS BIGINT)
                                             AS n_undefined,
       round(avg(CASE WHEN l_quantity <> 10
                      THEN l_extendedprice / (l_quantity - 10) END), 2)
                                             AS avg_adjusted_unit_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def ansi_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 runs ANSI mode by default: x/0 THROWS, killing the whole
    job for one bad row — the 100 TB failure mode where a 6-hour
    pipeline dies at hour 5 on a single denominator.  ``try_divide``
    is the per-expression escape: the error becomes NULL, and the
    query COUNTS those nulls into an explicit `n_undefined` bucket so
    the degradation is observable rather than silent (the expectations
    -report discipline applied at expression grain).  The oracle
    encodes the identical semantics as a guarded CASE — proving try_*
    is deterministic arithmetic, not an engine quirk.  All JVM
    codegen; the join broadcasts orders' two columns; one status
    rollup."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    unit = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 10)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("l_quantity") == 10, 1).otherwise(0)).alias(
                "n_undefined"
            ),
            F.round(F.avg(unit), 2).alias("avg_adjusted_unit_price"),
        )
    )


@query(
    "pivot_revenue_matrix",
    ref="§2.4 extension — PIVOT (wide reshaping aggregate): per-priority revenue split across order-status columns; Spark plans pivot as ONE pass of conditional partial aggregates, the portable form the oracle states explicitly",
    doc="Order priority x order status revenue matrix: one row per o_orderpriority with status columns (O/F/P) as conditional revenue sums plus a row total.",
    oracle="""
SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS revenue_o,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS revenue_f,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS revenue_p,
       round(sum(o_totalprice), 2)                                               AS revenue_total
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_revenue_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — the wide-reshaping aggregate every BI surface exports.
    The VALUES ARE PINNED ('O'/'F'/'P', TPC-H's order-status domain):
    an unpinned pivot must first run a distinct scan to discover the
    column set AND produces a data-dependent schema, both of which are
    wrong at 100 TB (the discovery scan reads the table twice; a
    drifting schema breaks every downstream consumer).  With pinned
    values Catalyst compiles the pivot to one pass of conditional
    partial aggregates — exactly the CASE-WHEN form the oracle states —
    so the reshape costs the same single shuffle as a plain GROUP BY."""
    o = t(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return wide.select(
        "o_orderpriority",
        money(F.coalesce(F.col("O"), F.lit(0.0))).alias("revenue_o"),
        money(F.coalesce(F.col("F"), F.lit(0.0))).alias("revenue_f"),
        money(F.coalesce(F.col("P"), F.lit(0.0))).alias("revenue_p"),
        money(
            F.coalesce(F.col("O"), F.lit(0.0))
            + F.coalesce(F.col("F"), F.lit(0.0))
            + F.coalesce(F.col("P"), F.lit(0.0))
        ).alias("revenue_total"),
    )


@query(
    "unpivot_charge_components",
    ref="§2.4 extension — UNPIVOT/melt (wide-to-long reshaping): lineitem's three charge components stacked into (component, amount) rows; Spark plans it as Expand, the zero-shuffle dual of pivot",
    doc="Per (l_returnflag, component) totals after melting base price, discount amount, and tax amount into long form: component in {base, discount, tax}.",
    oracle="""
SELECT l_returnflag, component, round(sum(amount), 2) AS total_amount,
       CAST(count(*) AS BIGINT) AS n_rows
FROM (
    SELECT l_returnflag, 'base' AS component, l_extendedprice AS amount FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'discount', l_extendedprice * l_discount FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'tax', l_extendedprice * (1 - l_discount) * l_tax FROM lineitem
)
GROUP BY l_returnflag, component
""",
)
def unpivot_charge_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the wide-to-long dual of pivot, the reshape
    that turns per-column metrics into a tidy (key, metric, value)
    stream for generic downstream aggregation.  Spark's ``unpivot``
    plans an Expand node (each input row emits one row per value
    column, map-side, ZERO extra shuffle) — the oracle's UNION ALL of
    three scans states the same multiset declaratively, but the Expand
    form reads the table ONCE; at 100 TB that is a 3x scan saving, the
    same physics as grouping-sets.  Derived amount columns are
    projected first so the melt carries the final metrics."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("base"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("discount"),
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax")
        ).alias("tax"),
    )
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["base", "discount", "tax"],
        variableColumnName="component",
        valueColumnName="amount",
    )
    return long.groupBy("l_returnflag", "component").agg(
        money(F.sum("amount")).alias("total_amount"),
        F.count("*").alias("n_rows"),
    )

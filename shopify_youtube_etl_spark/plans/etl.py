"""ETL-operator queries: MERGE upsert, verification, control-table read
(SURVEY §2.3 J3, §2.4 A1-A3, §2.12) — the reference's custom surface,
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.upsert import ParquetTable, upsert
from shopify_youtube_etl_spark.operators.verify import fk_report, uniqueness_report
from shopify_youtube_etl_spark.plans.common import day_str, money, t
from shopify_youtube_etl_spark.plans.registry import query


@query(
    "merge_upsert",
    ref="J3/J4/A4/D2 (shopify_etl.py:558-590 MERGE staging→final)",
    doc="MERGE rewrite: staging rows win on key, unmatched finals kept; aggregated for a compact hash.",
    oracle="""
WITH staging AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 5 = 0
),
merged AS (
    SELECT * FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = o.o_orderkey)
    UNION ALL
    SELECT * FROM staging
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM merged
GROUP BY o_orderstatus
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN MATCHED → staging's doubled price shows up; WHEN NOT MATCHED
    → untouched finals survive.  Uses operators.upsert.upsert — the
    engine's actual MERGE rewrite (anti-join + unionByName)."""
    final = t(spark, sf_dir, "orders")
    staging = final.where(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    merged = upsert(final, staging, keys=["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"), money(F.sum("o_totalprice")).alias("total_price")
    )


@query(
    "upsert_idempotency",
    ref="J3 + §5.4 property (upsert(upsert(T,B),B) == upsert(T,B))",
    doc="Applying the same staging batch twice must equal once — checked in-plan.",
    oracle="""
WITH staging AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 5 = 0
),
merged AS (
    SELECT * FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = o.o_orderkey)
    UNION ALL SELECT * FROM staging
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       round(sum(o_totalprice), 2) AS total_price
FROM merged
""",
)
def upsert_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1-hour overlap re-read (shopify_etl.py:191-198) is safe only
    because MERGE is idempotent; here the batch is applied TWICE and the
    oracle describes a single application."""
    final = t(spark, sf_dir, "orders")
    staging = final.where(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    once = upsert(final, staging, keys=["o_orderkey"])
    twice = upsert(once, staging, keys=["o_orderkey"])
    return twice.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        money(F.sum("o_totalprice")).alias("total_price"),
    )


@query(
    "verify_uniqueness",
    ref="A1-A3 (shopify_etl.py:592-618 verify_unique_records)",
    doc="The reference's per-table uniqueness verification as one report DF.",
    oracle="""
SELECT 'orders' AS table_name,
       CAST(count(*) AS BIGINT) AS total_records,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS unique_records,
       count(*) = count(DISTINCT o_orderkey) AS is_unique
FROM orders
UNION ALL
SELECT 'lineitem',
       CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
       count(*) = count(DISTINCT (l_orderkey, l_linenumber))
FROM lineitem
UNION ALL
SELECT 'customer',
       CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT c_custkey) AS BIGINT),
       count(*) = count(DISTINCT c_custkey)
FROM customer
""",
)
def verify_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return uniqueness_report(
        {
            "orders": (t(spark, sf_dir, "orders"), ["o_orderkey"]),
            "lineitem": (t(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"]),
            "customer": (t(spark, sf_dir, "customer"), ["c_custkey"]),
        }
    )


@query(
    "verify_fk_integrity",
    ref="J1 (shopify_etl.py:717-742 — FK anti-join checks)",
    doc="Orphan counts for each FK edge of the star schema.",
    oracle="""
SELECT 'lineitem->orders' AS check_name,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS orphan_count
UNION ALL
SELECT 'orders->customer',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
UNION ALL
SELECT 'customer->nation',
       CAST((SELECT count(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
""",
)
def verify_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fk_report(
        {
            "lineitem->orders": (
                t(spark, sf_dir, "lineitem"),
                t(spark, sf_dir, "orders"),
                "l_orderkey",
                "o_orderkey",
            ),
            "orders->customer": (
                t(spark, sf_dir, "orders"),
                t(spark, sf_dir, "customer"),
                "o_custkey",
                "c_custkey",
            ),
            "customer->nation": (
                t(spark, sf_dir, "customer"),
                t(spark, sf_dir, "nation"),
                "c_nationkey",
                "n_nationkey",
            ),
        }
    )


@query(
    "incremental_rollup_merge",
    ref="incremental materialized-view maintenance — recompute affected partitions, MERGE on grain key",
    doc="Day rollup maintained incrementally: base (pre-cutoff) + full recompute of delta-touched days, merged on day; oracle is the full rollup.",
    oracle="""
SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')  AS day,
       CAST(count(*) AS BIGINT)                     AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT)      AS n_users,
       round(sum(value), 2)                         AS total_value
FROM events
GROUP BY 1
""",
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production pattern for keeping a day-grain rollup fresh
    without full recompute: the materialized base covers everything
    before the incremental cutoff (so its boundary day is PARTIAL), the
    delta recomputes every day the new data touches IN FULL from raw
    events, and MERGE on the day key replaces the boundary day while
    leaving closed days untouched.  Recomputing whole affected
    partitions (not adding partial aggregates) is what keeps
    non-additive metrics like count(DISTINCT user_id) correct.  The
    oracle describes the full one-shot rollup — the driver hash check
    proves base+delta+MERGE converges to it exactly.  At 100 TB the
    delta scan prunes to the affected day partitions and the MERGE
    shuffles only day-grain rows (thousands, not billions)."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    e = t(spark, sf_dir, "events")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(day_str(F.col("ts")).alias("day")).agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            money(F.sum("value")).alias("total_value"),
        )

    cutoff = "2024-01-20 12:00:00"  # mid-day: the boundary day is split
    base_tbl = ParquetTable(spark, staging_dir("mv", sf_dir))
    base_tbl.overwrite(rollup(e.where(F.col("ts") < F.lit(cutoff))))

    delta_days_start = "2024-01-20"  # all days touched by post-cutoff data
    delta = rollup(e.where(day_str(F.col("ts")) >= F.lit(delta_days_start)))

    return upsert(base_tbl.read(), delta, keys=["day"])


@query(
    "run_ledger_daily_summary",
    ref="monitoring-guide.md:71-87 — daily run summary over sync_control (VERDICT r1 item #5)",
    doc="Per-day run/success/error counts + ingested records + last success watermark from a deterministic ledger.",
    oracle="""
WITH ledger AS (
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
           CASE WHEN o_orderpriority = '5-LOW' THEN 'error' ELSE 'success' END AS status,
           CAST(count(*) AS BIGINT) AS records
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1995-02-01 00:00:00'
    GROUP BY 1, o_orderpriority
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(sum(CASE WHEN status = 'success' THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
       CAST(sum(CASE WHEN status = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN status = 'success' THEN records ELSE 0 END) AS BIGINT) AS records_ingested,
       strftime(max(CASE WHEN status = 'success' THEN CAST(day AS TIMESTAMP) END),
                '%Y-%m-%d %H:%M:%S') AS last_success_wm
FROM ledger
GROUP BY day
""",
)
def run_ledger_daily_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monitoring runbook's daily-run summary (monitoring-guide.md
    :71-87): GROUP BY day over sync_control with per-status counts and
    the day's last successful watermark.  A deterministic ledger — one
    'run' per (order day, priority) in Jan 1995 (the testdata's first
    month, ~31 days × 5 priorities), errors for 5-LOW — is written
    through the REAL ``ParquetTable`` commit path and read back, so the
    query exercises ledger storage + the summary aggregation; the
    oracle recomputes both from ``orders`` directly."""
    import datetime as _dt

    from shopify_youtube_etl_spark.plans.common import staging_dir

    o = t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1995-02-01"))
    ledger = (
        o.groupBy("o_orderdate", "o_orderpriority")
        .agg(F.count("*").alias("records_processed"))
        .select(
            F.lit("orders").alias("table_name"),
            F.col("o_orderdate").cast("timestamp").alias("last_sync_timestamp"),
            F.col("records_processed"),
            F.when(F.col("o_orderpriority") == "5-LOW", F.lit("error"))
            .otherwise(F.lit("success"))
            .alias("status"),
            F.md5(F.concat_ws("|", "o_orderdate", "o_orderpriority")).alias("run_id"),
            F.lit("").alias("notes"),
            F.lit(_dt.datetime(2024, 1, 1)).cast("timestamp").alias("created_at"),
        )
    )
    tbl = ParquetTable(spark, staging_dir("ledger", sf_dir))
    tbl.overwrite(ledger)
    # day as yyyy-MM-dd string — repo convention for engine-portable hashing.
    led = tbl.read().withColumn("day", F.date_format("last_sync_timestamp", "yyyy-MM-dd"))
    return led.groupBy("day").agg(
        F.count("*").alias("n_runs"),
        F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).alias("n_success"),
        F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias("n_error"),
        F.sum(
            F.when(F.col("status") == "success", F.col("records_processed")).otherwise(0)
        ).alias("records_ingested"),
        F.date_format(
            F.max(F.when(F.col("status") == "success", F.col("last_sync_timestamp"))),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("last_success_wm"),
    )


@query(
    "reconcile_tables",
    ref="J3/D2 extension — the pre-apply audit a MERGE pipeline prints (monitoring-guide.md:73-95 spirit)",
    doc="Full-outer staging-vs-final comparison classified insert/update/unchanged/delete, with row counts and net value drift.",
    oracle="""
WITH staging AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 8 = 0 THEN o_totalprice + 10.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderstatus
    FROM orders WHERE o_orderkey % 4 = 0
    UNION ALL
    SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % 1000 = 1
),
f AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
j AS (
    SELECT f.o_orderkey AS fk, s.o_orderkey AS sk,
           f.o_totalprice AS fp, s.o_totalprice AS sp,
           f.o_orderstatus AS fs, s.o_orderstatus AS ss
    FROM f FULL OUTER JOIN staging s ON f.o_orderkey = s.o_orderkey
)
SELECT CASE WHEN fk IS NULL THEN 'insert'
            WHEN sk IS NULL THEN 'delete'
            WHEN fp <> sp OR fs <> ss THEN 'update'
            ELSE 'unchanged' END                             AS action,
       CAST(count(*) AS BIGINT)                              AS n_rows,
       round(sum(coalesce(sp, 0) - coalesce(fp, 0)), 2)      AS value_drift
FROM j GROUP BY 1
""",
)
def reconcile_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dry-run audit before a MERGE: classify every key as
    insert (staging only), delete (final only), update (both, any
    non-key column differs) or unchanged, with the net value drift the
    apply would cause.  The perturbation is +10.0 (exact double add,
    not a re-round) so the update classification is bit-identical on
    both engines.  Scale: ONE shuffle — the full-outer sort-merge join
    on the key — then a map-side classify + partial agg; neither side
    broadcasts (both are table-sized), which is exactly the plan a 100
    TB reconciliation wants."""
    final = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    key = F.col("o_orderkey")
    updates = final.where(key % 4 == 0).withColumn(
        "o_totalprice",
        F.when(key % 8 == 0, F.col("o_totalprice") + 10.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    inserts = final.where(key % 1000 == 1).withColumn(
        "o_orderkey", key + 100000000
    )
    staging = updates.unionByName(inserts)
    j = final.alias("f").join(
        staging.alias("s"),
        F.col("f.o_orderkey") == F.col("s.o_orderkey"),
        "full_outer",
    )
    action = (
        F.when(F.col("f.o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("s.o_orderkey").isNull(), F.lit("delete"))
        .when(
            (F.col("f.o_totalprice") != F.col("s.o_totalprice"))
            | (F.col("f.o_orderstatus") != F.col("s.o_orderstatus")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
    )
    drift = F.coalesce(F.col("s.o_totalprice"), F.lit(0.0)) - F.coalesce(
        F.col("f.o_totalprice"), F.lit(0.0)
    )
    return (
        j.select(action.alias("action"), drift.alias("d"))
        .groupBy("action")
        .agg(
            F.count("*").alias("n_rows"),
            money(F.sum("d")).alias("value_drift"),
        )
    )


@query(
    "deletion_propagation_report",
    ref="compliance extension of J1/J2's FK machinery — right-to-erasure cascade sizing (the DELETE the reference's relational model implies)",
    doc="For a planted erasure request set (c_custkey % 97 = 0): rows to delete per table across the customer→orders→lineitem cascade.",
    oracle="""
WITH del AS (
    SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
),
doomed_orders AS (
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM del)
)
SELECT 'customer' AS table_name,
       CAST((SELECT count(*) FROM del) AS BIGINT) AS n_rows_to_delete
UNION ALL
SELECT 'orders', CAST((SELECT count(*) FROM doomed_orders) AS BIGINT)
UNION ALL
SELECT 'lineitem',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)) AS BIGINT)
""",
)
def deletion_propagation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sizing a right-to-erasure batch BEFORE running it — the cascade
    the reference's FK layout (line_items→orders→customers,
    shopify_etl.py:718-733) implies for a customer-delete request.
    Scale shape: the request set and the doomed-order keyset stay
    small, so both hops are broadcast LEFT SEMI joins against the fact
    tables — lineitem is scanned once and never shuffled.  The same
    semi-join lineage, flipped to anti, IS the deletion; this report
    is its dry run."""
    del_set = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 97 == 0)
        .select("c_custkey")
    )
    doomed = (
        t(spark, sf_dir, "orders")
        .join(F.broadcast(del_set), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey")
    )
    li_n = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(doomed), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .agg(F.count("*").alias("n"))
    )
    rows = [
        del_set.agg(F.count("*").alias("n")).select(
            F.lit("customer").alias("table_name"), F.col("n").alias("n_rows_to_delete")
        ),
        doomed.agg(F.count("*").alias("n")).select(
            F.lit("orders").alias("table_name"), F.col("n").alias("n_rows_to_delete")
        ),
        li_n.select(
            F.lit("lineitem").alias("table_name"), F.col("n").alias("n_rows_to_delete")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "cdc_apply_changes",
    ref="D2/J3 completed — CDC change-feed apply with DELETE tombstones (the MERGE branch the reference's upsert lacks; operators/upsert.py::apply_changes)",
    doc="Synthetic change feed (deletes for key%7=0, doubled-price upserts for key%5=0) applied to orders; per-status profile of the result.",
    oracle="""
WITH applied AS (
    SELECT o_orderstatus,
           CASE WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
                THEN o_totalprice * 2 ELSE o_totalprice END AS price
    FROM orders
    WHERE o_orderkey % 7 <> 0
)
SELECT o_orderstatus                  AS status,
       CAST(count(*) AS BIGINT)       AS n_orders,
       round(sum(price), 2)           AS total_price
FROM applied
GROUP BY o_orderstatus
""",
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change-data-capture fold every warehouse sync needs: 'U'
    rows replace by key, 'D' tombstones remove, untouched keys pass
    through — built from one anti-join + union, so the big table is
    scanned once (same plan family as merge_upsert; the change feed
    is the small side).  The oracle expresses the IDENTICAL final
    state declaratively with CASE/WHERE, so the driver hash-verifies
    the operator path end-to-end."""
    from shopify_youtube_etl_spark.operators.upsert import apply_changes

    orders = t(spark, sf_dir, "orders")
    deletes = (
        orders.where(F.col("o_orderkey") % 7 == 0).withColumn("op", F.lit("D"))
    )
    upserts = (
        orders.where((F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("op", F.lit("U"))
    )
    changes = deletes.unionByName(upserts)
    applied = apply_changes(orders, changes, keys=["o_orderkey"], op_col="op")
    return applied.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("total_price"),
    )


@query(
    "expectations_report",
    ref="A1-A3/A8 generalized — declarative data-quality expectations evaluated in ONE pass (the reference's verify_table_data as a reusable report)",
    doc="Five expectations over orders (key uniqueness, positive amounts, date bounds, status domain, customer-key completeness) as pass/fail rows with measured violation counts.",
    oracle="""
WITH m AS (
    SELECT CAST(count(*) AS BIGINT)                                   AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)                 AS n_keys,
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)  AS bad_price,
           CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01'
                                    OR o_orderdate > TIMESTAMP '2005-01-01')
                AS BIGINT)                                            AS bad_date,
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
                AS BIGINT)                                            AS bad_status,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)  AS null_cust
    FROM orders
)
SELECT e.expectation, e.n_violations, e.passed
FROM m, LATERAL (VALUES
    ('order_key_unique',        n_rows - n_keys,  n_rows - n_keys = 0),
    ('total_price_positive',    bad_price,        bad_price = 0),
    ('order_date_in_range',     bad_date,         bad_date = 0),
    ('status_in_domain',        bad_status,       bad_status = 0),
    ('customer_key_present',    null_cust,        null_cust = 0)
) AS e(expectation, n_violations, passed)
""",
)
def expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's verification step (shopify_etl.py:592-618,
    uniqueness + conditional checks) generalized into the declarative
    expectations report every pipeline gate wants: each expectation is
    a conditional aggregate, ALL of them evaluated in a SINGLE scan +
    one-row aggregate (plus the exact distinct for uniqueness), then
    unpivoted into one row per expectation.  At 100 TB adding an
    expectation costs one more map-side counter, not another scan —
    the opposite of running N validation queries."""
    o = t(spark, sf_dir, "orders")
    m = o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("bad_price"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < "1990-01-01")
                | (F.col("o_orderdate") > "2005-01-01"),
                1,
            ).otherwise(0)
        ).alias("bad_date"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_cust"),
    )
    checks = [
        ("order_key_unique", F.col("n_rows") - F.col("n_keys")),
        ("total_price_positive", F.col("bad_price")),
        ("order_date_in_range", F.col("bad_date")),
        ("status_in_domain", F.col("bad_status")),
        ("customer_key_present", F.col("null_cust")),
    ]
    rows = None
    for name, viol in checks:
        row = m.select(
            F.lit(name).alias("expectation"),
            viol.cast("long").alias("n_violations"),
            (viol == 0).alias("passed"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


@query(
    "snapshot_time_travel",
    ref="lakehouse table format surface (S10/S12 generalized) — ParquetTable's retained manifests exposed as Delta/Iceberg-style VERSION AS OF reads",
    doc="Overwrite pre-1997 orders as generation 0, append 1997 orders as generation 1, then aggregate BOTH retained generations via time-travel reads.",
    oracle="""
SELECT CAST(0 AS BIGINT)           AS version,
       CAST(count(*) AS BIGINT)    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
UNION ALL
SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT), round(sum(o_totalprice), 2)
FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY version
""",
)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF on the engine's own table format: generation 0 is
    an overwrite commit, generation 1 an O(batch) append, and both are
    read back through ``ParquetTable.read_version`` — each generation scans
    ONLY the segment files its manifest references (no copy-on-write,
    no tombstone filtering at read time).  Retention is the manifest
    window (KEEP_GENERATIONS), so time travel is free until GC —
    exactly the Delta/Iceberg trade.  The oracle recomputes both
    snapshots from the raw table."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    orders = t(spark, sf_dir, "orders")
    tbl = ParquetTable(spark, staging_dir("timetravel", sf_dir))
    tbl.overwrite(orders.where(F.col("o_orderdate") < "1997-01-01"))
    tbl.append(
        orders.where(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
    )
    snaps = [
        tbl.read_version(seq)
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("total_price"),
        )
        .select(
            F.lit(seq).cast("long").alias("version"), "n_orders", "total_price"
        )
        for seq in tbl.history()
    ]
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out.select("version", "n_orders", "total_price").orderBy("version")


@query(
    "expectation_gated_ingest",
    ref="expectations_report made ENFORCING — the Delta Live Tables expect-or-quarantine write path (reference's verify step moved from report to gate)",
    doc="Orders with injected violations (negated prices on key%7, mangled status on key%11) gated on append: kept/quarantined totals plus per-expectation violation counts.",
    oracle="""
WITH staged AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN -o_totalprice ELSE o_totalprice END AS price,
           CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END         AS status
    FROM orders
),
m AS (
    SELECT CAST(count(*) AS BIGINT)                                         AS n_input,
           CAST(count(*) FILTER (WHERE price > 0 AND status IN ('F','O','P'))
                AS BIGINT)                                                  AS n_kept,
           CAST(count(*) FILTER (WHERE price <= 0) AS BIGINT)               AS viol_price,
           CAST(count(*) FILTER (WHERE status NOT IN ('F','O','P'))
                AS BIGINT)                                                  AS viol_status
    FROM staged
)
SELECT n_input, n_kept, n_input - n_kept AS n_quarantined, viol_price, viol_status
FROM m
""",
)
def expectation_gated_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the REAL gated write path: violations are injected into a
    copy of orders, ``append_with_expectations`` lands clean rows in the
    table and violating rows (tagged with every failed check) in the
    quarantine table, and the result re-reads BOTH committed tables —
    so the oracle equality verifies the physical split, not just the
    predicate arithmetic.  A row can violate two expectations at once
    (key divisible by 77), which is why n_quarantined ≤ viol_price +
    viol_status."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    staged = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
    )
    base = staging_dir("expgate", sf_dir)
    tbl = ParquetTable(spark, base + "/t")
    report = tbl.append_with_expectations(
        staged,
        {
            "price_positive": F.col("price") > 0,
            "status_in_domain": F.col("status").isin("F", "O", "P"),
        },
    )
    quarantined = ParquetTable(spark, base + "/t_quarantine").read()
    viol = {r["expectation"]: r["n_violations"] for r in report.collect()}
    return (
        tbl.read()
        .agg(F.count("*").alias("n_kept"))
        .crossJoin(quarantined.agg(F.count("*").alias("n_quarantined")))
        .select(
            (F.col("n_kept") + F.col("n_quarantined")).alias("n_input"),
            "n_kept",
            "n_quarantined",
            F.lit(viol.get("price_positive", 0)).cast("long").alias("viol_price"),
            F.lit(viol.get("status_in_domain", 0)).cast("long").alias("viol_status"),
        )
    )


@query(
    "targeted_reprocess",
    ref="targeted reload by explicit key list (monitoring-guide.md:89-101 recovery runbook; r4 verdict item #7) — IncrementalPipeline.reprocess is the pipeline-level twin",
    doc="Corrupted final table (negated price on key%97) healed by reloading ONLY the problem keys from the source via broadcast semi-join + upsert; summary proves exact restoration.",
    oracle="""
SELECT CAST(count(*) AS BIGINT)                                  AS n_rows,
       CAST(count(*) FILTER (WHERE o_orderkey % 97 = 0)
            AS BIGINT)                                           AS n_reprocessed,
       round(sum(o_totalprice), 2)                               AS total_revenue
FROM orders
""",
)
def targeted_reprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runbook's 'temp table with problematic IDs → targeted
    reload', run for real: a final table is committed with corrupted
    prices (negated on key%97 — the simulated incident), the problem
    keys are DISCOVERED by the quality probe (price ≤ 0), and only
    those keys are re-read from the source — the id list broadcasts
    into a left-semi join, so the source scan is pruned to the problem
    rows — then upserted back.  The returned summary re-reads the
    COMMITTED table: the oracle computes what a never-corrupted table
    would hold, so hash equality proves exact healing, not just row
    counts.

    Scale: the id list is incident-sized (broadcast); the heal costs
    one semi-joined source scan + one key-sized merge — never a
    force_full_load of the 100 TB table."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    corrupted = src.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, -F.col("o_totalprice")).otherwise(
            F.col("o_totalprice")
        ),
    )
    tbl = ParquetTable(spark, staging_dir("reproc", sf_dir) + "/orders")
    tbl.overwrite(corrupted)

    # Discovery probe → problem-id frame (the runbook's temp table).
    problem_ids = tbl.read().where(F.col("o_totalprice") <= 0).select("o_orderkey")
    n_reproc = problem_ids.count()
    reload = src.join(F.broadcast(problem_ids), "o_orderkey", "left_semi")
    tbl.upsert_matching(reload, ["o_orderkey"])

    return tbl.read().agg(
        F.count("*").alias("n_rows"),
        F.lit(n_reproc).cast("long").alias("n_reprocessed"),
        money(F.sum("o_totalprice")).alias("total_revenue"),
    )


@query(
    "incremental_rollup_maintenance",
    ref="incremental view maintenance — a pre-aggregated rollup updated from the table's change feed (Delta CDF update_preimage/postimage semantics), never recomputed from the fact table",
    doc="Daily (n_orders, revenue) rollup maintained through a delete/update/insert wave by applying change-feed deltas; oracle recomputes the rollup from scratch on the post-change state.",
    oracle="""
WITH v1 AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
                ELSE o_totalprice END AS price,
           CASE WHEN o_orderkey % 7 = 0 THEN o_orderdate + INTERVAL 1 DAY
                ELSE o_orderdate END  AS d
    FROM orders WHERE o_orderkey % 13 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_totalprice + 5.0,
           o_orderdate + INTERVAL 2 DAY
    FROM orders WHERE o_orderkey % 11 = 0
)
SELECT strftime(CAST(d AS TIMESTAMP), '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT)                   AS n_orders,
       round(sum(price), 2)                       AS revenue
FROM v1
GROUP BY 1
""",
)
def incremental_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, the 100 TB answer to 'keep the
    dashboard rollup fresh': the daily rollup is built ONCE, a
    delete/update/insert wave lands on the base table, and the rollup
    is repaired by applying the CHANGE FEED between the two table
    generations — −pre-image at its old day, +post-image at its new
    day (updates contribute both, so a row moving across days is
    handled) — never by rescanning the fact table.  Maintenance cost
    is O(|changes|) plus a rollup-sized merge; a nightly full
    recompute at 100 TB costs the whole table.  The oracle IS the full
    recompute on the post-change state, so hash equality proves the
    delta algebra exact (count and sum are self-maintainable
    aggregates; min/max would need the base row census — the textbook
    IVM caveat).  Uses change_feed(pre_images=True), the engine's
    Delta-CDF-update_preimage equivalent."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    base = staging_dir("ivm", sf_dir)
    orders_tbl = ParquetTable(spark, base + "/orders")
    rollup_tbl = ParquetTable(spark, base + "/rollup")
    v0 = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    orders_tbl.overwrite(v0)
    day = lambda c: F.date_format(c, "yyyy-MM-dd")
    rollup_tbl.overwrite(
        v0.groupBy(day("o_orderdate").alias("day")).agg(
            F.count("*").alias("n_orders"), F.sum("o_totalprice").alias("revenue")
        ),
        stats_cols=["day"],  # lets the delta-day repair verbs prune
    )

    upd = F.col("o_orderkey") % 7 == 0
    kept = v0.where(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(upd, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(upd, F.col("o_orderdate") + F.expr("INTERVAL 1 DAYS"))
        .otherwise(F.col("o_orderdate"))
        .alias("o_orderdate"),
    )
    ins = v0.where(F.col("o_orderkey") % 11 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        (F.col("o_totalprice") + 5.0).alias("o_totalprice"),
        (F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS")).alias("o_orderdate"),
    )
    orders_tbl.overwrite(kept.unionByName(ins))

    seqs = orders_tbl.history()
    feed = orders_tbl.change_feed(
        seqs[-2], seqs[-1], keys=["o_orderkey"], pre_images=True
    )
    minus = feed.where(F.col("op").isin("D", "U")).select(
        day("pre_o_orderdate").alias("day"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col("pre_o_totalprice")).alias("dr"),
    )
    plus = feed.where(F.col("op").isin("I", "U")).select(
        day("o_orderdate").alias("day"),
        F.lit(1).cast("long").alias("dn"),
        F.col("o_totalprice").alias("dr"),
    )
    deltas = (
        minus.unionByName(plus)
        .groupBy("day")
        .agg(F.sum("dn").alias("dn"), F.sum("dr").alias("dr"))
        .localCheckpoint()  # change-feed diff feeds probe AND repair
    )
    # Repair ONLY the delta days (r7 verdict #1 applied to the rollup):
    # days untouched by the wave never rewrite.  A day whose order
    # count reaches zero is a rollup DELETE (upsert can't express it);
    # both verbs are day-pruned against the rollup's segment sidecars.
    # Pull the touched rollup rows with a broadcast SEMI join (the
    # rollup scans once, map-side pruned), then join the two
    # batch-sized frames; broadcasting the preserved side of a
    # left_outer directly is not plannable.
    touched = rollup_tbl.read().join(
        F.broadcast(deltas.select("day")), "day", "left_semi"
    )
    updates = (
        deltas.join(touched, "day", "left_outer")
        .select(
            "day",
            (F.coalesce("n_orders", F.lit(0)) + F.col("dn")).alias("n_orders"),
            (F.coalesce("revenue", F.lit(0.0)) + F.col("dr")).alias("revenue"),
        )
        .localCheckpoint()  # two consumers: dead-day split + live upsert
    )
    dead = updates.where(F.col("n_orders") <= 0).select("day")
    if not dead.isEmpty():
        rollup_tbl.delete_matching(dead, on="day")
    rollup_tbl.upsert_matching(
        updates.where(F.col("n_orders") > 0), ["day"], auto_compact_at=64
    )
    return rollup_tbl.read().select(
        "day",
        F.col("n_orders").cast("long").alias("n_orders"),
        money(F.col("revenue")).alias("revenue"),
    )


@query(
    "table_change_feed",
    ref="CDC read side (inverse of cdc_apply_changes) — change data feed reconstructed between two retained table generations",
    doc="I/U/D feed between generation 0 (base customers) and generation 1 (deletes on key%10, +100 balance on key%7, 100 inserts), replayable by apply_changes.",
    oracle="""
WITH v0 AS (
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
    FROM customer WHERE c_custkey <= 1200
),
v1 AS (
    SELECT c_custkey, c_name,
           round(CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                      ELSE c_acctbal END, 2)      AS c_acctbal
    FROM customer
    WHERE c_custkey <= 1300 AND c_custkey % 10 <> 0
)
SELECT CASE WHEN v0.c_custkey IS NULL THEN 'I'
            WHEN v1.c_custkey IS NULL THEN 'D'
            ELSE 'U' END                          AS op,
       coalesce(v1.c_custkey, v0.c_custkey)       AS c_custkey,
       coalesce(v1.c_name, v0.c_name)             AS c_name,
       CASE WHEN v1.c_custkey IS NULL THEN v0.c_acctbal
            ELSE v1.c_acctbal END                 AS c_acctbal
FROM v0 FULL JOIN v1 USING (c_custkey)
WHERE v0.c_custkey IS NULL OR v1.c_custkey IS NULL
   OR v0.c_acctbal <> v1.c_acctbal OR v0.c_name <> v1.c_name
""",
)
def table_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds two real generations of a ParquetTable (overwrite v0,
    overwrite v1 with deletes/updates/inserts applied) and
    reconstructs the I/U/D feed between them with
    ``ParquetTable.change_feed`` — the subscription surface a
    downstream consumer uses to stay incremental against this
    engine's tables without the table storing a change log.  Only
    changed keys survive (unchanged rows never leave the join); the
    oracle recomputes both snapshots from raw and diffs them in SQL."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", money(F.col("c_acctbal")).alias("c_acctbal")
    )
    tbl = ParquetTable(spark, staging_dir("changefeed", sf_dir))
    v0 = cust.where(F.col("c_custkey") <= 1200)
    v1 = (
        t(spark, sf_dir, "customer")
        .where((F.col("c_custkey") <= 1300) & (F.col("c_custkey") % 10 != 0))
        .select(
            "c_custkey",
            "c_name",
            money(
                F.when(
                    F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0
                ).otherwise(F.col("c_acctbal"))
            ).alias("c_acctbal"),
        )
    )
    tbl.overwrite(v0)
    tbl.overwrite(v1)
    v_from, v_to = tbl.history()[-2], tbl.history()[-1]
    return tbl.change_feed(v_from, v_to, keys=["c_custkey"])


@query(
    "segment_skipping_scan",
    ref="lakehouse data skipping — per-segment min/max stats (Iceberg manifest-entry equivalent) prune files before the scan",
    doc="Orders appended in four year-partitioned batches with o_orderdate stats; a 1997 range read must scan only the overlapping segment (pruning proven in pytest) and aggregate correctly.",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT)    AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate <= TIMESTAMP '1997-12-31'
GROUP BY o_orderpriority
""",
)
def segment_skipping_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File skipping on the engine's own table format: each append
    records min/max stats for the clustering column (one O(batch)
    scan, stored in an underscore sidecar the parquet reader ignores),
    and ``read_range`` consults them to open ONLY segments whose
    range overlaps the query — the same mechanism as Iceberg
    manifest-entry pruning or Delta file stats, without the format
    dependency.  Pruning is safe-by-default (statless segments are
    always kept) and exactness comes from the residual filter, so
    stats can only remove provably-irrelevant FILES, never rows.  At
    100 TB with date-ordered ingest this turns a year-range query
    over a decade table into a ~10% file scan before the parquet
    row-group stats even engage.  tests/test_operators.py asserts the
    1997 read opens exactly one of the four segments."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    orders = t(spark, sf_dir, "orders")
    tbl = ParquetTable(spark, staging_dir("segskip", sf_dir))
    bounds = [("1900", "1997"), ("1997", "1998"), ("1998", "1999"), ("1999", "2100")]
    first = True
    for lo, hi in bounds:
        batch = orders.where(
            (F.col("o_orderdate") >= f"{lo}-01-01") & (F.col("o_orderdate") < f"{hi}-01-01")
        )
        if first:
            tbl.overwrite(batch, stats_cols=["o_orderdate"])
            first = False
        else:
            tbl.append(batch, stats_cols=["o_orderdate"])
    return (
        tbl.read_range("o_orderdate", "1997-01-01", "1997-12-31")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("total_price"),
        )
    )


@query(
    "observed_pipeline_metrics",
    ref="stage-timing/record-count instrumentation (shopify_etl.py:648-649, 662-670) made native — df.observe() accumulator metrics collected DURING the run, no second scan",
    doc="Flagship revenue pipeline instrumented with observe(): row counts and revenue totals at two pipeline stages, harvested from the SAME pass that produced the result.",
    oracle="""
SELECT CAST((SELECT count(*) FROM lineitem) AS BIGINT)               AS scanned_items,
       CAST(count(*) AS BIGINT)                                      AS joined_rows,
       round(sum(l_extendedprice * (1 - l_discount)), 2)             AS joined_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
""",
)
def observed_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference logs per-stage record counts by re-counting;
    ``observe()`` attaches named aggregates to plan NODES, so the
    metrics are computed by the same tasks that execute the query —
    zero extra scans, exact, and available on the driver the moment
    the action finishes.  Two observation points here: the raw scan
    (before the join) and the joined/filtered stream.  At 100 TB
    re-counting for monitoring doubles the bill; observation makes
    instrumentation free.  The observed values are returned AS the
    result frame so the oracle can verify them value-for-value."""
    from pyspark.sql import Observation

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "1997-01-01")
    scan_obs = Observation("scan")
    join_obs = Observation("joined")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pipeline = (
        li.observe(scan_obs, F.count(F.lit(1)).alias("scanned_items"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .observe(
            join_obs,
            F.count(F.lit(1)).alias("joined_rows"),
            F.round(F.sum(rev), 2).alias("joined_revenue"),
        )
    )
    pipeline.write.format("noop").mode("overwrite").save()  # one real pass

    def harvest(obs, name, default):
        # AQE empty-relation propagation can replace an all-empty
        # subtree with a LocalRelation, eliding the observe node —
        # then no metric row ever lands and Observation.get asserts.
        # An elided node means zero rows flowed: report the identity.
        try:
            v = obs.get[name]
        except Exception:  # noqa: BLE001 — JVM assertion, not a py error
            return default
        return default if v is None else v

    return spark.createDataFrame(
        [
            (
                harvest(scan_obs, "scanned_items", 0),
                harvest(join_obs, "joined_rows", 0),
                float(harvest(join_obs, "joined_revenue", 0.0)),
            )
        ],
        "scanned_items long, joined_rows long, joined_revenue double",
    )


@query(
    "bloom_indexed_point_lookup",
    ref="lakehouse point-lookup index — per-segment Bloom sidecars (Delta bloom-filter-index equivalent) prune files for key = value probes",
    doc="Orders appended in three key-ranged batches with a Bloom index on o_orderkey; a point lookup opens only admitting segments (pruning pinned in pytest) and returns the exact row.",
    oracle="""
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderstatus,
       round(o_totalprice, 2)     AS o_totalprice
FROM orders WHERE o_orderkey = 4711
""",
)
def bloom_indexed_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max stats answer RANGE queries; point lookups on a key with
    no write-order correlation need a membership structure — each
    append records a segment Bloom (bit positions computed
    DISTRIBUTED via seeded xxhash64, collect_set-reduced to a ≤1 KB
    sidecar), and ``read_point`` opens only segments whose bloom
    admits the probe.  False positives cost a file open (residual
    filter keeps results exact); false negatives are impossible.  At
    100 TB this is the difference between a needle-in-haystack scan
    and opening one file — the same contract as Delta's bloom filter
    index, on the engine's own table format."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", money(F.col("o_totalprice")).alias("o_totalprice")
    )
    tbl = ParquetTable(spark, staging_dir("bloomidx", sf_dir))
    tbl.overwrite(orders.where(F.col("o_orderkey") % 3 == 0), bloom_cols=["o_orderkey"])
    tbl.append(orders.where(F.col("o_orderkey") % 3 == 1), bloom_cols=["o_orderkey"])
    tbl.append(orders.where(F.col("o_orderkey") % 3 == 2), bloom_cols=["o_orderkey"])
    return tbl.read_point("o_orderkey", 4711)


@query(
    "erasure_cascade_apply",
    ref="right-to-erasure EXECUTED — deletion_propagation_report's diagnostic made a transform: cascade DELETE across customer→orders via ParquetTable.delete_where, committed and re-read",
    doc="Customer erasure requests (key % 97 = 0) applied as a cascading copy-on-write DELETE; the committed survivors' per-status profile must equal the oracle's recomputation.",
    oracle="""
WITH survivors AS (
    SELECT o_orderstatus, o_totalprice
    FROM orders
    WHERE o_custkey IS NULL OR o_custkey % 97 <> 0
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM survivors
GROUP BY o_orderstatus
""",
)
def erasure_cascade_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE half of the compliance story
    (``deletion_propagation_report`` sizes it; this executes it): the
    erasure request frame feeds ``delete_matching`` — a broadcast
    LEFT ANTI join that rewrites the committed table copy-on-write,
    and the result re-reads the COMMITTED survivors — so oracle
    equality proves the physical delete removed exactly the cascade,
    nothing more.  The pre-delete generation stays time-travelable
    until retention trims it, which is the audit trail an erasure
    workflow legally needs (prove what was deleted, then purge with
    retain+vacuum)."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    tbl = ParquetTable(spark, staging_dir("erasure", sf_dir) + "/orders")
    tbl.overwrite(src)
    doomed = (
        t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    # Join-shaped DELETE: the request frame ships executor-to-executor
    # as a broadcast anti-join inside delete_matching's rewrite — the
    # erasure key set never passes through the driver, so an
    # incident of any size (a regulator dump of millions of subjects)
    # runs in one scan of the table with zero collect().
    tbl.delete_matching(doomed, on="o_custkey")
    return (
        tbl.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            money(F.sum("o_totalprice")).alias("revenue"),
        )
    )


@query(
    "clustered_range_scan",
    ref="layout maintenance verified end-to-end — cluster_by rewrite + read_range stats pruning on the engine's table format",
    doc="Orders re-clustered on o_orderdate, then a one-year read_range over the committed layout; per-status profile must equal the oracle's plain date-slice aggregate.",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)     AS n_orders,
       round(sum(o_totalprice), 2)  AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <= TIMESTAMP '1997-12-31'
GROUP BY o_orderstatus
""",
)
def clustered_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cluster_by`` through the driver contract: orders commit into a
    ParquetTable, the clustering rewrite lays them out
    range-partitioned + sorted on o_orderdate with min/max sidecars,
    and ``read_range`` serves a one-year slice off the committed
    layout — sidecar pruning plus the exact residual filter.  Oracle
    equality proves the rewrite is row-preserving AND the pruned read
    returns exactly the plain date-slice answer (a skipping bug that
    dropped a boundary file would hash-mismatch).  At 100 TB this is
    the nightly OPTIMIZE + time-sliced consumer pattern; clustering
    cost is one range shuffle, reads after it skip all but the
    overlapping files."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
    )
    tbl = ParquetTable(spark, staging_dir("clurange", sf_dir) + "/orders")
    tbl.overwrite(src)
    tbl.cluster_by(["d"], num_files=8)
    sliced = tbl.read_range("d", "1997-01-01", "1997-12-31")
    return sliced.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("revenue"),
    )


@query(
    "incremental_cluster_maintenance",
    ref="layout maintenance made INCREMENTAL (the size-tiered-compact discipline applied to OPTIMIZE, r7) — cluster_by_incremental folds only the appends that landed since the last clustering; already-clustered segments survive by name",
    doc="Orders base-clustered on the date string, a 20%-of-id-range batch appended unsorted, then cluster_by_incremental folds ONLY the append into a second sorted run; a one-year read_range over the two-run layout must equal the oracle's plain date-slice aggregate.",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)     AS n_orders,
       round(sum(o_totalprice), 2)  AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <= TIMESTAMP '1997-12-31'
GROUP BY o_orderstatus
""",
)
def incremental_cluster_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly-OPTIMIZE shape a 100 TB append stream actually
    needs: ``cluster_by`` re-sorts the WHOLE table, so running it per
    batch is O(table) forever; ``cluster_by_incremental`` reads the
    layout sidecars and folds only segments not already sorted on the
    key — O(new data) per call, already-clustered runs surviving in
    the manifest by name (pinned in tests/test_operators.py).  The
    result is a small set of sorted runs; ``read_range`` prunes across
    runs by min/max sidecar and inside runs by parquet footer stats,
    so global ordering is never required.  Oracle equality proves the
    two-run layout is row-preserving and the pruned read returns
    exactly the plain date-slice answer."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
    )
    # src only projects orders (o_orderkey untouched), so the table's
    # footer max IS src's max.
    from shopify_youtube_etl_spark.plans.common import table_col_max

    mx = table_col_max(spark, sf_dir, "orders", "o_orderkey")
    split = int((mx + 1) * 4 // 5) if mx is not None else 0
    tbl = ParquetTable(spark, staging_dir("cluincr", sf_dir) + "/orders")
    tbl.overwrite(src.where(F.col("o_orderkey") < split))
    tbl.cluster_by(["d"], num_files=4)
    # Null order keys ride the batch (a split predicate must not lose
    # the rows NEITHER side of it matches).
    tbl.append(
        src.where(
            (F.col("o_orderkey") >= split) | F.col("o_orderkey").isNull()
        ),
        stats_cols=["d"],
    )
    tbl.cluster_by_incremental(["d"], num_files=4)
    sliced = tbl.read_range("d", "1997-01-01", "1997-12-31")
    return sliced.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("revenue"),
    )


@query(
    "zorder_multidim_scan",
    ref="N-D Z-order layout maintenance verified end-to-end (r5 verdict #8) — cluster_by_zorder over (string, int, int) dims + read_range pruning on the engine's table format",
    doc="Orders re-clustered by a 3-D Morton layout over (order date string, customer bucket, price band), then a one-year read_range + customer-band slice off the committed layout; per-status profile must equal the oracle's plain filtered aggregate.",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)     AS n_orders,
       round(sum(o_totalprice), 2)  AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <= TIMESTAMP '1997-12-31'
  AND o_custkey % 256 < 128
GROUP BY o_orderstatus
""",
)
def zorder_multidim_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cluster_by_zorder`` (N-D, string-keyed) through the driver
    contract: orders commit into a ParquetTable, the rewrite lays them
    out on the Morton interleave of THREE dimensions — the order-date
    STRING (rank-encoded against sampled lexicographic boundaries),
    a customer bucket, and a price band — and the read slices one year
    via ``read_range`` on the string dimension plus a residual
    customer-band filter.  Oracle equality proves the N-D rewrite is
    row-preserving and the string-dimension sidecar pruning returns
    exactly the plain filtered answer.  At 100 TB this is OPTIMIZE
    ZORDER BY (event_date, tenant, size_band): any one predicate
    skips most files because every file's envelope is narrow in every
    dimension — the property the 1-D ``clustered_range_scan`` twin
    can only give its leading column."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.pmod(F.col("o_custkey"), F.lit(256)).cast("long").alias("ck"),
        F.least(F.floor(F.col("o_totalprice") / 1000), F.lit(255))
        .cast("long")
        .alias("pb"),
    )
    tbl = ParquetTable(spark, staging_dir("zmulti", sf_dir) + "/orders")
    tbl.overwrite(src)
    tbl.cluster_by_zorder("d", "ck", "pb", bits=8, num_files=8)
    sliced = tbl.read_range("d", "1997-01-01", "1997-12-31").where(
        F.col("ck") < 128
    )
    return sliced.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("revenue"),
    )


@query(
    "table_file_audit",
    ref="physical-layout observability — the DESCRIBE DETAIL report OPTIMIZE reads before deciding what to bin-pack; the decision face of ParquetTable.compact",
    doc="Orders committed as one large (62.5%) overwrite plus three 12.5% appends, audited per segment (rows from parquet footers, bytes, compaction candidacy); the audit picks the tiering threshold, a size-tiered compact folds the small tail, and footer counts must reproduce the oracle's plain per-slice GROUP BY.",
    oracle="""
SELECT CAST(CASE WHEN o_custkey % 8 < 5 THEN 0 ELSE o_custkey % 8 END AS BIGINT) AS slice,
       CAST(count(*) AS BIGINT) AS n_rows
FROM orders
GROUP BY CASE WHEN o_custkey % 8 < 5 THEN 0 ELSE o_custkey % 8 END
""",
)
def table_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance must be decidable without scanning the table: this
    commits orders as one large segment plus three small appends (the
    hourly micro-batch pattern), runs ``file_audit`` — parquet-footer
    row counts, O(files) driver work, zero Spark jobs — and uses its
    ``compact_candidate`` verdict to drive a size-tiered ``compact``,
    then audits again.  The returned frame maps each ORIGINAL slice's
    row count to the audit's footer-derived counts: slice 0 stays its
    own (large, untouched) segment, slices 1–3 fold into one compacted
    segment, and footer sums must equal the oracle's plain GROUP BY —
    proving the audit counts rows without reading them and the tiered
    rewrite preserved them.  At 100 TB this is the nightly OPTIMIZE
    planner: audit every table, compact only where the small-file
    verdict fires, O(small bytes) rewritten."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    src = t(spark, sf_dir, "orders")
    tbl = ParquetTable(spark, staging_dir("audit", sf_dir) + "/orders")
    tbl.overwrite(src.where(F.col("o_custkey") % 8 < 5))      # the 62.5% base
    for slice_id in (5, 6, 7):                                 # 12.5% micro-batches
        tbl.append(src.where(F.col("o_custkey") % 8 == slice_id))
    audit_before = tbl.file_audit()
    # The audit DECIDES the tiering: fold everything smaller than the
    # largest live segment (bytes come from the audit, so the policy is
    # size-relative and works at every SF — a fixed threshold would
    # misclassify at small test scales).
    thr = max(r["total_bytes"] for r in audit_before.collect())
    tbl.compact(max_segment_bytes=thr)
    audit_after = tbl.file_audit()
    # Map footer counts back to the deterministic slices: the large
    # segment is slice 0; the compacted remainder carries slices 5-7.
    big = audit_after.orderBy(F.col("total_bytes").desc()).limit(1)
    rest = audit_after.join(big.select("segment"), "segment", "left_anti")
    slice0 = big.select(
        F.lit(0).cast("long").alias("slice"), F.col("n_rows").alias("n_rows")
    )
    # Slices 5-7 from the ORIGINAL frame, gated on the footer total:
    # the compacted segment's footer sum must equal the source slices'
    # sum or every row reports -1 (the audit lied / the rewrite lost
    # rows) and the oracle fails loudly.
    per_slice = (
        src.where(F.col("o_custkey") % 8 >= 5)
        .groupBy((F.col("o_custkey") % 8).cast("long").alias("slice"))
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    total_rest = rest.agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("t"))
    total_src = per_slice.agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("s"))
    checked = (
        per_slice.join(F.broadcast(total_rest))
        .join(F.broadcast(total_src))
        .select(
            "slice",
            F.when(F.col("t") == F.col("s"), F.col("n_rows"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("n_rows"),
        )
    )
    return slice0.unionByName(checked)


@query(
    "pseudonymize_join_integrity",
    ref="governance family (deletion_propagation_report / pii_redaction siblings) — keyed pseudonymization that PRESERVES JOINS: the analytics-on-tokenized-data contract",
    doc="Customers and orders re-keyed to salted SHA-256 tokens; the per-segment rollup is computed entirely in token space, with the min token emitted so the oracle proves byte-identical tokenization.",
    oracle="""
WITH pc AS (
    SELECT sha256('cust:' || CAST(c_custkey AS VARCHAR) || ':k1') AS tok,
           c_mktsegment
    FROM customer
),
po AS (
    SELECT sha256('cust:' || CAST(o_custkey AS VARCHAR) || ':k1') AS tok,
           o_totalprice
    FROM orders
)
SELECT c_mktsegment                       AS segment,
       CAST(count(DISTINCT pc.tok) AS BIGINT) AS n_customers,
       CAST(count(po.o_totalprice) AS BIGINT) AS n_orders,
       round(sum(coalesce(po.o_totalprice, 0)), 2) AS revenue,
       min(pc.tok)                        AS sample_token
FROM pc LEFT JOIN po ON pc.tok = po.tok
GROUP BY c_mktsegment
""",
)
def pseudonymize_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization for analytics hand-off: natural keys are
    replaced by a keyed hash (salted SHA-256 — deterministic within a
    key version, so referential integrity survives; rotate the salt
    and every token changes, the kill switch GDPR guidance expects).
    The proof obligation is twofold and both halves are in the oracle
    check: (1) the per-segment rollup computed ONLY from tokenized
    frames equals the clear-key rollup's numbers — no fan-out, no
    dropped matches, i.e. tokenization is injective on this key space;
    (2) ``sample_token`` hash-matches DuckDB's independent SHA-256 —
    the token bytes themselves are portable, not an engine-private
    encoding, so downstream systems can re-derive joins.

    Scale shape: sha2 is a JVM codegen expression — tokenization is
    map-side, free of shuffles; the join then shuffles on the TOKEN
    (uniform by construction — a salted hash is the perfect hash-
    partitioning key, no skew), and the rollup is an ordinary partial
    agg.  The salt would be a secret from config at 100 TB; a literal
    here so the oracle can recompute it."""
    tok = lambda c: F.sha2(  # noqa: E731
        F.concat(F.lit("cust:"), F.col(c).cast("string"), F.lit(":k1")), 256
    )
    pc = t(spark, sf_dir, "customer").select(
        tok("c_custkey").alias("tok"), "c_mktsegment"
    )
    po = t(spark, sf_dir, "orders").select(
        tok("o_custkey").alias("tok"), "o_totalprice"
    )
    return (
        pc.join(po, "tok", "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("tok").alias("n_customers"),
            F.count("o_totalprice").alias("n_orders"),
            money(F.sum(F.coalesce("o_totalprice", F.lit(0.0)))).alias("revenue"),
            F.min("tok").alias("sample_token"),
        )
    )


@query(
    "subject_access_report",
    ref="governance family — the GDPR Article-15 READ verb next to erasure_cascade_apply's DELETE: everything the engine holds about one data subject, enumerated per table",
    doc="For customer 7: per-table record counts and value totals across customer/orders/lineitem (lineitem reached through the subject's orders), plus the subject's segment — the access-request manifest.",
    oracle="""
SELECT 'customer' AS source_table,
       CAST(count(*) AS BIGINT) AS n_records,
       round(sum(c_acctbal), 2) AS value_total
FROM customer WHERE c_custkey = 7
UNION ALL
SELECT 'orders',
       CAST(count(*) AS BIGINT),
       round(sum(o_totalprice), 2)
FROM orders WHERE o_custkey = 7
UNION ALL
SELECT 'lineitem',
       CAST(count(*) AS BIGINT),
       round(sum(l_extendedprice), 2)
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey = 7)
""",
)
def subject_access_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read half of data-subject rights: an access request must
    enumerate every record held about the subject, including rows that
    reference them only TRANSITIVELY (lineitems through their orders —
    the same FK walk the erasure cascade deletes along, run in report
    mode).  Each branch is a key-pruned scan: the customer and orders
    predicates push to the parquet scan, and the lineitem branch is a
    LEFT SEMI join against the subject's order keys (broadcast — an
    individual's key set is human-sized by definition).  At 100 TB
    with Bloom sidecars this is ``read_point`` territory; here the
    point is the shape: no full-table pass anywhere."""
    cust = t(spark, sf_dir, "customer").where(F.col("c_custkey") == 7)
    orders = t(spark, sf_dir, "orders").where(F.col("o_custkey") == 7)
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(orders.select(F.col("o_orderkey").alias("l_orderkey"))),
        "l_orderkey",
        "left_semi",
    )

    def branch(name: str, df: DataFrame, val) -> DataFrame:
        return df.agg(
            F.lit(name).alias("source_table"),
            F.count("*").alias("n_records"),
            money(F.sum(val)).alias("value_total"),
        )

    return (
        branch("customer", cust, F.col("c_acctbal"))
        .unionByName(branch("orders", orders, F.col("o_totalprice")))
        .unionByName(branch("lineitem", li, F.col("l_extendedprice")))
    )


@query(
    "survivorship_golden_record",
    ref="MDM survivorship (master-data governance next to pseudonymize_join_integrity) — merge duplicate entity records field-by-field: per field the most recent non-null value wins, one golden record per entity",
    doc="Customers folded to entities (custkey mod 500) with deterministic per-field gaps; per entity the record count plus the most-recent-non-null acctbal / segment / nation — the golden record.",
    oracle="""
WITH recs AS (
    SELECT c_custkey % 500 AS entity,
           c_custkey       AS version,
           CASE WHEN c_custkey % 7  = 0 THEN NULL ELSE c_acctbal    END AS acctbal,
           CASE WHEN c_custkey % 5  = 0 THEN NULL ELSE c_mktsegment END AS segment,
           CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_nationkey  END AS nation
    FROM customer
),
filled AS (
    SELECT entity, version,
           count(*)    OVER w                     AS n_records,
           last_value(acctbal IGNORE NULLS) OVER w AS g_acctbal,
           last_value(segment IGNORE NULLS) OVER w AS g_segment,
           last_value(nation  IGNORE NULLS) OVER w AS g_nation,
           row_number() OVER (PARTITION BY entity ORDER BY version DESC) AS rn
    FROM recs
    WINDOW w AS (PARTITION BY entity ORDER BY version
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT entity,
       CAST(n_records AS BIGINT)   AS n_records,
       round(g_acctbal, 2)         AS golden_acctbal,
       g_segment                   AS golden_segment,
       CAST(g_nation AS BIGINT)    AS golden_nation
FROM filled WHERE rn = 1
""",
)
def survivorship_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution's second half: once duplicates are LINKED,
    which field values survive into the golden record?  The standard
    policy is recency-with-fallback — per FIELD, the newest non-null
    value, so a stale record can still donate the one field the newer
    record is missing (a whole-row "latest wins" loses exactly those
    donations; that's the classic MDM survivorship bug).  The engine
    shape: ``last_value(... IGNORE NULLS)`` over a full-frame window
    per field — every field filled in ONE pass over ONE entity-key
    exchange, which the row_number that picks the representative row
    shares (same-window discipline).  Deterministic gap simulation
    (mod-7/5/11 nulls) gives every entity a mixed donor pattern.  At
    100 TB this is the post-linkage consolidation step: one shuffle on
    the entity key, no self-joins, no per-field passes."""
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    gap = lambda m, col: F.when(F.col("c_custkey") % m == 0, F.lit(None)).otherwise(col)  # noqa: E731
    recs = c.select(
        (F.col("c_custkey") % 500).alias("entity"),
        F.col("c_custkey").alias("version"),
        gap(7, F.col("c_acctbal")).alias("acctbal"),
        gap(5, F.col("c_mktsegment")).alias("segment"),
        gap(11, F.col("c_nationkey")).alias("nation"),
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("version")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    filled = recs.select(
        "entity",
        "version",
        F.count("*").over(w).alias("n_records"),
        F.last("acctbal", ignorenulls=True).over(w).alias("g_acctbal"),
        F.last("segment", ignorenulls=True).over(w).alias("g_segment"),
        F.last("nation", ignorenulls=True).over(w).alias("g_nation"),
        F.row_number()
        .over(Window.partitionBy("entity").orderBy(F.col("version").desc()))
        .alias("rn"),
    )
    return filled.where(F.col("rn") == 1).select(
        "entity",
        F.col("n_records").cast("long").alias("n_records"),
        F.round("g_acctbal", 2).alias("golden_acctbal"),
        F.col("g_segment").alias("golden_segment"),
        F.col("g_nation").cast("long").alias("golden_nation"),
    )


@query(
    "tpch_refresh_q1",
    ref="TPC-H refresh streams (RF1/RF2) run through the engine's own DML verbs — the benchmark's insert/delete waves applied via delete_matching + upsert_matching (both segment-pruned), then Q1 over the REFRESHED table; the oracle reconstructs the refreshed relation in SQL, so a green row proves the full DML round-trip, not just the read path",
    doc="TPC-H Q1 pricing summary AFTER a refresh: RF2 deletes every order with l_orderkey % 37 = 0 (join-shaped pruned DELETE), RF1 updates surviving % 41 = 0 orders (returnflag 'R', quantity + 5) and inserts % 43 = 0 orders shifted +1e8 with linestatus 'I' (one keyed pruned MERGE); byte-identical to the SQL reconstruction.",
    oracle="""
WITH survived AS (
    SELECT * FROM lineitem WHERE l_orderkey % 37 <> 0
),
refreshed AS (
    SELECT * FROM survived WHERE l_orderkey % 41 <> 0
    UNION ALL
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
           l_quantity + 5 AS l_quantity, l_extendedprice, l_discount,
           l_tax, 'R' AS l_returnflag, l_linestatus, l_shipdate
    FROM survived WHERE l_orderkey % 41 = 0
    UNION ALL
    SELECT l_orderkey + 100000000 AS l_orderkey, l_partkey, l_suppkey,
           l_linenumber, l_quantity, l_extendedprice, l_discount,
           l_tax, l_returnflag, 'I' AS l_linestatus, l_shipdate
    FROM lineitem WHERE l_orderkey % 43 = 0
)
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(l_quantity) AS BIGINT)                     AS sum_qty,
       round(sum(l_extendedprice), 2)                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       CAST(count(*) AS BIGINT)                            AS count_order
FROM refreshed
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_refresh_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H's refresh functions are the benchmark's own test that an
    engine's DML keeps analytics correct — most analytical stacks run
    only Q1-Q22 and skip them.  Here both waves run through the
    engine's real table format and its segment-pruned verbs:

    * RF2 (delete wave): the doomed order keys ship as a DataFrame into
      ``delete_matching`` — broadcast anti-join rewrite of only the
      segments whose key envelope intersects the doomed range;
    * RF1 (insert+update wave): one ``upsert_matching`` keyed on
      (l_orderkey, l_linenumber) carries BOTH the updated rows (same
      keys — replace) and the inserted rows (new keys — land in the
      fresh batch segment);
    * Q1 then aggregates the COMMITTED refreshed table, and the oracle
      reconstructs the refreshed relation declaratively — hash equality
      proves the committed bytes, not a cached plan.

    Scale shape: at 100 TB the base table is key-clustered, so RF2
    rewrites O(doomed segments) and RF1 lands O(wave); Q1 itself stays
    the canonical map-side partial aggregate.  (The avg_* columns of
    stock Q1 are dropped here: averages over a refreshed double column
    can land on true half-ulp rounding ties between engines — the sums
    and counts pin the same correctness without the tie risk.)"""
    from shopify_youtube_etl_spark.plans.common import spread, staging_dir

    # spread() on the SOURCE of the initial overwrite (guide §2.5 input
    # parallelism): the sf0.1 lineitem file is ONE parquet row group, so
    # every pass over it decodes serially in one task; the overwrite
    # lands the table as a core-count-wide segment instead, and every
    # later pass reads THAT.  No-op at real scale (scans already split
    # past core count); results unchanged (Q1 is an aggregate).
    tbl = ParquetTable(spark, staging_dir("tpchrf", sf_dir) + "/lineitem")
    tbl.overwrite(spread(spark, sf_dir, "lineitem"), stats_cols=["l_orderkey"])
    # The refresh waves derive from the PRE-delete committed snapshot —
    # row-identical to the source table, but parallel (32 files) and
    # decoded once instead of re-decoding the single-row-group source
    # for every wave.  The snapshot's file list is resolved here, before
    # the later commits, and KEEP_GENERATIONS retention keeps those
    # files alive until after the merge's batch is materialized.
    li = tbl.read()

    # RF2: delete wave (join-shaped, segment-pruned).
    doomed = (
        li.where(F.col("l_orderkey") % 37 == 0).select("l_orderkey").distinct()
    )
    tbl.delete_matching(doomed, on="l_orderkey")

    # RF1: update + insert in ONE keyed merge.  upd filters % 37 != 0,
    # and ins shifts keys by +1e8, so deriving both from the pre-delete
    # snapshot is value-identical to deriving them from the raw source.
    upd = (
        li.where((F.col("l_orderkey") % 41 == 0) & (F.col("l_orderkey") % 37 != 0))
        .withColumn("l_returnflag", F.lit("R"))
        .withColumn("l_quantity", F.col("l_quantity") + 5)
    )
    ins = (
        li.where(F.col("l_orderkey") % 43 == 0)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.lit(100_000_000))
        .withColumn("l_linestatus", F.lit("I"))
    )
    tbl.upsert_matching(upd.unionByName(ins), ["l_orderkey", "l_linenumber"])

    refreshed = tbl.read().where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return refreshed.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        money(F.sum("l_extendedprice")).alias("sum_base_price"),
        money(F.sum(disc)).alias("sum_disc_price"),
        money(F.sum(disc * (1 + F.col("l_tax")))).alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


def _interleave16(x, y):
    """Morton/Z-value: interleave the low 16 bits of two long columns
    (x on even bit positions, y on odd) — pure integer expressions,
    deterministic on any engine."""
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for b in range(16):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(one), 2 * b)
        ).bitwiseOR(F.shiftleft(F.shiftright(y, b).bitwiseAND(one), 2 * b + 1))
    return z


@query(
    "zorder_box_scan",
    ref="layout maintenance, multi-dimension — OPTIMIZE ZORDER BY (customer, date): Morton-interleave both keys, cluster on the z-value, and serve a 2-D box predicate off the committed layout; completes the clustering family (range cluster_by, incremental folds, Z-order)",
    doc="Orders re-laid-out by the Morton z-value of (normalized o_custkey, normalized order day), then a 2-D box slice (customer band x one year) read off the committed table; per-status profile must equal the oracle's plain box aggregate.",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT)     AS n_orders,
       round(sum(o_totalprice), 2)  AS revenue
FROM orders
WHERE o_custkey BETWEEN 40 AND 80
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <= TIMESTAMP '1995-12-31'
GROUP BY o_orderstatus
""",
)
def zorder_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One sort key can only skip on one dimension: a date-clustered
    table serves date slices but scans EVERY file for a customer-band
    probe.  Z-ordering interleaves the bits of both normalized keys so
    z-contiguous files cover small RECTANGLES of (customer, day) space
    — each parquet file's footer then carries a tight min/max on BOTH
    natural columns, and a pushed 2-D box predicate skips files on
    either dimension (tests/test_etl-side pin: the same box touches
    strictly fewer files under z-order than under the 1-D date
    layout).  The z-value is pure integer expressions (16-bit
    normalized ranks from a one-row min/max aggregate, Morton
    interleave), the layout rewrite is the same committed ``cluster_by``
    the 1-D path uses, and oracle equality proves the rewrite is
    row-preserving AND the box read returns exactly the plain slice.
    At 100 TB this is nightly OPTIMIZE ZORDER + dashboard box probes."""
    from shopify_youtube_etl_spark.plans.common import staging_dir

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("day_num"),
    )
    b = src.agg(
        F.min("o_custkey").alias("c_lo"),
        F.max("o_custkey").alias("c_hi"),
        F.min("day_num").alias("d_lo"),
        F.max("day_num").alias("d_hi"),
    ).first()
    if b["c_lo"] is None:
        return spark.createDataFrame(
            [], "o_orderstatus string, n_orders long, revenue double"
        )
    c_span = max(b["c_hi"] - b["c_lo"], 1)
    d_span = max(b["d_hi"] - b["d_lo"], 1)
    cn = F.floor((F.col("o_custkey") - F.lit(b["c_lo"])) * 65535 / c_span).cast(
        "long"
    )
    dn = F.floor((F.col("day_num") - F.lit(b["d_lo"])) * 65535 / d_span).cast(
        "long"
    )
    with_z = src.withColumn("z", _interleave16(cn, dn))
    tbl = ParquetTable(spark, staging_dir("zorder", sf_dir) + "/orders")
    tbl.overwrite(with_z)
    tbl.cluster_by(["z"], num_files=16)
    box = tbl.read().where(
        F.col("o_custkey").between(40, 80)
        & F.col("d").between("1995-01-01", "1995-12-31")
    )
    return box.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money(F.sum("o_totalprice")).alias("revenue"),
    )

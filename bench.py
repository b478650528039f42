#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Mirrors the reference's per-stage timing discipline
(shopify_etl.py:648-649, 669-670, 680-681): each query is timed
end-to-end (plan → execute → collect-to-count), after a warmup query
that absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.plans.registry import all_queries
from shopify_youtube_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the scan/join/agg/window/dedup/similarity spine.
HEADLINE = [
    "flagship_revenue",
    "star_join_revenue_by_nation",
    "uniqueness_profile",
    "merge_upsert",
    "latest_order_per_customer",
    "keep_first_dedup",
    "events_daily_rollup",
    "tumbling_window_15m",
    "session_window_30m",
    "dedup_exact",
    "token_stats",
    "minhash_lsh_neardup",
    "ann_cosine_topk",
    # ann_cosine_topk_np was dropped when ann_cosine_topk started
    # delegating to the same block-matmul implementation (identical
    # plan, timing it twice measured nothing); tfidf_top_terms takes
    # the slot as a genuinely distinct heavy text-aggregation path.
    "tfidf_top_terms",
    "grouping_sets_revenue",
    "asof_click_attribution",
    "sessionize_gaps_islands",
    "simhash_neardup",
    "sql_nation_rank",
    # Round-4 additions: the two classic BI plan shapes and the
    # composed skew-adaptive join (probe cost included in its timing).
    "tpch_q3_shipping_priority",
    "tpch_q18_large_orders",
    "adaptive_join_revenue",
    "tpch_q5_local_supplier_volume",
    "int8_ann_topk",
    # Round-4 session-3 additions: the PQ/refine ANN path and the
    # heaviest new text aggregation (explode + vocab join).
    "pq_ann_topk",
    "unigram_logprob_score",
    # Round-5 additions (r4 verdict item #6): the remaining heavy r4
    # queries, tracked before they regress silently — k-means cell
    # dedup, the BPE apply pass, the span-census profile, and the
    # Python-DataSource streaming ingest.
    "semantic_cluster_dedup",
    "bpe_encode_stats",
    "duplicated_span_profile",
    "pagestore_stream_ingest",
    # Round-5 new operators with corpus-sized work: span masking is
    # the profile's transform twin; the real header decode exercises
    # the Arrow binary path.
    "repeated_span_removal",
    "media_header_decode",
    # Round-5 session-2 additions: the IVF-PQ composition and the
    # composed curation funnel (the heaviest chained lineage).
    "ivfpq_ann_topk",
    "curation_funnel_report",
    # Round-6 additions: the steady-state INCREMENTAL paths (full
    # recompute above is the cold build; these are what actually runs
    # per batch at 100 TB — first rep builds the persisted state,
    # best-of-N reflects the warm incremental cost) and the genuine
    # partsupp-dependent TPC-H shapes.
    "incremental_curation_funnel",
    "ivf_incremental_assign",
    "tpch_q2_real",
    "tpch_q20_surplus_suppliers",
    # Round-6 session-2 additions: the stream-stream join (two file
    # streams + bounded join state per run) is the heaviest new query;
    # the state-store reader runs a full streaming aggregate before
    # reading its checkpoint back.
    "stream_stream_join_attribution",
    "stream_state_inspection",
    # Round-6 session-3 additions: the index-maintenance chain's two
    # new stages (2-means bisection; Arrow re-encode of split-cell
    # codes), the held-out bigram LM (heaviest new oracle-green text
    # path), and the partitioned Python UDTF (the SQL-surface custom
    # operator — its Python-worker cost belongs in the record).
    "ivf_hot_cell_split",
    "ivfpq_code_refresh",
    "bigram_lm_heldout_ppl",
    "udtf_burst_sessions",
    # Round-6 session-4 additions: the fused-retrieval stack (BM25 leg
    # + dense leg + RRF), and the corpus-shuffle market-basket census —
    # the two new queries with corpus-sized work.
    "rrf_hybrid_retrieval",
    "market_basket_lift",
    # The index-served IVM twin of bm25_search_topk: first rep builds
    # the persisted postings, best-of-N reflects the warm merge+search.
    "bm25_incremental_index",
    # Round-7: the attribution family's IVM (state build in rep 1,
    # best-of-N is the warm batch-merge + state-served report).
    "incremental_attribution_revenue",
    # Round-8: the graph family's delete path (touched-component
    # recompute + segment-pruned relabel) and the KLL partials-ledger
    # IVM — both carry real per-rep state-merge work worth tracking.
    "incremental_component_delete",
    "incremental_kll_maintenance",
    # Round-8 session-2: the consecutive-day streak census is the one
    # new query with events-scale work (distinct + windows + census on
    # the user key); the day-grain smoothing/ACF/backtest/hazard
    # additions reduce to ~thousand-row frames and aren't worth a slot.
    "longest_active_streak",
    # Round-8 session-2 late: the shingle-DF novelty census (tfidf cost
    # shape over documents) and the exact 7x-fan-out sliding distinct
    # (events-scale) — the two late additions with corpus-sized work.
    "doc_novelty_profile",
    "sliding_distinct_users_7d",
    # Round-9: the r8 table-verb paths join the official record — the
    # RF1/RF2 DML round-trip (delete_matching + upsert_matching per
    # rep), the z-order rewrite + pruned box probe, and the two-phase
    # partitioned NTILE migration matrix (customer-scale self-join).
    "tpch_refresh_q1",
    "zorder_box_scan",
    "segment_migration_matrix",
]


def force_eval(df: DataFrame) -> int:
    """Row count + an xxhash64 checksum over EVERY output column in one
    pass.  A bare count() lets Catalyst prune unused projections, so a
    projection-heavy query (e.g. token_stats) would be timed as little
    more than a parquet row-count scan (ADVICE round 1); the checksum
    forces each output column to actually be computed."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("checksum"),
    ).first()
    return row["n"]


# Clamped to >=1 (ADVICE r10): REPS=0 or negative would leave every
# sample list empty, so min(samples) raised ValueError and zeroed the
# whole artifact — exactly the failure class the per-query try/except
# exists to prevent.
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# Calibration query: cheap, plan-stable since r1, scan+join+agg shaped.
# Re-timed (min-of-3) immediately after warmup AND after the last
# headline query; both values land in the artifact.  On a quiet host the
# two agree within noise; under contention the end sample drifts — which
# makes a dirty record SELF-IDENTIFYING (r9 lesson: BENCH_r09.json
# overstated the common-set total ~1.5× on a contended host and nothing
# in the artifact revealed it; the adjudication needed a manual re-run).
_CALIBRATION_QUERY = "flagship_revenue"


def _time_calibration(spark, specs) -> float:
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        force_eval(specs[_CALIBRATION_QUERY].fn(spark, SF_DIR))
        best = min(best, time.perf_counter() - start)
    return round(best, 3)


def _steal_ticks() -> int | None:
    """Cumulative hypervisor-steal jiffies from /proc/stat (field 8 of
    the aggregate cpu line).  The r12 adjudication showed loadavg alone
    misses mid-run steal storms; recording the tick counter before and
    after the run makes contamination machine-detectable (delta/100 =
    stolen CPU-seconds across the run).  None on platforms without it."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if parts and parts[0] == "cpu" else None
    except (OSError, ValueError, IndexError):
        return None


# The grading driver keeps only the LAST 2000 chars of stdout and parses
# the final JSON line out of it; the trailer (plus newline) must always
# fit.  1950 leaves headroom for the newline and stray carriage returns.
_TAIL_BUDGET = 1950


def summary_record(record: dict) -> dict:
    """Compact trailer derived from the full record — everything the
    grade reads (metric/value/unit/sf) plus the contention sentinels
    AND a 2-decimal per-query map.  Exists because the driver keeps
    only the LAST 2000 chars of stdout: r10's sentinel additions pushed
    the single full-record line past that and the truncation dropped
    ``metric``/``value`` off the head (r10 verdict #1); r11's fix made
    the trailer parseable but per-query-blind, leaving PERF_r12 with
    ``per_query: {}`` and an empty scaling block (r12 verdict #4/item
    2).  This version carries the per-query minima at 2 decimals in
    compact JSON — measured 1.8-1.9k chars for the 56-query set — with
    a size guard (``trailer_line``) that degrades to 1-decimal and then
    to no-queries rather than ever overflowing the tail window.  The
    full 3-decimal record (plus medians) is printed on the PRECEDING
    line for humans and LOCAL_PREVIEW captures; timing methodology is
    unchanged."""
    cal = record.get("calibration") or {}
    steal = record.get("steal_ticks") or {}
    out = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": record["unit"],
        "sf": record["sf"],
        "reps": record["reps"],
        "n_queries": len(record.get("queries", {})),
        "queries": {k: round(v, 2) for k, v in record.get("queries", {}).items()},
        # Sentinels, terse forms (the full line keeps the verbose ones):
        # the "query" name is dropped from calibration, steal collapses
        # to its delta (stolen jiffies across the run; /100 = CPU-sec).
        "calibration": {k: cal[k] for k in ("start_sec", "end_sec", "drift_ratio") if k in cal},
        "loadavg": record.get("loadavg"),
        "summary": True,  # marks the trailer; full per-query line precedes it
    }
    if steal.get("delta") is not None:
        out["steal_delta"] = steal["delta"]
    errors = record.get("errors")
    if errors:
        out["n_errors"] = len(errors)
        out["error_queries"] = sorted(errors)[:2]
    return out


def trailer_line(summary: dict) -> str:
    """Serialize the trailer compactly, degrading the per-query map
    (2dp → 1dp → absent) sooner than ever exceeding the driver's tail
    window.  Degradation is loud: the trailer says which fidelity it
    kept so a reader never mistakes a clipped map for the full one."""
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) <= _TAIL_BUDGET:
        return line
    coarse = dict(summary)
    coarse["queries"] = {k: round(v, 1) for k, v in summary.get("queries", {}).items()}
    coarse["queries_rounded_1dp"] = True
    line = json.dumps(coarse, separators=(",", ":"))
    if len(line) <= _TAIL_BUDGET:
        return line
    bare = {k: v for k, v in summary.items() if k != "queries"}
    bare["queries_omitted_for_size"] = True
    return json.dumps(bare, separators=(",", ":"))


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # Warmup: JVM, codegen, parquet footer caches — plus one tiny
    # mapInPandas so the Arrow-path queries measure steady state, not
    # the one-time Python worker pool startup.  Three warmup reps of the
    # calibration query, not one: a single warmup leaves JIT still cold
    # and biased the START calibration ~2x high.  Even fully warmed, the
    # JVM keeps improving across the run (codegen/footer caches), so the
    # QUIET-host signature measured on this box is drift_ratio ~0.5-0.7
    # (end faster than start); a ratio ≳1.25 — the end sample SLOWER
    # despite a warmer JVM — is the contention signal, and a start_sec
    # far above the historical ~0.8s floor flags a contended START
    # (the r10 preview runs caught both modes in the wild).
    for _ in range(3):
        force_eval(specs["flagship_revenue"].fn(spark, SF_DIR))
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    load_start = os.getloadavg()
    steal_start = _steal_ticks()
    calibration_start = _time_calibration(spark, specs)

    # Best of REPS runs per query: the first run absorbs per-query
    # codegen and any transient host load; the min reports steady state,
    # and the median is kept alongside so a record where median >> min
    # exposes intra-run contention.  (On this shared host, 5-rep
    # profiling showed identical-code swings of up to 8× — e.g. simhash
    # 1.57-11.95 s — so two samples were not enough to escape a single
    # noisy window.)
    # Per-query try/except so one red query reports an "err" entry
    # instead of zeroing the whole artifact (round-3 lesson: a single
    # AnalysisException cost the round its entire bench record).
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        samples: list[float] = []
        n = 0
        try:
            for _ in range(REPS):
                start = time.perf_counter()
                n = force_eval(specs[name].fn(spark, SF_DIR))
                samples.append(time.perf_counter() - start)
        except Exception as exc:  # noqa: BLE001 — keep the artifact alive
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            if not samples:
                continue
            # A later repetition failed but an earlier one measured
            # real work — keep the valid samples alongside the error.
        timings[name] = round(min(samples), 3)
        medians[name] = round(statistics.median(samples), 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    calibration_end = _time_calibration(spark, specs)
    load_end = os.getloadavg()
    steal_end = _steal_ticks()

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Contention sentinels (r9 verdict #1).  Readers should
        # trust `value` only when calibration drift ≲1.25, the
        # calibration start_sec is near its ~0.8s quiet floor,
        # and loadavg ≲ cpu_count; otherwise treat the record as
        # host-noise and compare against the last clean one
        # (quiet-host drift is ~0.5-0.7: the JVM keeps warming
        # across the run, so end-faster-than-start is normal).
        "reps": REPS,
        "queries_median": medians,
        "calibration": {
            "query": _CALIBRATION_QUERY,
            "start_sec": calibration_start,
            "end_sec": calibration_end,
            "drift_ratio": round(calibration_end / calibration_start, 3)
            if calibration_start > 0
            else None,
        },
        "loadavg": {
            "start": [round(x, 2) for x in load_start],
            "end": [round(x, 2) for x in load_end],
            "cpu_count": os.cpu_count(),
        },
        # Hypervisor steal (r12 verdict item 9): cumulative jiffies at
        # the run's bracket; delta/100 = CPU-seconds stolen during the
        # run.  On this host a quiet run shows <50k; the r12 official
        # record's storm would have shown its own contamination here.
        "steal_ticks": {
            "start": steal_start,
            "end": steal_end,
            "delta": (steal_end - steal_start)
            if steal_start is not None and steal_end is not None
            else None,
        },
        **({"errors": errors} if errors else {}),
    }
    # Full record first (humans, LOCAL_PREVIEW captures), compact
    # summary LAST — the driver's 2000-char tail capture must always
    # end on a self-contained parseable line carrying the per-query
    # map (see summary_record / trailer_line).
    print(json.dumps(record))
    print(trailer_line(summary_record(record)))


if __name__ == "__main__":
    main()

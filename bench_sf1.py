#!/usr/bin/env python
"""sf1.0 stress rehearsal (r4 verdict item #2).

The per-round bench runs at sf0.1 where every headline query is
sub-2s; this harness is the cheapest local scale-up rehearsal: build a
10× corpus (each sf0.1 table unioned with 9 key-shifted copies; text
copies get a per-copy suffix token so they are NEAR-dups, not exact
dups — the realistic dedup workload) under /tmp, then time the ten
heaviest queries at both scales and report the growth ratio.

A query is flagged ``superlinear`` when its sf1 min exceeds ~12× its
sf0.1 min (10× data + scheduling slack); every flag needs a written
disposition in the artifact before the round closes.

Round 8 additions (r7 verdict #3/#7): the graph/state family
(copurchase_components, the merge- and delete-capable component IVMs,
incremental clustering, the HLL/KLL sketch IVMs) joins the heavy set,
and every query's FIRST-rep time is recorded alongside the min — with
all /tmp IVM state wiped up front, rep 1 is the COLD state build and
min-of-N is the warm steady-state cost, so the record distinguishes
one-time construction from per-batch maintenance.

Round 10 additions (r9 verdict items #4/#5): DISPOSITIONS now live in
the script and land in the artifact at write time (every >2.5x ratio
names its scaling law, including incremental_funnel_two_batch's own
entry), and a copies=100 probe (≈SF10-equivalent, one decade past the
10x record) times three state-light heavies — minhash_lsh_neardup,
dedup_exact, merge_upsert — so the 2x-at-10x extrapolation is no longer
the one untested leap in the 100 TB story.

Round 11 addition (r10 verdict #4): the copies=100 probe gains its
first STATEFUL/IVM representative — bm25_incremental_index.  Persisted
IVM state is wiped immediately before the probe loop, so rep 1 is the
honest cold index build over the 100× corpus and the later reps are the
warm batch merge + index-served search (the steady-state 100 TB cost);
the probe records first_rep and min separately, like the 10× section.

Round 12 additions (r11 verdict #3/#4): the last stateful family
measured only to 10× — IVF maintenance — gains its decade row via
``ivf_incremental_assign`` in the copies=100 probe (``sye_ann_*`` now
in STATE_GLOBS so the pre-probe wipe makes rep 1 the honest cold
quantizer train + base census at 100×, and min-of-N the warm
append-assignment pass), and ``semantic_cluster_dedup`` gets its named
scaling-law disposition (the one >2.5× ratio without one in r11).

Usage: python bench_sf1.py  → writes BENCH_SF1_r13.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench import force_eval
from shopify_youtube_etl_spark.plans.registry import all_queries
from shopify_youtube_etl_spark.session import get_spark

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = "/tmp/sye_sf1_v2"
COPIES = 10
REPS = 4

# copies=100 probe (r9 verdict #5): one decade past the 10x record for
# three representative state-light plans.  Only the two tables those
# queries read are built (documents ~500k near-dup docs, orders ~15M
# rows — the rest would multiply build time for queries that never
# touch them), via a single explode pass instead of a 100-way union.
SF10 = "/tmp/sye_sf10_v1"
COPIES100 = 100
# The r9-verdict trio (minhash/dedup/merge) plus the other heavy
# documents-only families, so the decade probe covers banding, digest
# shuffle, DML merge, TF-IDF reduce, BM25 scoring, simhash banding, and
# the projection-heavy token census.
PROBE100 = [
    "minhash_lsh_neardup",
    "dedup_exact",
    "merge_upsert",
    "tfidf_top_terms",
    "bm25_search_topk",
    "simhash_neardup",
    "token_stats",
    "ann_cosine_topk",
    "embedding_lsh_neardup",
    # r10 verdict #4: the stateful/IVM representatives — rep 1 is the
    # cold 100x state build (state wiped right before the probe loop),
    # min-of-N the warm batch advance.  bm25 is the postings-index IVM;
    # the curation funnel is the five-stage composed IVM (quality →
    # exact dedup → MinHash-LSH → components → decontam over an 80%
    # history slice, then a 20%-fraction batch advance).
    "bm25_incremental_index",
    "incremental_curation_funnel",
    # r11 verdict #3: the IVF-maintenance family's decade representative
    # — rep 1 is the cold bounded-sample quantizer train + corpus-sized
    # base-cell census over the 100x 80% split, min-of-N the warm
    # map-side argmin assignment of the 20%-fraction appended batch
    # (itself 100x the sf0.1 batch).  Expected law: warm ~linear in the
    # BATCH with fixed K=16 centroids, decoupled from index size.
    "ivf_incremental_assign",
]
PROBE100_TABLES = {"documents", "orders", "embeddings"}
PROBE100_REPS = 2

# Written scaling-law dispositions, embedded here so every artifact
# carries them at write time (r9 verdict #4: a >2.5x ratio without a
# named law made the record non-self-explaining).  Carry these forward
# each round; add an entry whenever a new ratio crosses ~2.5x.
DISPOSITIONS = {
    "duplicate_payment_audit": (
        "~5x at 10x data: blocked-pair volume grows ~10x under "
        "customer-growth scaling (o_custkey shifts in lockstep with the "
        "customer copies, so per-customer block sizes stay constant); "
        "the Sigma|block|^2 worst case does not materialize. Same "
        "disposition as r7 (4.81x), r8 (4.56-5.1x), r9 (5.06x)."
    ),
    "graph_family": (
        "10x record for the label-propagation family (r7 verdict #3): "
        "copurchase_components, merge-IVM, delete-IVM and incremental "
        "clustering all in 0.6-1.6x (touched-component recompute is "
        "batch-sized; at SF1 the contracted graphs stay under the "
        "65536-edge driver union-find threshold, so iterations do not "
        "scale with data). Nothing superlinear."
    ),
    "cold_vs_warm": (
        "first_rep columns (r7 verdict #7) with all /tmp IVM state wiped "
        "up front: rep 1 is the honest cold state build, min-of-4 the "
        "warm steady-state batch cost. Warm ratios are the per-batch "
        "100TB story; cold is one-time construction."
    ),
    "span_family": (
        "duplicated_span_profile / repeated_span_removal / simhash in "
        "2.4-3.5x: xxhash64(span) census shuffle grows with near-dup "
        "corpus text volume (10x rows with per-copy suffix tokens), "
        "sublinear in wall clock. Stable since r7."
    ),
    "semantic_cluster_dedup": (
        "named law (r11 verdict #4 — the one >2.5x ratio that lacked "
        "one): CORPUS-LINEAR centroid assignment with fixed K. The "
        "k-means fit runs on a bounded driver-side sample (never "
        "data-sized); the per-row cost is a JVM-side fold over K "
        "centroids, so total work is K x corpus rows — 10x data means "
        "10x map-side work with zero quadratic term, and the "
        "representative pick is one groupBy on the assigned cell. "
        "Observed band: 2.37x (r10), 2.58x (r9), 2.82x (r11) — a "
        "2.4-2.8x hover around the 2.5 line, i.e. ~4x-sublinear wall "
        "clock against 10x work, with the spread being host noise on a "
        "sub-3s absolute query. Superlinear would require assignment "
        "cost to grow with K or pairwise doc-doc work; neither exists "
        "in the plan."
    ),
    "sliding_distinct_users_7d": (
        "3.8-4.3x at 10x data: work is exactly 7x the deduped (day,user) "
        "pair count, and pairs grow ~10x with users (constant per-user "
        "traffic) - a 10x work growth landing well under 10x wall clock, "
        "sublinear; the HLL rollup family is the registered approximate "
        "path when 7x pairs is too much."
    ),
    "incremental_funnel_two_batch": (
        "warm 2.9x at 10x data (r9 verdict #4's named-law entry): the "
        "advanced batch is a FIXED 20% FRACTION of the id range, so the "
        "batch itself grows ~10x with the corpus and ~3x wall is "
        "sublinear in the work actually done; the advance writes stay "
        "O(batch + touched segments) (pinned by the write-audit tests). "
        "Cold rep 1 pays the one-time 60-percent history build. A "
        "constant-size batch at a growing corpus would show a FLAT warm "
        "cost - that regime is what the segment-pruned merges guarantee."
    ),
    "session2_additions": (
        "longest_active_streak ~1.4x, doc_novelty_profile ~1.6x "
        "(shingle-DF shuffle grows with corpus text, per-doc reduction "
        "flat), triplet_margin_mining ~1.1x (broadcast 16-probe pass, "
        "corpus-linear map side)."
    ),
    "r9_additions": (
        "segment_migration_matrix ~1.8x (two-phase partitioned NTILE: "
        "both rank passes and the quarter self-join ride the custkey "
        "shuffle, no global window); zorder_box_scan ~1.3x (Morton "
        "rewrite is one clustered write; the box probe reads only "
        "envelope-intersecting files at both scales); tpch_refresh_q1 "
        "~1.6x (RF2 delete_matching + RF1 upsert_matching rewrite only "
        "envelope-intersecting segments; Q1 is the flat map-side "
        "partial agg)."
    ),
    "copies100_probe": (
        "r9 verdict #5: copies=100 (≈SF10-equivalent) spot rows for "
        "three state-light plans, timed against the SAME sf0.1 floor as "
        "the 10x section (so ratio100 ≈ 10 x ratio10 would be linear). "
        "Only documents+orders are built at 100x; PROBE100_REPS reps, "
        "min reported. Document copies are word-permuted (k-seeded hash "
        "sort), NOT suffix-tagged: suffix-tagged copies form a 100-way "
        "near-dup lattice (C(100,2) pairs per doc, ~25M verify pairs) "
        "that the pipeline-order contract routes through exact dedup "
        "first, so the probe measures 100x corpus at ~constant clone "
        "multiplicity. The first (lattice) attempt also exposed a real "
        "plan hazard, now fixed and gated: the minhash verify joins are "
        "pinned SHUFFLE_HASH because Catalyst broadcast the candidate-"
        "shingle side on a bad size estimate and OOM'd an 8g driver. "
        "minhash stays banded, dedup_exact is one digest shuffle, "
        "merge_upsert one anti-join + union over 15M rows."
    ),
    "copies100_results": (
        "measured r10: minhash_lsh_neardup 92.7x at 100x data — LINEAR "
        "in the corpus (the cost is map-side signature generation over "
        "100x docs; pair volume stays per-copy-bounded by construction, "
        "so no quadratic term appears — linear is the floor for a "
        "full-corpus near-dup pass); dedup_exact 14.7x (one digest "
        "shuffle with map-side combine, sublinear from fixed overheads "
        "amortizing); merge_upsert 21.2x (anti-join + union + "
        "status rollup over 15M rows, sublinear). Extended families, "
        "all sublinear: tfidf_top_terms 26.1x (explode + two reduces), "
        "bm25_search_topk 11.5x (term-filtered tf + exact idf "
        "aggregates), simhash_neardup 23.4x (map-side 64-bit hash + "
        "capped band buckets), token_stats 16.2x (projection-heavy "
        "census), ann_cosine_topk 2.52x (block-matmul: probe count is "
        "fixed, corpus streams through GEMM batches), "
        "embedding_lsh_neardup 67.7x (banding matmul linear; the "
        "verify join shuffles ~3.2 GB of candidate vectors — the exact "
        "join whose sides are too big to broadcast, runnable at this "
        "scale BECAUSE of the r10 SHUFFLE_HASH pin). Embedding copies "
        "are per-copy component-PERMUTED (an orthogonal transform): "
        "within-copy dot products and norms are preserved exactly, "
        "cross-copy cosines decorrelate — otherwise 100 identical "
        "copies of each vector form a C(100,2) exact-twin lattice. No "
        "superlinear decade leap anywhere: the 2x-at-10x story "
        "extrapolates."
    ),
    "copies100_ivm": (
        "r10 verdict #4: bm25_incremental_index is the decade probe's "
        "stateful/IVM representative (the copies=100 section previously "
        "covered only state-light plans). State is wiped right before "
        "the probe loop, so copies100_first_rep_sec is the one-time "
        "COLD index build over the 100x corpus (tokenize 500k docs + "
        "two base overwrites + first batch merge) and copies100_min_sec "
        "is the WARM steady-state cost: re-tokenize the 20%-fraction "
        "batch (itself 100x the sf0.1 batch, since the split is a fixed "
        "corpus fraction), keyed upsert_matching of its postings "
        "(O(batch postings) — base segments survive by name, pinned in "
        "tests), and the index-served term-filtered search. Expected "
        "law: warm cost ~linear in the BATCH, decoupled from index "
        "size; a warm ratio tracking the 100x batch growth at or below "
        "~100x is the pass bar, and the cold/warm gap is the measured "
        "evidence that maintenance does not pay the rebuild price."
    ),
    "copies100_ivm_results": (
        "measured r11: bm25_incremental_index warm 14.24s = 6.25x its "
        "sf0.1 floor while the batch grew 100x — strongly SUBLINEAR in "
        "the batch (fixed scheduling overheads amortize; the merge "
        "writes O(batch postings) with base segments surviving by "
        "name); cold build 31.29s, so warm maintenance runs at 0.46x "
        "the rebuild price even at this small absolute scale, and the "
        "gap widens with index size since the warm path never touches "
        "base postings. The state-light families reproduced their r10 "
        "laws within host noise (minhash 105.0x vs 92.7x — linear "
        "either way for a full-corpus banding pass; dedup_exact 18.5x, "
        "tfidf 25.3x, simhash 23.6x, token_stats 22.2x, ann_cosine "
        "4.14x fixed-probe, embedding_lsh 86.7x linear banding+verify, "
        "bm25_search 13.4x, merge_upsert 25.8x). No superlinear decade "
        "leap anywhere; the IVM family now has its measured decade row. "
        "Second IVM row, same session: incremental_curation_funnel "
        "(the five-stage composed IVM) cold history build 395.3s over "
        "400k docs, warm 20%-fraction batch advance 90.8s = 17.7x its "
        "sf0.1 floor while the batch grew 100x — sublinear in the "
        "batch, warm at 0.23x the rebuild price, answering the r10 "
        "verdict's open question (funnel state at 100x fits the "
        "sandbox comfortably: no OOM, no superlinear term; the advance "
        "stays O(batch + touched segments) as the write-audit pins "
        "guarantee)."
    ),
    "copies100_ivf_maintenance": (
        "r11 verdict #3: ivf_incremental_assign is the IVF/IVFPQ "
        "maintenance family's decade representative (the last stateful "
        "family measured only to 10x). sye_ann_* state is wiped before "
        "the probe loop, so copies100_first_rep_sec is the one-time "
        "COLD path at 100x — bounded-sample quantizer train (<=2048 "
        "vectors, K=16, driver-sized regardless of corpus) plus the "
        "corpus-sized base-cell census over the 80% split — and "
        "copies100_min_sec is the WARM steady-state maintenance cost: "
        "a map-side argmin of the 20%-fraction appended batch against "
        "16 broadcast-literal centroids followed by a 16-row rollup. "
        "Expected law: warm ~linear in the BATCH (itself 100x the "
        "sf0.1 batch, since the split is a fixed corpus fraction) and "
        "decoupled from index size; a warm ratio at or below ~100x is "
        "the pass bar, and fixed scheduling overheads should pull it "
        "well under, as with the other IVM rows."
    ),
}

# The ten heaviest queries by r04 bench + plan inspection.
HEAVY = [
    "minhash_lsh_neardup",
    "pq_ann_topk",
    "ann_ivf_topk",
    "int8_ann_topk",
    "simhash_neardup",
    "semantic_cluster_dedup",
    "duplicated_span_profile",
    "tfidf_top_terms",
    "uniqueness_profile",
    "reconcile_tables",
    # Round-5 new heavy operators, stress-checked at the same scale.
    "repeated_span_removal",
    "bm25_search_topk",
    "incremental_rollup_maintenance",
    "fuzzy_blocked_join",
    "ivfpq_ann_topk",
    "curation_funnel_report",
    # Round-6: the incremental steady-state paths (state build amortized
    # by REPS; best-of-N is the warm incremental cost) and the genuine
    # partsupp Q9 (two fact-grain tables joined on a composite key).
    "incremental_curation_funnel",
    "ivf_incremental_assign",
    "tpch_q9_product_profit",
    # Round-6 session-3: maintenance-chain stages 2+3 (bisection +
    # split-cell re-encode — work must track hot-cell membership, not
    # the corpus) and the held-out bigram LM (bigram census + eval
    # join).  The events-table additions (UDTF bursts, HLL IVM) stay
    # out: events is not in SCALED, so a 10x ratio would be noise.
    "ivf_hot_cell_split",
    "ivfpq_code_refresh",
    "bigram_lm_heldout_ppl",
    # Round-6 session-4: the fused-retrieval stack and its eval, the
    # index-served IVM twin (state build in rep 1, warm merge+search
    # after), the map-side pair census, the brute truncation-recall
    # baseline, and the two window-discipline statistics over scaled
    # tables.  cusum/ab_test read events (unscaled) and stay out.
    "rrf_hybrid_retrieval",
    "ndcg_retrieval_eval",
    "bm25_incremental_index",
    "market_basket_lift",
    "matryoshka_truncation_recall",
    "gini_segment_inequality",
    "seasonal_decompose_daily",
    # Round-7 (r6 verdict #4): events now scales (event_id AND user_id
    # shift per copy — 10x independent users, same per-user traffic, so
    # interval-join state grows linearly, the realistic 100 TB shape),
    # and orders copies shift o_custkey in lockstep with the customer
    # copies, so the blocked self-join and cohort queries see 10x
    # CUSTOMERS rather than 10x orders per customer.  That makes these
    # certifiable: the heaviest bench entry (the real stream-stream
    # join), the 9-shuffle funnel, the Σ|block|² audit, the LTV curve,
    # and the new attribution IVM (state build in rep 1; min-of-4 is
    # the warm incremental cost).
    "stream_stream_join_attribution",
    "window_funnel_depths",
    "duplicate_payment_audit",
    "cohort_ltv_curve",
    "incremental_attribution_revenue",
    # Round-8 (r7 verdict #3): the graph family — label-propagation
    # iterations x 10x data was the one heavy family without a 10x
    # record — plus the delete-capable component IVM, incremental
    # clustering, and the sketch IVMs (events scales since r7, so the
    # day-keyed HLL/KLL ledgers see 10x traffic).
    "copurchase_components",
    "incremental_component_maintenance",
    "incremental_component_delete",
    "incremental_cluster_maintenance",
    "incremental_hll_maintenance",
    "incremental_kll_maintenance",
    # Round-8 session-2: the consecutive-day streak census — distinct
    # (user, day) + islands windows + census on the scaled events
    # table; 10x users at constant per-user traffic should scale ~10x
    # in the distinct and stay flat in the per-user window frames.
    "longest_active_streak",
    # Round-8 session-2 late: shingle-DF novelty (documents scale),
    # the exact sliding distinct (7x the deduped (day,user) pairs),
    # and the triplet miner (broadcast-probe over scaled embeddings).
    "doc_novelty_profile",
    "sliding_distinct_users_7d",
    "triplet_margin_mining",
    # Round-9 (r8 verdict #7): the remaining unstressed r8 heavies —
    # the two-phase partitioned NTILE self-join (customer+orders scale),
    # the z-order cluster rewrite + pruned box probe (staging table is
    # rebuilt per rep, so min-of-N times the full OPTIMIZE+probe), and
    # the RF1/RF2 DML round-trip (delete_matching + upsert_matching at
    # 10x lineitem).  Plus the two-batch funnel: its advance flipped
    # from O(state) overwrites to pruned appends/merges this round, so
    # the 10x record certifies the new write path.
    "segment_migration_matrix",
    "zorder_box_scan",
    "tpch_refresh_q1",
    "incremental_funnel_two_batch",
]

# Persisted IVM/ANN state swept before timing so rep 1 is the honest
# COLD build at each scale and min-of-N is the warm steady-state cost
# (r7 verdict #7).
STATE_GLOBS = [
    "sye_cclivm_*", "sye_ccdivm_*", "sye_attrivm_*", "sye_hllstate_*",
    "sye_kllstate_*", "sye_bm25idx_*", "sye_funnel_*", "sye_cluincr_*",
    # r12: the ANN index/quantizer artifacts (ivfbase, codebooks, codes)
    # — without this the IVF probe's rep 1 could reuse a previous
    # harness run's SF10-keyed base and report a phantom-warm "cold".
    "sye_ann_*",
]

# Tables the HEAVY set reads; the rest are copied unscaled.
SCALED = {"documents", "embeddings", "orders", "lineitem", "customer", "events"}
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SHIFT = {"documents": "doc_id", "embeddings": "vec_id",
         "orders": "o_orderkey", "lineitem": "l_orderkey",
         "customer": "c_custkey", "events": "event_id"}
OFFSET = 100_000_000


def build_sf1(spark) -> None:
    os.makedirs(SF1, exist_ok=True)
    for name in ALL_TABLES:
        out = os.path.join(SF1, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = spark.read.parquet(os.path.join(SF01, f"{name}.parquet"))
        if name not in SCALED:
            base.write.mode("overwrite").parquet(out)
            continue
        parts = [base]
        for k in range(1, COPIES):
            c = base.withColumn(SHIFT[name], F.col(SHIFT[name]) + F.lit(k * OFFSET))
            if name == "documents":
                # Near-dup copies: one extra token per copy keeps the
                # neardup queries on their intended workload instead of
                # a degenerate 10-way exact-dup lattice.
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" copytok{k}")))
            if name == "events":
                # Independent user populations per copy: the same users
                # 10x-duplicated at identical timestamps would square
                # every interval-join pair count instead of scaling it.
                c = c.withColumn("user_id", F.col("user_id") + F.lit(k * OFFSET))
            if name == "orders":
                # Customer base scales WITH the customer table (same
                # per-copy offset, FK-consistent), so per-customer blocks
                # stay constant-sized — growth adds customers, not
                # duplicate payments per customer.
                c = c.withColumn("o_custkey", F.col("o_custkey") + F.lit(k * OFFSET))
            if name == "customer":
                # Distinct name prefix per copy, so fuzzy-join blocking
                # keys stay ~10 names per block (linear growth) instead
                # of 10x-duplicated names inflating every block 100x.
                c = c.withColumn(
                    "c_name",
                    F.concat(F.lit(f"K{k}"), F.expr("substr(c_name, 3)")),
                )
            parts.append(c)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionByName(p)
        scaled.write.mode("overwrite").parquet(out)
        print(f"# built {name}: {spark.read.parquet(out).count()} rows", file=sys.stderr)


def build_sf10(spark) -> None:
    """copies=100 corpus for the probe queries: one explode pass per
    table (a 100-way unionByName plan at this width is slower to plan
    than to run).  Same id-shift discipline as build_sf1, with the copy
    index k folded into the shifted keys.

    Documents are WORD-PERMUTED per copy (k-seeded hash sort), not
    suffix-tagged: 100 suffix-tagged copies of each doc form a 100-way
    near-dup lattice — C(100,2) LSH pairs per doc, ~25M verify pairs —
    which is exactly the workload the pipeline-order contract says
    exact dedup removes BEFORE near-dup search (see simhash_neardup's
    docstring).  Probing minhash on the lattice measures quadratic
    pair fan-out, not the banding scale path; the permutation keeps
    the word distribution and per-copy dup structure (each copy still
    contains the sf0.1 corpus's own near-dups under the same
    permutation) while making 3-shingles disjoint ACROSS copies, so
    the probe measures 100x corpus, ~constant clone multiplicity."""
    os.makedirs(SF10, exist_ok=True)
    for name in sorted(PROBE100_TABLES):
        out = os.path.join(SF10, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = spark.read.parquet(os.path.join(SF01, f"{name}.parquet"))
        # sequence() yields INTs and k*OFFSET tops out at 9.9e9 — cast k
        # to long BEFORE the multiply or ANSI mode raises
        # ARITHMETIC_OVERFLOW at k=22 (observed on the first r10 run).
        k = F.col("__k").cast("long")
        scaled = base.withColumn(
            "__k", F.explode(F.sequence(F.lit(0), F.lit(COPIES100 - 1)))
        ).withColumn(SHIFT[name], F.col(SHIFT[name]) + k * F.lit(OFFSET))
        if name == "documents":
            ws = F.split(F.col("text"), r"\s+")
            permuted = F.array_join(
                F.transform(
                    F.array_sort(
                        F.transform(
                            ws,
                            lambda w: F.struct(
                                F.xxhash64(F.concat(w, k.cast("string"))).alias("h"),
                                w.alias("w"),
                            ),
                        )
                    ),
                    lambda s: s["w"],
                ),
                " ",
            )
            scaled = scaled.withColumn(
                "text", F.when(k == 0, F.col("text")).otherwise(permuted)
            )
        if name == "orders":
            scaled = scaled.withColumn(
                "o_custkey", F.col("o_custkey") + k * F.lit(OFFSET)
            )
        if name == "embeddings":
            # Per-copy COMPONENT PERMUTATION (k-seeded): a permutation
            # matrix is orthogonal, so within-copy pairwise dot products
            # and norms are preserved EXACTLY (each copy is an isometric
            # image of the sf0.1 corpus, same near-dup structure), while
            # cross-copy cosines decorrelate to ~0 — without it, 100
            # identical copies of every vector form a C(100,2)
            # exact-twin lattice, the embedding analogue of the suffix-
            # tag lattice documented above.
            v = F.col("embedding")
            perm = F.transform(
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.size(v) - F.lit(1)),
                        lambda i: F.struct(
                            F.xxhash64(
                                F.concat(
                                    i.cast("string"), F.lit("|"), k.cast("string")
                                )
                            ).alias("h"),
                            i.alias("i"),
                        ),
                    )
                ),
                lambda s: F.element_at(v, s["i"] + F.lit(1)),
            )
            scaled = scaled.withColumn(
                "embedding", F.when(k == 0, v).otherwise(perm)
            )
        scaled.drop("__k").write.mode("overwrite").parquet(out)
        print(
            f"# built 100x {name}: {spark.read.parquet(out).count()} rows",
            file=sys.stderr,
        )


def wipe_ivm_state() -> None:
    import glob
    import shutil
    import tempfile

    for pat in STATE_GLOBS:
        for d in glob.glob(os.path.join(tempfile.gettempdir(), pat)):
            shutil.rmtree(d, ignore_errors=True)


def time_query(specs, spark, name: str, sf_dir: str) -> tuple[float, float]:
    """(first_rep_sec, min_sec): for state-building queries the first
    rep is the cold build (state wiped at harness start), the min is
    the warm per-batch cost."""
    best = first = float("inf")
    for i in range(REPS):
        start = time.perf_counter()
        force_eval(specs[name].fn(spark, sf_dir))
        took = time.perf_counter() - start
        if i == 0:
            first = took
        best = min(best, took)
    return round(first, 3), round(best, 3)


def main() -> None:
    spark = get_spark(app_name="bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    build_sf1(spark)
    wipe_ivm_state()

    # Warmup both Arrow and JVM paths.
    force_eval(specs["flagship_revenue"].fn(spark, SF01))
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    results: dict[str, dict] = {}
    for name in HEAVY:
        c01, t01 = time_query(specs, spark, name, SF01)
        c1, t1 = time_query(specs, spark, name, SF1)
        ratio = round(t1 / t01, 2) if t01 > 0 else None
        results[name] = {
            "sf0.1_min_sec": t01,
            "sf1_min_sec": t1,
            "sf0.1_first_rep_sec": c01,
            "sf1_first_rep_sec": c1,
            "ratio": ratio,
            "superlinear": bool(ratio is not None and ratio > 12),
        }
        print(
            f"# {name}: {t01:.3f}s -> {t1:.3f}s ({ratio}x; cold {c01:.3f}->{c1:.3f})",
            file=sys.stderr,
        )

    # copies=100 probe: one decade past the 10x record for three
    # state-light plans.  sf0.1 floors are reused from the main loop
    # where available so the ratio shares its baseline with the 10x
    # section.
    build_sf10(spark)
    # Wipe persisted IVM/ANN state again so the stateful probe entries'
    # rep 1 is the honest COLD build at copies=100 even when a previous
    # harness run left a warm index behind (the HEAVY loop above only
    # built state for the SF01/SF1 corpus dirs, which key differently).
    wipe_ivm_state()
    probe100: dict[str, dict] = {}
    for name in PROBE100:
        if name in results:
            t01 = results[name]["sf0.1_min_sec"]
        else:
            _c, t01 = time_query(specs, spark, name, SF01)
        best = first = float("inf")
        for i in range(PROBE100_REPS):
            start = time.perf_counter()
            force_eval(specs[name].fn(spark, SF10))
            took = time.perf_counter() - start
            if i == 0:
                first = took
            best = min(best, took)
        t100 = round(best, 3)
        ratio = round(t100 / t01, 2) if t01 > 0 else None
        probe100[name] = {
            "sf0.1_min_sec": t01,
            "copies100_min_sec": t100,
            "copies100_first_rep_sec": round(first, 3),
            "ratio_vs_sf0.1": ratio,
        }
        print(
            f"# 100x {name}: {t01:.3f}s -> {t100:.3f}s ({ratio}x; cold {first:.3f})",
            file=sys.stderr,
        )

    artifact = {
        "metric": "sf1_stress_ratios",
        "copies": COPIES,
        "reps": REPS,
        "queries": results,
        "copies100": {
            "copies": COPIES100,
            "reps": PROBE100_REPS,
            "tables_built": sorted(PROBE100_TABLES),
            "queries": probe100,
        },
        "dispositions": DISPOSITIONS,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SF1_r13.json"), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()

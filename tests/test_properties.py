"""Property-based tests (SURVEY §5.4) over generated inputs.

upsert/dedup algebraic laws and explode conservation, with hypothesis
driving the row sets — small example counts since each example runs
real Spark jobs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shopify_youtube_etl_spark.operators.dedup import dedup_keep_first
from shopify_youtube_etl_spark.operators.upsert import upsert

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_st = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-50, 50)), min_size=0, max_size=20
)


def _df(spark, rows):
    # seq = arrival order (the reference's O2 asc-fetch determinism)
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    return spark.createDataFrame(data, "k INT, v INT, seq INT")


@given(base=rows_st, batch=rows_st)
@SETTINGS
def test_upsert_idempotent(spark, base, batch):
    """upsert(upsert(T,B),B) == upsert(T,B) — reprocessing an
    overlapping window must be a no-op (the MERGE contract)."""
    t0 = dedup_keep_first(_df(spark, base), ["k"], order_col="seq")
    b = _df(spark, batch)
    once = upsert(t0, b, ["k"], order_col="seq")
    twice = upsert(once, b, ["k"], order_col="seq")
    assert sorted(once.collect()) == sorted(twice.collect())
    # uniqueness invariant holds after any upsert
    assert once.groupBy("k").count().where("count > 1").count() == 0


@given(rows=rows_st)
@SETTINGS
def test_dedup_keep_first_laws(spark, rows):
    """Idempotent; keeps exactly the min-seq row per key."""
    df = _df(spark, rows)
    d1 = dedup_keep_first(df, ["k"], order_col="seq")
    d2 = dedup_keep_first(d1, ["k"], order_col="seq")
    assert sorted(d1.collect()) == sorted(d2.collect())
    firsts = {
        (r["k"], r["seq"])
        for r in df.groupBy("k").agg(F.min("seq").alias("seq")).collect()
    }
    assert {(r["k"], r["seq"]) for r in d1.collect()} == firsts


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=0, max_size=25
    )
)
@SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation == a sequential union-find on
    arbitrary random graphs (self-loops, duplicates, disconnected
    nodes)."""
    from shopify_youtube_etl_spark.operators.components import connected_components

    nodes = list(range(15))
    # Sequential ground truth.
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: min(m for m in nodes if find(m) == find(n)) for n in nodes}

    edges_df = spark.createDataFrame(
        edges or [(0, 0)], "src LONG, dst LONG"  # empty DF needs a row; (0,0) is a no-op self-loop
    )
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "node LONG")
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges_df, nodes_df).collect()
    }
    assert got == want
    # Path equivalence: threshold 0 forces the distributed iterative
    # loop; its labeling must be identical to the driver union-find
    # fast path taken above.
    got_iter = {
        r["node"]: r["label"]
        for r in connected_components(
            edges_df, nodes_df, driver_edge_threshold=0
        ).collect()
    }
    assert got_iter == want


@given(
    arrays=st.lists(
        st.lists(st.integers(0, 9), min_size=0, max_size=5), min_size=0, max_size=12
    )
)
@SETTINGS
def test_explode_conservation(spark, arrays):
    """sum(size(arr)) == row count after explode (N1 conservation);
    explode_outer adds exactly one row per empty/missing array."""
    data = [(i, a) for i, a in enumerate(arrays)]
    df = spark.createDataFrame(data, "id INT, arr ARRAY<INT>")
    exploded = df.select("id", F.explode("arr"))
    total = df.agg(F.coalesce(F.sum(F.size("arr")), F.lit(0))).first()[0]
    assert exploded.count() == total
    outer = df.select("id", F.explode_outer("arr"))
    n_empty = df.where(F.size("arr") == 0).count()
    assert outer.count() == total + n_empty


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=20
    )
)
@SETTINGS
def test_zorder_matches_python_morton(spark, pts):
    """zorder_value == a bit-by-bit Python Morton interleave for any
    pair of non-negative ints within the bit budget (the JVM aggregate
    expression has no off-by-one in shift positions)."""
    from shopify_youtube_etl_spark.operators.scale import zorder_value

    def morton(x, y, bits=8):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], "id INT, x INT, y INT"
    )
    got = {
        r["id"]: r["z"]
        for r in df.select("id", zorder_value("x", "y", bits=8).alias("z")).collect()
    }
    want = {i: morton(x, y) for i, (x, y) in enumerate(pts)}
    assert got == want


@given(
    large=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 99)), min_size=0, max_size=25
    ),
    small=st.lists(
        st.tuples(st.integers(0, 3), st.text("ab", max_size=2)),
        min_size=0,
        max_size=6,
    ),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
@SETTINGS
def test_salted_join_equals_plain_join(spark, large, small, how):
    """salted_join is row-identical (as a multiset) to the plain join
    for every supported join type, including duplicate keys on both
    sides and keys present on only one side."""
    from shopify_youtube_etl_spark.operators.scale import salted_join

    ldf = spark.createDataFrame(large or [(99, 0)], "key INT, v INT")
    sdf = spark.createDataFrame(small or [(98, "x")], "key INT, tag STRING")
    got = salted_join(ldf, sdf, "key", salt_buckets=4, how=how)
    want = ldf.join(sdf, "key", how)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=20
    )
)
@SETTINGS
# full lane: ~33s 8-example property sweep; pagerank stays
# default-covered by the pagerank_nation_trade oracle-parity test.
@pytest.mark.full
def test_pagerank_matches_power_iteration(spark, edges):
    """Distributed pagerank == a dense numpy power iteration on random
    directed graphs with duplicate edges, self-loops, and dangling
    nodes (nodes with in-edges but no out-edges)."""
    import numpy as np

    from shopify_youtube_etl_spark.operators.components import pagerank

    d, iters = 0.85, 4
    # Collapse duplicates into weights, exactly like a groupBy would.
    w = {}
    for a, b in edges:
        w[(a, b)] = w.get((a, b), 0) + 1
    nodes = sorted({x for e in w for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for (a, b), wt in w.items():
        P[idx[a], idx[b]] = wt
    out = P.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if out[i] > 0:
                contrib += r[i] * P[i] / out[i]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)

    edges_df = spark.createDataFrame(
        [(a, b, float(wt)) for (a, b), wt in w.items()],
        "src LONG, dst LONG, weight DOUBLE",
    )
    got = {
        row["node"]: row["rank"]
        for row in pagerank(edges_df, damping=d, iterations=iters).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])


def test_pagerank_empty_edges(spark):
    """No edges → no nodes → empty (node, rank) frame, not a
    ZeroDivisionError at plan-construction time."""
    from shopify_youtube_etl_spark.operators.components import pagerank

    empty = spark.createDataFrame([], "src LONG, dst LONG, weight DOUBLE")
    out = pagerank(empty)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


@given(old=rows_st, new=rows_st)
@SETTINGS
def test_change_feed_complete_and_minimal(spark, old, new):
    """For ANY two table states: replaying change_feed(v0→v1) over v0
    reproduces v1 exactly (complete), and the feed contains ONLY keys
    that actually changed (minimal)."""
    import shutil
    import tempfile

    from shopify_youtube_etl_spark.operators.upsert import (
        ParquetTable,
        apply_changes,
    )

    v0 = dedup_keep_first(_df(spark, old), ["k"], order_col="seq").drop("seq")
    v1 = dedup_keep_first(_df(spark, new), ["k"], order_col="seq").drop("seq")
    d = tempfile.mkdtemp(prefix="cf_prop_")
    try:
        tbl = ParquetTable(spark, d)
        tbl.overwrite(v0)
        tbl.overwrite(v1)
        s0, s1 = tbl.history()[-2], tbl.history()[-1]
        feed = tbl.change_feed(s0, s1, keys=["k"]).collect()
        o = {r["k"]: r["v"] for r in v0.collect()}
        n = {r["k"]: r["v"] for r in v1.collect()}
        changed = {
            k for k in o.keys() | n.keys() if o.get(k, object()) != n.get(k, object())
        }
        assert {r["k"] for r in feed} == changed  # minimal
        for r in feed:
            want = "I" if r["k"] not in o else "D" if r["k"] not in n else "U"
            assert r["op"] == want
        feed_df = spark.createDataFrame(
            [(r["op"], r["k"], r["v"]) for r in feed] or [],
            "op STRING, k INT, v INT",
        )
        replayed = apply_changes(
            tbl.read_version(s0),
            feed_df.withColumn(
                "op", F.when(F.col("op") == "D", "D").otherwise("U")
            ),
            keys=["k"],
        )
        assert sorted((r["k"], r["v"]) for r in replayed.collect()) == sorted(
            n.items()
        )  # complete
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(-(2**31), 2**31 - 1),
            st.text(
                st.characters(
                    codec="utf-8", exclude_categories=("Cs",), exclude_characters="\x00"
                ),
                max_size=12,
            ),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.booleans(),
        ),
        min_size=1,
        max_size=10,
    )
)
@SETTINGS
def test_variant_roundtrip_any_typed_row(spark, rows):
    """parse_json → variant_get is lossless for arbitrary ints, unicode
    strings (quotes, backslashes, astral plane), float32-representable
    doubles, and an OPTIONAL key (present only when flag is true —
    try_variant_get must yield NULL exactly on the absent rows)."""
    import json

    data = [
        (
            i,
            json.dumps(
                {"k": k, "s": s, "v": v, **({"opt": s} if flag else {})},
                ensure_ascii=False,
            ),
            k,
            s,
            v,
            flag,
        )
        for i, (k, s, v, flag) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "id INT, j STRING, k LONG, s STRING, v DOUBLE, flag BOOLEAN"
    )
    got = df.select(
        "id",
        "k",
        "s",
        "v",
        "flag",
        F.parse_json("j").alias("var"),
    ).select(
        "id",
        (F.variant_get("var", "$.k", "long") == F.col("k")).alias("k_ok"),
        (F.variant_get("var", "$.s", "string") == F.col("s")).alias("s_ok"),
        (F.variant_get("var", "$.v", "double") == F.col("v")).alias("v_ok"),
        (F.try_variant_get("var", "$.opt", "string").isNotNull() == F.col("flag")).alias(
            "opt_ok"
        ),
    )
    bad = got.where(~(F.col("k_ok") & F.col("s_ok") & F.col("v_ok") & F.col("opt_ok"))).collect()
    assert not bad, bad


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**9),
            st.text(
                st.characters(
                    codec="utf-8",
                    exclude_categories=("Cs", "Cc"),
                    exclude_characters="\x00",
                ),
                min_size=1,
                max_size=10,
            ).filter(lambda s: s.strip() == s and s.strip() != ""),
            st.integers(-(2**62), 2**62),
        ),
        min_size=1,
        max_size=10,
    )
)
@SETTINGS
def test_xml_roundtrip_any_typed_row(spark, rows, tmp_path_factory):
    """XML write → explicit-schema read is a multiset identity for ids,
    markup-hostile unicode strings (&, <, >, quotes — the escaping
    cases), and full-range longs.  Leading/trailing-whitespace and
    empty strings are excluded: the XML source's documented contract
    (matching csv_roundtrip_ingest's boundary) is that such payloads
    belong in parquet/NDJSON."""
    d = str(tmp_path_factory.mktemp("xmlprop"))
    df = spark.createDataFrame(rows, "id LONG, s STRING, v LONG")
    df.write.mode("overwrite").option("rootTag", "rs").option("rowTag", "r").xml(d)
    back = spark.read.schema("id LONG, s STRING, v LONG").option("rowTag", "r").xml(d)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))


@given(
    xs=st.lists(
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=25,
    )
)
@SETTINGS
def test_cusum_window_identity_matches_recursion(spark, xs):
    """The reflected-walk identity cusum_daily_drift relies on:
    S_t = C_t − min(0, min_{j<t} C_j) (C = prefix sum of deviations)
    must equal the textbook recursion S_t = max(0, S_{t−1} + y_t) on
    any series — the lower-side mirror likewise."""
    from pyspark.sql.window import Window

    ys = [float(x) for x in xs]
    # Textbook sequential recursions.
    s_up_ref, s_dn_ref, up, dn = [], [], 0.0, 0.0
    for y in ys:
        up = max(0.0, up + y)
        dn = max(0.0, dn - y)
        s_up_ref.append(up)
        s_dn_ref.append(dn)

    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "i INT, y DOUBLE"
    )
    run = Window.orderBy("i")
    prev = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    c = df.select(
        "i",
        F.sum("y").over(run).alias("c_up"),
        F.sum(-F.col("y")).over(run).alias("c_dn"),
    )
    out = c.select(
        "i",
        (F.col("c_up") - F.least(F.lit(0.0), F.min("c_up").over(prev))).alias(
            "s_up"
        ),
        (F.col("c_dn") - F.least(F.lit(0.0), F.min("c_dn").over(prev))).alias(
            "s_dn"
        ),
    ).orderBy("i")
    got = out.collect()
    for r, eu, ed in zip(got, s_up_ref, s_dn_ref):
        assert abs(r["s_up"] - eu) < 1e-6, (r["i"], r["s_up"], eu)
        assert abs(r["s_dn"] - ed) < 1e-6, (r["i"], r["s_dn"], ed)


@given(
    xs=st.lists(
        st.floats(0.015625, 100, allow_nan=False, allow_infinity=False),
        min_size=2,
        max_size=20,
    )
)
@SETTINGS
def test_gini_rank_formula_matches_pairwise(spark, xs):
    """gini_segment_inequality's rank formula
    G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) must equal the pairwise
    definition Σ|x_i − x_j| / (2·n²·mean) — including under ties."""
    from pyspark.sql.window import Window

    vals = [float(x) for x in xs]
    n = len(vals)
    mean = sum(vals) / n
    pairwise = sum(abs(a - b) for a in vals for b in vals) / (2 * n * n * mean)

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i INT, x DOUBLE"
    )
    r = df.select(
        "x", F.row_number().over(Window.orderBy("x", "i")).alias("rk")
    )
    row = r.agg(
        (
            (2.0 * F.sum(F.col("rk") * F.col("x")) - (F.count("*") + 1) * F.sum("x"))
            / (F.count("*") * F.sum("x"))
        ).alias("g")
    ).collect()[0]
    assert abs(row["g"] - pairwise) < 1e-6, (row["g"], pairwise)


@given(segs=st.lists(rows_st, min_size=1, max_size=3), batch=rows_st)
@SETTINGS
def test_upsert_matching_equals_logical_upsert(spark, segs, batch):
    """The physical segment-pruned MERGE (``ParquetTable.upsert_matching``,
    the write path every IVM state store commits through) must equal the
    logical ``upsert()`` over the same frames by value, for ARBITRARY
    multi-segment bases (duplicate keys across segments included) and
    batches — pruning may only skip segments that provably hold no
    matched key, never change the result."""
    import shutil
    import tempfile

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    d = tempfile.mkdtemp(prefix="sye_prop_um_")
    try:
        tbl = ParquetTable(spark, d + "/t")
        for s in segs:
            tbl.append(_df(spark, s), stats_cols=["k"])
        b = _df(spark, batch)
        want = sorted(
            map(tuple, upsert(tbl.read(), b, ["k"], order_col="seq").collect())
        )
        tbl.upsert_matching(b, ["k"], order_col="seq")
        got = sorted(map(tuple, tbl.read().collect()))
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(
    segs=st.lists(rows_st, min_size=1, max_size=3),
    doomed=st.lists(st.integers(0, 4), min_size=0, max_size=5),
)
@SETTINGS
def test_delete_matching_equals_logical_anti_join(spark, segs, doomed):
    """The segment-pruned join-shaped DELETE must equal a left-anti join
    of the doomed key set by value, for arbitrary multi-segment bases,
    and must report exactly the number of rows it removed."""
    import shutil
    import tempfile

    from shopify_youtube_etl_spark.operators.upsert import ParquetTable

    d = tempfile.mkdtemp(prefix="sye_prop_dm_")
    try:
        tbl = ParquetTable(spark, d + "/t")
        for s in segs:
            tbl.append(_df(spark, s), stats_cols=["k"])
        keys = spark.createDataFrame([(k,) for k in doomed] or [(-99,)], "k INT")
        before = tbl.read().count()
        want = sorted(
            map(tuple, tbl.read().join(keys, "k", "left_anti").collect())
        )
        n = tbl.delete_matching(keys, on="k")
        got = sorted(map(tuple, tbl.read().collect()))
        assert got == want
        assert n == before - len(got)
    finally:
        shutil.rmtree(d, ignore_errors=True)

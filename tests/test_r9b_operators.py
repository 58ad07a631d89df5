"""Round-9 continuation operators: graph analytics (triangle census) and the
deterministic KMV / merged-Misra-Gries sketches.

Every pin here is the property the driver oracle can't see: partition
stability (the sketch is the same under any physical partitioning), exact
small-set degeneration, and hand-checkable graph counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import graph, sketches

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------

def test_kmv_sketch_partition_stable(spark):
    """The k-min sketch is identical under any physical partitioning — the
    two-level tournament prunes per partition but the global k-min of
    per-partition k-mins is exact."""
    rows = [("s", f"v{i}") for i in range(500)] + [("t", f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    a = sketches.kmv_sketch(df.repartition(3), "grp", "val", 32)
    b = sketches.kmv_sketch(df.repartition(17), "grp", "val", 32)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len([r for r in ra if r[0] == "s"]) == 32
    assert len([r for r in ra if r[0] == "t"]) == 32


def test_kmv_sketch_matches_python_reference(spark):
    """The sketch IS the k smallest (md5-32bit, value) pairs over distinct
    values — recomputed in plain Python."""
    import hashlib

    vals = [f"item-{i}" for i in range(300)]
    df = spark.createDataFrame([("g", v) for v in vals * 2], ["grp", "val"])
    k = 16
    got = sorted(
        (r["value"], r["hv"])
        for r in sketches.kmv_sketch(df, "grp", "val", k).collect()
    )
    ref = sorted(
        (int(hashlib.md5(v.encode()).hexdigest()[:8], 16), v) for v in set(vals)
    )[:k]
    assert got == sorted((v, h) for h, v in ref)


def test_kmv_estimate_exact_below_k_and_bounded_above(spark):
    """n < k degrades to the exact count; n >= k estimates within the
    documented 4-sigma band on this fixture."""
    small = spark.createDataFrame([("g", f"v{i}") for i in range(10)], ["g", "v"])
    est = sketches.kmv_distinct_estimate(
        sketches.kmv_sketch(small, "g", "v", 64), "g", 64
    ).first()
    assert est["n_slots"] == 10 and est["est_distinct"] == 10.0

    big = spark.createDataFrame([("g", f"v{i}") for i in range(5000)], ["g", "v"])
    est = sketches.kmv_distinct_estimate(
        sketches.kmv_sketch(big, "g", "v", 256), "g", 256
    ).first()
    assert abs(est["est_distinct"] / 5000.0 - 1.0) <= 4.0 / (256 - 2) ** 0.5


# ---------------------------------------------------------------------------
# Misra-Gries merged summary
# ---------------------------------------------------------------------------

def _mg_reference(bags: dict[int, list[str]], k: int) -> dict[str, int]:
    """Plain-Python optimal-offset MG per sub-bag, merged by summing."""
    from collections import Counter

    merged: Counter = Counter()
    for items in bags.values():
        c = Counter(items)
        counts = sorted(c.values(), reverse=True)
        off = counts[k] if len(counts) > k else 0
        for v, n in c.items():
            if n - off > 0:
                merged[v] += n - off
    return dict(merged)


def test_mg_summary_matches_python_reference(spark):
    """The DataFrame MG prune+merge equals the plain-Python optimal-offset
    reference on a skewed bag, and both MG guarantees hold."""
    from collections import Counter

    items = (
        ["hot"] * 400 + ["warm"] * 120 + ["mild"] * 40
        + [f"cold{i}" for i in range(200)] * 2
    )
    rows = [(i % 5, v) for i, v in enumerate(items)]
    bags: dict[int, list[str]] = {}
    for p, v in rows:
        bags.setdefault(p, []).append(v)
    k = 8
    ref = _mg_reference(bags, k)

    df = spark.createDataFrame(rows, ["p", "v"])
    counts = df.groupBy("p", "v").agg(F.count(F.lit(1)).alias("c"))
    got = {
        r["value"]: r["est_cnt"]
        for r in sketches.mg_summary_merged(counts, "p", "v", "c", k).collect()
    }
    assert got == ref

    exact = Counter(items)
    n = len(items)
    for v, est in got.items():
        assert est <= exact[v]
        assert (k + 1) * (exact[v] - est) <= n
    # the genuinely-heavy items always survive the prune
    assert "hot" in got and "warm" in got


def test_mg_summary_partitioning_of_rows_is_irrelevant(spark):
    """Physical repartitioning never changes the summary — only the sub-bag
    COLUMN defines the MG structure."""
    rows = [(i % 3, f"v{i % 37}") for i in range(1000)]
    df = spark.createDataFrame(rows, ["p", "v"])
    out = []
    for parts in (2, 13):
        counts = (
            df.repartition(parts)
            .groupBy("p", "v")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        out.append(
            sorted(
                map(tuple, sketches.mg_summary_merged(counts, "p", "v", "c", 5).collect())
            )
        )
    assert out[0] == out[1]


# ---------------------------------------------------------------------------
# graph: triangle census
# ---------------------------------------------------------------------------

def test_triangle_stats_hand_checked(spark):
    """Two triangles sharing edge (2,3): vertices {1,2,3,4}, degrees
    2,3,3,2 -> wedges 1+3+3+1 = 8, triangles 2, clustering 3*2/8 = 0.75."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)], ["src", "dst"]
    )
    row = graph.triangle_stats(edges).first()
    assert row["n_vertices"] == 4
    assert row["n_edges"] == 5
    assert row["n_wedges"] == 8
    assert row["n_triangles"] == 2
    assert row["global_clustering"] == 0.75


def test_triangle_stats_matches_bruteforce_on_testdata(spark):
    """Degree-oriented count == brute-force triple enumeration on the real
    co-occurrence graph at sf0.001."""
    from itertools import combinations

    from iceberg_ingestion_spark.queries import read_table

    l = read_table(spark, SF, "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey")
    adj: dict[int, set[int]] = {}
    es = {(r["src"], r["dst"]) for r in edges.collect()}
    for s, t in es:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    brute = sum(
        1
        for v, ns in adj.items()
        for a, b in combinations(sorted(ns), 2)
        if a > v and b > v and b in adj.get(a, ())
    )
    row = graph.triangle_stats(edges).first()
    assert row["n_triangles"] == brute
    assert row["n_edges"] == len(es)


def test_degree_oriented_is_an_acyclic_total_order_orientation(spark):
    """Every undirected edge appears exactly once, oriented low->high in the
    (degree, id) total order — so the oriented graph is a DAG."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 5)], ["src", "dst"]
    )
    deg = {r["v"]: r["d"] for r in graph.vertex_degrees(edges).collect()}
    o = [(r["s"], r["t"]) for r in graph.degree_oriented(edges).collect()]
    assert len(o) == 6
    for s, t in o:
        assert (deg[s], s) < (deg[t], t)


def test_bfs_min_hops_matches_python_reference(spark):
    """Distributed frontier BFS == plain-Python BFS min-hop labels on the
    real co-occurrence graph at sf0.001 (single seed), including the
    max_hop truncation."""
    from collections import deque

    from iceberg_ingestion_spark.queries import read_table

    l = read_table(spark, SF, "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey")
    es = [(r["src"], r["dst"]) for r in edges.collect()]
    adj: dict[int, set[int]] = {}
    for s, t in es:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    seeds = sorted(v for v in adj if v % 199 == 0)
    assert seeds, "fixture must contain at least one seed"
    ref = {v: 0 for v in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if ref[v] >= 2:
            continue
        for n in adj[v]:
            if n not in ref:
                ref[n] = ref[v] + 1
                q.append(n)

    seed_df = spark.createDataFrame([(v,) for v in seeds], ["v"])
    got = {
        r["v"]: r["hop"]
        for r in graph.bfs_min_hops(edges, seed_df, 2).collect()
    }
    assert got == ref


def test_bfs_min_hops_drains_early_on_isolated_seed(spark):
    """A seed with no edges stays hop 0 and the loop exits on the empty
    frontier instead of running max_hop rounds."""
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["v"])
    got = sorted(map(tuple, graph.bfs_min_hops(edges, seeds, 5).collect()))
    assert got == [(99, 0)]


# ---------------------------------------------------------------------------
# streamed KMV maintenance
# ---------------------------------------------------------------------------

def _drain_kmv(spark, feed, schema, table, ckpt, k=32):
    from iceberg_ingestion_spark.streaming.kmv_stream import stream_kmv_sketch

    q = stream_kmv_sketch(spark, feed, schema, table, ckpt, "grp", "val", k)
    assert q.awaitTermination(300)


def test_stream_kmv_split_equals_batch_and_redelivery_noop(spark, tmp_path):
    """Any micro-batch split folds to the batch sketch (mergeable summary),
    and reprocessing the full feed against a FRESH checkpoint (worst-case
    redelivery) leaves the table unchanged."""
    rows = [("g", f"v{i}") for i in range(400)] + [("h", f"v{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    batch = sorted(map(tuple, sketches.kmv_sketch(df, "grp", "val", 32).collect()))

    feed = str(tmp_path / "feed")
    table = str(tmp_path / "sketch")
    for r in (0, 1, 2):
        part = df.where(F.crc32(F.col("val")) % 3 == r)
        part.coalesce(1).write.mode("append").parquet(feed)
        _drain_kmv(spark, feed, df.schema, table, str(tmp_path / "ckpt"))
    streamed = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert streamed == batch

    # redelivery: a fresh checkpoint reprocesses every file — idempotent
    _drain_kmv(spark, feed, df.schema, table, str(tmp_path / "ckpt2"))
    assert sorted(map(tuple, spark.read.parquet(table).collect())) == batch


def test_kmv_merge_equals_sketch_of_union(spark):
    """kmin(kmin(A) ∪ kmin(B)) == kmin(A ∪ B) — the mergeability identity."""
    a = spark.createDataFrame([("g", f"a{i}") for i in range(200)], ["grp", "val"])
    b = spark.createDataFrame([("g", f"b{i}") for i in range(200)], ["grp", "val"])
    k = 16
    merged = sorted(
        map(
            tuple,
            sketches.kmv_merge(
                sketches.kmv_sketch(a, "grp", "val", k),
                sketches.kmv_sketch(b, "grp", "val", k),
                "grp",
                k,
            ).collect(),
        )
    )
    union = sorted(
        map(tuple, sketches.kmv_sketch(a.unionAll(b), "grp", "val", k).collect())
    )
    assert merged == union


def test_triangle_delta_equals_census_difference(spark):
    """Exact IVM: for a real edge split, delta == census(union) − census(old)
    — across three md5-split increments of the sf0.001 co-occurrence graph."""
    from iceberg_ingestion_spark.operators.text import hex_to_long
    from iceberg_ingestion_spark.queries import read_table

    l = read_table(spark, SF, "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey").localCheckpoint()
    coin = hex_to_long(F.md5(F.concat_ws(":", "src", "dst")), 9, 8) % 3
    parts = [edges.where(coin == r).localCheckpoint() for r in (0, 1, 2)]

    acc = parts[0]
    t = graph.triangle_stats(acc).first()["n_triangles"]
    for delta_part in parts[1:]:
        d = graph.triangle_delta(acc, delta_part).first()["n_new_triangles"]
        acc = acc.unionByName(delta_part).localCheckpoint()
        t_expected = graph.triangle_stats(acc).first()["n_triangles"]
        t += d
        assert t == t_expected
    # final total equals the one-shot batch census of the full graph
    assert t == graph.triangle_stats(edges).first()["n_triangles"]


def test_triangle_delta_dedupes_redelivered_edges(spark):
    """Edges already in the accumulated set contribute nothing (anti-join
    guard), so redelivering an increment is a no-op."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )
    d = graph.triangle_delta(edges, edges).first()["n_new_triangles"]
    assert d == 0


def test_edge_sample_md5_is_deterministic_subset(spark):
    """The DOULION coin is a pure function of the edge: the sample is a
    subset, identical across invocations and partitionings, and matches the
    plain-Python md5 draw."""
    import hashlib

    from iceberg_ingestion_spark.queries import read_table

    l = read_table(spark, SF, "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey").localCheckpoint()
    got = {
        (r["src"], r["dst"])
        for r in graph.edge_sample_md5(edges.repartition(7), 4).collect()
    }
    alle = {(r["src"], r["dst"]) for r in edges.collect()}
    ref = {
        (s, t)
        for (s, t) in alle
        if int(hashlib.md5(f"{s}:{t}".encode()).hexdigest()[:8], 16) % 4 == 0
    }
    assert got == ref and got <= alle


def test_kmv_intersection_entry_empty_universe_matches_oracle_shape(spark):
    """With an empty element universe the entry still emits exactly ONE row
    (degenerate estimates, within_bound TRUE via the n_slots < K branch) —
    the oracle's aggregate row shape. Guards the groupBy-vs-agg hazard."""
    import duckdb

    from iceberg_ingestion_spark.queries_ext_oracles import ORACLES_EXT
    from iceberg_ingestion_spark.queries_graph import q_sketch_kmv_intersection

    import os
    import tempfile

    root = tempfile.mkdtemp(prefix="kmv_empty_")
    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    ev.write.parquet(os.path.join(root, "events.parquet"))
    rows = q_sketch_kmv_intersection(spark, root).collect()
    assert len(rows) == 1
    assert rows[0]["n_both"] == 0 and rows[0]["within_bound"] is True

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(root, 'events.parquet')}/*.parquet'"
    )
    orc = con.sql(ORACLES_EXT["sketch_kmv_intersection"]).fetchall()
    assert len(orc) == 1 and orc[0][0] == 0


# ---------------------------------------------------------------------------
# property tests (hypothesis): the sketch invariants over GENERATED inputs
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

SKETCH_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_bag = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),
              st.integers(min_value=0, max_value=40)),
    min_size=0, max_size=120,
)


@SKETCH_SETTINGS
@given(rows=_bag)
def test_prop_mg_guarantees_hold_on_arbitrary_bags(spark, rows):
    """For ANY sub-bag assignment and bag contents: est <= true and
    (k+1)*(true - est) <= N, and the summary equals the plain-Python
    optimal-offset reference."""
    from collections import Counter

    k = 4
    bags: dict[int, list[str]] = {}
    data = [(p, f"v{v}") for p, v in rows]
    for p, v in data:
        bags.setdefault(p, []).append(v)
    ref = _mg_reference(bags, k)

    if not data:
        return
    df = spark.createDataFrame(data, ["p", "v"])
    counts = df.groupBy("p", "v").agg(F.count(F.lit(1)).alias("c"))
    got = {
        r["value"]: r["est_cnt"]
        for r in sketches.mg_summary_merged(counts, "p", "v", "c", k).collect()
    }
    assert got == ref
    exact = Counter(v for _, v in data)
    n = len(data)
    for v, est in got.items():
        assert 0 < est <= exact[v]
        assert (k + 1) * (exact[v] - est) <= n


@SKETCH_SETTINGS
@given(rows=st.lists(st.integers(min_value=0, max_value=300),
                     min_size=0, max_size=150),
       cut=st.integers(min_value=0, max_value=150))
def test_prop_kmv_merge_is_sketch_of_union(spark, rows, cut):
    """kmin(kmin(A) ∪ kmin(B)) == kmin(A ∪ B) for ANY split point — the
    mergeability identity the streamed maintenance rests on."""
    k = 8
    a_rows = [("g", f"v{v}") for v in rows[:cut]]
    b_rows = [("g", f"v{v}") for v in rows[cut:]]
    schema = "grp string, val string"
    df_all = spark.createDataFrame(a_rows + b_rows or [("g", "v0")], schema)
    union = sorted(map(tuple, sketches.kmv_sketch(df_all, "grp", "val", k).collect()))
    if not a_rows or not b_rows:
        return
    merged = sorted(
        map(
            tuple,
            sketches.kmv_merge(
                sketches.kmv_sketch(spark.createDataFrame(a_rows, schema), "grp", "val", k),
                sketches.kmv_sketch(spark.createDataFrame(b_rows, schema), "grp", "val", k),
                "grp",
                k,
            ).collect(),
        )
    )
    assert merged == union

"""Round-10 operators: the persisted incremental triangle index (frozen
(initial-degree, id) orientation, Δ-bounded updates), the crash-safe
atomic-pointer state tables, and the streamed Misra-Gries maintainer.

The pins here are the properties the driver oracle can't see: the index
path agrees with both the one-shot census and the non-indexed
``triangle_delta`` across degree-skewing increments (which would flip a
degree-maintained orientation — the frozen order must stay exact anyway)
and brand-new vertices; the streamed state tables survive a stale
half-written version dir (simulated crash) without losing state; and the
streamed MG summary keeps both guarantees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import graph, sketches

SF = "/root/testdata/sf0.001"


def _census(spark, edges):
    return graph.triangle_stats(edges).first()["n_triangles"]


def test_triangle_index_chained_equals_batch_census(spark, tmp_path):
    """Three md5-split increments of the sf0.001 co-occurrence graph through
    the PERSISTED index reproduce the one-shot batch census exactly, and
    each day's delta equals the census difference (the triangle_delta pin,
    now for the Δ-bounded path)."""
    from iceberg_ingestion_spark.operators.text import hex_to_long
    from iceberg_ingestion_spark.queries import read_table

    l = read_table(spark, SF, "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey").localCheckpoint()
    coin = hex_to_long(F.md5(F.concat_ws(":", "src", "dst")), 9, 8) % 3
    parts = [edges.where(coin == r).localCheckpoint() for r in (0, 1, 2)]

    root = str(tmp_path / "idx")
    t = graph.triangle_index_init(spark, parts[0], root).first()["n_triangles"]
    assert t == _census(spark, parts[0])
    acc = parts[0]
    for day, delta in enumerate(parts[1:], start=1):
        d = graph.triangle_index_update(
            spark, root, day, delta, assume_new=True
        ).first()["n_new_triangles"]
        acc = acc.unionByName(delta).localCheckpoint()
        t += d
        assert t == _census(spark, acc)
    assert t == _census(spark, edges)


def test_triangle_index_orientation_flips_and_new_vertices(spark, tmp_path):
    """A Δ that inflates one vertex's degree — the case that FLIPS a
    degree-maintained orientation; the frozen order must stay exact without
    any repair — plus brand-new vertices; every closed-triangle case
    (new-new-new, old-old-new-close, old-new mixes) appears. Hand-built so
    each day is checkable against the census."""
    day0 = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (2, 5)], ["src", "dst"]
    )
    # d(3): 2 -> 6 flips (2,3) and (1,3); new vertices 6..9; triangles:
    # {3,6,7} (all-new), {2,4,5} (two old + new close), {1,2,4} (mixed)
    day1 = spark.createDataFrame(
        [(3, 6), (3, 7), (3, 8), (3, 9), (6, 7), (4, 5), (1, 4)],
        ["src", "dst"],
    )
    # flip back pressure on vertex 6 + another mixed triangle {3,6,8}
    day2 = spark.createDataFrame(
        [(6, 8), (6, 9), (1, 6), (2, 6)], ["src", "dst"]
    )
    root = str(tmp_path / "idx")
    t = graph.triangle_index_init(spark, day0, root).first()["n_triangles"]
    assert t == 1
    acc = day0
    for day, delta in enumerate([day1, day2], start=1):
        expected = graph.triangle_delta(acc, delta).first()["n_new_triangles"]
        got = graph.triangle_index_update(
            spark, root, day, delta, assume_new=True
        ).first()["n_new_triangles"]
        assert got == expected
        acc = acc.unionByName(delta).localCheckpoint()
        t += got
        assert t == _census(spark, acc)


def test_triangle_index_dedupes_redelivered_edges(spark, tmp_path):
    """Without ``assume_new``, a redelivered increment anti-joins against
    the persisted edge log and contributes nothing."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"])
    root = str(tmp_path / "idx")
    graph.triangle_index_init(spark, edges, root)
    d = graph.triangle_index_update(spark, root, 1, edges).first()[
        "n_new_triangles"
    ]
    assert d == 0


def test_stream_kmv_table_is_atomic_pointer(spark, tmp_path):
    """The sketch table is a symlink repointed per batch: after each drain
    the path resolves to a complete versioned dir, a stale half-written
    version dir from a simulated crash is reclaimed on redelivery, and the
    superseded version is garbage-collected after the swap."""
    import os

    from iceberg_ingestion_spark.streaming.kmv_stream import stream_kmv_sketch

    rows = [("g", f"v{i}") for i in range(300)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    # simulated crash artifact: a garbage version dir for the first batch id
    os.makedirs(f"{table}.v0")
    with open(f"{table}.v0/garbage", "w") as fh:
        fh.write("partial write from a crashed attempt")

    df.where(F.col("val") < "v2").write.mode("append").parquet(feed)
    q = stream_kmv_sketch(spark, feed, df.schema, table, ckpt, "grp", "val", 32)
    assert q.awaitTermination(300)
    assert os.path.islink(table)
    first_target = os.path.realpath(table)
    assert not os.path.exists(f"{table}.v0/garbage")

    df.where(F.col("val") >= "v2").write.mode("append").parquet(feed)
    q = stream_kmv_sketch(spark, feed, df.schema, table, ckpt, "grp", "val", 32)
    assert q.awaitTermination(300)
    assert os.path.islink(table)
    assert os.path.realpath(table) != first_target
    assert not os.path.exists(first_target)  # superseded version reclaimed

    streamed = sorted(map(tuple, spark.read.parquet(table).collect()))
    batch = sorted(map(tuple, sketches.kmv_sketch(df, "grp", "val", 32).collect()))
    assert streamed == batch


def test_stream_kmv_migrates_legacy_in_place_table(spark, tmp_path):
    """A pre-existing REAL directory (the old in-place layout) is read as
    the previous state and migrated to the pointer layout on the next
    batch — merged sketch identical to the one-shot batch sketch."""
    import os

    from iceberg_ingestion_spark.streaming.kmv_stream import stream_kmv_sketch

    rows = [("g", f"v{i}") for i in range(200)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    old = df.where(F.col("val") < "v15")
    new = df.where(F.col("val") >= "v15")
    table = str(tmp_path / "sketch")
    sketches.kmv_sketch(old, "grp", "val", 32).write.parquet(table)
    assert not os.path.islink(table)

    feed = str(tmp_path / "feed")
    new.write.parquet(feed)
    q = stream_kmv_sketch(
        spark, feed, df.schema, table, str(tmp_path / "ckpt"), "grp", "val", 32
    )
    assert q.awaitTermination(300)
    assert os.path.islink(table)
    streamed = sorted(map(tuple, spark.read.parquet(table).collect()))
    batch = sorted(map(tuple, sketches.kmv_sketch(df, "grp", "val", 32).collect()))
    assert streamed == batch


def _mg_batch(spark, counts, k):
    from iceberg_ingestion_spark.operators.sketches import mg_summary_merged

    return sorted(
        map(tuple, mg_summary_merged(counts, "p", "value", "c", k).collect())
    )


def test_stream_mg_split_equals_batch_and_redelivery_noop(spark, tmp_path):
    """Any grouping of WHOLE sub-bags into micro-batches folds to the batch
    merged-MG summary exactly (counter addition is associative/commutative),
    and reprocessing the full feed against a FRESH checkpoint (worst-case
    redelivery) is a no-op via the applied-sub-bag ledger."""
    import os

    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.streaming.mg_stream import stream_mg_summary

    rows = [(i % 7, f"v{i % 23}", 1 + i % 5) for i in range(400)]
    counts = (
        spark.createDataFrame(rows, ["p", "value", "c"])
        .groupBy("p", "value")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint()
    )
    k = 4
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "mg")
    ckpt = str(tmp_path / "ckpt")
    for r in (0, 1, 2):
        counts.where(F.col("p") % 3 == r).coalesce(1).write.mode("append").parquet(feed)
        q = stream_mg_summary(
            spark, feed, counts.schema, table, ckpt, "p", "value", "c", k
        )
        assert q.awaitTermination(300)
    streamed = sorted(
        map(tuple, spark.read.parquet(os.path.join(table, "summary")).collect())
    )
    assert streamed == _mg_batch(spark, counts, k)
    # worst-case redelivery: full feed, fresh checkpoint, same state table
    q = stream_mg_summary(
        spark, feed, counts.schema, table, str(tmp_path / "ckpt2"), "p", "value", "c", k
    )
    assert q.awaitTermination(300)
    again = sorted(
        map(tuple, spark.read.parquet(os.path.join(table, "summary")).collect())
    )
    assert again == streamed
    assert os.path.islink(table)  # atomic pointer layout


def test_stream_mg_guarantees_hold_on_streamed_summary(spark, tmp_path):
    """Both MG guarantees hold on the PERSISTED streamed summary:
    est <= true and (k+1)*(true - est) <= N, integer-exact."""
    import os

    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.streaming.mg_stream import stream_mg_summary

    rows = [(i % 5, f"t{min(i % 37, i % 11)}", 1) for i in range(600)]
    counts = (
        spark.createDataFrame(rows, ["p", "value", "c"])
        .groupBy("p", "value")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint()
    )
    k = 3
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "mg")
    for r in (0, 1):
        counts.where(F.col("p") % 2 == r).coalesce(1).write.mode("append").parquet(feed)
        q = stream_mg_summary(
            spark, feed, counts.schema, table, str(tmp_path / "ckpt"),
            "p", "value", "c", k,
        )
        assert q.awaitTermination(300)
    est = {
        r["value"]: r["est_cnt"]
        for r in spark.read.parquet(os.path.join(table, "summary")).collect()
    }
    exact = {
        r["value"]: r["x"]
        for r in counts.groupBy("value").agg(F.sum("c").alias("x")).collect()
    }
    n = sum(exact.values())
    assert est  # non-degenerate
    for v, e in est.items():
        assert e <= exact[v]
        assert (k + 1) * (exact[v] - e) <= n


def test_census_3way_join_oracle_matches_engine():
    """The constant-memory 3-way-join census formulation that verifies the
    FULL sf1 graph (tools/census_full_check.py) agrees with the engine's
    array-intersection census — pinned here at sf0.001 (subprocess, the
    rotation-ledger convention) so the tool cannot drift from the operator."""
    import os
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "census_full_check.py"), SF],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MATCH" in out.stdout


def test_pagerank_fixed_integer_exact_and_partition_stable(spark):
    """The integer-scaled PR vector is identical under any physical
    partitioning (integer sums are order-independent — the whole point of
    the scaling), mass stays ~1 (floor loss ≤ iterations·V units of 1e-12),
    and the unrolled oracle matches the pinned iteration count."""
    from iceberg_ingestion_spark.queries_ext_oracles import ORACLES_EXT
    from iceberg_ingestion_spark.queries_graph import PR_ITERS

    assert PR_ITERS == 3
    sql = ORACLES_EXT["graph_pagerank"]
    assert "it3" in sql and "it4" not in sql  # unroll count == PR_ITERS

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 5)], ["src", "dst"]
    )
    a = sorted(map(tuple, graph.pagerank_fixed(edges, 3).collect()))
    b = sorted(
        map(tuple, graph.pagerank_fixed(edges.repartition(7), 3).collect())
    )
    assert a == b
    scale = 10**12
    total = sum(pr for _, pr in a)
    n = len(a)
    assert total <= scale
    assert scale - total <= 4 * (n + 1) * 100  # floor-loss bound, generous
    assert all(pr > 0 for _, pr in a)


def test_label_propagation_sync_deterministic_and_majority(spark):
    """The synchronized LPA rule is a pure function of the graph: identical
    under any partitioning, the oracle's unroll count matches LP_ITERS, and
    on a hand-built barbell (two triangles + one bridge) each triangle
    keeps its own min-label community after 2 rounds instead of collapsing
    into one component (the behavior that distinguishes LPA from CC)."""
    from iceberg_ingestion_spark.queries_ext_oracles import ORACLES_EXT
    from iceberg_ingestion_spark.queries_graph import LP_ITERS

    assert LP_ITERS == 2
    sql = ORACLES_EXT["graph_label_propagation"]
    assert "l2" in sql and "l3" not in sql  # unroll count == LP_ITERS

    barbell = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["src", "dst"],
    )
    a = sorted(map(tuple, graph.label_propagation_sync(barbell, 2).collect()))
    b = sorted(
        map(tuple, graph.label_propagation_sync(barbell.repartition(5), 2).collect())
    )
    assert a == b
    comms = {}
    for v, lbl in a:
        comms.setdefault(lbl, set()).add(v)
    assert {1, 2, 3} in comms.values()  # left triangle holds together
    assert any({5, 6} <= c and 1 not in c for c in comms.values())  # right side separate

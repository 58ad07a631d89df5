"""Round-11 pins: the pointer discipline's published-target protection
(ADVICE r10 high), the cooccurrence NULL-group contract, and the
id-type-generic triangle index.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import graph
from iceberg_ingestion_spark.streaming import pointer


def _write_state(vdir: str, payload: str) -> None:
    os.makedirs(vdir)
    with open(os.path.join(vdir, "state"), "w") as fh:
        fh.write(payload)


def test_pointer_never_reclaims_published_target(tmp_path):
    """ADVICE r10 high: a redelivered batch id whose plain version dir IS
    the live published target must not rmtree it — the claim moves to an
    attempt-suffixed dir, the live state stays readable throughout, and
    publish GCs by pointer (prev realpath), never by batch id."""
    table = str(tmp_path / "t")
    v0 = pointer.claim_version_dir(table, 0)
    assert v0 == f"{table}.v0"
    _write_state(v0, "state-from-batch-0")
    pointer.publish_version(table, v0, None)
    assert os.path.realpath(table) == os.path.realpath(v0)

    # crash landed between os.replace and the checkpoint commit: batch 0 is
    # redelivered while the pointer still targets .v0
    prev = pointer.current_version(table)
    v0b = pointer.claim_version_dir(table, 0)
    assert v0b != v0  # attempt-suffixed, NOT the live dir
    # the live state was untouched by the claim (the old bug rmtree'd it)
    with open(os.path.join(table, "state")) as fh:
        assert fh.read() == "state-from-batch-0"
    _write_state(v0b, "state-from-batch-0-retry")
    pointer.publish_version(table, v0b, prev)
    assert os.path.realpath(table) == os.path.realpath(v0b)
    assert not os.path.exists(v0)  # superseded target GC'd by pointer


def test_pointer_reclaims_stale_attempt_dir_but_not_live(tmp_path):
    """A half-written attempt-suffixed dir from a second crash is reclaimed
    on the next redelivery while the live target still survives."""
    table = str(tmp_path / "t")
    v0 = pointer.claim_version_dir(table, 0)
    _write_state(v0, "live")
    pointer.publish_version(table, v0, None)
    # crashed retry left a garbage attempt dir
    _write_state(f"{table}.v0.1", "partial")
    v = pointer.claim_version_dir(table, 0)
    assert v == f"{table}.v0.1"
    assert not os.path.exists(os.path.join(v, "state"))  # garbage reclaimed
    with open(os.path.join(table, "state")) as fh:
        assert fh.read() == "live"  # live target untouched


def test_cooccurrence_edges_drop_null_groups(spark):
    """NULL group keys contribute no edges (the pre-r10 self-join contract,
    ADVICE r10): items sharing only a NULL group must not be connected."""
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (None, 20), (None, 21), (None, 22)],
        "g int, item int",
    )
    edges = sorted(map(tuple, graph.cooccurrence_edges(df, "g", "item").collect()))
    assert edges == [(10, 11)]


def test_triangle_index_generic_vertex_id_types(spark, tmp_path):
    """The persisted triangle index works with non-bigint vertex ids
    (ADVICE r10: the empty-array literal is typed from the index schema,
    not hardcoded bigint) — string ids here, int-typed ids exercised by
    the hand-built fixtures in test_r10_operators."""
    day0 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("b", "d")], ["src", "dst"]
    )
    day1 = spark.createDataFrame([("c", "d"), ("a", "d")], ["src", "dst"])
    root = str(tmp_path / "idx")
    t = graph.triangle_index_init(spark, day0, root).first()["n_triangles"]
    assert t == 1
    d = graph.triangle_index_update(spark, root, 1, day1, assume_new=True).first()[
        "n_new_triangles"
    ]
    # {b,c,d} closes via (c,d); {a,b,d}+{a,c,d} close via (a,d)
    assert d == 3
    acc = day0.unionByName(day1)
    assert t + d == graph.triangle_stats(acc).first()["n_triangles"]


def test_pagerank_converged_stops_and_matches_fixed(spark):
    """The converged form stops at the first round whose max integer delta
    is <= tol, its vector equals pagerank_fixed run the same number of
    rounds (same kernel, same integers), an infinite tolerance stops after
    one round, a zero tolerance runs to the cap with converged=False, and
    the oracle unroll count matches PRC_MAX_ROUNDS."""
    from iceberg_ingestion_spark.queries_ext_oracles import ORACLES_EXT
    from iceberg_ingestion_spark.queries_graph import PRC_MAX_ROUNDS

    sql = ORACLES_EXT["graph_pagerank_converged"]
    assert f"it{PRC_MAX_ROUNDS}" in sql and f"it{PRC_MAX_ROUNDS + 1}" not in sql

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 5)], ["src", "dst"]
    )
    # on a 5-vertex graph deltas contract only at the 0.85 damping rate, so
    # the test tolerance is graph-sized (1e10 units ≈ 19 rounds); the graded
    # entry's 1e6 tolerance belongs to the dense driver corpora
    pr, rounds, conv = graph.pagerank_converged(edges, 10**10, 30)
    assert conv and 1 < rounds < 30
    fixed = graph.pagerank_fixed(edges, rounds)
    assert sorted(map(tuple, pr.collect())) == sorted(map(tuple, fixed.collect()))

    _, r_inf, c_inf = graph.pagerank_converged(edges, 10**13, 6)
    assert (r_inf, c_inf) == (1, True)  # tol above any possible delta
    _, r_zero, c_zero = graph.pagerank_converged(edges, 0, 3)
    assert (r_zero, c_zero) == (3, False)  # integer ranks keep moving

    a = graph.pagerank_converged(edges, 10**10, 30)
    b = graph.pagerank_converged(edges.repartition(7), 10**10, 30)
    assert (a[1], a[2]) == (b[1], b[2])  # stop decision partition-stable
    assert sorted(map(tuple, a[0].collect())) == sorted(map(tuple, b[0].collect()))


def _census(spark, edges):
    return graph.triangle_stats(edges).first()["n_triangles"]


def test_stream_triangle_index_equals_batch_and_redelivery_noop(spark, tmp_path):
    """Three drained edge drops (bulk + two dailies, overlapping rows in the
    last drop to exercise the Δ-vs-log dedup) maintain the streamed index to
    the exact one-shot batch census; reprocessing the full feed against a
    FRESH checkpoint (worst-case redelivery) is a no-op via the
    applied-batch ledger; and a crashed attempt's day artifacts plus a
    garbage pointer temp file are reclaimed."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.streaming.tri_stream import (
        read_state,
        stream_triangle_index,
    )

    from iceberg_ingestion_spark.operators.text import hex_to_long
    from iceberg_ingestion_spark.queries import read_table

    l = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    edges = graph.cooccurrence_edges(l, "l_orderkey", "l_partkey").localCheckpoint()
    coin = hex_to_long(F.md5(F.concat_ws(":", "src", "dst")), 9, 8) % 3
    drops = [
        edges.where(coin == 0),
        edges.where(coin == 1),
        edges.where(coin >= 1),  # overlaps drop 1: anti-join must dedup
    ]
    feed = str(tmp_path / "feed")
    root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for part in drops:
        part.coalesce(2).write.mode("append").parquet(feed)
        q = stream_triangle_index(spark, feed, part.schema, root, ckpt)
        assert q.awaitTermination(300)
    st = read_state(root)
    assert st["day"] == 2 and len(st["applied"]) == 3
    assert st["n_triangles"] == _census(spark, edges)
    import os

    idx = os.path.join(root, "index")
    logged = graph.triangle_index_edges(spark, idx)
    assert logged.count() == edges.count()  # overlap deduped

    # worst-case redelivery: full feed, fresh checkpoint, same state root
    q = stream_triangle_index(spark, feed, drops[0].schema, root, str(tmp_path / "ck2"))
    assert q.awaitTermination(300)
    again = read_state(root)
    assert again["n_triangles"] == st["n_triangles"]
    assert again["day"] == st["day"]

    # crashed attempt artifacts for the NEXT day are reclaimed on arrival
    os.makedirs(os.path.join(idx, "onbr_day3"))
    os.makedirs(os.path.join(idx, "edges_day3"))
    with open(os.path.join(idx, "edges_day3", "garbage"), "w") as fh:
        fh.write("partial")
    extra = spark.createDataFrame([(999991, 999992)], ["src", "dst"])
    extra.write.mode("append").parquet(feed)
    q = stream_triangle_index(spark, feed, extra.schema, root, ckpt)
    assert q.awaitTermination(300)
    st3 = read_state(root)
    assert st3["day"] == 3
    assert st3["n_triangles"] == _census(spark, edges.unionByName(extra))
    assert not os.path.exists(os.path.join(idx, "edges_day3", "garbage"))


def test_pagerank_weighted_uses_multiplicity(spark):
    """Weighted PR is partition-stable, conserves integer mass within the
    floor-loss bound, matches unweighted PR when every weight is 1, and
    ranks a heavily-bundled neighbor above a merely-connected one where
    unweighted PR cannot distinguish them."""
    # star: hub 1 with spokes 2,3 — edge (1,2) carries weight 9, (1,3)
    # weight 1: vertex 2 must outrank vertex 3 under weighted PR
    ew = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1)], "src long, dst long, w long"
    )
    a = dict(graph.pagerank_weighted_fixed(ew, 3).collect())
    b = dict(graph.pagerank_weighted_fixed(ew.repartition(5), 3).collect())
    assert a == b
    assert a[2] > a[3]
    scale = 10**12
    assert sum(a.values()) <= scale

    # all-ones weights == the unweighted kernel, bit-for-bit
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], ["src", "dst"]
    )
    ones = edges.select("src", "dst", F.lit(1).cast("long").alias("w"))
    w = sorted(map(tuple, graph.pagerank_weighted_fixed(ones, 3).collect()))
    u = sorted(map(tuple, graph.pagerank_fixed(edges, 3).collect()))
    assert w == u


def test_cooccurrence_edges_weighted_counts_groups(spark):
    """w = the number of distinct groups containing both endpoints; the
    unweighted projection equals cooccurrence_edges exactly."""
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (3, 10), (3, 11)],
        ["g", "item"],
    )
    ew = {(r.src, r.dst): r.w for r in
          graph.cooccurrence_edges_weighted(df, "g", "item").collect()}
    assert ew == {(10, 11): 3, (10, 12): 1, (11, 12): 1}
    unw = sorted(map(tuple, graph.cooccurrence_edges(df, "g", "item").collect()))
    assert unw == sorted(ew.keys())

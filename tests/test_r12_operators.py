"""Round-12 pins: personalized PageRank (seed-restricted teleport), the
bounded Δ-driven k-core peel, streamed recompute-on-maintained-state
PageRank, the shared census memo, deterministic drop-order mtime stamps,
and the pq_codes codebook validation (ADVICE r11)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst"])


# ---------------------------------------------------------------------------
# pagerank_personalized
# ---------------------------------------------------------------------------


def test_pagerank_personalized_zero_off_component_and_seed_mass(spark):
    """Two components: seeds in one — every vertex of the other holds
    EXACTLY 0 (integer floor division, no epsilon teleport mass), the seed
    outranks its peers, and the vector differs from global PR."""
    # component A: triangle 1-2-3; component B: edge 10-11
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    seeds = spark.createDataFrame([(1,)], ["v"])
    ppr = {r["v"]: r["pr"] for r in graph.pagerank_personalized(e, seeds, 3).collect()}
    assert ppr[10] == 0 and ppr[11] == 0
    assert ppr[1] > ppr[2] == ppr[3] > 0  # symmetric non-seeds tie
    gpr = {r["v"]: r["pr"] for r in graph.pagerank_fixed(e, 3).collect()}
    assert gpr[10] > 0  # global PR gives B mass; personalized must not
    assert ppr != gpr


def test_pagerank_personalized_all_seeds_equals_global(spark):
    """Seeding EVERY vertex recovers global PageRank exactly (the base
    vector degenerates to the uniform one) — pins the round arithmetic to
    pagerank_fixed's."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)])
    verts = graph.vertex_degrees(e).select("v")
    ppr = {r["v"]: r["pr"] for r in graph.pagerank_personalized(e, verts, 3).collect()}
    gpr = {r["v"]: r["pr"] for r in graph.pagerank_fixed(e, 3).collect()}
    assert ppr == gpr


def test_pagerank_personalized_drops_foreign_seeds_and_raises_on_empty(spark):
    """Seeds outside the vertex set are dropped from the mass split (|S|
    counts only graph vertices); an entirely-foreign seed set raises."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    with_foreign = spark.createDataFrame([(1,), (999,)], ["v"])
    only_real = spark.createDataFrame([(1,)], ["v"])
    a = {r["v"]: r["pr"] for r in graph.pagerank_personalized(e, with_foreign, 2).collect()}
    b = {r["v"]: r["pr"] for r in graph.pagerank_personalized(e, only_real, 2).collect()}
    assert a == b
    with pytest.raises(ValueError, match="no seeds"):
        graph.pagerank_personalized(
            e, spark.createDataFrame([(999,)], ["v"]), 2
        )


def test_pagerank_personalized_prepared_seam(spark):
    """The prepared=(both, deg, n) seam yields the identical vector to the
    self-setup path (the shared_pr_setup contract)."""
    from iceberg_ingestion_spark.operators.materialize import resolve

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)])
    seeds = spark.createDataFrame([(2,), (4,)], ["v"])
    prep = graph._pr_setup(e, resolve(None))
    a = sorted(graph.pagerank_personalized(e, seeds, 3).collect())
    b = sorted(graph.pagerank_personalized(e, seeds, 3, prepared=prep).collect())
    assert a == b


# ---------------------------------------------------------------------------
# kcore_peel
# ---------------------------------------------------------------------------


def test_kcore_peel_known_core(spark):
    """4-clique + pendant chain, k=3: the peel removes the chain in one
    round, verifies in the next, and returns exactly the clique."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    core, deg, rounds, conv = graph.kcore_peel(_edges(spark, clique + chain), 3, 10)
    assert conv and rounds == 2
    assert sorted((r["src"], r["dst"]) for r in core.collect()) == sorted(clique)
    d = {r["v"]: r["d"] for r in deg.collect()}
    assert d == {1: 3, 2: 3, 3: 3, 4: 3}  # maintained deg == core degrees


def test_kcore_peel_cascade_to_empty_and_cap(spark):
    """Path graph, k=2: endpoints peel inward two per round until nothing
    is left (converged, empty core); a tight cap stops mid-cascade with
    converged=False and the maintained state at exactly that round."""
    path = [(1, 2), (2, 3), (3, 4), (4, 5)]
    core, deg, rounds, conv = graph.kcore_peel(_edges(spark, path), 2, 10)
    assert conv and core.count() == 0 and deg.count() == 0
    # round1 removes 1,5; round2 removes 2,4; round3 removes 3 (deg 0);
    # round4 verifies empty
    assert rounds == 4

    core2, deg2, rounds2, conv2 = graph.kcore_peel(_edges(spark, path), 2, 1)
    assert not conv2 and rounds2 == 1
    assert sorted((r["src"], r["dst"]) for r in core2.collect()) == [(2, 3), (3, 4)]
    d2 = {r["v"]: r["d"] for r in deg2.collect()}
    assert d2 == {2: 1, 3: 2, 4: 1}  # maintained decrements, not recomputed-from-scratch


def test_kcore_peel_already_core(spark):
    """A graph that already is a k-core converges in one (verifying)
    round with nothing removed."""
    clique = [(1, 2), (1, 3), (2, 3)]
    core, deg, rounds, conv = graph.kcore_peel(_edges(spark, clique), 2, 5)
    assert conv and rounds == 1 and core.count() == 3 and deg.count() == 3


# ---------------------------------------------------------------------------
# stream_pagerank
# ---------------------------------------------------------------------------


def test_stream_pagerank_equals_batch_and_redelivery_noop(spark, tmp_path):
    """Three drained edge drops (overlapping rows in the last to exercise
    the Δ-vs-log dedup) maintain the state to the exact one-shot batch
    pagerank_fixed vector; full-feed reprocessing against a fresh
    checkpoint is a no-op via the ledger; crashed next-day artifacts are
    reclaimed."""
    from iceberg_ingestion_spark.operators.text import hex_to_long
    from iceberg_ingestion_spark.queries import read_table
    from iceberg_ingestion_spark.streaming.pr_stream import (
        maintained_edges,
        read_state,
        stream_pagerank,
    )

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
        q = stream_pagerank(spark, feed, part.schema, root, ckpt, iterations=2)
        assert q.awaitTermination(300)
    st = read_state(root)
    assert st["day"] == 2 and len(st["applied"]) == 3

    logged = maintained_edges(spark, root)
    assert logged.count() == edges.count()  # overlap deduped
    streamed = {
        r["v"]: r["pr"]
        for r in spark.read.parquet(os.path.join(root, f"pr_day{st['day']}")).collect()
    }
    batch = {r["v"]: r["pr"] for r in graph.pagerank_fixed(edges, 2).collect()}
    assert streamed == batch  # bit-identical recompute on maintained state
    # maintained degree vector equals the derived one
    mdeg = {
        r["v"]: r["d"]
        for r in spark.read.parquet(os.path.join(root, f"deg_day{st['day']}")).collect()
    }
    ddeg = {r["v"]: r["d"] for r in graph.vertex_degrees(edges).collect()}
    assert mdeg == ddeg

    # worst-case redelivery: full feed, fresh checkpoint, same state root
    q = stream_pagerank(spark, feed, drops[0].schema, root, str(tmp_path / "ck2"))
    assert q.awaitTermination(300)
    again = read_state(root)
    assert again["day"] == st["day"] and again["n_vertices"] == st["n_vertices"]

    # crashed attempt artifacts for the NEXT day are reclaimed on arrival
    for stale in ("edges_day3", "deg_day3", "pr_day3"):
        os.makedirs(os.path.join(root, stale))
        with open(os.path.join(root, stale, "garbage"), "w") as fh:
            fh.write("partial")
    extra = spark.createDataFrame([(999991, 999992)], ["src", "dst"])
    extra.write.mode("append").parquet(feed)
    q = stream_pagerank(spark, feed, extra.schema, root, ckpt, iterations=2)
    assert q.awaitTermination(300)
    st3 = read_state(root)
    assert st3["day"] == 3
    assert not os.path.exists(os.path.join(root, "edges_day3", "garbage"))
    streamed3 = {
        r["v"]: r["pr"]
        for r in spark.read.parquet(os.path.join(root, "pr_day3")).collect()
    }
    batch3 = {
        r["v"]: r["pr"]
        for r in graph.pagerank_fixed(edges.unionByName(extra), 2).collect()
    }
    assert streamed3 == batch3


# ---------------------------------------------------------------------------
# shared census memo / drop-order stamps / pq_codes validation
# ---------------------------------------------------------------------------


def test_shared_census_memo_identity_and_values(spark):
    """The memo returns the SAME relation object per (session, sf_dir, mod)
    and its values equal a direct triangle_stats run."""
    from iceberg_ingestion_spark.queries_graph import shared_census, shared_edges

    sf = "/root/testdata/sf0.001"
    a = shared_census(spark, sf, 1)
    assert shared_census(spark, sf, 1) is a
    direct = graph.triangle_stats(shared_edges(spark, sf)).first()
    assert a.first() == direct
    b = shared_census(spark, sf, 2)
    assert b is not a
    assert b.first()["n_edges"] < direct["n_edges"]


def test_stamp_drop_orders_files(tmp_path):
    """Stamped drops carry strictly increasing whole-second mtimes
    regardless of write timing; metadata files are untouched."""
    from iceberg_ingestion_spark.streaming.feed import stamp_drop

    feed = tmp_path / "feed"
    feed.mkdir()
    stamped: set[str] = set()
    for i in range(3):
        p = feed / f"part-{i}.parquet"
        p.write_bytes(b"x")
        (feed / "_SUCCESS").write_bytes(b"")
        stamp_drop(str(feed), i, stamped)
    times = [os.path.getmtime(feed / f"part-{i}.parquet") for i in range(3)]
    assert times[0] < times[1] < times[2]
    assert times[1] - times[0] == pytest.approx(1.0)
    assert os.path.getmtime(feed / "_SUCCESS") > times[2]  # not stamped


def test_pq_codes_validates_codebooks(spark):
    """Empty or out-of-range hand-built codebook relations fail with a
    descriptive ValueError before any kernel runs (ADVICE r11)."""
    from iceberg_ingestion_spark.operators import similarity

    docs = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0, 3.0])], ["vec_id", "embedding"]
    )
    empty = spark.createDataFrame([], "subspace int, code int, centroid array<double>")
    with pytest.raises(ValueError, match="empty codebook"):
        similarity.pq_codes(docs, "vec_id", "embedding", 4, empty, m=2)
    bad = spark.createDataFrame(
        [(2, 0, [0.0, 0.0]), (0, 0, [0.0, 0.0])],
        "subspace int, code int, centroid array<double>",
    )
    with pytest.raises(ValueError, match="invalid codebook row"):
        similarity.pq_codes(docs, "vec_id", "embedding", 4, bad, m=2)


def test_pagerank_variants_project_only_v_pr(spark):
    """r12 carries the (constant) degree INSIDE the rank vector across
    rounds; the public contract is unchanged — every variant must still
    return exactly (v, pr), with the ride-along degree projected away."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert graph.pagerank_fixed(e, 2).columns == ["v", "pr"]
    pr, _, _ = graph.pagerank_converged(e, 1, 3)
    assert pr.columns == ["v", "pr"]
    ew = spark.createDataFrame([(1, 2, 2), (2, 3, 1)], ["src", "dst", "w"])
    assert graph.pagerank_weighted_fixed(ew, 2).columns == ["v", "pr"]
    seeds = spark.createDataFrame([(1,)], ["v"])
    assert graph.pagerank_personalized(e, seeds, 2).columns == ["v", "pr"]

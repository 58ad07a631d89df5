"""Graph analytics over relation-derived graphs: co-occurrence edge
extraction and triangle counting via degree-ordered edge orientation.

Training-data pipelines run graph structure queries over corpus-derived
graphs (link graphs, co-citation, item co-occurrence) for quality signals;
the connected-components machinery lives in ``dedup`` (large-star/small-star)
— this module adds the counting side.

Triangle counting uses the degree-ordering technique of Suri &
Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer"
(WWW'11): orient every undirected edge from its lower-(degree, id) endpoint
to the higher one. The oriented graph is a DAG under a total order, so each
triangle {a,b,c} (with a<b<c in that order) materializes as EXACTLY one
directed path a→b→c closed by the edge a→c — count = one equi-join to build
length-2 paths plus one semi-join to close them. The orientation is what
makes this scale: a vertex of degree d has out-degree ≤ O(√|E|) after
orienting toward higher degree, so path fan-out is bounded by √|E| per
vertex instead of d² on hubs — the "last reducer" hot key disappears.

Everything is hash-partitionable equi-joins + aggregates (the single-row
stat combine at the end is a broadcast of 1-row aggregates); integer-exact,
so the DuckDB oracle recomputes every number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Distinct undirected edges ``(src < dst)`` between items sharing a
    group (e.g. parts appearing in the same order). The self-join is keyed on
    the group id — a hash shuffle, never a cross product — and fan-out per
    group is C(|group|, 2), bounded by the max group size (order line counts
    here, single digits). Output: ``(src, dst)`` distinct, src < dst."""
    g = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    return (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a._g") == F.col("b._g")) & (F.col("a._i") < F.col("b._i")),
        )
        .select(F.col("a._i").alias("src"), F.col("b._i").alias("dst"))
        .distinct()
    )


def vertex_degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per vertex: ``(v, d)``. One unionAll + groupBy."""
    ends = edges.select(F.col("src").alias("v")).unionAll(
        edges.select(F.col("dst").alias("v"))
    )
    return ends.groupBy("v").agg(F.count(F.lit(1)).alias("d"))


def degree_oriented(edges: DataFrame, degrees: DataFrame | None = None) -> DataFrame:
    """Orient each undirected edge from its lower-(degree, id) endpoint:
    ``(s, t)`` with (d(s), s) < (d(t), t). A total order, so the result is a
    DAG and every triangle has exactly one length-2 path + closing edge."""
    deg = degrees if degrees is not None else vertex_degrees(edges)
    e = (
        edges.join(
            deg.select(F.col("v").alias("src"), F.col("d").alias("_ds")), "src"
        ).join(deg.select(F.col("v").alias("dst"), F.col("d").alias("_dt")), "dst")
    )
    fwd = (F.col("_ds") < F.col("_dt")) | (
        (F.col("_ds") == F.col("_dt")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("s"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("t"),
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """ONE row of global triangle statistics over a distinct undirected edge
    set: ``(n_vertices, n_edges, n_wedges, n_triangles,
    global_clustering)``.

    * wedges (length-2 paths, unordered) = Σ_v d(v)·(d(v)−1)/2 — computed
      from the degree relation, no join;
    * triangles via the oriented path-close join (module docstring);
    * global clustering coefficient = 3·triangles / wedges (the only
      non-integer — one IEEE division, identical cross-engine).

    All sums stay far below 2^53, so the /2 via double is exact. The final
    combine crossJoins four 1-row aggregates (broadcast by construction)."""
    deg = vertex_degrees(edges)
    o = degree_oriented(edges, deg)
    paths = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e1.t") == F.col("e2.s"))
        .select(F.col("e1.s").alias("u"), F.col("e2.t").alias("w"))
    )
    tri = paths.join(
        o.select(F.col("s").alias("u"), F.col("t").alias("w")), ["u", "w"], "leftsemi"
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    wedges = deg.agg(
        (F.sum(F.col("d") * (F.col("d") - F.lit(1))) / F.lit(2))
        .cast("long")
        .alias("n_wedges"),
        F.count(F.lit(1)).alias("n_vertices"),
    )
    ecnt = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wedges.crossJoin(F.broadcast(ecnt))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            "n_triangles",
            (F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")).alias(
                "global_clustering"
            ),
        )
    )


def bfs_min_hops(edges: DataFrame, seeds: DataFrame, max_hop: int) -> DataFrame:
    """Minimum-hop BFS labels ``(v, hop)`` for every vertex reachable within
    ``max_hop`` of the seed set, over an undirected edge relation
    ``(src, dst)``. ``seeds`` is a one-column relation of start vertices.

    The standard distributed frontier expansion: each round joins the
    CURRENT frontier (not the visited set) to the edge relation, anti-joins
    out already-visited vertices, and stops early when the frontier drains.
    Per round: one equi-join keyed on vertex id + one anti-join — both
    hash-partitionable; ``localCheckpoint`` truncates the iterative lineage
    (the connected-components convention). Work per round is
    O(frontier-adjacent edges), never the whole graph; rounds are bounded by
    ``max_hop``, so the plan cannot grow unboundedly on high-diameter
    graphs. Min-hop correctness needs no re-labeling: a vertex is claimed by
    the FIRST frontier that reaches it (BFS invariant), and the anti-join
    guarantees exactly-once labeling."""
    both = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    visited = (
        seeds.toDF("v").distinct().withColumn("hop", F.lit(0)).localCheckpoint()
    )
    frontier = visited
    for h in range(1, max_hop + 1):
        nxt = (
            frontier.join(both, frontier["v"] == both["src"])
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(visited, "v", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited

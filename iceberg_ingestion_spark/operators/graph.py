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
triangle {a,b,c} (with a<b<c in that order) decomposes as EXACTLY one
directed path a→b→c closed by the edge a→c; per oriented edge (u→v) the
closing vertices are |N⁺(u) ∩ N⁺(v)|, so the census is two |E|-row
equi-joins against the out-neighbor-array relation plus a JVM-side
``array_intersect`` per edge — the Σ out-deg² path relation is never
materialized or shuffled. The orientation is what makes this scale: a
vertex of degree d has out-degree ≤ O(√|E|) after orienting toward higher
degree, so each neighbor list is O(√|E|) instead of d on hubs — the "last
reducer" hot key disappears.

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


def triangle_stats(edges: DataFrame, materializer=None) -> DataFrame:
    """ONE row of global triangle statistics over a distinct undirected edge
    set: ``(n_vertices, n_edges, n_wedges, n_triangles,
    global_clustering)``.

    * wedges (length-2 paths, unordered) = Σ_v d(v)·(d(v)−1)/2 — computed
      from the degree relation, no join;
    * triangles via the oriented path-close join (module docstring);
    * global clustering coefficient = 3·triangles / wedges (the only
      non-integer — one IEEE division, identical cross-engine).

    All sums stay far below 2^53, so the /2 via double is exact. The final
    combine crossJoins four 1-row aggregates (broadcast by construction).

    Physical shape — the common-neighbor INTERSECTION kernel, not a path
    join: per oriented edge (u→v), triangles closing it are
    |N⁺(u) ∩ N⁺(v)|, so the census is edges ⋈ out-neighbor arrays (two
    equi-joins of |E| rows) + a JVM-side ``array_intersect`` per row. The
    work is still Σ out-deg² element comparisons (orientation bounds each
    list by O(√|E|)), but the Σ out-deg² PATH relation is never
    materialized or shuffled — measured 4× faster than the path-join form
    at sf0.1 and ~flat 0.01→0.1 (BASELINE.md r9 continuation). ``edges``
    and the oriented relation fan into several subtrees (degrees, both
    array joins, the edge count), so both are materialized once
    (``materializer=`` seam, default localCheckpoint) instead of
    re-expanding the upstream co-occurrence self-join per reference."""
    from iceberg_ingestion_spark.operators.materialize import resolve

    mat = resolve(materializer)
    edges = mat(edges)
    deg = vertex_degrees(edges)
    o = mat(degree_oriented(edges, deg))
    nbrs = o.groupBy(F.col("s").alias("_k")).agg(F.collect_list("t").alias("_ns"))
    tri = (
        o.join(nbrs.toDF("u", "_nu"), F.col("s") == F.col("u"))
        .join(nbrs.toDF("w", "_nw"), F.col("t") == F.col("w"))
        .select(F.size(F.array_intersect("_nu", "_nw")).alias("_c"))
        .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_triangles"))
    )
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


def bfs_min_hops(
    edges: DataFrame, seeds: DataFrame, max_hop: int, materializer=None
) -> DataFrame:
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
    guarantees exactly-once labeling. The bidirected edge relation is
    materialized once (``materializer=`` seam) — every round joins it, and
    a lazy reference would re-expand the upstream edge derivation (e.g. the
    co-occurrence self-join) per round."""
    from iceberg_ingestion_spark.operators.materialize import resolve

    mat = resolve(materializer)
    both = mat(
        edges.select("src", "dst").unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    visited = mat(seeds.toDF("v").distinct().withColumn("hop", F.lit(0)))
    frontier = visited
    for h in range(1, max_hop + 1):
        nxt = mat(
            frontier.join(both, frontier["v"] == both["src"])
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(visited, "v", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        if not nxt.take(1):
            break
        visited = mat(visited.unionByName(nxt))
        frontier = nxt
    return visited


def edge_sample_md5(edges: DataFrame, mod: int) -> DataFrame:
    """Deterministic DOULION edge sampling (Tsourakakis et al. KDD'09):
    keep an edge iff md5('src:dst') % mod == 0, i.e. sampling probability
    p = 1/mod. Because the coin is a hash of the edge itself, any engine
    draws the SAME sample (the DuckDB oracle recomputes it) and re-runs are
    reproducible. Triangle estimate: T_sampled * mod^3 — integer-exact —
    with Var/T^2 ~ (mod^3 - 1)/T + a shared-edge covariance term that
    vanishes on low-clustering graphs; the graded entry checks a 10% band
    against the exact census in-query."""
    from iceberg_ingestion_spark.operators.text import hex_to_long

    key = F.md5(F.concat_ws(":", F.col("src"), F.col("dst")))
    return edges.where(hex_to_long(key, 1, 8) % mod == 0)


def triangle_delta(
    old_edges: DataFrame, new_edges: DataFrame, materializer=None
) -> DataFrame:
    """ONE row ``(n_new_triangles)``: exact count of triangles that exist in
    ``old ∪ new`` but not in ``old`` — i.e. triangles using at least one new
    edge — WITHOUT re-running the full census. This is the incremental-view
    maintenance rule for triangle counts: ``T(E ∪ Δ) = T(E) + Δ-count``.

    Counting each new triangle exactly once with no inclusion-exclusion:
    orient the UNION graph by (degree, id) — every triangle is exactly one
    oriented path a→b→c closed by a→c — and split by the FIRST new slot:

    * c1: edge1 (a→b) is new — per new edge, |N⁺_U(a) ∩ N⁺_U(b)| completions;
    * c2: edge1 old, edge2 (b→c) new — per new edge, |N⁻_old(b) ∩ N⁻_U(c)|;
    * c3: edge1 old, edge2 old, closing (a→c) new — per new edge,
      |N⁺_old(a) ∩ N⁻_old(c)|.

    The three cases are disjoint and exhaustive over "≥1 new edge", and
    each is the common-neighbor intersection kernel driven by Δ — two
    equi-joins keyed on the Δ edge's endpoints against the neighbor-array
    relations (V rows, E entries total; only the Δ-matching rows shuffle
    usefully) plus a JVM-side ``array_intersect`` per Δ row; per-increment
    intersection work is O(|Δ| · avg-outdeg), independent of the
    accumulated census cost, and the old×old path expansion never
    materializes. The union ORIENTATION
    changes as degrees grow, but orientation only affects the
    representation, never the count, so the maintained total stays exact
    (pytest-pinned: delta == census(union) − census(old); the chained
    driver entry grades 3 appends against the one-shot batch census)."""
    from iceberg_ingestion_spark.operators.materialize import resolve

    mat = resolve(materializer)
    old = mat(old_edges.select("src", "dst").distinct())
    delta = mat(
        new_edges.select("src", "dst").distinct().join(
            old, ["src", "dst"], "left_anti"
        )
    )
    union = old.withColumn("is_new", F.lit(False)).unionByName(
        delta.withColumn("is_new", F.lit(True))
    )
    deg = vertex_degrees(union)
    flagged = (
        union.join(
            deg.select(F.col("v").alias("src"), F.col("d").alias("_ds")), "src"
        ).join(deg.select(F.col("v").alias("dst"), F.col("d").alias("_dt")), "dst")
    )
    fwd = (F.col("_ds") < F.col("_dt")) | (
        (F.col("_ds") == F.col("_dt")) & (F.col("src") < F.col("dst"))
    )
    o = mat(
        flagged.select(
            F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("s"),
            F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("t"),
            "is_new",
        )
    )
    o_new = o.where(F.col("is_new")).select("s", "t")
    o_old = o.where(~F.col("is_new")).select("s", "t")

    def _nbr(rel: DataFrame, key: str, val: str) -> DataFrame:
        return rel.groupBy(F.col(key).alias("_k")).agg(
            F.collect_list(val).alias("_ns")
        )

    out_u = _nbr(o.select("s", "t"), "s", "t")   # N+ over the union
    in_u = _nbr(o.select("s", "t"), "t", "s")    # N- over the union
    out_old = _nbr(o_old, "s", "t")              # N+ over old edges
    in_old = _nbr(o_old, "t", "s")               # N- over old edges

    def _case(left: DataFrame, key_a: str, na: DataFrame, key_b: str,
              nb: DataFrame) -> DataFrame:
        return (
            left.join(na.toDF("_ka", "_na"), F.col(key_a) == F.col("_ka"))
            .join(nb.toDF("_kb", "_nb"), F.col(key_b) == F.col("_kb"))
            .select(F.size(F.array_intersect("_na", "_nb")).alias("_c"))
            .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("_c"))
        )

    c1 = _case(o_new, "s", out_u, "t", out_u)     # (new, any, any)
    c2 = _case(o_new, "s", in_old, "t", in_u)     # (old, new, any)
    c3 = _case(o_new, "s", out_old, "t", in_old)  # (old, old, new-close)
    total = (
        c1.crossJoin(F.broadcast(c2.withColumnRenamed("_c", "_c2")))
        .crossJoin(F.broadcast(c3.withColumnRenamed("_c", "_c3")))
        .select(
            (F.col("_c") + F.col("_c2") + F.col("_c3")).alias("n_new_triangles")
        )
    )
    return total

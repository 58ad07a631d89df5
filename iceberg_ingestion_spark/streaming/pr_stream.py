"""Streaming maintenance of a persisted PageRank state (VERDICT r11 #3 —
the one persisted-state graph family without a ``streaming/`` maintainer
after r11's triangle index: the rank vector itself).

Contract — RECOMPUTE-ON-MAINTAINED-STATE: per micro-batch of edge drops the
maintainer appends the Δ to the persisted edge log, upserts the persisted
DEGREE vector Δ-boundedly (only touched vertices rewrite — the
copy-on-write shape of ``triangle_index_update``), and re-runs the SAME
bounded-round integer-scaled kernel (``graph.pagerank_fixed``) on the
maintained state, publishing the rank-table version. Delta-PR
approximations (push-based residual propagation etc.) are NOT oracle-exact
— they converge to, but do not equal, the fixed-round vector — so the
honest streamed contract is: maintain the graph state incrementally, pay
the bounded-round recompute per batch, and the published vector after any
drop sequence is BIT-IDENTICAL to the one-shot batch ``pagerank_fixed``
over all edges ever seen (the driver entry ``graph_stream_pagerank``
grades exactly that against the unrolled-CTE oracle).

EXACTLY-ONCE / CRASH DISCIPLINE (the ``tri_stream`` pattern): the day
counter, vertex count, and applied-batch ledger publish ATOMICALLY in one
``os.replace``'d ``state.json``; a day's writes (``edges_day{K}``,
``deg_day{K}``, ``pr_day{K}``) are FRESH dirs reclaimed on redelivery, so a
crash between the first state write and the pointer publish reruns the
whole day from the prior published state. Degree upserts are not
idempotent against double-apply, so redelivered whole batches are no-ops
via the ledger; overlapping drops dedup via the Δ-vs-log anti-join.
Readers resolve state through the pointer: ranks = ``pr_day{ptr.day}``,
degrees = ``deg_day{ptr.day}``, edges = ``edges_day{0..ptr.day}``.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.operators.graph import pagerank_fixed


def read_state(root: str) -> dict | None:
    """The published pointer state ``{day, n_vertices, applied}``, or None
    if no batch has published yet."""
    path = os.path.join(root, "state.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _publish(root: str, state: dict) -> None:
    path = os.path.join(root, "state.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, path)  # atomic: day + n + ledger move together


def maintained_edges(spark: SparkSession, root: str) -> DataFrame:
    """The full undirected edge log of a maintained PR state: every
    committed ``edges_day*`` dir."""
    paths = sorted(glob.glob(os.path.join(root, "edges_day*")))
    return spark.read.parquet(*paths).select("src", "dst")


def stream_pagerank(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    root: str,
    checkpoint_dir: str,
    iterations: int = 3,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    assume_canonical: bool = False,
) -> StreamingQuery:
    """Maintain a persisted PageRank state at ``root`` from parquet edge
    drops ``(src, dst)`` in ``input_dir`` (see module docstring).
    ``availableNow`` drains what's there and stops; ``False`` runs until
    stopped. Drops may overlap — the Δ-vs-log anti-join dedups edges, and
    the ledger makes whole-batch redelivery a no-op. ``assume_canonical``:
    the feed writer guarantees src < dst with no within-drop duplicates —
    skips the per-batch dedup shuffle (cross-drop overlap is still handled
    by the anti-join)."""
    os.makedirs(root, exist_ok=True)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # each micro-batch = at most this many whole files (the entries'
        # one-drain form; the multi-drain restart form is pytest-pinned)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        state = read_state(root)
        if state is not None and str(batch_id) in state["applied"]:
            return  # redelivered whole batch: the degree upsert must not repeat
        day = 0 if state is None else state["day"] + 1
        for stale in (f"edges_day{day}", f"deg_day{day}", f"pr_day{day}"):
            p = os.path.join(root, stale)
            if os.path.exists(p):  # crashed unpublished attempt at this day
                shutil.rmtree(p)

        if assume_canonical:
            delta = batch.select("src", "dst")
        else:
            delta = batch.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            ).distinct()
        if state is not None:
            delta = delta.join(
                maintained_edges(spark, root), ["src", "dst"], "left_anti"
            )
        delta.write.mode("error").parquet(os.path.join(root, f"edges_day{day}"))
        delta = spark.read.parquet(os.path.join(root, f"edges_day{day}"))

        # Δ-bounded degree upsert: one small groupBy over 2|Δ| role rows,
        # then copy-on-write — untouched rows pass through an anti-join on
        # the touched set, touched rows add their Δ counts (new vertices
        # enter with old degree 0)
        dd = (
            delta.select(F.col("src").alias("v"))
            .unionAll(delta.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("_dd"))
        )
        if state is None:
            deg = dd.select("v", F.col("_dd").alias("d"))
        else:
            prev = spark.read.parquet(os.path.join(root, f"deg_day{day - 1}"))
            deg = prev.join(dd.select("v"), "v", "left_anti").unionByName(
                dd.join(prev, "v", "left").select(
                    "v", (F.coalesce("d", F.lit(0)) + F.col("_dd")).alias("d")
                )
            )
        deg.write.mode("error").parquet(os.path.join(root, f"deg_day{day}"))
        deg = spark.read.parquet(os.path.join(root, f"deg_day{day}"))
        n = deg.count()

        # bounded-round recompute on the maintained state: the SAME kernel
        # the batch entries run, fed the persisted degree vector — the
        # maintained deg equals the derived deg exactly (integer counts),
        # so the published vector is bit-identical to a batch run
        # both stays LAZY: it is a union of scans over the PERSISTED edge
        # log (already materialized state), and the broadcast-vector kernel
        # probes it map-side — an eager checkpoint here was one
        # pure-overhead job per batch (r12)
        edges = maintained_edges(spark, root)
        both = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        pr = pagerank_fixed(edges, iterations, prepared=(both, deg, n))
        pr.write.mode("error").parquet(os.path.join(root, f"pr_day{day}"))

        applied = {} if state is None else state["applied"]
        applied[str(batch_id)] = day
        _publish(root, {"day": day, "n_vertices": int(n), "applied": applied})

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

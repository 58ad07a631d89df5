"""Streaming maintenance of the persisted incremental triangle index
(VERDICT r10 #5 — the last persisted-state family without a ``streaming/``
maintainer; KMV/CMS/HLL/MG/PQ/near-dup/rollup all have one).

Each micro-batch of edge drops flows through the SAME Δ-bounded batch code
path the daily-cadence entry uses (``graph.triangle_index_init`` /
``triangle_index_update`` — frozen-orientation persisted index, per-day
shuffle O(|Δ|)), so the streamed chained triangle count equals the one-shot
batch census exactly (the ``triangle_delta`` decomposition is exact under
any fixed total order, and the mg_stream grading pattern applies: the
driver entry ``graph_stream_triangles`` grades the streamed count against
the batch-census oracle).

EXACTLY-ONCE / CRASH DISCIPLINE: the day counter and the running triangle
count publish ATOMICALLY in one pointer file (``state.json``, written to a
temp path and ``os.replace``d — the :mod:`.pointer` discipline specialized
to a single file) together with the applied-batch-id ledger (triangle-count
addition is not idempotent, so redelivery safety comes from the ledger —
the mg_stream contract). A day's state writes (``onbr_day{K}``,
``edges_day{K}``) are FRESH dirs the batch operator reclaims on redelivery
(``triangle_index_update`` r11 crash discipline), so a crash anywhere
between the first state write and the pointer publish reruns the whole day
from the prior published state — no partial-write residue, no double count,
no lost count. Readers resolve state through the pointer: arrays =
``onbr_day{ptr.day}``, edges = ``edges`` ∪ ``edges_day{1..ptr.day}``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.operators.graph import (
    triangle_index_init,
    triangle_index_update,
)


def read_state(root: str) -> dict | None:
    """The published pointer state ``{day, n_triangles, applied}``, or None
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
    os.replace(tmp, path)  # atomic: count + day + ledger move together


def stream_triangle_index(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    root: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    assume_canonical: bool = False,
) -> StreamingQuery:
    """Maintain a persisted triangle index at ``root/index`` from parquet
    edge drops ``(src, dst)`` in ``input_dir``; the running exact triangle
    count lives in ``root/state.json`` (see module docstring).
    ``availableNow`` drains what's there and stops; ``False`` runs until
    stopped. Drops may overlap — the Δ-vs-log anti-join dedups edges, and
    the ledger makes whole-batch redelivery a no-op. ``assume_canonical``:
    the feed writer guarantees src < dst with no within-drop duplicates —
    skips the per-batch dedup shuffle (the entries' feeds project the
    already-canonical co-occurrence relation; cross-drop overlap is still
    handled by the anti-join)."""
    os.makedirs(root, exist_ok=True)
    index_dir = os.path.join(root, "index")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # each micro-batch = at most this many whole files: lets ONE drain
        # process a multi-drop feed as separate batches (the entries' cheap
        # form; the multi-drain restart form is pytest-pinned)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        state = read_state(root)
        if state is not None and str(batch_id) in state["applied"]:
            return  # redelivered whole batch: counter addition must not repeat
        edges = batch.select("src", "dst")
        if state is None:
            # crashed unpublished first attempt: rebuild from scratch
            if os.path.exists(index_dir):
                shutil.rmtree(index_dir)
            n = triangle_index_init(
                spark, edges, index_dir, assume_canonical=assume_canonical
            ).first()["n_triangles"]
            _publish(
                root,
                {"day": 0, "n_triangles": int(n), "applied": {str(batch_id): 0}},
            )
            return
        day = state["day"] + 1
        d = triangle_index_update(
            spark, index_dir, day, edges, assume_canonical=assume_canonical
        ).first()["n_new_triangles"]
        state["day"] = day
        state["n_triangles"] = int(state["n_triangles"] + d)
        state["applied"][str(batch_id)] = day
        _publish(root, state)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Streaming incremental rollup maintenance.

The continuous analogue of ``operators/incremental.py``: watch a directory of
changelog drops (the shape ``sinks.read_changes`` / Iceberg's changelog scan
emits — rows + ``_change_type``) and fold each micro-batch into a persistent
per-key rollup table via ``foreachBatch``. Batch and streaming share the one
``apply_changelog_to_agg`` code path, the same stance as ``cdc_stream``.

Correctness rests on the operator's associativity: signed deltas commute and
re-combine exactly (decimal sums), so ANY split of the changelog into
micro-batches — including one that separates a key's UPDATE_BEFORE from its
UPDATE_AFTER — folds to the same rollup as a single batch, which in turn
equals the from-scratch recompute (pinned by the ``ingest_incremental_agg``
driver oracle and tests/test_streaming.py's split-stream test).

Scale notes: each micro-batch costs O(|batch|) + one key-equi join against
the rollup (AQE broadcasts the delta side when small); the rollup table is
snapshot-versioned by the sink, so every micro-batch commit is atomic and
time-travel-able like any other table this engine writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.model import TablePolicy
from iceberg_ingestion_spark.operators.incremental import (
    ROW_COUNT_COL,
    apply_changelog_to_agg,
    changelog_deltas,
)
from iceberg_ingestion_spark.sinks import TableSink


def stream_rollup_maintenance(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    sink: TableSink,
    name: str,
    keys: list[str],
    sum_cols: dict[str, Column],
    policy: TablePolicy = TablePolicy(),
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain rollup table ``name`` from changelog parquet drops in
    ``input_dir``. ``available_now=True`` drains what's there and stops (one
    scheduled run / a test); ``False`` runs until stopped."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if sink.exists(name):
            updated = apply_changelog_to_agg(sink.read(name), batch, keys, sum_cols)
        else:
            # first batch: the rollup of a changelog applied to nothing is
            # just its positive-count deltas
            updated = changelog_deltas(batch, keys, sum_cols).filter(
                F.col(ROW_COUNT_COL) > 0
            )
        sink.replace(name, updated, policy)

    writer = stream.writeStream.foreachBatch(_apply)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_joined_rollup_maintenance(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    dim: DataFrame,
    on: list[str],
    sink: TableSink,
    name: str,
    keys: list[str],
    sum_cols: dict[str, Column],
    policy: TablePolicy = TablePolicy(),
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a rollup of ``fact ⋈ dim`` from a streaming FACT changelog —
    the continuous form of the static-dimension join-IVM delta rule
    γ(Δfact ⋈ dim) (``ingest_incremental_join_agg``'s batch contract). Each
    micro-batch's changelog rows are enriched with their dimension
    attributes via a **broadcast** join (the dimension is the slowly- or
    never-changing side; when it does change, run the two-sided batch rule
    ``incremental.join_changelog`` at the dimension's cadence), then folded
    into the persistent rollup exactly as the single-table path does.

    Same associativity argument as :func:`stream_rollup_maintenance`: any
    micro-batch split of the changelog folds to the same rollup. Cost per
    batch: O(|batch|) map-side dim lookups + one key-equi join against the
    rollup.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        enriched = batch.join(F.broadcast(dim), on=on, how="inner")
        if sink.exists(name):
            updated = apply_changelog_to_agg(sink.read(name), enriched, keys, sum_cols)
        else:
            updated = changelog_deltas(enriched, keys, sum_cols).filter(
                F.col(ROW_COUNT_COL) > 0
            )
        sink.replace(name, updated, policy)

    writer = stream.writeStream.foreachBatch(_apply)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

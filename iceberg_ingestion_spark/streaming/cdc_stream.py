"""Structured Streaming CDC ingestion.

The reference processes CDC as daily micro-batches of DMS parquet drops
(reference ``dags/data_ingestion_dms.py:84``, ``dmsdatabase1.py:36-42``).
This module is the continuous analogue: watch the CDC drop directory with a
file-source stream and apply each micro-batch through the exact same calculus
(``dedup_latest`` + sink merge) via ``foreachBatch`` — so batch and streaming
share one code path and one set of semantics tests.

Scale notes: the file source tracks processed files in the checkpoint (no
reprocessing); each micro-batch shuffles only that batch's keys. For true
cross-batch ordering guarantees you would add a per-key watermark +
``applyInPandasWithState``; the reference's semantics (trust DMS ordering
within a batch, latest-per-key wins) do not require it.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.changes import dedup_latest, stamp_audit, with_soft_delete_flag
from iceberg_ingestion_spark.model import ChangeSpec, TablePolicy
from iceberg_ingestion_spark.sinks import TableSink


def stream_cdc_merge(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    sink: TableSink,
    name: str,
    spec: ChangeSpec,
    policy: TablePolicy = TablePolicy(),
    checkpoint_dir: str | None = None,
    keep_deletes: bool = False,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously merge CDC parquet drops from ``input_dir`` into ``name``.

    ``available_now=True`` drains all currently-available files then stops —
    the streaming equivalent of one scheduled run (useful for tests and
    backfills); ``False`` runs until stopped.
    """
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        ts = datetime.now(timezone.utc)
        changes = stamp_audit(dedup_latest(batch, spec), ts)
        if sink.exists(name):
            sink.merge(name, changes, spec, policy, keep_deletes=keep_deletes)
        else:
            # First batch creates the table. With keep_deletes the target
            # schema must carry hard_deleted from the start (later merges
            # UPDATE SET * / INSERT * against it), and first-batch D rows
            # must land flagged, not live — same contract as
            # IngestionJob.first_load (reference iceberg.py:122-149).
            initial = changes
            if keep_deletes:
                initial = with_soft_delete_flag(initial, spec.op_col)
            sink.create(name, initial.drop(spec.op_col), policy)

    writer = stream.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

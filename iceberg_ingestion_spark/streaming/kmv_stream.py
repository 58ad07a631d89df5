"""Streaming KMV-sketch maintenance.

KMV is a MERGEABLE summary (the k smallest hashes of A ∪ B are the k
smallest of kmin(A) ∪ kmin(B)), so a stream maintains it exactly: per
micro-batch, sketch the batch with the SAME ``sketches.kmv_sketch`` code
path the batch engine uses and ``kmv_merge`` it into a persisted sketch
table. Any split of the input into micro-batches folds to the identical
sketch as one batch pass (split invariance), and redelivering a batch is a
no-op (set semantics) — both pytest-pinned, and the driver entry
``sketch_kmv_stream`` grades the streamed sketch against the BATCH oracle.

Why this matters at scale: "how many distinct users/keys so far?" over an
unbounded stream needs either unbounded exact state or a mergeable sketch;
the KMV table is ≤ k rows per set forever, and (unlike HLL binaries) its
rows carry the sample VALUES, so intersection/Jaccard estimates keep working
on the streamed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.operators.sketches import kmv_merge, kmv_sketch


def stream_kmv_sketch(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    table_dir: str,
    checkpoint_dir: str,
    set_col: str,
    value_col: str,
    k: int,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a KMV sketch parquet table at ``table_dir`` from parquet
    drops in ``input_dir``. ``availableNow`` drains what's there and stops
    (one scheduled run / a test); ``False`` runs until stopped."""
    import os

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        delta = kmv_sketch(batch, set_col, value_col, k)
        if os.path.isdir(table_dir):
            merged = kmv_merge(spark.read.parquet(table_dir), delta, set_col, k)
        else:
            merged = delta
        # the sketch is <= k rows per set by construction: materialize before
        # overwriting the table we just read (classic read-modify-write)
        out = merged.localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(table_dir)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Streaming KMV-sketch maintenance.

KMV is a MERGEABLE summary (the k smallest hashes of A ∪ B are the k
smallest of kmin(A) ∪ kmin(B)), so a stream maintains it exactly: per
micro-batch, sketch the batch with the SAME ``sketches.kmv_sketch`` code
path the batch engine uses and ``kmv_merge`` it into a persisted sketch
table. Any split of the input into micro-batches folds to the identical
sketch as one batch pass (split invariance), and redelivering a batch is a
no-op (set semantics) — both pytest-pinned, and the driver entry
``sketch_kmv_stream`` grades the streamed sketch against the BATCH oracle.

Crash safety (ADVICE r9): the sketch table is updated by ATOMIC POINTER
SWAP, not in-place overwrite — the shared :mod:`.pointer` discipline
(versioned dir + symlink repoint via ``os.replace``); see that module for
the crash-window analysis.

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
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a KMV sketch parquet table at ``table_dir`` from parquet
    drops in ``input_dir``. ``availableNow`` drains what's there and stops
    (one scheduled run / a test); ``False`` runs until stopped.

    ``table_dir`` is maintained as a symlink to the current versioned
    sketch directory (see module docstring); read it with
    ``spark.read.parquet(table_dir)`` as before — the local filesystem
    follows the link."""
    from iceberg_ingestion_spark.streaming import pointer

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
        delta = kmv_sketch(batch, set_col, value_col, k)
        prev_target = pointer.current_version(table_dir)
        if prev_target is not None:
            merged = kmv_merge(spark.read.parquet(table_dir), delta, set_col, k)
        else:
            merged = delta
        vdir = pointer.claim_version_dir(table_dir, batch_id)
        merged.write.parquet(vdir)
        pointer.publish_version(table_dir, vdir, prev_target)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

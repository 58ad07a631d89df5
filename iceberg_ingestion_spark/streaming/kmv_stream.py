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
SWAP, not in-place overwrite. Each batch writes the merged sketch to a
fresh versioned directory ``<table_dir>.v<batch_id>`` and then atomically
repoints ``table_dir`` (a symlink) at it via ``os.replace`` — rename(2)
replaces the symlink itself, so readers always resolve either the old or
the new complete sketch, never a half-written one. A crash before the swap
leaves the previous sketch intact (the stale version dir is reclaimed when
the batch is redelivered); the old in-place ``mode("overwrite")`` deleted
the table before rewriting it, so a crash in that window silently reset
the accumulated state. Versioning also removes the read-modify-write
hazard: the batch reads the OLD version dir and writes a NEW one, so no
defensive materialization is needed.

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
    (one scheduled run / a test); ``False`` runs until stopped.

    ``table_dir`` is maintained as a symlink to the current versioned
    sketch directory (see module docstring); read it with
    ``spark.read.parquet(table_dir)`` as before — the local filesystem
    follows the link."""
    import os
    import shutil

    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        delta = kmv_sketch(batch, set_col, value_col, k)
        prev_target = (
            os.path.realpath(table_dir) if os.path.isdir(table_dir) else None
        )
        if prev_target is not None:
            merged = kmv_merge(spark.read.parquet(table_dir), delta, set_col, k)
        else:
            merged = delta
        vdir = f"{table_dir}.v{batch_id}"
        if os.path.exists(vdir):
            # a redelivered batch may find its own half-written version dir
            # from the crashed attempt — reclaim it before rewriting
            shutil.rmtree(vdir)
        merged.write.parquet(vdir)
        tmp_link = f"{table_dir}.ptr.tmp"
        if os.path.lexists(tmp_link):
            os.remove(tmp_link)
        os.symlink(vdir, tmp_link)
        if os.path.isdir(table_dir) and not os.path.islink(table_dir):
            # legacy in-place layout (pre-seeded real directory): migrating
            # to the pointer layout is the one non-atomic step, and only
            # happens once — after it every swap is a pure rename
            shutil.rmtree(table_dir)
        os.replace(tmp_link, table_dir)  # atomic: symlink repoint
        if (
            prev_target is not None
            and prev_target != os.path.realpath(table_dir)
            and os.path.isdir(prev_target)
            and not os.path.islink(prev_target)
        ):
            shutil.rmtree(prev_target, ignore_errors=True)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

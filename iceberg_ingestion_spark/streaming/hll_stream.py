"""Streaming HLL sketch maintenance: per-bucket distinct-count sketches kept
current from a feed, without per-key state.

HLL union is a lattice operation (per-register max — associative,
commutative, idempotent over the inserted value set), so a stream maintains
the per-bucket sketches EXACTLY: per micro-batch, build the batch's bucket
sketches with the SAME ``sketches.hll_bucket_sketches`` code path the batch
engine uses, union them into the persistent sketch table with
``hll_union_agg``, and any split of the input into micro-batches yields the
same estimates as one batch pass — the same split-invariance contract as
``sketch_stream`` (Count-Min, additive cells), with idempotent max instead
of addition.

Why this matters at scale: "distinct users per trailing 7 days, updated as
drops arrive" with exact counts means keeping the full (bucket, user) pair
set as state — unbounded in users. The sketch table is one ~2^lgk-byte row
per OBSERVED BUCKET, independent of event volume and user cardinality, and
the windowed answers come from ``sketches.hll_window_union`` over the
maintained table — the identical union path the batch entry
(``sketch_hll_windowed``) executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.model import TablePolicy
from iceberg_ingestion_spark.operators.sketches import hll_bucket_sketches
from iceberg_ingestion_spark.sinks import TableSink


def stream_hll_maintenance(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    sink: TableSink,
    name: str,
    bucket_col: str,
    value_col: str,
    lgk: int = 12,
    policy: TablePolicy = TablePolicy(),
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain per-bucket HLL sketch table ``name`` from parquet drops in
    ``input_dir``. ``available_now=True`` drains what's there and stops (one
    scheduled run / a test); ``False`` runs until stopped."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        delta = hll_bucket_sketches(batch, bucket_col, value_col, lgk)
        if sink.exists(name):
            merged = (
                sink.read(name)
                .unionByName(delta)
                .groupBy(bucket_col)
                .agg(F.hll_union_agg("sketch").alias("sketch"))
            )
        else:
            merged = delta
        sink.replace(name, merged, policy)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation",
        checkpoint_dir or f"{input_dir}/_hll_checkpoint",
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

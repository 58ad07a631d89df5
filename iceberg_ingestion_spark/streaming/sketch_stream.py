"""Streaming Count-Min sketch maintenance.

A CMS is a pure additive aggregate over (seed, bucket) cells, so a stream
maintains it exactly: per micro-batch, build the batch's cell counts with the
SAME ``sketches.count_min_table`` code path the batch engine uses and add
them into a persistent d×w cell table via ``foreachBatch``. Because cell
addition is associative and commutative, ANY split of the input into
micro-batches folds to the identical sketch as one batch pass — the same
split-invariance argument as ``rollup_stream`` (signed-delta IVM), pinned by
tests/test_clustering_and_r4b.py's split-stream parity test.

Why this matters at scale: a streaming corpus feed cannot re-scan history to
answer "roughly how often has value X arrived so far?", and keeping exact
per-key counts means unbounded state. The CMS table is a CONSTANT d·w rows
forever — state size is independent of both stream length and key
cardinality — while inheriting the batch operator's guarantees (never
underestimates; ε·N overcount bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.model import TablePolicy
from iceberg_ingestion_spark.operators.sketches import count_min_table
from iceberg_ingestion_spark.sinks import TableSink


def stream_count_min_maintenance(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    sink: TableSink,
    name: str,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    policy: TablePolicy = TablePolicy(),
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain CMS table ``name`` from parquet drops in ``input_dir``.
    ``available_now=True`` drains what's there and stops (one scheduled run /
    a test); ``False`` runs until stopped."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        delta = count_min_table(batch, value_col, depth, width)
        if sink.exists(name):
            merged = (
                sink.read(name)
                .unionByName(delta)
                .groupBy("seed", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        sink.replace(name, merged, policy)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation",
        checkpoint_dir or f"{input_dir}/_cms_checkpoint",
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Streaming Misra-Gries heavy-hitter maintenance.

MG summaries in optimal-offset form are MERGEABLE (Agarwal et al.,
"Mergeable Summaries", PODS'12): the merged summary is the counter-wise sum
of the sub-summaries, and the combined error is bounded by the sum of the
sub-bag offsets ≤ N/(k+1). The batch operator
(``sketches.mg_summary_merged``) exploits this over md5-assigned sub-bags;
the maintainer here streams the SAME computation: per micro-batch, compute
the optimal-offset sub-summaries of the newly-arrived sub-bags with the
batch code path and fold them into a persisted ``(value, est_cnt)`` summary
table by counter addition. Any grouping of whole sub-bags into micro-batches
folds to the identical summary as one batch pass (split invariance by
associativity/commutativity of the counter sum), and the driver entry
``sketch_mg_stream`` grades the streamed summary against the BATCH oracle.

DELIVERY CONTRACT — sub-bags arrive whole: the MG prune is a function of a
sub-bag's COMPLETE exact counts, so a sub-bag split across micro-batches
would be pruned on partial counts and break the guarantees. The maintainer
enforces idempotency at sub-bag granularity: alongside the summary it
persists the set of APPLIED sub-bag ids and drops already-seen sub-bags
from each batch — which also makes micro-batch redelivery a no-op (unlike
KMV, counter addition is not naturally idempotent, so redelivery safety
must come from the applied-set, the classic exactly-once ledger).

State layout (atomic pointer swap, shared :mod:`.pointer` discipline):
``table_dir`` is a symlink to a versioned dir holding ``summary/``
(value, est_cnt) and ``parts/`` (applied sub-bag ids).

Why this matters at scale: "which tokens are heavy so far?" over an
unbounded pre-aggregated shard stream needs either unbounded exact vocab
state or a mergeable summary; the MG table is ≤ k·P counter rows forever
with both guarantees (est ≤ true, true − est ≤ Σ offsets) intact on the
streamed table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from iceberg_ingestion_spark.operators.sketches import mg_summary_merged
from iceberg_ingestion_spark.streaming import pointer


def stream_mg_summary(
    spark: SparkSession,
    input_dir: str,
    schema: StructType,
    table_dir: str,
    checkpoint_dir: str,
    part_col: str,
    value_col: str,
    count_col: str,
    k: int,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain a merged-MG summary table at ``table_dir`` from parquet
    drops of pre-aggregated sub-bag counts ``(part, value, count)`` in
    ``input_dir``. Sub-bags must arrive whole (module docstring); rows of a
    sub-bag may span files within one drop (re-aggregated per batch).
    ``availableNow`` drains what's there and stops; ``False`` runs until
    stopped. Read the state with ``spark.read.parquet(table_dir +
    "/summary")``."""
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
        prev_target = pointer.current_version(table_dir)
        seen = summary = None
        if prev_target is not None:
            seen = spark.read.parquet(os.path.join(table_dir, "parts"))
            summary = spark.read.parquet(os.path.join(table_dir, "summary"))
        fresh_parts = batch.select(part_col).distinct()
        if seen is not None:
            fresh_parts = fresh_parts.join(seen, part_col, "left_anti")
        counts = (
            batch.join(fresh_parts, part_col, "left_semi")
            .groupBy(part_col, value_col)
            .agg(F.sum(count_col).alias("_bc"))
        )
        delta = mg_summary_merged(counts, part_col, value_col, "_bc", k)
        if summary is not None:
            merged = (
                summary.unionByName(delta)
                .groupBy("value")
                .agg(F.sum("est_cnt").alias("est_cnt"))
            )
            parts_u = seen.unionByName(fresh_parts)
        else:
            merged, parts_u = delta, fresh_parts
        vdir = pointer.claim_version_dir(table_dir, batch_id)
        merged.write.parquet(os.path.join(vdir, "summary"))
        parts_u.write.parquet(os.path.join(vdir, "parts"))
        pointer.publish_version(table_dir, vdir, prev_target)

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

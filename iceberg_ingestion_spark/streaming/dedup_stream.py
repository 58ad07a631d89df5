"""Streaming exact deduplication with bounded state.

The batch engine's exact_dedup (hash-groupBy) has a streaming analogue with a
crucial scale twist: unbounded ``dropDuplicates`` state grows forever, so the
watermark variant keeps a key in state only until the event-time watermark
passes — the standard shape for at-least-once sources (Kinesis/Kafka replays,
DMS re-drops) feeding a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def near_dup_stream_batch_fn(
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
):
    """``foreachBatch`` function for STREAMING near-dup detection against a
    growing corpus (rate limiting lives on the stream READER —
    ``stream_near_dup``'s ``max_files_per_trigger`` — not here; ADVICE r11
    removed the dead factory parameter that silently ignored it): each
    micro-batch SimHashes its docs, probes the
    persisted signature index for increment-vs-corpus pairs (plus its own
    in-batch pairs via :func:`dedup.simhash_pairs_incremental` /
    :func:`dedup.simhash_pairs`), appends the pairs, and appends its
    signatures to the index.

    State lives in the INDEX TABLE, not Spark streaming state: one BIGINT
    per doc ever seen, readable by any other job, and a restart resumes
    from it — the at-scale alternative to holding corpus-sized state in
    the state store. Invariant (pytest-pinned), INCLUDING under
    at-least-once redelivery: over a run, every within-radius pair is
    emitted EXACTLY ONCE — in the micro-batch where its later member FIRST
    arrives — so the union of all emitted pairs equals the batch
    :func:`dedup.simhash_pairs` over the full corpus. Ids re-delivered in
    a later micro-batch are treated as OLD-ONLY: the batch's signatures
    anti-join the index before pairing (ADVICE r5 #1), which removes both
    degenerate (X, X, 0) self-pairs and duplicate re-emissions of X's
    cross-batch pairs; X stays on the index side, so genuinely-new batch
    docs near X still pair with it exactly once.

    Replay safety: both writes are partitioned by ``_batch_id`` with
    dynamic partition overwrite, so a re-run of a failed batch overwrites
    its own partitions instead of duplicating rows (the standard
    foreachBatch idempotency idiom); the index probe drops duplicate ids
    defensively besides. Only the post-anti-join (first-seen) signatures
    are appended to the index — a re-delivered id never gets a second
    index row under a later ``_batch_id``."""
    from iceberg_ingestion_spark.operators import dedup, text

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        sigs = text.simhash60(batch_df, id_col).cache()
        try:
            # exclude this batch's own (replayed) partition and anything
            # later: a re-run must see exactly the index state the original
            # run saw, or it would pair the batch against its own previous
            # write (self/duplicate pollution)
            old = (
                spark.read.parquet(index_dir)
                .filter(F.col("_batch_id") < F.lit(batch_id))
                .dropDuplicates([id_col])
                .select(id_col, "simhash")
            )
            have_index = True
        except AnalysisException as e:
            # ONLY the path-missing case (first batch, no index yet) may
            # downgrade to in-batch pairing; any other AnalysisException
            # (schema drift, corrupt index — e.g. a missing simhash or
            # _batch_id column raises here too) must FAIL the batch, or
            # every new-vs-corpus pair of the batch would vanish silently
            cond = None
            for getter in ("getCondition", "getErrorClass"):
                try:
                    cond = getattr(e, getter)()
                except Exception:
                    continue
                if cond is not None:
                    break
            if cond != "PATH_NOT_FOUND":
                raise
            have_index = False
        if have_index:
            # re-delivered ids are OLD-ONLY (see docstring): drop them from
            # the new side so a replayed doc re-emits nothing, keeping the
            # disjoint-ids premise of simhash_pairs_incremental intact
            new = sigs.join(old.select(id_col), on=id_col, how="left_anti")
            pairs = dedup.simhash_pairs_incremental(
                old, new, id_col, max_hamming=max_hamming
            )
        else:
            new = sigs
            pairs = dedup.simhash_pairs(sigs, id_col, max_hamming=max_hamming)
        with_conf = spark.conf
        prev = with_conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        with_conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                pairs.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("_batch_id")
                .parquet(pairs_dir)
            )
            (
                new.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("_batch_id")
                .parquet(index_dir)
            )
        finally:
            with_conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        sigs.unpersist()

    return fn


def exact_dedup_stream(
    stream: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``subset`` key was already seen within the watermark
    horizon. State is O(keys per horizon), not O(stream); duplicates arriving
    later than ``watermark_delay`` after the original are NOT caught — pick the
    delay to cover the source's replay window."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        subset
    )


def stream_near_dup(
    spark,
    feed_dir: str,
    schema,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    max_files_per_trigger: int | None = None,
):
    """Start an ``availableNow`` streaming near-dup run over a parquet file
    feed: each micro-batch flows through :func:`near_dup_stream_batch_fn`
    (SimHash -> persisted-index probe -> pair/signature appends). Returns
    the started query; the caller drains it (``awaitTermination``). The
    checkpoint carries the batch counter across restarts, so successive
    drains against new feed files get strictly increasing ``_batch_id``s —
    the invariant the index's ``_batch_id < batch_id`` read relies on."""
    fn = near_dup_stream_batch_fn(
        index_dir, pairs_dir, id_col=id_col, text_col=text_col,
        max_hamming=max_hamming,
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # each micro-batch = at most this many whole files: lets ONE drain
        # process a multi-drop feed as separate batches (the entries' cheap
        # form; the multi-drain restart form is pytest-pinned)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    return (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )

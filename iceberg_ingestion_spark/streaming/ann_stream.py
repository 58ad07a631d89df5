"""Streaming ANN-index maintenance: PQ codes appended per micro-batch under
FROZEN codebooks.

The batch engine's daily-crawl contract for the PQ index
(``similarity.pq_codes_append``: per-doc encoding has no corpus statistics,
so ``encode(d1) ∪ encode(d2) == encode(d1 ∪ d2)`` exactly under a frozen
codebook relation) has a direct streaming analogue — the shape a continuous
ingestion pipeline runs between embedding inference and ANN serving: every
micro-batch encodes its NEW vectors and appends 16-byte code rows to the
persisted index table; probes (``similarity.topk_pq(codes=, codebooks=)``)
read the same table any batch job would.

State lives in the INDEX TABLE, not Spark streaming state (the
``dedup_stream`` posture): one code row per vector ever seen, readable by
any job, restart resumes from it. Invariant (pytest-pinned, including under
at-least-once redelivery): after any sequence of drains, the codes table
equals the one-shot batch ``similarity.pq_codes`` over all first-seen
vectors under the frozen codebooks — so a probe against the streamed index
is bit-identical to a probe against the batch index. Codebooks are built
ONCE from the first micro-batch and frozen (refreshing codebooks = index
rebuild, the same frozen-stats contract as every incremental dedup index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pq_index_stream_batch_fn(
    codes_dir: str,
    codebooks_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
):
    """``foreachBatch`` function for streamed PQ-index maintenance.
    (Rate limiting lives on the stream READER — ``stream_pq_index``'s
    ``max_files_per_trigger`` — not here; ADVICE r11 removed the dead
    factory parameter that silently ignored it.)

    Batch 0 (or whenever no codebook table exists yet): build the
    codebooks from THIS batch's vectors (the hash-spread draw —
    deterministic, no RNG) and persist them; they are FROZEN for the
    stream's lifetime. Every batch: anti-join already-indexed ids
    (re-delivered vectors are old-only and re-emit nothing — the
    ``dedup_stream`` redelivery rule), encode the survivors under the
    frozen codebooks, append partitioned by ``_batch_id`` with dynamic
    partition overwrite so a replayed batch overwrites its own partition
    instead of duplicating rows (the standard foreachBatch idempotency
    idiom)."""
    from iceberg_ingestion_spark.operators import similarity

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession

        def _path_missing(e: AnalysisException) -> bool:
            cond = None
            for getter in ("getCondition", "getErrorClass"):
                try:
                    cond = getattr(e, getter)()
                except Exception:  # noqa: BLE001
                    continue
                if cond is not None:
                    break
            return cond == "PATH_NOT_FOUND"

        try:
            books = spark.read.parquet(codebooks_dir)
        except AnalysisException as e:
            # only the no-codebooks-yet case may build; any other analysis
            # error (schema drift, corrupt table) must fail the batch — a
            # silently rebuilt codebook would re-key every existing code
            if not _path_missing(e):
                raise
            books = similarity.pq_codebooks(
                batch_df, id_col, vec_col, dim, m, n_codes
            )
            books.write.mode("error").parquet(codebooks_dir)
            books = spark.read.parquet(codebooks_dir)
        try:
            seen = (
                spark.read.parquet(codes_dir)
                .filter(F.col("_batch_id") < F.lit(batch_id))
                .select(id_col)
                .dropDuplicates([id_col])
            )
        except AnalysisException as e:
            if not _path_missing(e):
                raise
            seen = None
        new = (
            batch_df
            if seen is None
            else batch_df.join(seen, on=id_col, how="left_anti")
        )
        codes = similarity.pq_codes(new, id_col, vec_col, dim, books, m)
        conf = spark.conf
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                codes.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("_batch_id")
                .parquet(codes_dir)
            )
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return fn


def stream_pq_index(
    spark,
    feed_dir: str,
    schema,
    codes_dir: str,
    codebooks_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    max_files_per_trigger: int | None = None,
):
    """Start an ``availableNow`` streamed PQ-index run over a parquet file
    feed: each micro-batch flows through :func:`pq_index_stream_batch_fn`
    (frozen-codebook encode → idempotent code append). Returns the started
    query; the caller drains it. The checkpoint carries the batch counter
    across drains, so successive drains get strictly increasing
    ``_batch_id``s — the invariant the ``_batch_id < batch_id`` seen-read
    relies on."""
    fn = pq_index_stream_batch_fn(
        codes_dir, codebooks_dir, id_col=id_col, vec_col=vec_col,
        dim=dim, m=m, n_codes=n_codes,
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

"""Streaming corpus preparation: the pretraining feed pipeline as a
Structured Streaming composition of the batch corpus operators.

Stage order and state budget (the design constraint in streaming):

1. **exact dedup** — ``dropDuplicatesWithinWatermark`` on the content
   fingerprint: the only stateful stage, state bounded by keys per watermark
   horizon (see ``dedup_stream``).
2. **quality gate** — token-count bounds; pure map-side expressions.
3. **decontamination** — the benchmark n-gram set is eval-suite-sized by
   definition, so it rides along as a broadcast Python set inside an
   Arrow-batched kernel (same tokenizer as ``dedup.shingle_sets``). Map-only:
   the stream-side n-grams are never exploded into a stateful join; a doc is
   dropped the moment one of its n-grams hits the set.
4. **weighted mix** — md5-bucket thresholding (``corpus.weighted_mix``), no
   RNG, map-only; a doc's keep/drop decision is identical in batch and
   streaming, replay-stable under at-least-once sources.

Every stage except (1) is stateless, so the pipeline's state never grows with
corpus size — the property that lets the same code run over a 100 TB backfill
(batch) and the live feed (stream). Batch/stream equivalence is pinned by
tests/test_streaming_corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import corpus, text
from iceberg_ingestion_spark.streaming.dedup_stream import exact_dedup_stream


def with_contamination_flag(
    docs: DataFrame,
    bench_ngrams: set[str],
    text_col: str = "text",
    n: int = 4,
) -> DataFrame:
    """Add ``contaminated`` (boolean): does the doc share ANY word ``n``-gram
    with the benchmark set? Arrow-batched kernel over a broadcast Python set —
    works identically on batch and streaming DataFrames (no shuffle, no
    state). Tokenizer matches ``dedup.shingle_sets`` (``\\s+`` split of
    trimmed lower-cased text)."""
    import re

    ws = re.compile(r"\s+")
    bench = frozenset(bench_ngrams)
    cols = docs.columns
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema)

    def kernel(batches):
        for pdf in batches:
            flags = []
            for t in pdf[text_col]:
                # NULL text -> empty token list -> contaminated=false, matching
                # the batch SQL side's NULL-propagating regexp behavior.
                toks = ws.split((t if isinstance(t, str) else "").strip().lower())
                hit = False
                for i in range(len(toks) - n + 1):
                    if " ".join(toks[i : i + n]) in bench:
                        hit = True
                        break
                flags.append(hit)
            pdf = pdf.copy()
            pdf["contaminated"] = flags
            yield pdf

    return docs.mapInPandas(kernel, schema=f"{fields}, contaminated boolean")


def stream_corpus_prep(
    stream: DataFrame,
    bench_ngrams: set[str],
    mix_weights: dict[str, float] | None = None,
    text_col: str = "text",
    lang_col: str = "lang",
    key_col: str = "doc_id",
    ts_col: str = "ts",
    n: int = 4,
    min_tokens: int = 5,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """The streaming pretraining feed: dedup -> quality gate -> decon -> mix.
    Returns the kept-document stream (original columns + ``n_tokens``)."""
    deduped = exact_dedup_stream(
        stream.withColumn("_fp", text.fingerprint_md5(text_col)),
        subset=["_fp"],
        ts_col=ts_col,
        watermark_delay=watermark_delay,
    ).drop("_fp")
    gated = deduped.withColumn("n_tokens", text.token_count_ws(text_col)).where(
        F.col("n_tokens") >= min_tokens
    )
    flagged = with_contamination_flag(gated, bench_ngrams, text_col, n)
    clean = flagged.where(~F.col("contaminated")).drop("contaminated")
    if mix_weights is not None:
        clean = corpus.weighted_mix(clean, lang_col, mix_weights, key=key_col)
    return clean


def corpus_feed_health(
    stream: DataFrame,
    bench_ngrams: set[str],
    text_col: str = "text",
    ts_col: str = "ts",
    n: int = 4,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-window corpus-feed health metrics: doc volume, contamination rate,
    and exact-duplicate rate — the monitoring signals a live pretraining feed
    alarms on (a contamination spike means an eval suite leaked into a
    source; a dup-rate spike means an upstream replay).

    Duplicate rate is within-window (count minus distinct fingerprints over
    the window) — a bounded-state approximation of corpus-wide dup tracking,
    which is exactly what a monitoring signal wants. Exact ``count_distinct``
    is not allowed in streaming aggregations (it would need unbounded
    per-group distinct state), so the fingerprint cardinality is HLL++
    (``approx_count_distinct``, ~2% rsd) — constant state per window, the
    right trade for an alarm threshold. Map-only flagging + one windowed
    aggregate; append-mode emits each window exactly once.
    """
    flagged = with_contamination_flag(
        stream.withColumn("_fp", text.fingerprint_md5(text_col)),
        bench_ngrams,
        text_col,
        n,
    )
    return (
        flagged.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("contaminated").cast("int")).alias("contamination_rate"),
            F.greatest(
                F.lit(0.0),
                (F.count(F.lit(1)) - F.approx_count_distinct("_fp"))
                / F.count(F.lit(1)),
            ).alias("dup_rate"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "n_docs",
            "contamination_rate",
            "dup_rate",
        )
    )

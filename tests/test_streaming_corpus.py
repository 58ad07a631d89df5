"""Streaming corpus prep must equal the batch composition on the same data —
the invariant that lets one pipeline serve both the backfill and the live
feed."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import corpus, text
from iceberg_ingestion_spark.streaming.corpus_stream import (
    stream_corpus_prep,
    with_contamination_flag,
)

SCHEMA_DDL = "doc_id long, text string, lang string, ts timestamp"
WEIGHTS = {"en": 1.0, "de": 0.5}


def _rows():
    t0 = datetime(2026, 1, 1)
    bench_text = "alpha beta gamma delta epsilon"
    return [
        (0, bench_text, "en", t0),                              # benchmark doc
        (1, "alpha beta gamma delta poisoned tail", "en", t0),  # contaminated
        (2, "clean document with many unique tokens here", "en", t0),
        (3, "clean document with many unique tokens here", "en", t0),  # dup of 2
        (4, "short", "en", t0),                                 # quality-gated
        (5, "ein sauberes deutsches dokument mit tokens", "de", t0),
        (6, "another perfectly clean english document sample", "en", t0),
    ]


def _bench_ngrams(spark, docs_df, n=4):
    bench = docs_df.where("doc_id = 0")
    return {r["ngram"] for r in corpus.ngram_table(bench, "doc_id", n=n).collect()}


def test_contamination_flag_matches_batch_operator(spark):
    docs = spark.createDataFrame(_rows(), SCHEMA_DDL)
    bench = _bench_ngrams(spark, docs)
    flagged = with_contamination_flag(docs.where("doc_id != 0"), bench, n=4)
    got = {r["doc_id"]: r["contaminated"] for r in flagged.collect()}
    batch = corpus.contamination_counts(
        docs.where("doc_id != 0"), docs.where("doc_id = 0"), n=4
    )
    batch_hits = {r["doc_id"] for r in batch.collect()}
    assert {k for k, v in got.items() if v} == batch_hits == {1}


def test_stream_corpus_prep_equals_batch(spark, tmp_path):
    input_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    docs = spark.createDataFrame(_rows(), SCHEMA_DDL)
    docs.coalesce(1).write.mode("append").parquet(input_dir)
    bench = _bench_ngrams(spark, docs)

    stream = spark.readStream.schema(docs.schema).parquet(input_dir)
    kept = stream_corpus_prep(
        stream, bench, mix_weights=WEIGHTS, min_tokens=5
    )
    q = (
        kept.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointPath", ckpt)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}

    # batch composition of the same stages on the same data
    b = docs.dropDuplicates(["text"])
    b = b.withColumn("n_tokens", text.token_count_ws("text")).where("n_tokens >= 5")
    contaminated = {1, 0} | {
        r["doc_id"]
        for r in corpus.contamination_counts(b, docs.where("doc_id = 0"), n=4).collect()
    }
    b = b.where(~b.doc_id.isin(list(contaminated)))
    b = corpus.weighted_mix(b, "lang", WEIGHTS, key="doc_id")
    expected = {r["doc_id"] for r in b.collect()}

    # doc 0 is the benchmark doc itself: the streaming pipeline sees it in the
    # feed and drops it as contaminated (it IS benchmark text); mirror that.
    # Docs 2/3 are content-identical, and WHICH survives dedup is
    # engine-arbitrary — normalize the pair to its min id before comparing.
    norm = lambda s: {2 if d == 3 else d for d in s}  # noqa: E731
    assert norm(got) == norm(expected)
    assert 1 not in got and 4 not in got  # decon + quality gates held
    assert got & {2, 3} != {2, 3}  # dup pair collapsed to one survivor


def test_corpus_feed_health_metrics(spark, tmp_path):
    from iceberg_ingestion_spark.streaming.corpus_stream import corpus_feed_health

    input_dir = str(tmp_path / "health_in")
    os.makedirs(input_dir)
    docs = spark.createDataFrame(_rows(), SCHEMA_DDL)
    docs.coalesce(1).write.mode("append").parquet(input_dir)
    bench = _bench_ngrams(spark, docs)

    stream = spark.readStream.schema(docs.schema).parquet(input_dir)
    health = corpus_feed_health(stream, bench, window_duration="1 hour")
    q = (
        health.writeStream.format("memory")
        .queryName("health")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from health").collect()
    assert len(rows) == 1  # all fixture docs share one event-time hour
    r = rows[0]
    assert r["n_docs"] == 7
    # docs 0 (benchmark itself) and 1 are contaminated -> 2/7
    assert abs(r["contamination_rate"] - 2 / 7) < 1e-9
    # docs 2 and 3 are content-identical; HLL at 7 keys is exact in practice
    assert abs(r["dup_rate"] - 1 / 7) < 0.05

def test_near_dup_stream_emits_each_pair_exactly_once(spark, tmp_path):
    """Streaming near-dup against the growing signature index: over a
    multi-batch run, the union of emitted pairs equals the batch
    simhash_pairs over the full corpus — each pair exactly once, in the
    micro-batch where its later member arrived."""
    from iceberg_ingestion_spark.operators import dedup, text
    from iceberg_ingestion_spark.streaming.dedup_stream import (
        near_dup_stream_batch_fn,
    )

    input_dir = str(tmp_path / "in")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(input_dir)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    first = docs.filter("doc_id % 2 = 0")
    second = docs.filter("doc_id % 2 = 1").unionByName(
        first.limit(5).withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    first.coalesce(1).write.mode("append").parquet(input_dir)
    second.coalesce(1).write.mode("append").parquet(input_dir)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            near_dup_stream_batch_fn(index_dir, pairs_dir, max_hamming=6)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.id_1, r.id_2, r.hamming)
        for r in spark.read.parquet(pairs_dir).select("id_1", "id_2", "hamming").collect()
    }
    all_docs = first.unionByName(second)
    expected = {
        (r.id_1, r.id_2, r.hamming)
        for r in dedup.simhash_pairs(
            text.simhash60(all_docs, "doc_id"), "doc_id", max_hamming=6
        ).collect()
    }
    assert got == expected and len(expected) > 0
    # the index now holds one signature per doc ever seen
    n_idx = spark.read.parquet(index_dir).dropDuplicates(["doc_id"]).count()
    assert n_idx == all_docs.count()

def test_near_dup_stream_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id) overwrites its own partitions
    and probes only earlier index partitions — outputs are unchanged."""
    from iceberg_ingestion_spark.streaming.dedup_stream import (
        near_dup_stream_batch_fn,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b0 = docs.filter("doc_id % 2 = 0")
    b1 = docs.filter("doc_id % 2 = 1").unionByName(
        b0.limit(4).withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    fn = near_dup_stream_batch_fn(index_dir, pairs_dir, max_hamming=6)
    fn(b0, 0)
    fn(b1, 1)
    snap = lambda d: {tuple(r) for r in spark.read.parquet(d).collect()}  # noqa: E731
    pairs_before, index_before = snap(pairs_dir), snap(index_dir)
    fn(b1, 1)  # replay
    assert snap(pairs_dir) == pairs_before
    assert snap(index_dir) == index_before

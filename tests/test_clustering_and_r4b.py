"""Round-4 extension operators: k-means (exact-decimal Lloyd), CMS,
boilerplate scrub, shard assignment — correctness + the properties that
matter at scale (partition-order determinism, broadcast plans, guarantees)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import clustering, corpus, sketches

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# clustering
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_assign_nearest_every_vector_assigned_once(spark, embeddings):
    cents = clustering.hash_spread_centroids(embeddings, "vec_id", "embedding", 8)
    out = clustering.assign_nearest(embeddings, cents, "vec_id", "embedding", 64)
    assert out.count() == embeddings.count()
    assert out.select("vec_id").distinct().count() == embeddings.count()
    # every assigned centroid is one of the codebook ids
    cids = {r.cluster_id for r in cents.select("cluster_id").collect()}
    assert {r.cluster_id for r in out.select("cluster_id").distinct().collect()} <= cids


def test_assign_nearest_is_argmin(spark, embeddings):
    """The chosen cluster's distance is <= every other centroid's distance
    (cross-checked by brute force on a 50-vector sample)."""
    sample = embeddings.limit(50)
    cents = clustering.hash_spread_centroids(embeddings, "vec_id", "embedding", 8)
    got = {
        r.vec_id: (r.cluster_id, r.sq_dist)
        for r in clustering.assign_nearest(sample, cents, "vec_id", "embedding", 64).collect()
    }
    C = {r.cluster_id: r.centroid for r in cents.collect()}
    for r in sample.collect():
        v = [float(x) for x in r.embedding]
        dists = {
            cid: sum((v[i] - c[i]) ** 2 for i in range(64)) for cid, c in C.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        assert got[r.vec_id][0] == best[0]
        assert got[r.vec_id][1] == pytest.approx(best[1], rel=1e-9)


def test_assign_nearest_broadcasts_centroids(spark, embeddings):
    cents = clustering.hash_spread_centroids(embeddings, "vec_id", "embedding", 8)
    plan = _plan(clustering.assign_nearest(embeddings, cents, "vec_id", "embedding", 64))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_lloyd_partition_order_invariant(spark, embeddings):
    """THE deterministic-distributed-kmeans property: decimal-exact centroid
    accumulation makes the result identical under any partitioning — a
    float-summing implementation fails this under repartition(17) vs (3)."""
    a_assign, a_cents = clustering.kmeans_lloyd(
        embeddings.repartition(17), "vec_id", "embedding", 64, k=4, iterations=2
    )
    b_assign, b_cents = clustering.kmeans_lloyd(
        embeddings.repartition(3), "vec_id", "embedding", 64, k=4, iterations=2
    )
    ca = sorted((r.cluster_id, tuple(r.centroid)) for r in a_cents.collect())
    cb = sorted((r.cluster_id, tuple(r.centroid)) for r in b_cents.collect())
    assert ca == cb  # bit-identical, not approx
    aa = sorted((r.vec_id, r.cluster_id) for r in a_assign.collect())
    ab = sorted((r.vec_id, r.cluster_id) for r in b_assign.collect())
    assert aa == ab


def test_kmeans_lloyd_objective_decreases(spark, embeddings):
    def objective(assign):
        return assign.agg(F.sum("sq_dist")).first()[0]

    a1, _ = clustering.kmeans_lloyd(embeddings, "vec_id", "embedding", 64, k=4, iterations=1)
    a3, _ = clustering.kmeans_lloyd(embeddings, "vec_id", "embedding", 64, k=4, iterations=3)
    assert objective(a3) <= objective(a1) + 1e-9


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """Two far groups + k=3 seeded so one centroid captures nothing: k stays 3
    and the starved centroid survives verbatim."""
    rows = [(i, [float(i % 2) * 100.0] * 4) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    _, cents = clustering.kmeans_lloyd(df, "vec_id", "embedding", 4, k=3, iterations=2)
    assert cents.count() == 3


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_count_min_never_underestimates(spark):
    df = spark.range(0, 5000).select((F.col("id") % 67).alias("k"))
    cms = sketches.count_min_table(df, "k", depth=4, width=64)  # narrow: force collisions
    probes = df.select("k").distinct()
    est = sketches.count_min_estimate(cms, probes, "k", depth=4, width=64)
    exact = df.groupBy(F.col("k").cast("string").alias("value")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    rows = est.join(exact, "value").collect()
    assert len(rows) == 67
    assert all(r.est_cnt >= r.exact for r in rows)


def test_count_min_exact_when_no_collisions(spark):
    df = spark.range(0, 40).select((F.col("id") % 4).alias("k"))
    cms = sketches.count_min_table(df, "k", depth=4, width=4096)
    est = sketches.count_min_estimate(cms, df.select("k").distinct(), "k", depth=4, width=4096)
    assert sorted((r.value, r.est_cnt) for r in est.collect()) == [
        ("0", 10), ("1", 10), ("2", 10), ("3", 10)
    ]


def test_count_min_sketch_size_is_bounded(spark):
    df = spark.range(0, 10000).select(F.col("id").alias("k"))  # 10k distinct keys
    cms = sketches.count_min_table(df, "k", depth=4, width=128)
    assert cms.count() <= 4 * 128


def test_count_min_probe_join_is_broadcast(spark):
    df = spark.range(0, 1000).select((F.col("id") % 50).alias("k"))
    cms = sketches.count_min_table(df, "k")
    est = sketches.count_min_estimate(cms, df.select("k").distinct(), "k")
    assert "BroadcastExchange" in _plan(est)


# ---------------------------------------------------------------------------
# boilerplate scrub + shard assignment
# ---------------------------------------------------------------------------


def test_boilerplate_scrub_removes_shared_chunks_only(spark):
    rows = [
        (1, "alpha beta gamma delta " + "sub now join free " * 1),
        (2, "epsilon zeta eta theta " + "sub now join free"),
        (3, "unique words only here truly"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in corpus.boilerplate_chunk_scrub(df, chunk_words=4, min_docs=2).collect()
    }
    assert out[1].n_removed == 1 and out[1].cleaned_text == "alpha beta gamma delta"
    assert out[2].n_removed == 1 and out[2].cleaned_text == "epsilon zeta eta theta"
    assert out[3].n_removed == 0
    assert out[3].cleaned_text == "unique words only here truly"


def test_boilerplate_scrub_keeps_fully_scrubbed_doc_row(spark):
    rows = [(1, "spam spam spam spam"), (2, "spam spam spam spam")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in corpus.boilerplate_chunk_scrub(df, chunk_words=4).collect()}
    assert set(out) == {1, 2}
    assert out[1].cleaned_text == "" and out[1].n_removed == out[1].n_chunks == 1


def test_boilerplate_scrub_rebuild_is_identity_when_clean(spark):
    rows = [(1, "One  Two   three\tfour five"), (2, "six seven eight nine ten eleven")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in corpus.boilerplate_chunk_scrub(df, chunk_words=4).collect()}
    # rebuild normalizes whitespace/case (the same normalization every text
    # operator applies), nothing else
    assert out[1].cleaned_text == "one two three four five"
    assert out[2].cleaned_text == "six seven eight nine ten eleven"


def test_shard_assign_stable_and_uniform(spark):
    df = spark.range(0, 10000).select(F.col("id").alias("doc_id"))
    sharded = corpus.shard_assign(df, "doc_id", 16)
    counts = {r.shard_id: r.c for r in sharded.groupBy("shard_id").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(counts) == set(range(16))
    assert max(counts.values()) < 2 * min(counts.values())
    # stability: a doc's shard doesn't depend on which other docs are present
    sub = corpus.shard_assign(df.where(F.col("doc_id") < 100), "doc_id", 16)
    full = {r.doc_id: r.shard_id for r in sharded.where(F.col("doc_id") < 100).collect()}
    assert {r.doc_id: r.shard_id for r in sub.collect()} == full


def test_shard_assign_partitioned_write_layout(spark, tmp_path):
    """End-to-end export: partitionBy(shard_id) produces one directory per
    shard whose files contain exactly that shard's docs."""
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    sharded = corpus.shard_assign(df, "doc_id", 8)
    path = str(tmp_path / "export")
    sharded.write.partitionBy("shard_id").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 500
    reassigned = corpus.shard_assign(back.drop("shard_id"), "doc_id", 8)
    mismatch = (
        back.select("doc_id", F.col("shard_id").cast("int").alias("disk_shard"))
        .join(reassigned.withColumnRenamed("shard_id", "calc_shard"), "doc_id")
        .where(F.col("disk_shard") != F.col("calc_shard"))
    )
    assert mismatch.count() == 0


# ---------------------------------------------------------------------------
# JSONL export / source round-trip
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_with_shards(spark, tmp_path):
    from iceberg_ingestion_spark.sources import read_jsonl, write_jsonl

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sharded = corpus.shard_assign(docs, "doc_id", 4)
    path = str(tmp_path / "export")
    write_jsonl(sharded, path, partition_cols=("shard_id",))
    back = read_jsonl(
        spark, path, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    assert back.count() == docs.count()
    assert back.where(F.col("_corrupt_record").isNotNull()).select(
        "doc_id", "_corrupt_record"
    ).count() == 0
    # full content fidelity through the JSON round-trip
    orig = {(r.doc_id, r.text, r.lang) for r in docs.collect()}
    got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert got == orig


def test_jsonl_corrupt_lines_are_quarantined_not_fatal(spark, tmp_path):
    from iceberg_ingestion_spark.sources import read_jsonl

    p = tmp_path / "feed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        'NOT JSON AT ALL\n'
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    df = read_jsonl(spark, str(p), "doc_id bigint, text string")
    assert df.count() == 3
    # quarantine projection keeps a data column (Spark rejects corrupt-only
    # schemas — see read_jsonl docstring)
    quarantined = df.where(F.col("_corrupt_record").isNotNull()).select(
        "doc_id", "_corrupt_record"
    )
    assert quarantined.count() == 1
    clean = df.where(F.col("_corrupt_record").isNull())
    assert clean.count() == 2
    assert {r.doc_id for r in clean.select("doc_id").collect()} == {1, 2}


# ---------------------------------------------------------------------------
# End-to-end corpus-prep pipeline: scrub -> dedup -> mix -> pack -> shard ->
# JSONL export (the full pre-tokenization path on real testdata)
# ---------------------------------------------------------------------------


def test_corpus_prep_pipeline_end_to_end(spark, tmp_path):
    from iceberg_ingestion_spark.operators import dedup, text
    from iceberg_ingestion_spark.sources import read_jsonl, write_jsonl

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_in = docs.count()

    # 1. corpus-level boilerplate scrub (keep every doc row, text rewritten)
    scrubbed = corpus.boilerplate_chunk_scrub(docs, chunk_words=4, min_docs=2)
    cleaned = scrubbed.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id", F.col("cleaned_text").alias("text"), "lang"
    )
    assert cleaned.count() == n_in

    # 2. exact dedup on the CLEANED text (scrubbing can create new exact dups)
    keep = dedup.duplicate_groups(
        cleaned.where(F.col("text") != ""), "doc_id",
        text.fingerprint_md5("text"), min_count=1,
    ).select(F.col("keep_id").alias("doc_id"))
    deduped = cleaned.join(keep, "doc_id")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_in

    # 3. deterministic language mix
    mixed = corpus.weighted_mix(
        deduped, "lang", {"en": 1.0, "de": 1.0, "fr": 0.5, "es": 0.5, "zh": 0.5}
    )
    n_mixed = mixed.count()
    assert 0 < n_mixed <= n_dedup

    # 4. pack into token-budget sequences, then shard + export
    packed = corpus.pack_sequences(
        mixed, "lang", text.token_count_ws("text").cast("long"), budget=512
    )
    sharded = corpus.shard_assign(packed, "doc_id", 4)
    out = str(tmp_path / "train")
    write_jsonl(
        sharded.select("doc_id", "text", "lang", "shard", "seq_index", "shard_id"),
        out, partition_cols=("shard_id",),
    )
    back = read_jsonl(
        spark, out,
        "doc_id bigint, text string, lang string, shard int, seq_index bigint",
    )
    assert back.count() == n_mixed
    assert back.where(F.col("_corrupt_record").isNotNull()).count() == 0
    # determinism end to end: rerunning the pipeline reproduces the exact id set
    rerun = corpus.weighted_mix(
        deduped, "lang", {"en": 1.0, "de": 1.0, "fr": 0.5, "es": 0.5, "zh": 0.5}
    )
    assert {r.doc_id for r in rerun.select("doc_id").collect()} == {
        r.doc_id for r in back.select("doc_id").collect()
    }


# ---------------------------------------------------------------------------
# streaming CMS maintenance
# ---------------------------------------------------------------------------


def test_stream_count_min_split_equals_batch(spark, tmp_path):
    """CMS cell addition is associative+commutative, so a stream split into
    two arbitrary drops folds to the EXACT sketch a single batch pass builds
    — and estimates from the streamed sketch inherit the batch guarantees."""
    import os

    from iceberg_ingestion_spark.sinks import ParquetVersionedSink
    from iceberg_ingestion_spark.streaming.sketch_stream import (
        stream_count_min_maintenance,
    )

    base = spark.range(0, 3000).select("id", (F.col("id") % 97).alias("k"))
    full = base.select("k")
    d1 = base.where(F.col("id") % 3 != 0).select("k")
    d2 = base.where(F.col("id") % 3 == 0).select("k")
    in_dir, ckpt, wh = (str(tmp_path / d) for d in ("in", "ckpt", "wh"))
    os.makedirs(in_dir)
    sink = ParquetVersionedSink(spark, wh)
    d1.coalesce(1).write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def run():
        q = stream_count_min_maintenance(
            spark, in_dir, schema, sink, "db.cms", "k", checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    run()
    d2.coalesce(1).write.mode("append").parquet(in_dir)
    run()

    streamed = {
        (r.seed, r.bucket): r.cnt for r in sink.read("db.cms").collect()
    }
    batch = {
        (r.seed, r.bucket): r.cnt
        for r in sketches.count_min_table(full, "k").collect()
    }
    assert streamed == batch
    # estimates from the streamed sketch: never underestimate
    est = sketches.count_min_estimate(
        sink.read("db.cms"), full.select("k").distinct(), "k"
    )
    exact = {r.value: r.c for r in full.groupBy(F.col("k").cast("string").alias("value")).agg(F.count(F.lit(1)).alias("c")).collect()}
    assert all(r.est_cnt >= exact[r.value] for r in est.collect())


# ---------------------------------------------------------------------------
# plan-shape regression pins for the r4-continuation entries
# ---------------------------------------------------------------------------


def _entry_plan(spark, name):
    import __spark_entry__ as entry_mod

    return entry_mod.queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def _no_python_eval(plan):
    return not any(s in plan for s in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))


def test_boilerplate_scrub_plan_is_all_jvm_no_global_exchange(spark):
    """The scrub's claim: higher-order functions only, no Python eval, no
    single-partition exchange anywhere (all three shuffles are keyed)."""
    plan = _entry_plan(spark, "text_boilerplate_scrub")
    assert _no_python_eval(plan)
    assert "SinglePartition" not in plan


def test_rolling_7d_plan_keyed_window_no_global_exchange(spark):
    plan = _entry_plan(spark, "events_rolling_7d")
    assert _no_python_eval(plan)
    assert "SinglePartition" not in plan  # window is per-user, never global


def test_cms_plan_prunes_to_key_column_and_broadcasts(spark):
    """Column pruning must reach the scan (a CMS build that decodes all 16
    lineitem columns is wrong) and the probe join must broadcast the
    sketch; the only SinglePartition exchange is the documented 1-row N."""
    plan = _entry_plan(spark, "sketch_count_min")
    import re

    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert all(
        all(c.startswith("l_suppkey") for c in filter(None, s.split(",")))
        for s in scans
    ), scans
    assert "BroadcastExchange" in plan
    assert plan.count("SinglePartition") == 1
    assert _no_python_eval(plan)


def test_shard_stats_and_quantile_filter_plans(spark):
    """Pruned scans; SinglePartition exchanges only for the documented
    1-row broadcast aggregates (1 for the shard total; 2 for the quantile
    filter's total + threshold)."""
    plan = _entry_plan(spark, "corpus_shard_stats")
    assert _no_python_eval(plan) and plan.count("SinglePartition") == 1
    plan = _entry_plan(spark, "text_token_quantile_filter")
    assert _no_python_eval(plan) and plan.count("SinglePartition") == 2

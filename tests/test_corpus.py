"""Corpus-preparation operators: decontamination, mixing, packing, chunk dedup.

Cross-engine value exactness is pinned by the DuckDB oracles
(queries_ext: decon_benchmark_overlap / mix_weighted_sample /
pack_token_budget / dedup_exact_chunks); these tests pin the semantic
contracts and the plan shapes that matter at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_contamination_counts_flags_overlap_only(spark):
    bench = _docs(spark, [(0, "alpha beta gamma delta epsilon zeta")])
    cor = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 4-grams
            (2, "one two three four five six"),  # disjoint
            (3, "x y alpha beta gamma delta z"),  # shares one 4-gram
        ],
    )
    got = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in corpus.contamination_counts(cor, bench, n=4).collect()
    }
    assert got == {1: 2, 3: 1}  # doc 2 absent: clean docs never surface


def test_contamination_broadcasts_benchmark_side(spark):
    bench = _docs(spark, [(0, "a b c d e")])
    cor = _docs(spark, [(1, "a b c d e f")])
    plan = corpus.contamination_counts(cor, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_mix_deterministic_and_drops_unknown_strata(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 else "xx") for i in range(200)]
    )
    kept = corpus.weighted_mix(df, "lang", {"en": 0.5}, key="doc_id")
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in kept.collect())
    assert a == b  # no RNG: identical across evaluations
    assert all(i % 2 == 1 for i in a)  # unknown stratum 'xx' dropped entirely
    assert 20 <= len(a) <= 80  # ~half of the 100 'en' docs


def test_weighted_mix_weight_one_keeps_everything(spark):
    df = spark.createDataFrame([Row(doc_id=i, lang="en") for i in range(50)])
    assert corpus.weighted_mix(df, "lang", {"en": 1.0}).count() == 50


def test_pack_sequences_bin_assignment(spark):
    # single group/shard: doc sizes 60,60,60 at budget 100 -> seqs 0,0,1
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", n=60) for i in range(3)]
    )
    packed = corpus.pack_sequences(df, "lang", F.col("n"), budget=100, shards=1)
    got = {r["doc_id"]: r["seq_index"] for r in packed.collect()}
    assert got == {0: 0, 1: 0, 2: 1}  # doc 2 starts at token 120 -> seq 1


def test_pack_sequences_sharding_bounds_sort_groups(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, lang="en", n=10) for i in range(100)]
    )
    packed = corpus.pack_sequences(df, "lang", F.col("n"), budget=50, shards=4)
    per_shard = packed.groupBy("shard").count().collect()
    assert {r["shard"] for r in per_shard} == {0, 1, 2, 3}
    # within every (lang, shard), seq_index is non-decreasing in doc_id order
    rows = packed.orderBy("shard", "doc_id").collect()
    last = {}
    for r in rows:
        key = (r["lang"], r["shard"])
        assert r["seq_index"] >= last.get(key, 0)
        last[key] = r["seq_index"]


def test_chunk_table_drops_trailing_partial(spark):
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(25)))])
    # 25 words at chunk_words=10 -> exactly 2 full chunks
    assert corpus.chunk_table(df, "doc_id", chunk_words=10).count() == 2


def test_chunk_table_null_text_yields_no_chunks(spark):
    """NULL text must produce zero chunks, not crash the Arrow kernel
    (ADVICE r3) — matching the SQL side where regexp functions return NULL."""
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, None)],
        "doc_id long, text string",
    )
    rows = corpus.chunk_table(df, "doc_id", chunk_words=10).collect()
    assert [r.doc_id for r in rows] == [1]


def test_chunk_duplicate_counts_cross_doc(spark):
    shared = " ".join(f"tok{i}" for i in range(10))
    df = _docs(
        spark,
        [
            (1, shared + " filler one two three four five six seven eight nine"),
            (2, shared + " other pad a b c d e f g h"),
            (3, "totally different words " + " ".join(f"u{i}" for i in range(10))),
        ],
    )
    dups = corpus.chunk_duplicate_counts(df, chunk_words=10).collect()
    assert len(dups) == 1
    assert dups[0]["n_occurrences"] == 2 and dups[0]["n_docs"] == 2


def test_chunk_duplicate_counts_within_doc_repeat(spark):
    block = " ".join(f"r{i}" for i in range(10))
    df = _docs(spark, [(1, block + " " + block)])
    dups = corpus.chunk_duplicate_counts(df, chunk_words=10).collect()
    assert len(dups) == 1
    assert dups[0]["n_occurrences"] == 2 and dups[0]["n_docs"] == 1


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1 for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )


def test_pack_sequences_single_shuffle(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=i, lang="en", n=10) for i in range(50)])
    packed = corpus.pack_sequences(df, "lang", F.col("n"), budget=100, shards=4)
    assert _n_exchanges(packed) == 1  # exactly the window's partition-by


def test_funnel_single_shuffle(spark):
    from pyspark.sql import Row

    from iceberg_ingestion_spark.operators.funnel import funnel_stage_times

    ev = spark.createDataFrame(
        [Row(user_id=1, event_type="view", ts_us=10),
         Row(user_id=1, event_type="click", ts_us=20)]
    )
    times = funnel_stage_times(ev, ["view", "click"])
    # one exchange for the groupBy; stage chaining is pure expressions
    assert _n_exchanges(times) == 1


def test_batch_pipeline_end_to_end(spark):
    """The full corpus-prep chain on real testdata: exact dedup -> decon ->
    quality gate -> mix -> pack. Pins stage composability and row
    conservation (each stage only removes rows; packing only adds columns)."""
    from iceberg_ingestion_spark.operators import text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = docs.count()

    deduped = docs.dropDuplicates(["text"])
    bench = docs.where(F.col("doc_id") % 97 == 0)
    hits = corpus.contamination_counts(
        deduped.where(F.col("doc_id") % 97 != 0), bench, n=4
    )
    clean = deduped.join(hits.select("doc_id"), "doc_id", "left_anti").where(
        F.col("doc_id") % 97 != 0
    )
    gated = clean.withColumn("n_tokens", text.token_count_ws("text")).where(
        "n_tokens >= 5"
    )
    mixed = corpus.weighted_mix(gated, "lang", {"en": 1.0, "de": 0.5, "fr": 0.5})
    packed = corpus.pack_sequences(
        mixed.drop("n_tokens"), "lang", text.token_count_ws("text"), budget=512
    )

    n_packed = packed.count()
    assert 0 < n_packed <= n0
    assert set(packed.columns) >= set(docs.columns) | {"shard", "n_tokens", "seq_index"}
    # token conservation through packing: packing never drops or alters rows
    assert n_packed == mixed.count()
    # langs outside the mix weights are gone
    assert {r["lang"] for r in packed.select("lang").distinct().collect()} <= {
        "en", "de", "fr"
    }


def test_pack_sequences_token_conservation_and_bin_coherence(spark):
    """Property-style invariants over a deterministic irregular corpus:
    (a) packing preserves rows and total token mass per (group, shard);
    (b) within a shard, consecutive docs' seq_index never decreases and
        every bin index is exactly floor(cumulative-before / budget)."""
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, lang=("en" if i % 3 else "de"), n=(i * 37) % 190 + 10)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows)
    budget = 256
    packed = corpus.pack_sequences(df, "lang", F.col("n"), budget=budget, shards=4)

    assert packed.count() == 120
    per_group_in = {
        (r["lang"],): r["s"] for r in df.groupBy("lang").agg(F.sum("n").alias("s")).collect()
    }
    per_group_out = {
        (r["lang"],): r["s"]
        for r in packed.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert per_group_in == per_group_out

    local = sorted(
        packed.select("lang", "shard", "doc_id", "n_tokens", "seq_index").collect(),
        key=lambda r: (r["lang"], r["shard"], r["doc_id"]),
    )
    running: dict = {}
    for r in local:
        key = (r["lang"], r["shard"])
        before = running.get(key, 0)
        assert r["seq_index"] == before // budget
        running[key] = before + r["n_tokens"]


# ---------------------------------------------------------------------------
# Bloom-filter pruning (operators/bloom.py)
# ---------------------------------------------------------------------------

def test_bloom_contamination_equals_direct_overlap(spark):
    """Exactness theorem on real-ish text: the Bloom prune + confirm path
    returns byte-identical rows to the direct broadcast overlap."""
    bench = _docs(spark, [(0, "alpha beta gamma delta epsilon zeta"),
                          (97, "red green blue cyan magenta")])
    cor = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five six"),
            (3, "x y alpha beta gamma delta z red green blue cyan"),
        ],
    )
    from iceberg_ingestion_spark.operators.bloom import contamination_counts_bloom

    direct = sorted(map(tuple, corpus.contamination_counts(cor, bench, n=4).collect()))
    bloomy = sorted(
        map(tuple, contamination_counts_bloom(cor, bench, n=4, m_bits=1 << 16, k=3).collect())
    )
    assert direct == bloomy == [(1, 2), (3, 2)]


def test_bloom_prune_no_false_negatives_even_when_tiny(spark):
    """With m_bits absurdly small the filter saturates (every probe passes) —
    it may keep everything, but it must NEVER drop a true member."""
    from iceberg_ingestion_spark.operators.bloom import bloom_build, bloom_prune

    members = spark.createDataFrame([Row(v=f"key{i}") for i in range(50)])
    probe = spark.createDataFrame([Row(v=f"key{i}") for i in range(100)])
    for m_bits in (8, 1 << 16):
        bits = bloom_build(members, "v", m_bits, k=3)
        kept = {r["v"] for r in bloom_prune(probe, "v", bits, m_bits, k=3).collect()}
        assert {f"key{i}" for i in range(50)} <= kept


def test_bloom_prune_filters_and_stays_broadcast(spark):
    """At a sane m/n ratio the prune visibly shrinks a disjoint probe set, and
    the probe plan is broadcast-only (no shuffle of the probed side)."""
    from iceberg_ingestion_spark.operators.bloom import bloom_build, bloom_prune

    members = spark.createDataFrame([Row(v=f"in{i}") for i in range(100)])
    probe = spark.createDataFrame([Row(v=f"out{i}") for i in range(2000)])
    m_bits, k = 1 << 16, 3
    bits = bloom_build(members, "v", m_bits, k)
    pruned = bloom_prune(probe, "v", bits, m_bits, k)
    # FPR at 100 elems / 65536 bits / k=3 is ~1e-8: all 2000 non-members drop
    assert pruned.count() == 0
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_build_bounded_by_m_bits(spark):
    """The relational filter never exceeds m_bits rows however big the build
    side is — the broadcast stays bounded by construction."""
    from iceberg_ingestion_spark.operators.bloom import bloom_build

    m_bits = 64
    big = spark.createDataFrame([Row(v=f"x{i}") for i in range(5000)])
    assert bloom_build(big, "v", m_bits, k=3).count() <= m_bits


def test_training_data_pipeline_with_split_and_embeddings(spark):
    """The downstream half of the pipeline on real testdata: near-dup
    clustering -> leakage-safe split -> batch embedding -> ANN neighbors.
    Pins that (a) no near-dup cluster spans splits, (b) embeddings compose
    with LSH ANN over the split corpus, (c) everything stays deterministic
    end-to-end (two runs, identical assignments)."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.operators import dedup, similarity
    from iceberg_ingestion_spark.operators.inference import batch_embed
    from iceberg_ingestion_spark.operators.sampling import leakage_safe_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # near-dup components over a doubled corpus (every doc has an exact copy)
    doubled = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    pairs = dedup.minhash_lsh_pairs(doubled, "doc_id", threshold=0.8)
    comps = dedup.connected_components(pairs)

    split = leakage_safe_split(doubled, "doc_id", comps)
    # (a) every component lands in exactly one split
    spans = (
        split.join(comps.withColumnRenamed("id", "doc_id"), "doc_id")
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where("n_splits > 1")
        .count()
    )
    assert spans == 0
    # a doc and its exact copy are in the same component -> same split
    a = {r.doc_id: r.split for r in split.collect()}
    assert all(a[i] == a[i + 1_000_000] for i in a if i < 1_000_000)

    # (b) embed the train split, ANN over it
    train = split.where("split = 'train'")
    vecs = batch_embed(train, dim=16).withColumnRenamed("doc_id", "vec_id")
    topk = similarity.topk_bruteforce(
        vecs, "vec_id", "embedding", 16, 2, F.col("vec_id") % 100 == 0
    )
    assert topk.groupBy("query_id").count().collect()  # non-empty, 2 per query
    # (c) determinism
    b = {r.doc_id: r.split for r in leakage_safe_split(doubled, "doc_id", comps).collect()}
    assert a == b

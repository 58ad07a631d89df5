"""Extension-operator tests: dedup, similarity, text, sessionization,
multimodal plumbing. Semantics pinned on hand-built data; recall of the
approximate (LSH) variants pinned against the exact baselines on testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators import dedup, multimodal, sessionize, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# -- text -------------------------------------------------------------------

def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world!  two  spaces",)], "text string")
    row = df.select(
        text.token_count_ws("text").alias("ws"),
        text.token_count_bpe_ish("text").alias("bpe"),
    ).first()
    assert row.ws == 4  # hello, world! two spaces
    assert row.bpe == 6  # hello , world ! two spaces


def test_lang_id_prefers_matching_stopwords(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat",), ("el gato que se fue no es de la casa",),
         ("xyzzy qwerty",)],
        "text string",
    )
    got = [r[0] for r in df.select(text.lang_id("text")).collect()]
    assert got == ["en", "es", "und"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("A  b\tC",), ("a b c",)], "text string")
    fps = [r[0] for r in df.select(text.fingerprint_md5("text")).collect()]
    assert fps[0] == fps[1]


def test_simhash_similar_docs_close(spark, documents):
    """The corpus's planted near-dup pairs (jaccard >= 0.9) must land within a
    small hamming distance; random pairs must not."""
    sig = text.simhash60(documents, "doc_id")
    pairs = dedup.ngram_jaccard_pairs(documents, "doc_id", threshold=0.9)
    near = dedup.simhash_pairs(sig, "doc_id", max_hamming=10)
    near_set = {(r.id_1, r.id_2) for r in near.collect()}
    for r in pairs.collect():
        assert (r.id_1, r.id_2) in near_set
    # the corpus is low-vocab word salad, so simhash separation is weak
    # (measured: dup pairs 0-8, random median 13); assert the median of ALL
    # pairwise distances stays above the dup band rather than a rare-pair bound.
    allp = dedup.simhash_pairs(sig, "doc_id", max_hamming=60)
    median = allp.agg(F.expr("percentile(hamming, 0.5)")).first()[0]
    assert median > 10


# -- dedup ------------------------------------------------------------------

def test_exact_dedup(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], "id long, text string")
    assert dedup.exact_dedup(df, ["text"]).count() == 2


def test_duplicate_groups_keeps_min_id(spark):
    df = spark.createDataFrame([(5, "x"), (2, "x"), (3, "y")], "id long, text string")
    got = dedup.duplicate_groups(df, "id", text.fingerprint_md5("text")).collect()
    assert len(got) == 1
    assert got[0].keep_id == 2 and got[0].dup_count == 2


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q w e r t y")],
        "doc_id long, text string",
    )
    got = dedup.ngram_jaccard_pairs(df, "doc_id", threshold=0.5).collect()
    assert [(r.id_1, r.id_2, r.jaccard) for r in got] == [(1, 2, 1.0)]


def test_minhash_lsh_finds_exact_pairs(spark, documents):
    """LSH candidates + exact verify == exact pair set on the corpus."""
    exact = {
        (r.id_1, r.id_2)
        for r in dedup.ngram_jaccard_pairs(documents, "doc_id", threshold=0.8).collect()
    }
    lsh = {
        (r.id_1, r.id_2)
        for r in dedup.minhash_lsh_pairs(documents, "doc_id", threshold=0.8).collect()
    }
    assert exact and lsh == exact


def test_ngram_jaccard_hot_shingle_cap_keeps_pair_set(spark, documents):
    """Dropping df>cap shingles from candidate generation must not change the
    >=threshold pair set (hot shingles carry no Jaccard signal), and jaccard
    values stay exact because verification uses the full sets."""
    uncapped = {
        (r.id_1, r.id_2, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(documents, "doc_id", threshold=0.5).collect()
    }
    capped = {
        (r.id_1, r.id_2, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            documents, "doc_id", threshold=0.5, max_shingle_df=10
        ).collect()
    }
    assert uncapped and capped == uncapped


def test_ngram_jaccard_cap_drops_boilerplate_only_pairs(spark):
    """The recall contract, exercised: a pair whose ENTIRE intersection is hot
    shingles is missed under the cap; pairs sharing any rare shingle are kept."""
    boiler = "terms of service apply to all documents here"  # only shared content of 1-2
    rows = [
        (1, boiler + " alpha beta gamma delta"),
        (2, boiler + " epsilon zeta eta theta"),
        (3, boiler + " alpha beta gamma delta"),  # exact dup of 1 beyond boiler
    ] + [(100 + i, boiler + f" filler{i} x{i} y{i} z{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.id_1, r.id_2)
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", threshold=0.3).collect()
    }
    capped = {
        (r.id_1, r.id_2)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", threshold=0.3, max_shingle_df=5
        ).collect()
    }
    assert (1, 3) in capped  # shares rare shingles -> kept
    assert (1, 2) in uncapped and (1, 2) not in capped  # boilerplate-only -> dropped


def test_ngram_jaccard_frac_cap_floor_resolution(spark):
    """The fractional cap resolves to max(absolute floor, frac * n_docs): on a
    tiny corpus the floor dominates, so frac+floor output equals the
    floor-only output even when frac*n alone (rounding to 0) would cap away
    every shingle."""
    rows = [(i, f"alpha beta gamma delta w{i} x{i} y{i} z{i}") for i in range(8)]
    rows += [(100, "alpha beta gamma delta p q r s"),
             (101, "alpha beta gamma delta p q r s")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    floor_only = {
        (r.id_1, r.id_2)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", threshold=0.5, max_shingle_df=20
        ).collect()
    }
    frac_floored = {
        (r.id_1, r.id_2)
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", threshold=0.5, max_shingle_df=20, max_shingle_df_frac=0.004
        ).collect()
    }
    assert (100, 101) in floor_only
    assert frac_floored == floor_only


def test_minhash_lsh_bucket_cap_keeps_planted_pairs(spark, documents):
    """A generous band-bucket cap must keep the full >=threshold pair set on
    the corpus (hot buckets are boilerplate clusters, not near-dup signal)."""
    uncapped = {
        (r.id_1, r.id_2)
        for r in dedup.minhash_lsh_pairs(documents, "doc_id", threshold=0.8).collect()
    }
    capped = {
        (r.id_1, r.id_2)
        for r in dedup.minhash_lsh_pairs(
            documents, "doc_id", threshold=0.8, max_band_bucket_size=10
        ).collect()
    }
    assert uncapped and capped == uncapped


def test_simhash_pairs_plan_has_no_cross_join(spark, documents):
    """Pigeonhole banding: candidate generation must be an equi-join — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan."""
    sig = text.simhash60(documents, "doc_id")
    plan = (
        dedup.simhash_pairs(sig, "doc_id", max_hamming=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_banding_matches_bruteforce(spark, documents):
    """Banded pair set == brute-force pair set (pigeonhole is a guarantee)."""
    sig = text.simhash60(documents, "doc_id").cache()
    a = sig.select(F.col("doc_id").alias("id_1"), F.col("simhash").alias("sh_1"))
    b = sig.select(F.col("doc_id").alias("id_2"), F.col("simhash").alias("sh_2"))
    brute = {
        (r.id_1, r.id_2, r.hamming)
        for r in a.join(b, F.col("id_1") < F.col("id_2"))
        .withColumn("hamming", F.bit_count(F.col("sh_1").bitwiseXOR(F.col("sh_2"))).cast("int"))
        .filter(F.col("hamming") <= 6)
        .select("id_1", "id_2", "hamming")
        .collect()
    }
    banded = {
        (r.id_1, r.id_2, r.hamming)
        for r in dedup.simhash_pairs(sig, "doc_id", max_hamming=6).collect()
    }
    assert brute and banded == brute


# -- similarity -------------------------------------------------------------

def test_cosine_self_is_one(spark, embeddings):
    v = embeddings.select(similarity.as_double(F.col("embedding")).alias("v"))
    got = v.select(similarity.cosine(F.col("v"), F.col("v"), 64).alias("c")).agg(
        F.min("c"), F.max("c")
    ).first()
    assert abs(got[0] - 1.0) < 1e-12 and abs(got[1] - 1.0) < 1e-12


def test_topk_bruteforce_shape(spark, embeddings):
    got = similarity.topk_bruteforce(
        embeddings, "vec_id", "embedding", 64, 5, F.col("vec_id") % 50 == 0
    )
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        assert all(r.neighbor_id != q for r in rs)
        sims = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_topk_lsh_recall(spark, embeddings):
    """The approximate path must reach >=40% recall@5 on this corpus (8 sign
    bits -> ~1/256 of pairs share a bucket by chance; true neighbors much more
    often). Pinned so regressions in bucketing logic show up."""
    exact = similarity.topk_bruteforce(
        embeddings, "vec_id", "embedding", 64, 5, F.col("vec_id") % 50 == 0
    )
    approx = similarity.topk_lsh(
        embeddings, "vec_id", "embedding", 64, 5, F.col("vec_id") % 50 == 0
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.4


def test_knn_label_vote_majority(spark):
    topk = spark.createDataFrame(
        [(1, 10, 1, 0.9), (1, 11, 2, 0.8), (1, 12, 3, 0.7)],
        "query_id long, neighbor_id long, rank int, cosine double",
    )
    labels = spark.createDataFrame(
        [(10, 7), (11, 7), (12, 3)], "vec_id long, label int"
    )
    got = similarity.knn_label_vote(topk, labels, "vec_id", "label").collect()
    assert [(r.query_id, r.predicted_label) for r in got] == [(1, 7)]


# -- sessionize -------------------------------------------------------------

def test_sessionize_gap_splits(spark):
    rows = [
        (1, 100, 0.0), (2, 100, 100.0), (3, 100, 5000.0),  # gap 4900 > 3600 -> new session
        (4, 200, 0.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts double")
    got = sessionize.sessionize(ev, ts_col="ts", gap_seconds=3600.0)
    sessions = {(r.event_id): r.session_index for r in got.collect()}
    assert sessions == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats(spark):
    rows = [(1, 100, 0.0), (2, 100, 100.0), (3, 100, 5000.0)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts double")
    got = sessionize.session_stats(ev, ts_col="ts", gap_seconds=3600.0).collect()
    by_s = {(r.user_id, r.session_index): r for r in got}
    assert by_s[(100, 1)].n_events == 2
    assert by_s[(100, 1)].duration_sec == 100.0
    assert by_s[(100, 2)].n_events == 1


# -- multimodal -------------------------------------------------------------

def test_multimodal_decode_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "")], "doc_id long, text string")
    got = {r.doc_id: r for r in multimodal.decode_metadata(
        multimodal.attach_binary_payload(df)
    ).collect()}
    import hashlib

    assert got[1].n_bytes == 5
    assert got[1].content_md5 == hashlib.md5(b"hello").hexdigest()
    assert got[1].fake_width == 1 + ord("h") and got[1].fake_height == 1 + ord("o")
    assert got[2].n_bytes == 0 and got[2].fake_width == 0


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"\x89PNG")


# -- multimodal frame sampling / resize / new text ops ----------------------

def test_frame_sample_blocks_and_stride(spark):
    from iceberg_ingestion_spark.operators import multimodal

    payload = bytes(range(200))  # 6 full 32-byte frames + remainder
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    rows = {r.frame_index: r for r in multimodal.frame_sample(df).collect()}
    # 200 // 32 = 6 frames, stride 4 -> indices 0 and 4
    assert set(rows) == {0, 4}
    assert bytes(rows[0].frame_bytes) == payload[0:32]
    assert bytes(rows[4].frame_bytes) == payload[128:160]


def test_frame_sample_short_payload_single_frame(spark):
    from iceberg_ingestion_spark.operators import multimodal

    df = spark.createDataFrame([(1, b"tiny")], "doc_id long, payload binary")
    rows = multimodal.frame_sample(df).collect()
    assert len(rows) == 1 and rows[0].frame_index == 0
    assert bytes(rows[0].frame_bytes) == b"tiny"


def test_resize_plan_never_upscales_and_keeps_aspect(spark):
    from iceberg_ingestion_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, 256, 128), (2, 64, 32)], "doc_id long, fake_width int, fake_height int"
    )
    got = {r.doc_id: r for r in multimodal.resize_plan(df, max_side=128).collect()}
    assert (got[1].target_width, got[1].target_height, got[1].resized) == (128, 64, True)
    assert (got[2].target_width, got[2].target_height, got[2].resized) == (64, 32, False)


def test_scrub_pii_all_three_patterns(spark):
    df = spark.createDataFrame(
        [("mail a.b@x.co or visit https://x.co/1?q=2 or call +49 170 123456 now",)],
        "text string",
    )
    got = df.select(text.scrub_pii("text").alias("s")).first().s
    assert "<EMAIL>" in got and "<URL>" in got and "<PHONE>" in got
    assert "a.b@x.co" not in got and "https" not in got and "170" not in got


def test_repetition_ratio_extremes(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c a b c"), (2, "all words here are unique tokens")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.r for r in df.select(
        "doc_id", text.repetition_ratio("text").alias("r")).collect()}
    assert got[1] > 0.5      # heavy 3-gram repetition
    assert got[2] == 0.0     # no repeated 3-grams


def test_topk_ivf_recall_and_shape(spark, embeddings):
    """IVF with nprobe=8 of 16 cells scans ~half the corpus per query -> recall
    well above chance; shape contract identical to the exact path."""
    exact = similarity.topk_bruteforce(
        embeddings, "vec_id", "embedding", 64, 5, F.col("vec_id") % 50 == 0
    )
    approx = similarity.topk_ivf(
        embeddings, "vec_id", "embedding", 64, 5, F.col("vec_id") % 50 == 0,
        n_cells=16, nprobe=8,
    )
    rows = approx.collect()
    assert all(1 <= r.rank <= 5 for r in rows)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in rows}
    assert len(a & e) / len(e) >= 0.5


def test_cosine_pairs_blocked_size_guard(spark):
    """The exact all-pairs path refuses corpora above max_rows unless
    exact=True — the error must route the caller to the ANN/LSH paths."""
    big = spark.range(0, 1_000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="topk_lsh"):
        similarity.cosine_pairs_blocked(
            big, "vec_id", "embedding", 2, 0.5, max_rows=500
        )
    # explicit exact=True bypasses the guard (plan builds; no execution here)
    similarity.cosine_pairs_blocked(
        big, "vec_id", "embedding", 2, 0.5, max_rows=500, exact=True
    )


def test_connected_components_chains_and_stars(spark):
    pairs = spark.createDataFrame(
        # chain 1-2-3-4, star 10-(11,12), isolated pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (20, 21)],
        "id_1 long, id_2 long",
    )
    got = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_hash_split_stable_under_corpus_growth(spark, documents):
    """A document's split assignment must not change when the corpus grows —
    the defining property of hash-based splits."""
    from iceberg_ingestion_spark.operators.sampling import hash_split

    small = {r.doc_id: r.split for r in hash_split(documents.limit(100), "doc_id").collect()}
    full = {r.doc_id: r.split for r in hash_split(documents, "doc_id").collect()}
    assert all(full[k] == v for k, v in small.items())
    fracs = {s: sum(1 for v in full.values() if v == s) / len(full) for s in set(full.values())}
    assert 0.80 <= fracs["train"] <= 0.97  # ~90% within sampling noise


def test_stratified_sample_rates(spark, documents):
    from iceberg_ingestion_spark.operators.sampling import stratified_sample

    fractions = {"en": 0.5, "es": 1.0, "de": 0.1, "fr": 1.0, "zh": 1.0}
    sampled = stratified_sample(documents, "lang", fractions)
    before = {r.lang: r.n for r in documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    after = {r.lang: r.n for r in sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert after.get("es") == before["es"]          # fraction 1.0 keeps all
    assert after.get("fr") == before["fr"]
    assert after.get("en", 0) < before["en"]        # downsampled strata shrink
    assert after.get("de", 0) < before["de"]


def test_normalize_per_user_zscore(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0), (2, 5.0)],
        "user_id long, value double",
    )
    got = sessionize.normalize_per_user(df).collect()
    u1 = sorted(r.value_z for r in got if r.user_id == 1)
    import math
    sd = math.sqrt(((10-20)**2 + 0 + (30-20)**2) / 3)  # population std
    assert abs(u1[0] - (10 - 20) / sd) < 1e-12
    assert abs(u1[1]) < 1e-12
    # zero-variance group -> 0.0, not NaN
    assert all(r.value_z == 0.0 for r in got if r.user_id == 2)


def test_approx_distinct_error_bound(spark):
    from iceberg_ingestion_spark.operators import sketches

    df = spark.range(100_000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("v")
    )
    got = {r.g: r.approx_distinct for r in sketches.approx_distinct_by(
        df, ["g"], "v", rsd=0.02).collect()}
    for g, est in got.items():
        assert abs(est - 25_000) / 25_000 < 0.1  # well within 5 sigma of 2% rsd


def test_approx_quantiles_rank_error(spark):
    from iceberg_ingestion_spark.operators import sketches

    df = spark.range(10_000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    rows = sketches.approx_quantiles_by(df, ["g"], "v", [0.5, 0.9], 0.01).collect()
    got = {(r.g, r.probability): r.value for r in rows}  # scalar rows, no arrays
    assert set(got) == {("a", 0.5), ("a", 0.9)}
    assert abs(got[("a", 0.5)] - 5_000) <= 150   # rank error <= 1% of n, with slack
    assert abs(got[("a", 0.9)] - 9_000) <= 150


def test_funnel_order_matters(spark):
    from iceberg_ingestion_spark.operators.funnel import funnel_counts

    ev = spark.createDataFrame(
        [
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),   # full funnel
            (2, "click", 10), (2, "view", 20),                        # out of order: no click AFTER view
            (3, "view", 10), (3, "purchase", 20),                     # skips click: stops at view
        ],
        "user_id long, event_type string, ts_us long",
    )
    got = {r.stage: r.n_users for r in funnel_counts(
        ev, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_cohort_retention_buckets_and_offsets(spark):
    from iceberg_ingestion_spark.operators.funnel import cohort_retention

    DAY = 24 * 3600 * 1_000_000
    ev = spark.createDataFrame(
        [
            (1, 0), (1, DAY), (1, 3 * DAY),        # cohort 0: active d0, d1, d3
            (2, 0),                                 # cohort 0: only d0
            (3, DAY), (3, 2 * DAY),                 # cohort 1: d1, d2 (offsets 0,1)
        ],
        "user_id long, ts_us long",
    )
    got = {r.cohort_week: (r.w0, r.w1, r.w2, r.w3) for r in cohort_retention(
        ev, max_offset=3, bucket_us=DAY).collect()}
    assert got[0] == (2, 1, 0, 1)   # both users day0; user1 back on d1 and d3
    assert got[1] == (1, 1, 0, 0)   # user3 cohort day1, back next day


def test_connected_components_raises_on_non_convergence(spark):
    """A chain longer than the round budget must fail loudly — silently
    returning over-split components corrupts dedup survivor sets."""
    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(12)], "id_1 long, id_2 long, jaccard double"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iterations=3)
    labels = dedup.connected_components(chain, max_iterations=15)
    assert {r.component for r in labels.collect()} == {0}


def test_connected_components_string_ids(spark):
    """Non-integral ids must take the changed-count convergence path: the
    decimal-cast sum would be NULL for strings, the sums would compare equal
    after round one, and a long chain would silently return over-split
    components (ADVICE r3, medium)."""
    pairs = spark.createDataFrame(
        # chain a-b-c-d-e needs >1 round to converge; plus an isolated pair
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        "id_1 string, id_2 string",
    )
    got = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "a", "x": "x", "y": "x"}
    # and the non-convergence guard still fires for string chains
    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)], "id_1 string, id_2 string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iterations=3)


def test_connected_components_empty_input(spark):
    empty = spark.createDataFrame([], "id_1 long, id_2 long")
    assert dedup.connected_components(empty).count() == 0


def test_funnel_requires_stage0_entry(spark):
    """A user with only later-stage events (click but never view) emits NO
    row — the single-shuffle rewrite keeps the join-chain row contract
    (ADVICE r3)."""
    from iceberg_ingestion_spark.operators.funnel import funnel_stage_times

    ev = spark.createDataFrame(
        [(1, "view", 10), (1, "click", 20), (2, "click", 5)],
        "user_id long, event_type string, ts_us long",
    )
    rows = funnel_stage_times(ev, ["view", "click"]).collect()
    assert {r.user_id for r in rows} == {1}


def test_interval_join_matches_bruteforce_and_halfopen(spark):
    """Binned equi-join output == brute-force theta join, including points on
    bin boundaries; [start, end) half-open at both edges; multi-bin intervals
    match points in every bin they span exactly once."""
    from iceberg_ingestion_spark.operators.interval import interval_join

    points = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 100), (3, 1, 599), (4, 1, 600), (5, 1, 1800),
         (6, 2, 100), (7, 2, 2399), (8, 2, 2400)],
        "pid long, k long, ts long",
    )
    ivs = spark.createDataFrame(
        [(10, 1, 0, 600),        # [0, 600): pids 1,2,3 — NOT 4 (end exclusive)
         (11, 1, 600, 601),      # [600, 601): pid 4 (start inclusive)
         (12, 2, 0, 2400),       # spans 4 bins: pids 6,7 — NOT 8
         (13, 2, 50, 150)],      # sub-bin: pid 6
        "ivid long, k long, s long, e long",
    )
    got = {
        (r.pid, r.iv_ivid)
        for r in interval_join(
            points, ivs, "ts", "s", "e", key_cols=["k"], bin_width=600
        ).collect()
    }
    brute = {
        (p.pid, i.ivid)
        for p in points.collect()
        for i in ivs.collect()
        if p.k == i.k and i.s <= p.ts < i.e
    }
    assert got == brute
    assert got == {(1, 10), (2, 10), (3, 10), (4, 11), (6, 12), (7, 12), (6, 13)}


def test_interval_join_plan_has_no_nested_loop(spark):
    """The whole point of binning: candidate generation must be an equi-join,
    never BroadcastNestedLoopJoin / CartesianProduct."""
    from iceberg_ingestion_spark.operators.interval import interval_join

    points = spark.createDataFrame([(1, 1, 5)], "pid long, k long, ts long")
    ivs = spark.createDataFrame([(9, 1, 0, 10)], "ivid long, k long, s long, e long")
    plan = (
        interval_join(points, ivs, "ts", "s", "e", key_cols=["k"], bin_width=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bigram_corpus_features_counts_and_rare_rate(spark):
    """Hand-checked corpus df weighting: duplicate bigrams count per
    occurrence, rare = corpus df <= 2, sub-2-token docs emit no row."""
    from pyspark.sql import Row

    from iceberg_ingestion_spark.operators.text import bigram_corpus_features

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="a b"), Row(doc_id=3, text="solo")]
    )
    got = {r.doc_id: r for r in bigram_corpus_features(docs).collect()}
    assert set(got) == {1, 2}
    # corpus: "a b" x3 (df 3), "b a" x1 (df 1)
    r1 = got[1]
    assert (r1.n_bigrams, r1.sum_bg_df, r1.n_rare) == (3, 7, 1)
    assert r1.mean_bg_df == 7 / 3 and r1.rare_rate == 1 / 3
    r2 = got[2]
    assert (r2.n_bigrams, r2.sum_bg_df, r2.n_rare) == (1, 3, 0)


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Near-dup clusters never span splits; singletons fall back to their
    own id and reproduce the plain hash_split assignment exactly."""
    from pyspark.sql import Row
    from iceberg_ingestion_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    # clusters: {0..4} -> comp 0, {10,11} -> comp 10; rest singletons
    comps = spark.createDataFrame(
        [Row(doc_id=i, component=0) for i in range(5)]
        + [Row(doc_id=10, component=10), Row(doc_id=11, component=10)]
    )
    out = leakage_safe_split(docs, "doc_id", comps).collect()
    by_id = {r.doc_id: r.split for r in out}
    assert len({by_id[i] for i in range(5)}) == 1       # cluster 0 together
    assert by_id[10] == by_id[11]                        # cluster 10 together
    plain = {r.doc_id: r.split for r in hash_split(docs, "doc_id").collect()}
    for i in range(200):
        if i not in (1, 2, 3, 4, 11):  # non-representative members may move
            assert by_id[i] == plain[i], i
    # determinism under repartition
    again = {r.doc_id: r.split for r in leakage_safe_split(
        docs.repartition(7), "doc_id", comps).collect()}
    assert again == by_id


def test_batch_embed_shape_determinism_and_ann_composition(spark):
    """Inference plumbing: right schema/dtype, unit-norm deterministic
    vectors independent of partitioning and batch boundaries, per-worker
    init hook fires, and the output composes directly with the ANN
    operators (brute-force top-k runs on it unchanged)."""
    from pyspark.sql import Row

    from iceberg_ingestion_spark.operators import similarity
    from iceberg_ingestion_spark.operators.inference import batch_embed

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"document number {i} about topic {i % 3}") for i in range(60)]
    )
    emb1 = batch_embed(docs, dim=16)
    assert dict(emb1.dtypes) == {"doc_id": "bigint", "embedding": "array<float>"}
    rows = {r.doc_id: r.embedding for r in emb1.collect()}
    assert all(len(v) == 16 for v in rows.values())
    assert all(abs(sum(x * x for x in v) - 1.0) < 1e-5 for v in rows.values())
    # partitioning/batch boundaries must not change values
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        rows2 = {r.doc_id: r.embedding for r in
                 batch_embed(docs.repartition(5), dim=16).collect()}
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert rows2 == rows
    # composes with ANN: exact top-3 over the embedded corpus
    vecs = batch_embed(docs, dim=16).withColumnRenamed("doc_id", "vec_id")
    topk = similarity.topk_bruteforce(
        vecs, "vec_id", "embedding", 16, 3, (F.col("vec_id") % 20 == 0)
    )
    got = topk.groupBy("query_id").count().collect()
    assert {r.query_id for r in got} == {0, 20, 40}
    assert all(r["count"] == 3 for r in got)


def test_heavy_hitters_exact_matches_full_groupby(spark):
    """Two-pass heavy hitters == the naive full groupBy filtered at the
    threshold, on a zipfian column where most keys are below support; and
    the empty-candidate path returns an empty frame."""
    from pyspark.sql import Row

    from iceberg_ingestion_spark.operators.sketches import heavy_hitters_exact

    # key 'a': 500 rows, 'b': 300, 'c': 120, then 1000 singletons
    rows = (["a"] * 500 + ["b"] * 300 + ["c"] * 120
            + [f"rare{i}" for i in range(1000)])
    df = spark.createDataFrame([Row(k=v) for v in rows]).repartition(8)
    got = {(r.value, r.n_rows) for r in heavy_hitters_exact(df, "k", 0.05).collect()}
    total = len(rows)
    want = {
        (r.k, r["count"])
        for r in df.groupBy("k").count().where(F.col("count") >= 0.05 * total).collect()
    }
    assert got == want == {("a", 500), ("b", 300), ("c", 120)}
    # nothing above 60% -> empty result, not an error
    assert heavy_hitters_exact(df, "k", 0.6).count() == 0


def test_survivors_by_priority_prefers_quality_over_min_id(spark):
    """Within a duplicate cluster the high-quality copy survives even with
    a larger id; singletons survive; ties resolve deterministically by id."""
    from pyspark.sql import Row

    from iceberg_ingestion_spark.operators.dedup import survivors_by_priority

    docs = spark.createDataFrame([
        Row(doc_id=1, quality=0.2, src_rank=2),   # comp 1: low quality, small id
        Row(doc_id=5, quality=0.9, src_rank=1),   # comp 1: best -> survives
        Row(doc_id=7, quality=0.9, src_rank=2),   # comp 1: quality tie, worse rank
        Row(doc_id=20, quality=0.1, src_rank=3),  # singleton
    ])
    comps = spark.createDataFrame(
        [Row(id=1, component=1), Row(id=5, component=1), Row(id=7, component=1)]
    )
    prio = F.struct((-F.col("quality")).alias("nq"), F.col("src_rank"), F.col("doc_id"))
    out = {r.doc_id: (r.component, r.keep) for r in
           survivors_by_priority(docs, "doc_id", comps, prio).collect()}
    assert out == {
        1: (1, False),
        5: (1, True),    # best quality wins over min id
        7: (1, False),   # quality tie broken by src_rank
        20: (20, True),  # singleton survives as own component
    }

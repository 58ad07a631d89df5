"""Round-4 latest additions: PMI collocations, sequence-pattern match,
pivot reshape, value histogram, snapshot profile drift — correctness
invariants + the plan shapes that matter at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators.funnel import sequence_match
from iceberg_ingestion_spark.operators.text import pmi_top_collocations
from iceberg_ingestion_spark.validate import profile_drift

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_pmi_hand_computed(spark):
    # corpus: "a b" x4, "a c" x2  -> bigrams: (a,b):4, (a,c):2, N=6
    # c_first(a)=6; c_second(b)=4, c_second(c)=2
    # lift(a,b) = 4*6/(6*4) = 1.0 ; lift(a,c) = 2*6/(6*2) = 1.0
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(4)] + [(10 + i, "a c") for i in range(2)],
        "doc_id long, text string",
    )
    rows = {
        (r.w1, r.w2): r
        for r in pmi_top_collocations(docs, min_count=1, k=10).collect()
    }
    assert rows[("a", "b")].c_pair == 4
    assert rows[("a", "b")].c_first == 6
    assert rows[("a", "b")].c_second == 4
    assert rows[("a", "b")].lift == 1.0
    assert rows[("a", "c")].lift == 1.0


def test_pmi_ranks_bound_pairs_above_chance(spark):
    # "x y" always co-occur (and nowhere else) -> lift >> 1; filler pairs
    # built from a promiscuous token have lift ~1.
    docs = spark.createDataFrame(
        [(i, "x y") for i in range(5)]
        + [(100 + i, f"f t{i % 3}") for i in range(9)],
        "doc_id long, text string",
    )
    top = pmi_top_collocations(docs, min_count=2, k=1).collect()
    assert (top[0].w1, top[0].w2) == ("x", "y")
    assert top[0].lift > 1.0


def test_pmi_min_count_filter(spark):
    docs = spark.createDataFrame(
        [(1, "rare pair"), (2, "c d"), (3, "c d")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2) for r in pmi_top_collocations(docs, min_count=2, k=10).collect()}
    assert got == {("c", "d")}


def test_pmi_deterministic_total_order(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = pmi_top_collocations(docs, min_count=5, k=20).collect()
    b = pmi_top_collocations(docs.repartition(7), min_count=5, k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# ---------------------------------------------------------------------------
# Sequence pattern match
# ---------------------------------------------------------------------------

CODES = {"view": "v", "click": "c", "purchase": "p", "error": "e"}


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_us long"
    )


def test_sequence_match_orders_by_ts_then_tiebreak(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "view", 10),
            (1, 2, "click", 20),
            (1, 3, "purchase", 30),
            # user 2: same events but an error between click and purchase
            (2, 4, "view", 10),
            (2, 5, "click", 20),
            (2, 6, "error", 25),
            (2, 7, "purchase", 30),
            # user 3: ts tie broken by event_id -> "vc" not "cv"
            (3, 8, "view", 10),
            (3, 9, "click", 10),
        ],
    )
    got = {
        r.user_id: (r.journey, r.matched)
        for r in sequence_match(ev, "v[^e]*c[^e]*p", CODES).collect()
    }
    assert got[1] == ("vcp", True)
    assert got[2] == ("vcep", False)
    assert got[3] == ("vc", False)


def test_sequence_match_excludes_uncoded_types(spark):
    ev = _ev(spark, [(1, 1, "view", 10), (1, 2, "mystery", 15), (1, 3, "click", 20)])
    row = sequence_match(ev, "vc", CODES).collect()[0]
    assert row.journey == "vc"
    assert row.n_events == 2
    assert row.matched


def test_sequence_match_single_shuffle(spark):
    ev = _ev(spark, [(1, 1, "view", 10)])
    plan = _plan(sequence_match(ev, "vc", CODES))
    # one exchange for the user-key aggregate; no join, no extra shuffle
    assert plan.count("Exchange") <= 2  # partial+final agg pair share one
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# Profile drift
# ---------------------------------------------------------------------------


def test_profile_drift_counts_and_sums(spark):
    a = spark.createDataFrame(
        [(1, 10.0, "x"), (2, None, "y"), (3, 30.0, "y")],
        "k long, v double, s string",
    )
    b = spark.createDataFrame(
        [(1, 10.0, "x"), (4, 40.0, None)], "k long, v double, s string"
    )
    rows = {r["column"]: r for r in profile_drift(a, b, ["k", "v", "s"]).collect()}
    assert rows["k"].n_a == 3 and rows["k"].n_b == 2
    assert rows["k"].ndv_a == 3 and rows["k"].ndv_b == 2
    assert rows["v"].n_null_a == 1 and rows["v"].n_null_b == 0
    assert rows["v"].sum_a == 40.0 and rows["v"].sum_b == 50.0
    assert rows["s"].sum_a is None  # non-numeric: no sum
    assert rows["s"].ndv_b == 1  # NULL not counted as a distinct value
    assert rows["k"].delta_rows == -1


def test_profile_drift_identical_sides_zero_delta(spark):
    a = spark.read.parquet(f"{SF}/orders.parquet")
    out = profile_drift(a, a, ["o_orderkey", "o_totalprice"]).collect()
    assert len(out) == 2
    for r in out:
        assert r.delta_rows == 0
        assert (r.n_a, r.n_null_a, r.ndv_a, r.sum_a) == (
            r.n_b,
            r.n_null_b,
            r.ndv_b,
            r.sum_b,
        )


# ---------------------------------------------------------------------------
# Pivot entry plan shape
# ---------------------------------------------------------------------------


def test_pivot_is_single_aggregation_no_extra_job(spark):
    """Pinned spine => no distinct-collect job: the pivot plan is one
    aggregate pair (partial + final) over one exchange, same as a CASE-sum."""
    from iceberg_ingestion_spark.queries_analytics import analytics_pivot_status

    df = analytics_pivot_status(spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan
    got = {r.o_orderpriority: r for r in df.collect()}
    # row-count parity with a direct groupBy
    base = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert len(got) == len(base)
    # status counts per priority sum to the priority's total orders
    for r in base:
        row = got[r.o_orderpriority]
        assert row.n_orders_f + row.n_orders_o + row.n_orders_p == r["count"]


# ---------------------------------------------------------------------------
# Histogram entry
# ---------------------------------------------------------------------------


def test_value_histogram_bins_partition_the_data(spark):
    from iceberg_ingestion_spark.queries_ext import q_events_value_histogram

    hist = q_events_value_histogram(spark, SF).collect()
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n for r in hist) == ev_n  # bins partition all rows
    for r in hist:
        assert r.bin_lo == r.bin * 25.0


# ---------------------------------------------------------------------------
# Prefix-filtered Jaccard join
# ---------------------------------------------------------------------------


def test_prefix_jaccard_hand_case(spark):
    from iceberg_ingestion_spark.operators.dedup import jaccard_prefix_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # 3-shingles: {abc, bcd, cde}
            (2, "a b c d e"),          # identical -> jaccard 1.0
            (3, "a b c d x"),          # {abc, bcd, cdx} -> inter 2, union 4 -> 0.5
            (4, "q r s t u"),          # disjoint
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_1, r.id_2): r.jaccard
        for r in jaccard_prefix_pairs(docs, "doc_id", k=3, threshold=0.5).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.5
    assert got[(2, 3)] == 0.5
    assert set(got) == {(1, 2), (1, 3), (2, 3)}


def test_prefix_jaccard_matches_inverted_index_path(spark):
    """The two exact-Jaccard candidate generators (prefix filter vs full
    inverted index) must produce the IDENTICAL pair set + scores on the
    fixture corpus — they differ only in how candidates are generated."""
    from iceberg_ingestion_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {
        (r.id_1, r.id_2): r.jaccard
        for r in jaccard_prefix_pairs(docs, "doc_id", k=3, threshold=0.5).collect()
    }
    b = {
        (r.id_1, r.id_2): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", k=3, threshold=0.5).collect()
    }
    assert a == b
    assert a  # non-vacuous: the fixture corpus has near-dup pairs


def test_prefix_jaccard_threshold_one_still_finds_exact_dups(spark):
    """t=1.0 -> prefix length is exactly 1 (the single rarest shingle);
    identical docs must still pair."""
    from iceberg_ingestion_spark.operators.dedup import jaccard_prefix_pairs

    docs = spark.createDataFrame(
        [(1, "w x y z w2"), (2, "w x y z w2"), (3, "totally different text here")],
        "doc_id long, text string",
    )
    got = [
        (r.id_1, r.id_2)
        for r in jaccard_prefix_pairs(docs, "doc_id", k=3, threshold=1.0).collect()
    ]
    assert got == [(1, 2)]


# ---------------------------------------------------------------------------
# Input guards
# ---------------------------------------------------------------------------


def test_new_operator_input_guards(spark):
    from iceberg_ingestion_spark.operators.dedup import jaccard_prefix_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    ev = _ev(spark, [(1, 1, "view", 10)])
    with pytest.raises(ValueError, match="threshold"):
        jaccard_prefix_pairs(docs, "doc_id", threshold=0.0)
    with pytest.raises(ValueError, match="columns"):
        profile_drift(docs, docs, [])
    with pytest.raises(ValueError, match="codes"):
        sequence_match(ev, "x", {})


def test_sequence_detect_stream_rejects_duplicate_stages():
    from iceberg_ingestion_spark.streaming.stateful import sequence_detect_stream

    with pytest.raises(ValueError, match="distinct"):
        sequence_detect_stream(None, ["a", "b", "a"])


# ---------------------------------------------------------------------------
# Perceptual-hash image near-dup (multimodal)
# ---------------------------------------------------------------------------


def _payload_df(spark, items):
    return spark.createDataFrame(items, "doc_id long, payload binary")


def test_ahash_deterministic_and_empty_payload(spark):
    from iceberg_ingestion_spark.operators.multimodal import ahash64

    base = bytes(range(256)) * 4
    df = _payload_df(spark, [(1, base), (2, base), (3, b"")])
    rows = {r.doc_id: r.phash for r in ahash64(df).collect()}
    assert rows[1] == rows[2]          # same bytes -> same hash
    assert rows[3] == 0                # empty payload -> 0
    rows2 = {r.doc_id: r.phash for r in ahash64(df.repartition(5)).collect()}
    assert rows == rows2               # partitioning-independent


def test_phash_near_dup_pairs_small_edit_vs_unrelated(spark):
    from iceberg_ingestion_spark.operators.multimodal import (
        ahash64,
        phash_near_dup_pairs,
    )

    base = bytearray((i * 37) % 256 for i in range(4096))
    edited = bytearray(base)
    for k in range(0, 64, 16):         # touch a few bytes: a "light re-encode"
        edited[k] = (edited[k] + 7) % 256
    unrelated = bytes(((i * i) ^ 123) % 256 for i in range(4096))
    df = _payload_df(spark, [(1, bytes(base)), (2, bytes(edited)), (3, unrelated)])
    pairs = {
        (r.id_1, r.id_2): r.hamming
        for r in phash_near_dup_pairs(df, max_hamming=6).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # exactness: hamming equals the Python popcount of the xored hashes
    h = {r.doc_id: r.phash for r in ahash64(df).collect()}
    assert pairs[(1, 2)] == bin((h[1] ^ h[2]) & ((1 << 64) - 1)).count("1")


def test_phash_pipeline_from_text_payloads(spark):
    """End-to-end through the documented payload attach: duplicate texts pair
    at hamming 0; the banding join (not an all-pairs scan) generates them."""
    from iceberg_ingestion_spark.operators.multimodal import (
        attach_binary_payload,
        phash_near_dup_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    pairs = phash_near_dup_pairs(
        attach_binary_payload(doubled), max_hamming=0
    ).collect()
    exact = {(r.id_1, r.id_2) for r in pairs if r.hamming == 0}
    # every doc pairs with its shifted twin at hamming 0
    twin = {(r.doc_id, r.doc_id + 1_000_000) for r in docs.collect()}
    assert twin <= exact

def test_simhash_pairs_grouped_identical_to_per_item_join(spark):
    """The duplicate-robust distinct-signature banding join is LOSSLESS: on
    real corpus signatures (simhash60) and on a duplicate-heavy corpus it
    returns the byte-identical pair set of the per-item join."""
    from iceberg_ingestion_spark.operators import dedup, text

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = text.simhash60(docs, "doc_id")
    ref = {
        (r.id_1, r.id_2, r.hamming)
        for r in dedup.simhash_pairs(sigs, "doc_id", max_hamming=6).collect()
    }
    got = {
        (r.id_1, r.id_2, r.hamming)
        for r in dedup.simhash_pairs_grouped(sigs, "doc_id", max_hamming=6).collect()
    }
    assert got == ref and len(ref) > 0
    # duplicate-heavy: clone 10 copies of 5 docs -> identical signatures
    clones = docs.limit(5)
    heavy = docs
    for i in range(1, 11):
        heavy = heavy.unionByName(
            clones.withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
        )
    hsigs = text.simhash60(heavy, "doc_id")
    ref2 = {
        (r.id_1, r.id_2, r.hamming)
        for r in dedup.simhash_pairs(hsigs, "doc_id", max_hamming=4).collect()
    }
    got2 = {
        (r.id_1, r.id_2, r.hamming)
        for r in dedup.simhash_pairs_grouped(hsigs, "doc_id", max_hamming=4).collect()
    }
    assert got2 == ref2


def test_simhash_pairs_grouped_star_same_components(spark):
    """equal_expansion='star' emits a linear spanning star per equal-signature
    clique; connected components equal the quadratic 'pairs' expansion's."""
    from iceberg_ingestion_spark.operators import dedup, text

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    heavy = docs
    for i in range(1, 6):
        heavy = heavy.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
        )
    sigs = text.simhash60(heavy, "doc_id")
    pairs = dedup.simhash_pairs_grouped(sigs, "doc_id", max_hamming=4)
    star = dedup.simhash_pairs_grouped(
        sigs, "doc_id", max_hamming=4, equal_expansion="star"
    )
    # star edge count within cliques is linear: n-1 per clique, vs n(n-1)/2
    assert star.count() < pairs.count()
    cc_p = {
        (r.id, r.component)
        for r in dedup.connected_components(pairs.select("id_1", "id_2")).collect()
    }
    cc_s = {
        (r.id, r.component)
        for r in dedup.connected_components(star.select("id_1", "id_2")).collect()
    }
    assert cc_p == cc_s

    import pytest

    with pytest.raises(ValueError):
        dedup.simhash_pairs_grouped(sigs, "doc_id", equal_expansion="clique")

def test_minhash_grouped_identical_to_per_item_uncapped(spark):
    """Exact-duplicate factoring before LSH is LOSSLESS: on a corpus with
    identical-copy cliques the grouped path returns the same pair set (same
    jaccard values) as the per-item uncapped join. Shuffled token order
    joins the same set group (sorted canonical key)."""
    from iceberg_ingestion_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    heavy = docs
    for i in range(1, 5):
        heavy = heavy.unionByName(
            docs.limit(10).withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
        )
    # one reordered-token copy: same shingle SET iff k=1; with k=3 reordering
    # changes shingles, so instead append an EXACT text copy with a new id
    heavy = heavy.unionByName(
        docs.limit(3).withColumn("doc_id", F.col("doc_id") + 77_000_000)
    )
    ref = {
        (r.id_1, r.id_2, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_pairs(heavy, "doc_id", threshold=0.5).collect()
    }
    got = {
        (r.id_1, r.id_2, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_pairs_grouped(
            heavy, "doc_id", threshold=0.5
        ).collect()
    }
    assert got == ref and len(ref) > 0


def test_minhash_grouped_star_components_and_guard(spark):
    from iceberg_ingestion_spark.operators import dedup

    import pytest

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
    heavy = docs
    for i in range(1, 7):
        heavy = heavy.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + i * 10_000_000)
        )
    pairs = dedup.minhash_lsh_pairs_grouped(heavy, "doc_id", threshold=0.8)
    star = dedup.minhash_lsh_pairs_grouped(
        heavy, "doc_id", threshold=0.8, equal_expansion="star"
    )
    assert star.count() < pairs.count()
    cc_p = {
        (r.id, r.component)
        for r in dedup.connected_components(pairs.select("id_1", "id_2")).collect()
    }
    cc_s = {
        (r.id, r.component)
        for r in dedup.connected_components(star.select("id_1", "id_2")).collect()
    }
    assert cc_p == cc_s
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs_grouped(heavy, "doc_id", equal_expansion="cliques")

def test_minhash_incremental_equals_full_minus_old_old(spark):
    """Increment dedup contract: pairs(old UNION new) restricted to pairs
    touching a new id == incremental(old, new); no old x old pair appears."""
    from iceberg_ingestion_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    # increment: held-out docs plus exact copies of some OLD docs (cross-side
    # duplicates) and of its own rows (in-increment duplicates)
    fresh = docs.filter(F.col("doc_id") % 5 == 0)
    new = (
        fresh.unionByName(
            old.limit(7).withColumn("doc_id", F.col("doc_id") + 50_000_000)
        )
        .unionByName(
            fresh.limit(4).withColumn("doc_id", F.col("doc_id") + 60_000_000)
        )
    )
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    full = {
        (r.id_1, r.id_2, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_pairs(
            old.unionByName(new), "doc_id", threshold=0.5
        ).collect()
    }
    expected = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    got = {
        (r.id_1, r.id_2, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_pairs_incremental(
            old, new, "doc_id", threshold=0.5
        ).collect()
    }
    assert got == expected and len(expected) > 0
    # the cross-side exact copies are found at jaccard 1.0
    assert any(j == 1.0 for (_, _, j) in got)
    # and nothing old x old leaked
    assert all(p[0] in new_ids or p[1] in new_ids for p in got)

def test_minhash_incremental_prebuilt_index_same_output(spark):
    """The production form (precomputed minhash_index for the old corpus)
    returns the same pairs as the inline convenience form."""
    from iceberg_ingestion_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        old.limit(5).withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    inline = {
        (r.id_1, r.id_2, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_pairs_incremental(
            old, new, "doc_id", threshold=0.5
        ).collect()
    }
    idx = dedup.minhash_index(old, "doc_id")
    via_index = {
        (r.id_1, r.id_2, round(r.jaccard, 9))
        for r in dedup.minhash_lsh_pairs_incremental(
            None, new, "doc_id", threshold=0.5, old_index=idx
        ).collect()
    }
    assert via_index == inline and len(inline) > 0

    import pytest

    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs_incremental(None, new, "doc_id")

def test_incremental_components_equals_full_cc(spark):
    """Label identity: incremental_components(old CC labels, new pairs) ==
    connected_components(old pairs UNION new pairs) for every id — including
    old clusters MERGING through a bridge of new docs — and untouched
    clusters pass through."""
    from iceberg_ingestion_spark.operators import dedup

    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)], "id_1 long, id_2 long"
    )
    # new doc 100 bridges clusters {1,2,3} and {10,11}; new docs 200-201 form
    # a fresh cluster; old cluster {20,21} is touched without merging; {30,31}
    # is untouched
    new_pairs = spark.createDataFrame(
        [(3, 100), (100, 10), (200, 201), (21, 300)], "id_1 long, id_2 long"
    )
    old_labels = dedup.connected_components(old_pairs)
    got = {
        (r.id, r.component)
        for r in dedup.incremental_components(old_labels, new_pairs).collect()
    }
    full = {
        (r.id, r.component)
        for r in dedup.connected_components(
            old_pairs.unionByName(new_pairs)
        ).collect()
    }
    assert got == full
    # the merged bridge cluster took the global min label
    assert (100, 1) in got and (11, 1) in got and (300, 20) in got
    assert (30, 30) in got and (31, 30) in got  # untouched passthrough

def test_incremental_dedup_pipeline_end_to_end(spark):
    """The full incremental composition — index-probe pairs in, updated
    cluster labels out — matches the from-scratch pipeline on real docs."""
    from iceberg_ingestion_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0).unionByName(
        old.limit(6).withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    scratch = {
        (r.id, r.component)
        for r in dedup.connected_components(
            dedup.minhash_lsh_pairs(
                old.unionByName(new), "doc_id", threshold=0.5
            ).select("id_1", "id_2")
        ).collect()
    }
    old_labels = dedup.connected_components(
        dedup.minhash_lsh_pairs(old, "doc_id", threshold=0.5).select("id_1", "id_2")
    )
    inc_pairs = dedup.minhash_lsh_pairs_incremental(old, new, "doc_id", threshold=0.5)
    got = {
        (r.id, r.component)
        for r in dedup.incremental_components(
            old_labels, inc_pairs.select("id_1", "id_2")
        ).collect()
    }
    assert got == scratch and len(scratch) > 0

def test_simhash_pairs_incremental_restriction_contract(spark):
    """simhash_pairs_incremental == simhash_pairs(old UNION new) restricted
    to pairs touching a new id — on both text SimHash60 and aHash64 image
    signatures (the two production signature widths)."""
    from iceberg_ingestion_spark.operators import dedup, text
    from iceberg_ingestion_spark.operators.multimodal import (
        ahash64,
        attach_binary_payload,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old_docs = docs.filter(F.col("doc_id") % 4 != 0)
    new_docs = docs.filter(F.col("doc_id") % 4 == 0).unionByName(
        old_docs.limit(5).withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    for name, sig_fn, bits, mh in (
        ("simhash60", lambda d: text.simhash60(d, "doc_id"), 60, 6),
        (
            "ahash64",
            lambda d: ahash64(attach_binary_payload(d), "doc_id").withColumnRenamed(
                "phash", "simhash"
            ),
            64,
            10,
        ),
    ):
        old_sigs, new_sigs = sig_fn(old_docs), sig_fn(new_docs)
        new_ids = {r.doc_id for r in new_docs.select("doc_id").collect()}
        full = {
            (r.id_1, r.id_2, r.hamming)
            for r in dedup.simhash_pairs(
                sig_fn(old_docs.unionByName(new_docs)), "doc_id",
                max_hamming=mh, bits=bits,
            ).collect()
        }
        expected = {p for p in full if p[0] in new_ids or p[1] in new_ids}
        got = {
            (r.id_1, r.id_2, r.hamming)
            for r in dedup.simhash_pairs_incremental(
                old_sigs, new_sigs, "doc_id", max_hamming=mh, bits=bits
            ).collect()
        }
        assert got == expected, name
        assert len(expected) > 0, name

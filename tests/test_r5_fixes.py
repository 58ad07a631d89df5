"""Round-5 regression pins for the round-4 ADVICE findings.

Each test here encodes one reviewer-reported latent defect and would fail on
the pre-fix code:

1. ``jaccard_prefix_pairs`` prefix length float guard (exact-boundary recall).
2. ``profile_drift`` per-side numeric detection (decimal drift on side b).
3. Streaming near-dup: corrupt/schema-drifted index FAILS the batch instead of
   silently downgrading to in-batch pairing.
4. Streaming near-dup: an id re-delivered in a later micro-batch never emits a
   degenerate (X, X, 0) self-pair.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_jaccard_prefix_exact_boundary_pair_not_missed(spark):
    """Containment pair with jaccard EXACTLY equal to the threshold, at a
    threshold where t*n lands on an integer in exact arithmetic but a hair
    above it in binary (0.8*5 -> 4.0000000000000002): without the epsilon the
    prefix is one shingle too short and the pair is silently dropped."""
    from iceberg_ingestion_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # 4 3-shingles
            (2, "a b c d e f g"),  # 5 3-shingles, superset of doc 1's
        ],
        "id bigint, text string",
    )
    # jaccard = 4/5 = 0.8 exactly; doc 2's only df=1 shingle ("e f g") sorts
    # first in its prefix, so recall of this pair REQUIRES the second prefix
    # slot that the unguarded ceil(0.8*5)=5 computation removes
    got = dedup.jaccard_prefix_pairs(df, "id", "text", k=3, threshold=0.8).collect()
    assert [(r.id_1, r.id_2) for r in got] == [(1, 2)]
    assert got[0].jaccard == pytest.approx(0.8)
    # and the reference generator agrees (pair-identity contract)
    ref = dedup.ngram_jaccard_pairs(df, "id", "text", k=3, threshold=0.8).collect()
    assert {(r.id_1, r.id_2) for r in ref} == {(1, 2)}


def test_profile_drift_decimal_only_on_side_b(spark):
    """Side b drifting to a decimal precision/scale side a never had must still
    populate sum_b — a numeric-type set derived from a.dtypes alone would NULL
    it and fake a value drift."""
    from iceberg_ingestion_spark.validate import profile_drift

    a = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    b = spark.createDataFrame([(1, 10.0), (2, 21.0)], "k int, v double").select(
        "k", F.col("v").cast("decimal(12,3)").alias("v")
    )
    row = {r["column"]: r for r in profile_drift(a, b, ["v"]).collect()}["v"]
    assert row["sum_a"] == pytest.approx(30.0)
    assert row["sum_b"] == pytest.approx(31.0)  # pre-fix: None
    # symmetric: decimal only on side a
    row2 = {r["column"]: r for r in profile_drift(b, a, ["v"]).collect()}["v"]
    assert row2["sum_a"] == pytest.approx(31.0)
    assert row2["sum_b"] == pytest.approx(30.0)


def test_near_dup_stream_corrupt_index_fails_batch(spark, tmp_path):
    """A schema-drifted index (simhash column missing) raises out of the
    foreachBatch fn — only PATH_NOT_FOUND (first batch ever) may downgrade to
    in-batch pairing. Silently skipping the probe would drop every
    new-vs-corpus pair of the batch without a trace."""
    from pyspark.errors import AnalysisException

    from iceberg_ingestion_spark.streaming.dedup_stream import (
        near_dup_stream_batch_fn,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    # corrupt index: right partitioning, no simhash column
    spark.createDataFrame([(1, 0)], "doc_id bigint, _batch_id int").write.partitionBy(
        "_batch_id"
    ).parquet(index_dir)
    batch = spark.createDataFrame([(2, "some document text")], "doc_id bigint, text string")
    fn = near_dup_stream_batch_fn(index_dir, pairs_dir, max_hamming=6)
    with pytest.raises(AnalysisException):
        fn(batch, 1)
    # and nothing was written for the failed batch
    import os

    assert not os.path.exists(pairs_dir)


def test_near_dup_stream_redelivered_id_no_self_pair(spark, tmp_path):
    """At-least-once sources may re-deliver a doc in a LATER micro-batch (not
    a same-batch-id replay). The index side must drop the batch's own ids
    before probing, else least/greatest produces a degenerate (X, X, 0) pair
    violating the id_1 < id_2 contract."""
    from iceberg_ingestion_spark.streaming.dedup_stream import (
        near_dup_stream_batch_fn,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b0 = docs.filter("doc_id % 2 = 0")
    # batch 1 re-delivers three of batch 0's docs verbatim, plus new docs
    b1 = docs.filter("doc_id % 2 = 1").unionByName(b0.limit(3))
    fn = near_dup_stream_batch_fn(index_dir, pairs_dir, max_hamming=6)
    fn(b0, 0)
    fn(b1, 1)
    pairs = spark.read.parquet(pairs_dir)
    assert pairs.filter(F.col("id_1") >= F.col("id_2")).count() == 0
    assert pairs.filter(F.col("id_1") == F.col("id_2")).count() == 0


def test_cc_star_contraction_logarithmic_rounds_on_adversarial_path(spark):
    """The round-5 scale-hardening pin: a 10k-node PATH (diameter 10k — the
    adversarial transitive-near-dup chain that makes min-label propagation
    crawl) converges in <= ceil(log2 n) + 2 star-contraction rounds, with
    component = global min for every node."""
    import math

    from iceberg_ingestion_spark.operators import dedup

    n = 10_000
    # relabel nodes by a multiplicative hash so ids are scattered, not sorted
    lab = [(i * 2654435761) % (1 << 31) for i in range(n)]
    pairs = spark.createDataFrame(
        [(lab[i], lab[i + 1]) for i in range(n - 1)], "id_1 long, id_2 long"
    ).repartition(8)
    budget = math.ceil(math.log2(n)) + 2  # 16
    labels = dedup.connected_components(pairs, max_iterations=budget)
    mn = min(lab)
    comps = labels.groupBy("component").count().collect()
    assert [(r.component, r["count"]) for r in comps] == [(mn, n)]


def test_cc_star_contraction_label_identical_to_propagation(spark):
    """Differential pin against the kept propagation kernel on a mixed
    adversarial graph: giant star + long chain + isolated pairs + a dense
    clique, integer AND string ids."""
    from iceberg_ingestion_spark.operators import dedup

    star = [(1000, 1000 + i) for i in range(1, 80)]  # giant star, center NOT min
    chain = [(2000 + i, 2000 + i + 1) for i in range(60)]
    bridge = [(1003, 2031)]  # star and chain merge through a bridge
    pairs_list = star + chain + bridge + [(7, 9), (5, 7), (42, 41)]
    clique = [(3000 + i, 3000 + j) for i in range(8) for j in range(i + 1, 8)]
    pairs = spark.createDataFrame(pairs_list + clique, "id_1 long, id_2 long")
    a = {
        (r.id, r.component)
        for r in dedup.connected_components(pairs, max_iterations=20).collect()
    }
    b = {
        (r.id, r.component)
        for r in dedup.connected_components_propagation(
            pairs, max_iterations=100
        ).collect()
    }
    assert a == b and len(a) > 0
    s_pairs = spark.createDataFrame(
        [(f"d{x:05d}", f"d{y:05d}") for x, y in pairs_list],
        "id_1 string, id_2 string",
    )
    sa = {
        (r.id, r.component)
        for r in dedup.connected_components(s_pairs, max_iterations=20).collect()
    }
    sb = {
        (r.id, r.component)
        for r in dedup.connected_components_propagation(
            s_pairs, max_iterations=100
        ).collect()
    }
    assert sa == sb and len(sa) > 0


def test_ivf_trained_codebook_beats_hash_spread_at_equal_nprobe(spark):
    """VERDICT r4 #2: at a corpus large enough for training to matter
    (sf0.01, 5k vectors), the k-means-trained codebook's recall vs the exact
    brute-force baseline strictly improves on the hash-spread draw at equal
    nprobe. (At sf0.001's 1k vectors the difference is sampling noise — the
    20x A/B lives in tools/scale_smoke.py ann_curve.)"""
    from iceberg_ingestion_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    flt = F.col("vec_id") % 50 == 0
    exact = similarity.topk_bruteforce(e, "vec_id", "embedding", 64, 5, flt).cache()
    n_exact = exact.count()

    def recall(approx):
        hits = exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        ).count()
        return hits / n_exact

    hashed = recall(
        similarity.topk_ivf(
            e, "vec_id", "embedding", 64, 5, flt, n_cells=16, nprobe=4
        )
    )
    cb = similarity.train_ivf_codebook(e, "vec_id", "embedding", 64, 16)
    assert cb.count() == 16  # full codebook, broadcast-sized
    trained = recall(
        similarity.topk_ivf(
            e, "vec_id", "embedding", 64, 5, flt, n_cells=16, nprobe=4, codebook=cb
        )
    )
    exact.unpersist()
    assert trained > hashed, (trained, hashed)
    assert trained >= 0.5  # comfortable margin over the 0.3 oracle floor


def test_multimodal_real_decode_seam_contract():
    """VERDICT r4 #8: the real-decoder seam. If PIL ever becomes installable
    the stub must be wired and golden-tested; until then the contract is that
    calling it names the missing dependency explicitly (so a user hitting the
    seam knows exactly what to install), chained from the ImportError."""
    from iceberg_ingestion_spark.operators.multimodal import real_decode

    try:
        import PIL  # noqa: F401

        pytest.skip(
            "PIL is installed: wire real_decode to it and replace this "
            "contract test with a golden decode test (VERDICT r4 #8)"
        )
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL/pillow") as ei:
        real_decode(b"\x89PNG fake")
    assert isinstance(ei.value.__cause__, ImportError)

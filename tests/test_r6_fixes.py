"""Round-6 regression pins: VERDICT r5 next-round items + ADVICE r5 fixes.

Each test names the finding it pins so a future regression is traceable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r5 #3: tfidf norms must not wrap silently past int64
# ---------------------------------------------------------------------------

def test_tfidf_norm_overflow_raises_not_wraps(spark):
    """A doc whose squared norm exceeds int64 (forced via a huge `scale`)
    must RAISE with the lower-scale remedy — before this fix, non-ANSI
    SUM(long) wrapped silently and the wrong cosine would only have
    surfaced as a cross-engine oracle mismatch."""
    from iceberg_ingestion_spark.operators.dedup import tfidf_cosine_pairs

    # 12 distinct bigrams, scale=1e9: idf_q ~ 1.4e9, sum of 12 * (1.4e9)^2
    # ~ 2.4e19 > 2^63-1 ~ 9.2e18
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l m"),
            (2, "a b c d e f g h i j k l m"),
        ],
        "doc_id int, text string",
    )
    with pytest.raises(Exception, match="overflows BIGINT|lower `scale`"):
        tfidf_cosine_pairs(
            docs, "doc_id", k=2, threshold=0.5, max_df_frac=1.0,
            scale=1_000_000_000,
        ).collect()


def test_tfidf_norm_guard_passes_at_default_scale(spark):
    """The guard is inert at the default scale on ordinary docs: same corpus,
    scale=1e4 — pairs come back with the exact cosine."""
    from iceberg_ingestion_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l m"),
            (2, "a b c d e f g h i j k l m"),
        ],
        "doc_id int, text string",
    )
    rows = tfidf_cosine_pairs(
        docs, "doc_id", k=2, threshold=0.5, max_df_frac=1.0
    ).collect()
    assert len(rows) == 1
    assert rows[0].id_1 == 1 and rows[0].id_2 == 2
    assert rows[0].cosine == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# VERDICT r5 #1: the weighted prefix must actually shrink the join
# ---------------------------------------------------------------------------

def test_tfidf_prefix_excludes_common_terms(spark):
    """On a corpus where every doc shares a common block plus rare unique
    content, the prefix relation must be strictly smaller than the full
    weight relation AND keep every doc (no doc loses its entire prefix):
    the rarest-first order puts the shared block last and the suffix-norm
    bound truncates it."""
    from iceberg_ingestion_spark.operators.dedup import (
        _tfidf_prefix,
        _tfidf_suffix_norms,
        _tfidf_weights,
    )

    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, f"unique{i}a unique{i}b unique{i}c unique{i}d " + common) for i in range(8)],
        "doc_id int, text string",
    )
    w = _tfidf_weights(docs, "doc_id", "text", 2, 1.0, 10_000)
    prefix = _tfidf_prefix(_tfidf_suffix_norms(w, "doc_id"), "doc_id", 0.5)
    n_full = w.count()
    n_prefix = prefix.count()
    assert n_prefix < n_full
    assert prefix.select("doc_id").distinct().count() == 8
    # rarest-first: every doc's unique bigrams (df=1) must lead its prefix —
    # the max _df inside any prefix is bounded by the common block's df only
    # if the suffix bound admits it; at t=0.5 with 4 unique leading tokens
    # the shared-block tail (df=8) is largely truncated
    w.unpersist()


# ---------------------------------------------------------------------------
# VERDICT r5 #3: batched BM25 retrieval over a query relation
# ---------------------------------------------------------------------------

def test_bm25_topk_batch_matches_python_reference(spark):
    """bm25_topk_batch == a dense Python Okapi computation using the SAME
    quantization (idf on 1e-9 grid, per-term contribution floored to 1e-9
    BIGINT) over a tiny corpus; ranks and scores exact."""
    import math

    from iceberg_ingestion_spark.operators.similarity import bm25_topk_batch

    corpus = {
        1: "spark join spark window",
        2: "join the window",
        3: "vector index search vector",
        4: "the the the spark",
    }
    queries = {"qa": ["spark", "join"], "qb": ["vector"]}
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id int, text string"
    )
    qt = spark.createDataFrame(
        [(q, t) for q, ts in queries.items() for t in ts],
        "query_id string, term string",
    )
    got = {
        (r.query_id, r.doc_id): (r.rank, r.bm25)
        for r in bm25_topk_batch(docs, qt, k=3).collect()
    }

    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    sumdl = sum(len(t) for t in toks.values())
    avgdl = sumdl / n

    def quant_contrib(tf, df, dl):
        idf = math.floor(
            math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e9 + 0.5
        ) / 1e9
        w = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        return math.floor(w * 1e9 + 0.5)

    expected = {}
    for q, ts in queries.items():
        scores = {}
        for d, dt in toks.items():
            s = 0
            for t in set(ts):
                tf = dt.count(t)
                if tf == 0:
                    continue
                df = sum(1 for v in toks.values() if t in v)
                s += quant_contrib(tf, df, len(dt))
            if s > 0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (d, s) in enumerate(ranked, 1):
            expected[(q, d)] = (rank, s / 1e9)
    assert got == expected


# ---------------------------------------------------------------------------
# ADVICE r5 #1: re-delivered ids must re-emit NOTHING (exactly-once pairs)
# ---------------------------------------------------------------------------

def test_near_dup_stream_redelivery_emits_each_pair_exactly_once(spark, tmp_path):
    """An id re-delivered in a LATER micro-batch is treated as old-only: the
    union of emitted pairs across batches equals the batch simhash_pairs
    over the DISTINCT corpus, with zero duplicate pair rows — before the
    fix, a replayed doc re-emitted its (X, older-doc) pairs into the new
    batch's partition."""
    from iceberg_ingestion_spark.operators import dedup, text
    from iceberg_ingestion_spark.streaming.dedup_stream import (
        near_dup_stream_batch_fn,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b0 = docs.filter("doc_id % 2 = 0")
    # batch 1 re-delivers a third of batch 0 verbatim, plus the odd docs —
    # chosen large enough that replayed docs HAVE within-radius partners in
    # the index (the hazard the fix removes)
    b1 = docs.filter("doc_id % 2 = 1").unionByName(b0.filter("doc_id % 3 = 0"))
    fn = near_dup_stream_batch_fn(index_dir, pairs_dir, max_hamming=6)
    fn(b0, 0)
    fn(b1, 1)
    emitted = spark.read.parquet(pairs_dir).select("id_1", "id_2", "hamming")
    # no duplicate pair rows across batch partitions
    assert emitted.count() == emitted.distinct().count()
    # union of emissions == batch pair set over the distinct corpus
    expected = dedup.simhash_pairs(
        text.simhash60(docs, "doc_id"), "doc_id", max_hamming=6
    )
    assert emitted.exceptAll(expected).count() == 0
    assert expected.exceptAll(emitted).count() == 0
    # and a replayed id never re-enters the index under a later batch
    idx = spark.read.parquet(index_dir)
    assert idx.count() == idx.select("doc_id").distinct().count()


# ---------------------------------------------------------------------------
# VERDICT r5 #5: shared-labels pipeline reports — one MinHash/CC execution
# ---------------------------------------------------------------------------

def test_shared_labels_reports_reuse_one_pair_graph(spark):
    """near_dup_canonical materializes the labels ONCE; both report
    operators read the materialized relation — their executed plans must
    contain no shingling (MapInPandas) or banding nodes, i.e. the pair
    graph cannot re-execute per report. Values must equal the r5
    self-contained forms (left-join + coalesce convention)."""
    from iceberg_ingestion_spark.operators import corpus, dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    labels = corpus.near_dup_canonical(docs, "doc_id", k=3, threshold=0.8)
    # labels are an already-computed scan, not a live MinHash plan
    lplan = labels._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in lplan and "Generate" not in lplan

    funnel = corpus.quality_funnel_report(docs, labels, 30)
    by_src = corpus.dedup_by_source_report(docs, labels)
    for rep in (funnel, by_src):
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan  # shingling never re-runs

    # value parity with the r5 inline construction
    from pyspark.sql import functions as Fn

    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", k=3, threshold=0.8)
    comp = dedup.connected_components(pairs).select(
        Fn.col("id").alias("doc_id"), "component"
    )
    keep_ref = {
        r.doc_id: r.keep
        for r in docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .withColumn(
            "keep",
            Fn.coalesce("component", Fn.col("doc_id")) == Fn.col("doc_id"),
        )
        .collect()
    }
    keep_got = {r.doc_id: r.keep for r in labels.collect()}
    assert keep_got == keep_ref
    # report outputs are consistent with the labels
    total_kept = sum(keep_got.values())
    by_src_rows = by_src.collect()
    assert sum(r.n_kept for r in by_src_rows) == total_kept


# ---------------------------------------------------------------------------
# ADVICE r5 #2: self-pair-only ids keep their (x, x) row in BOTH CC kernels
# ---------------------------------------------------------------------------

def test_cc_star_contraction_self_pairs_match_propagation(spark):
    """Graph with (a) an id appearing ONLY as a self-pair, (b) an id with
    both a self-pair and a real edge, (c) ordinary edges: the star-
    contraction kernel must return the same label set as the propagation
    reference — one row per id appearing in pairs, singletons included."""
    from iceberg_ingestion_spark.operators.dedup import (
        connected_components,
        connected_components_propagation,
    )

    pairs = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 3), (3, 3), (10, 11)],
        "id_1 bigint, id_2 bigint",
    )
    star = {(r.id, r.component) for r in connected_components(pairs).collect()}
    prop = {
        (r.id, r.component)
        for r in connected_components_propagation(pairs).collect()
    }
    assert star == prop
    assert (7, 7) in star  # self-pair-only id keeps its singleton row
    assert (3, 1) in star  # self-pair on a connected id doesn't split it


def test_cc_star_contraction_all_self_pairs(spark):
    """Degenerate graph of ONLY self-pairs: every id comes back a singleton
    (the empty-edge early exit must not drop them)."""
    from iceberg_ingestion_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(5, 5), (9, 9)], "id_1 bigint, id_2 bigint"
    )
    got = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert got == {(5, 5), (9, 9)}


def test_tfidf_prefix_identical_docs_share_prefix_term(spark):
    """Losslessness floor: two identical docs (cosine 1.0) must collide on a
    prefix term at ANY threshold (here t=1.0 — the tightest prefix)."""
    from iceberg_ingestion_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "zeta eta theta iota")],
        "doc_id int, text string",
    )
    rows = tfidf_cosine_pairs(
        docs, "doc_id", k=2, threshold=1.0, max_df_frac=1.0
    ).collect()
    assert {(r.id_1, r.id_2) for r in rows} == {(1, 2)}
    assert rows[0].cosine == pytest.approx(1.0, abs=0.0)

"""Round-5 operator additions: directed set-containment pairs, BM25 top-k
retrieval, vocabulary coverage."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Directed containment (one-sided prefix filter)
# ---------------------------------------------------------------------------


def test_containment_hand_case_directional(spark):
    """A fragment is contained in its extension, NOT vice versa."""
    from iceberg_ingestion_spark.operators.dedup import containment_prefix_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),            # shingles {abc,bcd,cde} — all in doc 2
            (2, "a b c d e f g h"),      # superset: {abc..fgh} (6 shingles)
            (3, "q r s t u"),            # disjoint
        ],
        "doc_id long, text string",
    )
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_prefix_pairs(docs, "doc_id", k=3, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}  # 3/3; reverse is 3/6 = 0.5 < t


def test_containment_exact_boundary_pair_kept(spark):
    """containment == t exactly (4 of 5 shingles shared at t=0.8) must
    survive both the prefix generation and the verify — the epsilon
    convention on ceil/compares."""
    from iceberg_ingestion_spark.operators.dedup import containment_prefix_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),    # {abc,bcd,cde,def,efg} (5)
            (2, "a b c d e f x"),    # shares {abc,bcd,cde,def} -> 4/5 = 0.8
        ],
        "doc_id long, text string",
    )
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in containment_prefix_pairs(docs, "doc_id", k=3, threshold=0.8).collect()
    }
    assert got == {(1, 2): pytest.approx(0.8), (2, 1): pytest.approx(0.8)}


def test_containment_matches_bruteforce_on_fixture(spark):
    """Prefix-generated candidates are LOSSLESS: the output equals the
    brute-force directed containment pair set on the fixture corpus."""
    from iceberg_ingestion_spark.operators.dedup import (
        containment_prefix_pairs,
        shingle_sets,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = 0.8
    got = {
        (r.src_id, r.dst_id): round(r.containment, 12)
        for r in containment_prefix_pairs(docs, "doc_id", k=3, threshold=t).collect()
    }
    sets_ = {r.doc_id: frozenset(r.ss) for r in shingle_sets(docs, "doc_id").collect()}
    want = {}
    for a, sa in sets_.items():
        for b, sb in sets_.items():
            if a == b or not sa:
                continue
            c = len(sa & sb) / len(sa)
            if c >= t:
                want[(a, b)] = round(c, 12)
    assert got == want
    assert got  # non-vacuous: the fixture corpus has containment pairs


def test_containment_threshold_guard(spark):
    from iceberg_ingestion_spark.operators.dedup import containment_prefix_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        containment_prefix_pairs(docs, "doc_id", threshold=0.0)


# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------


def test_bm25_matches_python_reference(spark):
    """Spark BM25 == a plain-Python Okapi reference on the fixture corpus
    (approx: the operator quantizes idf to 1e-9, Python does not)."""
    import math

    from iceberg_ingestion_spark.queries_text_dedup import (
        BM25_K,
        BM25_TERMS,
        q_sim_bm25_topk,
    )

    got = [(r.doc_id, r.bm25) for r in q_sim_bm25_topk(spark, SF).collect()]

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    toks = {r.doc_id: r.text.strip().lower().split() for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    k1, b = 1.2, 0.75
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in BM25_TERMS}
    scores = {}
    for doc_id, tk in toks.items():
        s = 0.0
        for t in BM25_TERMS:
            tf = tk.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
        if s > 0:
            scores[doc_id] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_K]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, e) in zip(got, want):
        assert a == pytest.approx(e, rel=1e-8)


def test_bm25_score_expr_is_shared_text():
    """The oracle embeds the SAME expression string the Spark side parses —
    the bit-equality argument rests on textual identity."""
    from iceberg_ingestion_spark.queries_ext_oracles import ORACLES_EXT
    from iceberg_ingestion_spark.queries_text_dedup import BM25_TERMS, bm25_score_expr

    expr = bm25_score_expr(
        "_sn",
        "_sumdl",
        "_dl",
        [f"_tf{i}" for i in range(len(BM25_TERMS))],
        [f"_sdf{i}" for i in range(len(BM25_TERMS))],
    )
    assert expr in ORACLES_EXT["sim_bm25_topk"]
    assert "floor(" in expr  # the 1e-9 idf quantize that pins cross-engine ln


# ---------------------------------------------------------------------------
# Vocabulary coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_matches_python_reference(spark):
    from collections import Counter

    from iceberg_ingestion_spark.queries_text_dedup import (
        VOCAB_TOP_K,
        q_text_vocab_coverage,
    )

    got = [
        (r.token, r.freq, r.rank, r.cum_share)
        for r in q_text_vocab_coverage(spark, SF).orderBy("rank").collect()
    ]
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    c = Counter(t for r in docs for t in r.text.strip().lower().split())
    total = sum(c.values())
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOP_K]
    assert [(t, f) for t, f, _, _ in got] == want
    assert [r for _, _, r, _ in got] == list(range(1, len(want) + 1))
    cum = 0
    for (_, f, _, share), (_, wf) in zip(got, want):
        cum += wf
        assert share == pytest.approx(cum / total)
    # coverage is monotone and ends <= 1
    shares = [s for _, _, _, s in got]
    assert shares == sorted(shares) and shares[-1] <= 1.0

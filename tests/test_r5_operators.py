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


# ---------------------------------------------------------------------------
# tf-idf weighted cosine pairs
# ---------------------------------------------------------------------------


def test_tfidf_cosine_matches_python_reference(spark):
    """Spark tf-idf cosine == plain-Python reference using the SAME
    quantized-integer weight definition, on the fixture corpus."""
    import math
    from collections import Counter

    from iceberg_ingestion_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t, max_df_frac, scale, k = 0.5, 0.3, 10_000, 2
    got = {
        (r.id_1, r.id_2): round(r.cosine, 12)
        for r in tfidf_cosine_pairs(
            docs, "doc_id", k=k, threshold=t, max_df_frac=max_df_frac, scale=scale
        ).collect()
    }

    rows = docs.collect()
    n = len(rows)
    tf = {}
    for r in rows:
        toks = (r.text or "").strip().lower().split()
        tf[r.doc_id] = Counter(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
    df_counts = Counter(s for c in tf.values() for s in c)
    max_df = math.floor(max_df_frac * n)
    w = {
        d: {
            s: c * math.floor((math.log((n + 1.0) / (df_counts[s] + 1.0)) + 1.0) * scale + 0.5)
            for s, c in cnt.items()
            if df_counts[s] <= max_df
        }
        for d, cnt in tf.items()
    }
    norms = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    want = {}
    ids = sorted(w)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            shared = set(w[d1]) & set(w[d2])
            if not shared:
                continue
            dot = sum(w[d1][s] * w[d2][s] for s in shared)
            cos = dot / math.sqrt(norms[d1] * norms[d2])
            if cos >= t:
                want[(d1, d2)] = round(cos, 12)
    assert got == want
    assert got  # non-vacuous


def test_tfidf_cosine_downweights_common_phrasing(spark):
    """Two docs overlapping ONLY in a boilerplate k-gram (df above max_df)
    must not pair; docs sharing rare phrasing must."""
    from iceberg_ingestion_spark.operators.dedup import tfidf_cosine_pairs

    boiler = "click here now"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} unique alpha phrase one"),
            (2, f"{boiler} different beta phrase two"),
            (3, "rare gamma signature text body"),
            (4, "rare gamma signature text tail"),
            *[(10 + i, boiler) for i in range(6)],  # make the boilerplate hot
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_1, r.id_2)
        for r in tfidf_cosine_pairs(
            docs, "doc_id", k=2, threshold=0.3, max_df_frac=0.3
        ).collect()
    }
    assert (3, 4) in got          # rare shared phrasing pairs
    assert (1, 2) not in got      # boilerplate-only overlap pruned by max_df
    assert not any(a >= 10 or b >= 10 for a, b in got)  # pure-boilerplate docs drop out


def test_tfidf_cosine_threshold_guard(spark):
    from iceberg_ingestion_spark.operators.dedup import tfidf_cosine_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        tfidf_cosine_pairs(docs, "doc_id", threshold=1.5)


# ---------------------------------------------------------------------------
# Pipeline report entries: quality funnel + per-source dedup attrition
# ---------------------------------------------------------------------------


def test_quality_funnel_monotone_and_consistent(spark):
    from iceberg_ingestion_spark.queries_corpus_mm import q_corpus_quality_funnel

    rows = sorted(
        q_corpus_quality_funnel(spark, SF).collect(), key=lambda r: r.stage_idx
    )
    assert [r.stage for r in rows] == [
        "total", "nonempty", "lang_known", "min_tokens", "neardup_canonical",
    ]
    counts = [r.n_surviving for r in rows]
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert counts[0] == total
    assert counts == sorted(counts, reverse=True)  # cumulative gates only shrink
    assert counts[-1] > 0


def test_dedup_by_source_sums_to_funnel(spark):
    """Per-source kept counts must sum to the corpus-wide number of near-dup
    canonical survivors (the same closure, grouped differently)."""
    from iceberg_ingestion_spark.operators import dedup
    from iceberg_ingestion_spark.queries_corpus_mm import q_corpus_dedup_by_source
    from iceberg_ingestion_spark.queries_text_dedup import MINHASH_THRESHOLD

    per_source = q_corpus_dedup_by_source(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", k=3, threshold=MINHASH_THRESHOLD)
    cc = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    all_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    n_survivors = sum(1 for i in all_ids if cc.get(i, i) == i)
    assert sum(r.n_kept for r in per_source) == n_survivors
    assert sum(r.n_docs for r in per_source) == len(all_ids)
    for r in per_source:
        assert 0 <= r.n_kept <= r.n_docs
        assert r.drop_rate == pytest.approx((r.n_docs - r.n_kept) / r.n_docs)

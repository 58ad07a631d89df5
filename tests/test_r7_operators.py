"""Round-7 operators: incremental tf-idf cosine (frozen-stats index probe),
persisted-df probe variants, winnowing substring-span dedup.

Each test names the VERDICT r6 next-round item it lands.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _python_frozen_tfidf_pairs(rows, t, max_df_frac, scale, k):
    """Plain-Python reference for the FROZEN-STATS policy: idf / max_df cut /
    corpus size all computed over the OLD docs (doc_id % 5 != 0) only; every
    doc (old and new) weighted in that frozen space; exact integer weights;
    pairs touching an increment id with cosine >= t."""
    tf = {}
    for r in rows:
        toks = (r.text or "").strip().lower().split()
        tf[r.doc_id] = Counter(
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
    old_ids = [d for d in tf if d % 5 != 0]
    n = len(old_ids)
    df_counts = Counter(s for d in old_ids for s in tf[d])
    max_df = math.floor(max_df_frac * n)
    w = {
        d: {
            s: c
            * math.floor(
                (math.log((n + 1.0) / (df_counts.get(s, 0) + 1.0)) + 1.0) * scale + 0.5
            )
            for s, c in cnt.items()
            if df_counts.get(s, 0) <= max_df
        }
        for d, cnt in tf.items()
    }
    norms = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    want = {}
    ids = sorted(w)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            if d1 % 5 != 0 and d2 % 5 != 0:
                continue  # old x old: out of contract
            shared = set(w[d1]) & set(w[d2])
            if not shared:
                continue
            dot = sum(w[d1][s] * w[d2][s] for s in shared)
            if norms[d1] == 0 or norms[d2] == 0:
                continue
            cos = dot / math.sqrt(norms[d1] * norms[d2])
            if cos >= t:
                want[(d1, d2)] = round(cos, 12)
    return want


# ---------------------------------------------------------------------------
# VERDICT r6 #3: incremental tf-idf cosine over a persisted prefix index
# ---------------------------------------------------------------------------

def test_tfidf_incremental_matches_frozen_stats_reference(spark):
    """tfidf_cosine_pairs_incremental == the plain-Python frozen-stats
    reference on the fixture corpus: the pinned policy contract (weights in
    the OLD corpus's stat space, increment terms off-vocabulary get df 0,
    only pairs touching an increment id)."""
    from iceberg_ingestion_spark.operators.dedup import (
        tfidf_cosine_pairs_incremental,
        tfidf_prefix_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t, max_df_frac, scale, k = 0.5, 0.3, 10_000, 2
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    index = tfidf_prefix_index(old, "doc_id", k=k, max_df_frac=max_df_frac, scale=scale)
    got = {
        (r.id_1, r.id_2): round(r.cosine, 12)
        for r in tfidf_cosine_pairs_incremental(
            index, new, "doc_id", k=k, threshold=t, max_df_frac=max_df_frac, scale=scale
        ).collect()
    }
    want = _python_frozen_tfidf_pairs(docs.collect(), t, max_df_frac, scale, k)
    assert got == want
    assert got  # non-vacuous
    assert all(a % 5 == 0 or b % 5 == 0 for a, b in got)  # touches increment


def test_tfidf_incremental_new_vocabulary_pairs(spark):
    """Increment docs sharing terms OUTSIDE the frozen vocabulary must still
    pair (df 0 -> maximal idf, sort first — the rarest-possible terms), and
    an increment doc near-identical to an old doc must pair across sides."""
    from iceberg_ingestion_spark.operators.dedup import (
        tfidf_cosine_pairs_incremental,
        tfidf_prefix_index,
    )

    old = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),     # == old doc 1
            (15, "brandnew wordone wordtwo wordthree"),  # new vocab only
            (20, "brandnew wordone wordtwo wordthree"),  # == new doc 15
        ],
        "doc_id long, text string",
    )
    index = tfidf_prefix_index(old, "doc_id", k=2, max_df_frac=1.0)
    got = {
        (r.id_1, r.id_2): r.cosine
        for r in tfidf_cosine_pairs_incremental(
            index, new, "doc_id", k=2, threshold=0.9, max_df_frac=1.0
        ).collect()
    }
    assert got[(1, 10)] == pytest.approx(1.0, abs=1e-12)
    assert got[(15, 20)] == pytest.approx(1.0, abs=1e-12)
    assert (1, 2) not in got and (2, 1) not in got  # old x old never re-paired


def test_tfidf_incremental_threshold_guard(spark):
    from iceberg_ingestion_spark.operators.dedup import (
        tfidf_cosine_pairs_incremental,
        tfidf_prefix_index,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    index = tfidf_prefix_index(docs, "doc_id")
    with pytest.raises(ValueError, match="threshold"):
        tfidf_cosine_pairs_incremental(index, docs, "doc_id", threshold=0.0)


# ---------------------------------------------------------------------------
# VERDICT r6 #5: persisted-df probe variants skip the full-index aggregate
# ---------------------------------------------------------------------------

def _n_aggregates(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().toString().count("Aggregate")


def test_containment_incremental_dfreq_skips_index_aggregate(spark, tmp_path):
    """With the persisted containment_df_relation passed as ``dfreq``, the
    probe plan must contain strictly FEWER aggregates than the
    self-contained form (the full-index df-derivation groupBy — replicated
    into every leg that consumes the frozen order, so the saving compounds),
    and the output must be identical."""
    from iceberg_ingestion_spark.operators.dedup import (
        containment_df_relation,
        containment_prefix_index,
        containment_prefix_pairs_incremental,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx_path, df_path = str(tmp_path / "cidx"), str(tmp_path / "cdf")
    index = containment_prefix_index(old, "doc_id", k=3)
    index.write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    containment_df_relation(index).write.parquet(df_path)
    dfreq = spark.read.parquet(df_path)

    derived = containment_prefix_pairs_incremental(index, new, "doc_id", k=3, threshold=0.8)
    persisted = containment_prefix_pairs_incremental(
        index, new, "doc_id", k=3, threshold=0.8, dfreq=dfreq
    )
    assert _n_aggregates(persisted) < _n_aggregates(derived)
    rows = lambda d: sorted(  # noqa: E731
        (r.src_id, r.dst_id, round(r.containment, 12)) for r in d.collect()
    )
    assert rows(persisted) == rows(derived)


def test_tfidf_incremental_dfreq_skips_index_aggregate(spark, tmp_path):
    """Same pin for the weighted family: tfidf_df_relation passed as
    ``dfreq`` removes the full-index groupBy from the probe plan (strictly
    fewer aggregates); output identical."""
    from iceberg_ingestion_spark.operators.dedup import (
        tfidf_cosine_pairs_incremental,
        tfidf_df_relation,
        tfidf_prefix_index,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx_path, df_path = str(tmp_path / "tidx"), str(tmp_path / "tdf")
    tfidf_prefix_index(old, "doc_id", k=2).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    tfidf_df_relation(index).write.parquet(df_path)
    dfreq = spark.read.parquet(df_path)

    derived = tfidf_cosine_pairs_incremental(index, new, "doc_id", k=2, threshold=0.5)
    persisted = tfidf_cosine_pairs_incremental(
        index, new, "doc_id", k=2, threshold=0.5, dfreq=dfreq
    )
    assert _n_aggregates(persisted) < _n_aggregates(derived)
    rows = lambda d: sorted(  # noqa: E731
        (r.id_1, r.id_2, round(r.cosine, 12)) for r in d.collect()
    )
    assert rows(persisted) == rows(derived)


# ---------------------------------------------------------------------------
# VERDICT r6 #6: winnowing substring-span dedup
# ---------------------------------------------------------------------------

def _python_span_reference(texts: dict[int, str], k: int, window: int):
    """All-pairs maximal common token runs of length >= window + k - 1:
    the direct computation the winnowed operator must equal exactly."""
    grams = {}
    for d, t in texts.items():
        toks = t.strip().lower().split()
        grams[d] = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    min_len = window + k - 1
    want = set()
    ids = sorted(grams)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            matches = {
                (p1, p2)
                for p1, g1 in enumerate(grams[d1], 1)
                for p2, g2 in enumerate(grams[d2], 1)
                if g1 == g2
            }
            for p1, p2 in matches:
                if (p1 - 1, p2 - 1) in matches:
                    continue  # not a run start
                ln = 0
                while (p1 + ln, p2 + ln) in matches:
                    ln += 1
                tok_len = ln + k - 1
                if tok_len >= min_len:
                    want.add((d1, d2, p1, p2, tok_len))
    return want


def test_substring_spans_match_python_reference(spark):
    """substring_span_pairs == the direct all-pairs maximal-run reference on
    a crafted corpus: shifted quotes (the aligned-chunk-dedup blind spot),
    multiple islands per pair, sub-threshold runs dropped, repeated grams."""
    from iceberg_ingestion_spark.operators.dedup import substring_span_pairs

    quote = "the five boxing wizards jump quickly over the lazy brown dog tonight"
    texts = {
        1: f"intro words here {quote} closing remarks",
        2: f"{quote} and then a totally different second half of text",
        3: f"one two three four {quote} five six seven eight nine ten",
        4: "the five boxing wizards never jump quickly over anything at all",
        5: f"first island {quote} middle gap words {quote} second island",
        6: "completely unrelated content with no shared long substrings here",
        7: "repeat repeat repeat repeat repeat repeat repeat repeat repeat",
        8: "repeat repeat repeat repeat tail of the eighth document text",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    k, w = 4, 5
    got = {
        (r.id_1, r.id_2, r.start_1, r.start_2, r.match_len)
        for r in substring_span_pairs(docs, "doc_id", k=k, window=w).collect()
    }
    want = _python_span_reference(texts, k, w)
    assert got == want
    assert got  # non-vacuous
    # the shifted quote (docs 1 vs 2: offsets 4 vs 1) was caught
    assert any(a == 1 and b == 2 for a, b, *_ in got)


def test_substring_spans_randomized_equals_reference(spark):
    """Seeded randomized corpus (shared fragments planted at random offsets
    into random filler) — operator == direct reference on every draw."""
    import random

    from iceberg_ingestion_spark.operators.dedup import substring_span_pairs

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(40)]
    fragment = ["frag%d" % i for i in range(9)]
    texts = {}
    for d in range(24):
        body = [rng.choice(vocab) for _ in range(rng.randint(6, 30))]
        if d % 3 == 0:  # plant the fragment at a random offset
            at = rng.randint(0, len(body))
            body = body[:at] + fragment + body[at:]
        texts[d] = " ".join(body)
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    k, w = 3, 4
    got = {
        (r.id_1, r.id_2, r.start_1, r.start_2, r.match_len)
        for r in substring_span_pairs(docs, "doc_id", k=k, window=w).collect()
    }
    assert got == _python_span_reference(texts, k, w)
    assert got


def test_substring_spans_guarantee_floor(spark):
    """A common substring of EXACTLY window + k - 1 tokens is the guarantee
    floor — must be emitted; one of window + k - 2 tokens must not."""
    from iceberg_ingestion_spark.operators.dedup import substring_span_pairs

    k, w = 4, 5  # floor = 8 tokens
    shared8 = "s1 s2 s3 s4 s5 s6 s7 s8"
    shared7 = "u1 u2 u3 u4 u5 u6 u7"
    docs = spark.createDataFrame(
        [
            (1, f"aa bb {shared8} cc dd"),
            (2, f"{shared8} xx yy zz ww vv"),
            (3, f"ee ff {shared7} gg hh"),
            (4, f"{shared7} pp qq rr ss tt"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_1, r.id_2): r.match_len
        for r in substring_span_pairs(docs, "doc_id", k=k, window=w).collect()
    }
    assert got == {(1, 2): 8}


def test_substring_spans_window_guard(spark):
    from iceberg_ingestion_spark.operators.dedup import substring_span_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        substring_span_pairs(docs, "doc_id", window=0)


# ---------------------------------------------------------------------------
# r7 continuation: incremental substring spans (per-doc selection index probe)
# ---------------------------------------------------------------------------

def test_substring_incremental_equals_batch_restricted(spark):
    """substring_span_pairs_incremental == substring_span_pairs over
    old ∪ new restricted to pairs touching an increment id — EXACT equality
    (winnowing selection is per-doc; nothing is frozen), on the fixture
    corpus."""
    from iceberg_ingestion_spark.operators.dedup import (
        substring_span_index,
        substring_span_pairs,
        substring_span_pairs_incremental,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    k, w = 4, 5
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    index = substring_span_index(old, "doc_id", k=k, window=w)
    got = {
        (r.id_1, r.id_2, r.start_1, r.start_2, r.match_len)
        for r in substring_span_pairs_incremental(
            index, new, "doc_id", k=k, window=w
        ).collect()
    }
    want = {
        (r.id_1, r.id_2, r.start_1, r.start_2, r.match_len)
        for r in substring_span_pairs(docs, "doc_id", k=k, window=w).collect()
        if r.id_1 % 5 == 0 or r.id_2 % 5 == 0
    }
    assert got == want
    assert got  # non-vacuous
    assert all(a % 5 == 0 or b % 5 == 0 for a, b, *_ in got)


def test_substring_incremental_no_old_old_pairs(spark):
    """Old x old spans never appear even when the old corpus is
    span-dense; cross-side and new x new spans do."""
    from iceberg_ingestion_spark.operators.dedup import (
        substring_span_index,
        substring_span_pairs_incremental,
    )

    quote = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10"
    old = spark.createDataFrame(
        [(1, f"a b {quote}"), (2, f"{quote} c d"), (3, "no shared content here at all")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, f"x {quote} y"), (15, f"z {quote} w")],
        "doc_id long, text string",
    )
    index = substring_span_index(old, "doc_id", k=4, window=5)
    got = {
        (r.id_1, r.id_2)
        for r in substring_span_pairs_incremental(index, new, "doc_id", k=4, window=5).collect()
    }
    assert (1, 2) not in got            # old x old never re-paired
    assert {(1, 10), (2, 10), (1, 15), (2, 15), (10, 15)} <= got


def test_substring_index_window_guard(spark):
    from iceberg_ingestion_spark.operators.dedup import substring_span_index

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        substring_span_index(docs, "doc_id", window=0)

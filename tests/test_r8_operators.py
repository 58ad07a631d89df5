"""Round-8 operators and fixes.

- ADVICE r7 (high): max_df-cut shingles must keep their true frozen df in
  the tf-idf prefix index (tombstone rows), so an incremental probe never
  weights cut boilerplate as df-0 new vocabulary.
- ADVICE r7 (low): an empty index/dfreq substitutes _n = 0 instead of
  silently emitting nothing.
Later sections land VERDICT r7 next-round items (chained increments,
substring-span scrub, reliable materialization).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.test_r7_operators import _python_frozen_tfidf_pairs

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ADVICE r7 high: frozen-stats probe with a shingle ABOVE the max_df cut
# ---------------------------------------------------------------------------

def _hazard_corpus():
    """9 old docs (ids skip multiples of 5) all opening with the same
    boilerplate phrase — its bigrams have old-df 9 > floor(0.3 * 9) = 2,
    so they are CUT at index build — plus 2 increment docs that CONTAIN the
    cut boilerplate alongside a shared rare phrase. The documented hazard:
    a probe that coalesces the cut shingles to df 0 weights the corpus's
    most common terms as its rarest and every increment cosine diverges
    from the frozen-stats contract."""
    boiler = "terms of service apply here"
    old = [
        (i, f"{boiler} unique{i} filler{i} content{i} words{i}")
        for i in [1, 2, 3, 4, 6, 7, 8, 9, 11]
    ]
    new = [
        (5, f"{boiler} rare alpha beta gamma"),
        (10, f"{boiler} rare alpha beta delta"),
    ]
    return old, new


def test_tfidf_incremental_cut_shingle_in_increment(spark):
    """tfidf_cosine_pairs_incremental == the frozen-stats Python reference
    on a corpus where boilerplate shingles CROSS the max_df cut and appear
    in increment docs (the exact ADVICE r7 hazard). The reference computes
    df over ALL old shingles before cutting, so equality proves the index
    preserves pre-cut df (tombstones) and the probe drops cut terms instead
    of maximally up-weighting them."""
    from iceberg_ingestion_spark.operators.dedup import (
        tfidf_cosine_pairs_incremental,
        tfidf_prefix_index,
    )

    old_rows, new_rows = _hazard_corpus()
    t, max_df_frac, scale, k = 0.5, 0.3, 10_000, 2
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    # the hazard is real: boilerplate bigrams exceed the cut AND appear in
    # increment docs (guards the fixture against silently going stale)
    n_old = len(old_rows)
    cut = math.floor(max_df_frac * n_old)
    old_df = Counter(
        s
        for _, text in old_rows
        for s in {
            " ".join(toks[i : i + k])
            for toks in [text.lower().split()]
            for i in range(len(toks) - k + 1)
        }
    )
    new_shingles = {
        " ".join(toks[i : i + k])
        for _, text in new_rows
        for toks in [text.lower().split()]
        for i in range(len(toks) - k + 1)
    }
    assert any(old_df[s] > cut for s in new_shingles)

    index = tfidf_prefix_index(old, "doc_id", k=k, max_df_frac=max_df_frac, scale=scale)
    got = {
        (r.id_1, r.id_2): round(r.cosine, 12)
        for r in tfidf_cosine_pairs_incremental(
            index, new, "doc_id", k=k, threshold=t, max_df_frac=max_df_frac, scale=scale
        ).collect()
    }
    all_rows = old.unionByName(new).collect()
    want = _python_frozen_tfidf_pairs(all_rows, t, max_df_frac, scale, k)
    assert got == want
    assert got  # non-vacuous: the rare-phrase increment pair survives


def test_tfidf_index_tombstones_carry_cut_df(spark):
    """Structural pin for the fix: cut shingles appear in the index exactly
    once as NULL-id/-_wt/-_sfxd/-_n2 tombstones carrying their TRUE frozen
    df; tfidf_df_relation therefore covers the full pre-cut vocabulary; the
    prefix filter never admits a tombstone."""
    from iceberg_ingestion_spark.operators.dedup import (
        _tfidf_prefix,
        tfidf_df_relation,
        tfidf_prefix_index,
    )

    old_rows, _ = _hazard_corpus()
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    index = tfidf_prefix_index(old, "doc_id", k=2, max_df_frac=0.3)

    tomb = index.filter(F.col("_wt").isNull()).collect()
    assert tomb  # the boilerplate bigrams were cut
    assert all(
        r.doc_id is None and r._sfxd is None and r._n2 is None for r in tomb
    )
    by_shingle = Counter(r.shingle for r in tomb)
    assert max(by_shingle.values()) == 1  # one tombstone per cut shingle
    assert {r.shingle: r._df for r in tomb}["terms of"] == 9

    dfreq = {r.shingle: r._df for r in tfidf_df_relation(index).collect()}
    assert dfreq["terms of"] == 9  # pre-cut df visible to probes
    assert dfreq["unique1 filler1"] == 1

    prefix = _tfidf_prefix(index, "doc_id", 0.0001).collect()
    assert all(r.doc_id is not None for r in prefix)  # tombstones never probe


def test_tfidf_index_parquet_roundtrip_preserves_tombstones(spark, tmp_path):
    """The persisted-index path (write -> read back -> probe) produces the
    same pair set as the in-session index on the hazard corpus — tombstones
    survive parquet and the persisted tfidf_df_relation stays complete."""
    from iceberg_ingestion_spark.operators.dedup import (
        tfidf_cosine_pairs_incremental,
        tfidf_df_relation,
        tfidf_prefix_index,
    )

    old_rows, new_rows = _hazard_corpus()
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    idx_path, df_path = str(tmp_path / "tidx"), str(tmp_path / "tdf")
    tfidf_prefix_index(old, "doc_id", k=2, max_df_frac=0.3).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    tfidf_df_relation(index).write.parquet(df_path)
    dfreq = spark.read.parquet(df_path)

    rows = lambda d: sorted(  # noqa: E731
        (r.id_1, r.id_2, round(r.cosine, 12)) for r in d.collect()
    )
    live = tfidf_cosine_pairs_incremental(
        tfidf_prefix_index(old, "doc_id", k=2, max_df_frac=0.3),
        new, "doc_id", k=2, threshold=0.5, max_df_frac=0.3,
    )
    persisted = tfidf_cosine_pairs_incremental(
        index, new, "doc_id", k=2, threshold=0.5, max_df_frac=0.3, dfreq=dfreq
    )
    assert rows(persisted) == rows(live)
    assert rows(live)


# ---------------------------------------------------------------------------
# ADVICE r7 low: empty index / dfreq must not silently empty the probe
# ---------------------------------------------------------------------------

def test_tfidf_incremental_empty_index_still_pairs_new_new(spark):
    """An EMPTY old corpus substitutes _n = 0 (every increment term df 0,
    idf 1, cut bound 0): new x new pairs the frozen-stats contract emits at
    N = 0 still appear instead of the silent-empty crossJoin."""
    from iceberg_ingestion_spark.operators.dedup import (
        tfidf_cosine_pairs_incremental,
        tfidf_prefix_index,
    )

    old = spark.createDataFrame([], "doc_id long, text string")
    new = spark.createDataFrame(
        [(5, "alpha beta gamma delta"), (10, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    index = tfidf_prefix_index(old, "doc_id", k=2, max_df_frac=0.3)
    got = {
        (r.id_1, r.id_2): r.cosine
        for r in tfidf_cosine_pairs_incremental(
            index, new, "doc_id", k=2, threshold=0.9, max_df_frac=0.3
        ).collect()
    }
    assert got[(5, 10)] == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# VERDICT r7 #1: substring_span_scrub — act on detected spans (keep-first)
# ---------------------------------------------------------------------------

def _python_scrub_reference(texts: dict[int, str], k: int, window: int):
    """Keep-first rebuild over the all-pairs maximal-run reference: every
    token position of doc d covered by a shared run whose partner has a
    smaller id is removed; text rebuilt in normalized token space."""
    from tests.test_r7_operators import _python_span_reference

    spans = _python_span_reference(texts, k, window)
    removed: dict[int, set[int]] = {d: set() for d in texts}
    for _, d2, _, start_2, ln in spans:
        removed[d2].update(range(start_2, start_2 + ln))
    out = {}
    for d, t in texts.items():
        toks = t.strip().lower().split()
        kept = [tok for i, tok in enumerate(toks, 1) if i not in removed[d]]
        out[d] = (" ".join(kept), len(toks) - len(kept))
    return out


def test_substring_scrub_matches_python_reference(spark):
    """substring_span_scrub == the keep-first rebuild over the direct
    all-pairs reference on the crafted corpus from the span tests: shifted
    quotes, multi-island pairs, a doc that is ENTIRELY duplicated content
    (scrubs to empty string — the row must still be present)."""
    from iceberg_ingestion_spark.operators.dedup import substring_span_scrub

    quote = "the five boxing wizards jump quickly over the lazy brown dog tonight"
    texts = {
        1: f"intro words here {quote} closing remarks",
        2: f"{quote} and then a totally different second half of text",
        3: quote,                                    # entirely duplicated
        5: f"first island {quote} middle gap words {quote} second island",
        6: "completely unrelated content with no shared long substrings here",
        7: "repeat repeat repeat repeat repeat repeat repeat repeat repeat",
        8: "repeat repeat repeat repeat tail of the eighth document text",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    k, w = 4, 5
    got = {
        r.doc_id: (r.scrubbed_text, r.n_removed)
        for r in substring_span_scrub(docs, "doc_id", k=k, window=w).collect()
    }
    want = _python_scrub_reference(texts, k, w)
    assert got == want
    assert set(got) == set(texts)            # full coverage, every doc present
    assert got[3] == ("", len(quote.split()))  # all-duplicate doc -> empty, kept
    assert got[1][1] == 0                     # min-id occurrence always retained


def test_substring_scrub_randomized_equals_reference(spark):
    """Seeded randomized corpus (planted fragments at random offsets):
    scrub == keep-first reference on every draw."""
    import random

    from iceberg_ingestion_spark.operators.dedup import substring_span_scrub

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(40)]
    fragment = ["frag%d" % i for i in range(9)]
    texts = {}
    for d in range(24):
        body = [rng.choice(vocab) for _ in range(rng.randint(6, 30))]
        if d % 3 == 0:
            at = rng.randint(0, len(body))
            body = body[:at] + fragment + body[at:]
        texts[d] = " ".join(body)
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    k, w = 3, 4
    got = {
        r.doc_id: (r.scrubbed_text, r.n_removed)
        for r in substring_span_scrub(docs, "doc_id", k=k, window=w).collect()
    }
    assert got == _python_scrub_reference(texts, k, w)
    assert any(n for _, n in got.values())  # non-vacuous


def test_substring_scrub_precomputed_spans(spark):
    """Passing a precomputed ``spans`` relation (the persisted-run seam)
    produces the identical rebuild — detection is skipped, not redone."""
    from iceberg_ingestion_spark.operators.dedup import (
        substring_span_pairs,
        substring_span_scrub,
    )

    quote = "the five boxing wizards jump quickly over the lazy brown dog tonight"
    docs = spark.createDataFrame(
        [(1, f"a b {quote}"), (2, f"{quote} c d"), (4, "nothing shared here at all")],
        "doc_id long, text string",
    )
    spans = substring_span_pairs(docs, "doc_id", k=4, window=5)
    rows = lambda d: sorted(  # noqa: E731
        (r.doc_id, r.scrubbed_text, r.n_removed) for r in d.collect()
    )
    assert rows(
        substring_span_scrub(docs, "doc_id", k=4, window=5, spans=spans)
    ) == rows(substring_span_scrub(docs, "doc_id", k=4, window=5))

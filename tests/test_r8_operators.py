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

"""Property-based tests (hypothesis) for the merge calculus.

The invariants the reference's design guarantees, checked over generated
snapshots instead of hand-picked fixtures:

1. full snapshot-merge makes the target bag-equal to the source
   (the reference's own --test assertion, salesforce.py:80-83) whenever
   touched rows carry strictly newer timestamps;
2. merging a snapshot into itself changes nothing (idempotency — a re-run of
   the same day is a no-op, guaranteed by J3's strict `>`);
3. CDC dedup keeps exactly one row per key, and it is a maximal-timestamp row.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_ingestion_spark.changes import build_changeset, dedup_latest
from iceberg_ingestion_spark.merge import merge_dataframes
from iceberg_ingestion_spark.model import ChangeSpec
from iceberg_ingestion_spark.validate import bag_diff

SPEC = ChangeSpec(natural_keys=("k",), updated_at_fields=("ts",))

# (key, ts, payload) rows; keys from a small pool so collisions are common.
row = st.tuples(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=50),
    st.sampled_from(["a", "b", "c"]),
)

snapshot = st.lists(row, min_size=0, max_size=12).map(
    # one row per key: max-ts row wins so a snapshot is a valid table state
    lambda rows: list({k: (k, t, p) for k, t, p in sorted(rows, key=lambda r: r[1])}.values())
)

PROP_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [(None, None, None)], "k int, ts int, payload string").filter(
        F.col("k").isNotNull()
    )


@given(day1=snapshot, day2=snapshot)
@PROP_SETTINGS
def test_full_merge_reaches_source_when_changes_are_newer(spark, day1, day2):
    # Make every overlapping day2 row strictly newer than day1's: the merge
    # must then land exactly on day2 (bag-equal), the reference's --test gate.
    d1 = {k: (k, t, p) for k, t, p in day1}
    day2_newer = [
        (k, t + 51, p) if k in d1 else (k, t, p) for k, t, p in day2
    ]
    src, tgt = _df(spark, day2_newer), _df(spark, day1)
    merged = merge_dataframes(tgt, build_changeset(src, tgt, SPEC), SPEC)
    assert bag_diff(merged, src).count() == 0


@given(snap=snapshot)
@PROP_SETTINGS
def test_merge_self_is_identity(spark, snap):
    df = _df(spark, snap)
    merged = merge_dataframes(df, build_changeset(df, df, SPEC), SPEC)
    assert bag_diff(merged, df).count() == 0


@given(batch=st.lists(row, min_size=1, max_size=12))
@PROP_SETTINGS
def test_cdc_dedup_latest_is_maximal_per_key(spark, batch):
    cdc = spark.createDataFrame(
        [(k, t, p, "U") for k, t, p in batch], "k int, ts int, payload string, op string"
    )
    got = dedup_latest(cdc, SPEC).collect()
    maxts = {}
    for k, t, _ in batch:
        maxts[k] = max(maxts.get(k, -1), t)
    assert len(got) == len(maxts)            # exactly one row per key
    for r in got:
        assert r.ts == maxts[r.k]            # and it carries the max timestamp


@PROP_SETTINGS
@given(old=snapshot, new=snapshot)
def test_changelog_applied_to_old_reproduces_new(spark, old, new):
    """4. For ANY two table states, applying build_changelog(old, new) to old
    yields exactly new: old minus (DELETE ∪ UPDATE_BEFORE) keys plus
    (INSERT ∪ UPDATE_AFTER) rows — and unchanged rows never appear in the
    changelog (minimality)."""
    from iceberg_ingestion_spark.changes import (
        CHANGE_TYPE_COL,
        CT_INSERT,
        CT_UPDATE_AFTER,
        build_changelog,
    )

    o, n = _df(spark, old), _df(spark, new)
    ch = build_changelog(o, n, ["k"]).collect()

    adds = {(r["k"], r["ts"], r["payload"]) for r in ch
            if r[CHANGE_TYPE_COL] in (CT_INSERT, CT_UPDATE_AFTER)}
    removed_keys = {r["k"] for r in ch
                    if r[CHANGE_TYPE_COL] not in (CT_INSERT, CT_UPDATE_AFTER)}
    old_rows = {(r["k"], r["ts"], r["payload"]) for r in o.collect()}
    new_rows = {(r["k"], r["ts"], r["payload"]) for r in n.collect()}

    rebuilt = {r for r in old_rows if r[0] not in removed_keys} | adds
    assert rebuilt == new_rows
    # minimality: rows identical in both states never surface
    unchanged = old_rows & new_rows
    surfaced = adds | {(r["k"], r["ts"], r["payload"]) for r in ch}
    assert not (unchanged & surfaced)


# ---------------------------------------------------------------------------
# Two-sided join IVM: maintained == recomputed for ARBITRARY v1→v2 states
# ---------------------------------------------------------------------------

# fact rows (order_id, cust, price-cents); dims (cust, seg). Small pools so
# inserts/updates/deletes and dim moves all occur; one row per key.
fact_snapshot = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=999),
    ),
    min_size=0,
    max_size=10,
).map(lambda rows: list({r[0]: r for r in rows}.values()))

dim_snapshot = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4), st.sampled_from(["A", "B", "C"])),
    min_size=5,
    max_size=5,
).map(lambda rows: [(c, next(s for cc, s in rows if cc == c)) for c in range(5)]
      if {c for c, _ in rows} >= set(range(5)) else [(c, "A") for c in range(5)])


@given(f1=fact_snapshot, f2=fact_snapshot, s1=dim_snapshot, s2=dim_snapshot)
@PROP_SETTINGS
def test_two_sided_join_ivm_property(spark, f1, f2, s1, s2):
    """γ(R₂ ⋈ S₂) == apply(γ(R₁ ⋈ S₁), Δ(R⋈S)) for arbitrary generated
    state pairs — inserts, deletes, reprices and dim re-segmentation in any
    combination, including simultaneous fact+dim churn on the same key."""
    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import (
        apply_signed_changelog_to_agg,
        join_changelog,
    )

    fddl = "order_id int, cust int, cents long"
    sddl = "cust int, seg string"
    r1 = spark.createDataFrame(f1 or [(None,) * 3], fddl).filter(F.col("order_id").isNotNull())
    r2 = spark.createDataFrame(f2 or [(None,) * 3], fddl).filter(F.col("order_id").isNotNull())
    d1 = spark.createDataFrame(s1, sddl)
    d2 = spark.createDataFrame(s2, sddl)

    ch_r = build_changelog(r1, r2, ["order_id"])
    ch_s = build_changelog(d1, d2, ["cust"])

    def rollup(fact, dim):
        return (
            fact.join(dim, "cust")
            .groupBy("seg")
            .agg(F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n_rows"))
        )

    signed = join_changelog(r1, ch_r, d1, ch_s, on=["cust"])
    maintained = apply_signed_changelog_to_agg(
        rollup(r1, d1), signed, ["seg"], {"total": F.col("cents")}
    )
    got = {r.seg: (r.total, r.n_rows) for r in maintained.collect()}
    want = {r.seg: (r.total, r.n_rows) for r in rollup(r2, d2).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# r4-continuation operator properties: CMS and boilerplate scrub
# ---------------------------------------------------------------------------

values = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=60
)


@given(values)
@PROP_SETTINGS
def test_property_cms_never_underestimates_and_bounds(spark, vals):
    """Over arbitrary multisets: CMS point estimates are >= the true count
    for EVERY key (hard guarantee), and the total overcount mass across all
    keys is bounded by (depth-weighted) collisions — checked via the sketch's
    own conservation law: every cell's count equals the sum of the true
    counts of keys hashing there, so est(k) <= N always."""
    from collections import Counter

    from iceberg_ingestion_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "k int")
    cms = count_min_table(df, "k", depth=3, width=16)  # narrow: collisions likely
    est = count_min_estimate(
        cms, df.select("k").distinct(), "k", depth=3, width=16
    )
    rows = {r.value: r.est_cnt for r in est.collect()}
    n = len(vals)
    assert set(rows) == {str(k) for k in truth}
    for k, c in truth.items():
        assert c <= rows[str(k)] <= n


texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
        min_size=0, max_size=12,
    ).map(" ".join),
    min_size=1, max_size=6,
)


@given(texts)
@PROP_SETTINGS
def test_property_boilerplate_scrub_invariants(spark, docs):
    """Over arbitrary corpora: every doc keeps exactly one output row;
    0 <= n_removed <= n_chunks; min_docs high enough means identity rebuild
    (whitespace-normalized); and a doc's surviving chunks appear in original
    order as a subsequence of its full chunk list."""
    from iceberg_ingestion_spark.operators.corpus import boilerplate_chunk_scrub

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    out = {r.doc_id: r for r in boilerplate_chunk_scrub(df, chunk_words=2, min_docs=2).collect()}
    assert set(out) == set(range(len(docs)))
    for i, text_in in enumerate(docs):
        r = out[i]
        assert 0 <= r.n_removed <= r.n_chunks
        toks = text_in.strip().lower().split()
        chunks = [" ".join(toks[j:j+2]) for j in range(0, len(toks), 2)] or [""]
        assert r.n_chunks == len(chunks)
        # surviving text is the in-order concatenation of a subset of chunks
        kept = r.cleaned_text.split(" ") if r.cleaned_text else []
        it = iter(" ".join(chunks).split(" ") if any(chunks) else [])
        assert all(tok in it for tok in kept) or r.cleaned_text == ""
    # identity when nothing can repeat across docs (min_docs > corpus size)
    ident = {
        r.doc_id: r
        for r in boilerplate_chunk_scrub(df, chunk_words=2, min_docs=len(docs) + 1).collect()
    }
    for i, text_in in enumerate(docs):
        assert ident[i].n_removed == 0
        assert ident[i].cleaned_text == " ".join(text_in.strip().lower().split())


# ---------------------------------------------------------------------------
# SCD2 (r4 late block)
# ---------------------------------------------------------------------------

#: (key, ts) version events; duplicate (key, ts) pairs are collapsed so the
#: version order is total per key (the operator's documented contract: the
#: (ts, tiebreaks) order must be total).
history = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 30)), min_size=1, max_size=15
).map(lambda rows: sorted({(k, t) for k, t in rows}))


@given(history)
@PROP_SETTINGS
def test_property_scd2_tiles_each_key_timeline(spark, hist):
    """Over generated version histories: row count is preserved, each key's
    ranges tile half-open with no gaps/overlaps, exactly one open (current)
    version per key, and the as-of probe at any version ts returns exactly
    that version."""
    from iceberg_ingestion_spark.changes import scd2_from_history

    df = spark.createDataFrame(hist, "k int, ts int")
    out = scd2_from_history(df, ["k"], "ts").collect()
    assert len(out) == len(hist)  # SCD2 keeps EVERY version
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.valid_to == nxt.valid_from
        assert rows[-1].valid_to is None
        assert sum(r.is_current for r in rows) == 1
        # as-of probe at each version's own ts yields exactly that version
        for probe in rows:
            hits = [
                r for r in rows
                if r.valid_from <= probe.valid_from
                and (r.valid_to is None or probe.valid_from < r.valid_to)
            ]
            assert [h.valid_from for h in hits] == [probe.valid_from]


# ---------------------------------------------------------------------------
# edit-distance verify (r4 late block)
# ---------------------------------------------------------------------------

def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


texts = st.text(alphabet="ab c", min_size=0, max_size=12)


@given(st.lists(st.tuples(texts, texts), min_size=1, max_size=8))
@PROP_SETTINGS
def test_property_edit_distance_matches_reference_dp(spark, pairs):
    """Spark's levenshtein + the operator's threshold filter agree with a
    pure-Python DP over generated strings: every surviving pair's distance
    is exact, and exactly the pairs within (1/5)·max(len) survive (empty
    strings: max(len)=0 keeps only identical-empty pairs, dist 0)."""
    from iceberg_ingestion_spark.operators.dedup import edit_distance_pairs

    docs = [(2 * i, a) for i, (a, _) in enumerate(pairs)] + [
        (2 * i + 1, b) for i, (_, b) in enumerate(pairs)
    ]
    cand = [(2 * i, 2 * i + 1) for i in range(len(pairs))]
    out = edit_distance_pairs(
        spark.createDataFrame(cand, "id_1 long, id_2 long"),
        spark.createDataFrame(docs, "doc_id long, text string"),
        "doc_id",
        F.col("text"),
        max_dist_num=1,
        max_dist_den=5,
    ).collect()
    got = {(r.id_1, r.id_2): r.edit_dist for r in out}
    for i, (a, b) in enumerate(pairs):
        d = _py_levenshtein(a, b)
        expected_kept = d * 5 <= max(len(a), len(b)) * 1
        key = (2 * i, 2 * i + 1)
        assert (key in got) == expected_kept, (a, b, d)
        if expected_kept:
            assert got[key] == d, (a, b)


# ---------------------------------------------------------------------------
# r4-final operators: sequence match, PMI, prefix-filtered Jaccard
# ---------------------------------------------------------------------------

ev_row = st.tuples(
    st.integers(min_value=0, max_value=3),            # user
    st.integers(min_value=0, max_value=30),           # ts
    st.sampled_from(["view", "click", "purchase", "error", "other"]),
)


@given(events=st.lists(ev_row, min_size=0, max_size=25))
@PROP_SETTINGS
def test_sequence_match_equals_reference_regex(spark, events):
    """The one-shuffle journey build + rlike equals a plain-Python rebuild of
    each user's journey and re.search — over random event streams, including
    ts ties (broken by event_id) and uncoded types."""
    import re

    from iceberg_ingestion_spark.operators.funnel import sequence_match

    codes = {"view": "v", "click": "c", "purchase": "p", "error": "e"}
    pattern = "v[^e]*c[^e]*p"
    rows = [(u, i, et, ts) for i, (u, ts, et) in enumerate(events)]
    df = spark.createDataFrame(
        rows or [(None, None, None, None)],
        "user_id int, event_id int, event_type string, ts_us int",
    ).filter(F.col("user_id").isNotNull())
    got = {
        r.user_id: (r.n_events, r.journey, r.matched)
        for r in sequence_match(df, pattern, codes).collect()
    }
    expected: dict[int, str] = {}
    for u, i, et, ts in sorted(rows, key=lambda r: (r[3], r[1])):
        if et in codes:
            expected[u] = expected.get(u, "") + codes[et]
    assert set(got) == set(expected)
    for u, j in expected.items():
        assert got[u] == (len(j), j, re.search(pattern, j) is not None)


doc_row = st.tuples(
    st.integers(min_value=0, max_value=99),
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8).map(" ".join),
)


@given(docs=st.lists(doc_row, min_size=0, max_size=10, unique_by=lambda d: d[0]))
@PROP_SETTINGS
def test_prefix_jaccard_equals_bruteforce(spark, docs):
    """Prefix filtering loses NOTHING: over random tiny corpora (tiny
    vocabulary -> dense collisions, empty/short docs included) the pair set
    and scores equal the all-pairs Python computation."""
    from iceberg_ingestion_spark.operators.dedup import jaccard_prefix_pairs

    k, t = 2, 0.5
    df = spark.createDataFrame(
        docs or [(None, None)], "doc_id int, text string"
    ).filter(F.col("doc_id").isNotNull())
    got = {
        (r.id_1, r.id_2): r.jaccard
        for r in jaccard_prefix_pairs(df, "doc_id", k=k, threshold=t).collect()
    }
    sets_ = {}
    for did, text in docs:
        toks = text.strip().lower().split()
        sets_[did] = {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
    expected = {}
    ids = sorted(sets_)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets_[a] & sets_[b])
            union = len(sets_[a] | sets_[b])
            if union and inter / union >= t:
                expected[(a, b)] = inter / union
    assert got == expected


@given(docs=st.lists(doc_row, min_size=0, max_size=10, unique_by=lambda d: d[0]))
@PROP_SETTINGS
def test_pmi_marginals_are_consistent(spark, docs):
    """With no min-count filter and k large enough to keep every pair:
    c_pair <= min(c_first, c_second), lift is exactly c_pair*N/(c1*c2), and
    each first-word marginal equals the sum of its pairs' counts."""
    from collections import Counter

    from iceberg_ingestion_spark.operators.text import pmi_top_collocations

    df = spark.createDataFrame(
        docs or [(None, None)], "doc_id int, text string"
    ).filter(F.col("doc_id").isNotNull())
    rows = pmi_top_collocations(df, min_count=1, k=10_000).collect()
    bigrams = Counter()
    for _did, text in docs:
        toks = text.strip().lower().split()
        for i in range(len(toks) - 1):
            bigrams[(toks[i], toks[i + 1])] += 1
    n_total = sum(bigrams.values())
    assert {(r.w1, r.w2) for r in rows} == set(bigrams)
    first = Counter()
    for (w1, _w2), c in bigrams.items():
        first[w1] += c
    for r in rows:
        assert r.c_pair == bigrams[(r.w1, r.w2)]
        assert r.c_pair <= min(r.c_first, r.c_second)
        assert r.c_first == first[r.w1]
        assert r.lift == (r.c_pair * n_total) / (r.c_first * r.c_second)


@given(
    docs=st.lists(doc_row, min_size=0, max_size=10, unique_by=lambda d: d[0]),
    t=st.sampled_from([0.5, 0.75, 0.8, 1.0]),
)
@PROP_SETTINGS
def test_prefix_containment_equals_bruteforce(spark, docs, t):
    """The one-sided prefix filter loses NOTHING: over random tiny corpora
    (tiny vocabulary -> dense collisions, empty/short docs, boundary
    thresholds incl. exact-integer t*n) the DIRECTED pair set and scores
    equal the all-pairs Python computation."""
    from iceberg_ingestion_spark.operators.dedup import containment_prefix_pairs

    k = 2
    df = spark.createDataFrame(
        docs or [(None, None)], "doc_id int, text string"
    ).filter(F.col("doc_id").isNotNull())
    got = {
        (r.src_id, r.dst_id): round(r.containment, 12)
        for r in containment_prefix_pairs(df, "doc_id", k=k, threshold=t).collect()
    }
    sets_ = {}
    for did, text in docs:
        toks = text.strip().lower().split()
        sets_[did] = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    expected = {}
    for a, sa in sets_.items():
        for b, sb in sets_.items():
            if a == b or not sa:
                continue
            c = len(sa & sb) / len(sa)
            if c >= t:
                expected[(a, b)] = round(c, 12)
    assert got == expected


@given(docs=st.lists(doc_row, min_size=0, max_size=10, unique_by=lambda d: d[0]))
@PROP_SETTINGS
def test_tfidf_cosine_equals_bruteforce(spark, docs):
    """The sparse inverted-index tf-idf cosine equals the dense all-pairs
    Python computation using the SAME integer-quantized weights, over random
    tiny corpora (duplicate tokens -> tf > 1, max_df pruning hit by the
    4-token vocabulary)."""
    import math
    from collections import Counter

    from iceberg_ingestion_spark.operators.dedup import tfidf_cosine_pairs

    k, t, max_df_frac, scale = 2, 0.5, 0.6, 10_000
    df = spark.createDataFrame(
        docs or [(None, None)], "doc_id int, text string"
    ).filter(F.col("doc_id").isNotNull())
    got = {
        (r.id_1, r.id_2): round(r.cosine, 12)
        for r in tfidf_cosine_pairs(
            df, "doc_id", k=k, threshold=t, max_df_frac=max_df_frac, scale=scale
        ).collect()
    }
    n = len(docs)
    tf = {}
    for did, text in docs:
        toks = text.strip().lower().split()
        tf[did] = Counter(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
    dfc = Counter(s for c in tf.values() for s in c)
    max_df = math.floor(max_df_frac * n)
    w = {
        d: {
            s: c * math.floor((math.log((n + 1.0) / (dfc[s] + 1.0)) + 1.0) * scale + 0.5)
            for s, c in cnt.items()
            if dfc[s] <= max_df
        }
        for d, cnt in tf.items()
    }
    norms = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    expected = {}
    ids = sorted(w)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            cos = sum(w[a][s] * w[b][s] for s in shared) / math.sqrt(
                norms[a] * norms[b]
            )
            if cos >= t:
                expected[(a, b)] = round(cos, 12)
    assert got == expected


@given(
    docs=st.lists(doc_row, min_size=0, max_size=10, unique_by=lambda d: d[0]),
    t=st.sampled_from([0.5, 0.8, 1.0]),
)
@PROP_SETTINGS
def test_incremental_containment_equals_batch_restriction(spark, docs, t):
    """The frozen-order index-probe incremental containment equals the BATCH
    directed pair set restricted to pairs touching an increment id, over
    random tiny corpora (dense collisions, empty docs, boundary thresholds,
    increments with out-of-vocabulary shingles). Pure construction claim —
    no banding probability involved."""
    from iceberg_ingestion_spark.operators.dedup import (
        containment_prefix_index,
        containment_prefix_pairs,
        containment_prefix_pairs_incremental,
    )

    k = 2
    df = spark.createDataFrame(
        docs or [(None, None)], "doc_id int, text string"
    ).filter(F.col("doc_id").isNotNull())
    old = df.filter(F.col("doc_id") % 3 != 0)
    new = df.filter(F.col("doc_id") % 3 == 0)
    index = containment_prefix_index(old, "doc_id", k=k)
    got = {
        (r.src_id, r.dst_id): round(r.containment, 12)
        for r in containment_prefix_pairs_incremental(
            index, new, "doc_id", k=k, threshold=t
        ).collect()
    }
    expected = {
        (r.src_id, r.dst_id): round(r.containment, 12)
        for r in containment_prefix_pairs(df, "doc_id", k=k, threshold=t).collect()
        if r.src_id % 3 == 0 or r.dst_id % 3 == 0
    }
    assert got == expected

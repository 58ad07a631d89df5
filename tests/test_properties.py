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

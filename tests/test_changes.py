"""Unit tests for the change calculus (SURVEY §2.4 J1/J2/J3, §2.6 W1, §2.8 U1).

Pins the reference semantics that are easy to 'fix' accidentally (SURVEY §7.4):
strict-> update detection, no-delete-leg incremental, tie handling in CDC dedup,
already-soft-deleted exclusion.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.changes import (
    build_changeset,
    dedup_latest,
    detect_deletes,
    detect_inserts,
    detect_updates,
    empty_like,
)
from iceberg_ingestion_spark.model import ChangeSpec, MergeOptions

SPEC = ChangeSpec(natural_keys=("id",), updated_at_fields=("mod_ts",))
SCHEMA = "id long, mod_ts timestamp, payload string"


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.fromisoformat(ts), p) for i, ts, p in rows], SCHEMA
    )


@pytest.fixture()
def target(spark):
    return _df(
        spark,
        [
            (1, "2026-01-01T00:00:00", "t1"),
            (2, "2026-01-02T00:00:00", "t2"),
            (3, "2026-01-03T00:00:00", "t3"),
        ],
    )


@pytest.fixture()
def source(spark):
    return _df(
        spark,
        [
            (2, "2026-01-02T00:00:00", "touched-same-ts"),  # NOT an update (strict >)
            (3, "2026-01-04T00:00:00", "newer"),            # update
            (4, "2026-01-05T00:00:00", "brand-new"),        # insert
        ],
    )


def test_detect_inserts(spark, source, target):
    got = detect_inserts(source, target, SPEC)
    assert [r.id for r in got.collect()] == [4]
    assert got.columns == ["id", "mod_ts", "payload", "op"]
    assert got.first().op == "I"


def test_detect_deletes(spark, source, target):
    got = detect_deletes(source, target, SPEC)
    assert [r.id for r in got.collect()] == [1]
    assert got.first().payload == "t1"  # delete leg carries the TARGET payload
    assert got.first().op == "D"


def test_detect_deletes_skips_already_soft_deleted(spark, source, target):
    tgt = target.withColumn("hard_deleted", F.col("id") == 1)
    got = detect_deletes(source, tgt, SPEC, soft_delete_col="hard_deleted")
    assert got.count() == 0  # id=1 is already tombstoned -> not re-deleted


def test_detect_updates_strictly_newer_only(spark, source, target):
    got = detect_updates(source, target, SPEC)
    assert [r.id for r in got.collect()] == [3]  # id=2 equal-ts excluded
    assert got.first().op == "U"


def test_dedup_latest_keeps_newest_per_key(spark):
    cdc = _df(
        spark,
        [
            (1, "2026-01-01T00:00:00", "old"),
            (1, "2026-01-03T00:00:00", "newest"),
            (1, "2026-01-02T00:00:00", "mid"),
            (2, "2026-01-01T00:00:00", "only"),
        ],
    )
    got = {r.id: r.payload for r in dedup_latest(cdc, SPEC).collect()}
    assert got == {1: "newest", 2: "only"}


def test_dedup_latest_tie_yields_single_survivor(spark):
    # row_number tie semantics: exactly one survivor, which one is unspecified
    # (reference iceberg.py:211-216; SURVEY §7.4).
    cdc = _df(
        spark,
        [
            (1, "2026-01-01T00:00:00", "a"),
            (1, "2026-01-01T00:00:00", "b"),
        ],
    )
    got = dedup_latest(cdc, SPEC).collect()
    assert len(got) == 1
    assert got[0].payload in {"a", "b"}


def test_build_changeset_full(spark, source, target):
    got = build_changeset(source, target, SPEC, ingestion_ts="2026-08-13 02:00:00")
    ops = {(r.id, r.op) for r in got.collect()}
    assert ops == {(4, "I"), (3, "U"), (1, "D")}
    assert "ingestion_datetime" in got.columns


def test_build_changeset_incremental_has_no_deletes(spark, source, target):
    got = build_changeset(source, target, SPEC, include_deletes=False)
    ops = {(r.id, r.op) for r in got.collect()}
    assert ops == {(4, "I"), (3, "U")}


def test_build_changeset_toggles(spark, source, target):
    got = build_changeset(
        source, target, SPEC, options=MergeOptions(insert=False, update=True, delete=True)
    )
    ops = {(r.id, r.op) for r in got.collect()}
    assert ops == {(3, "U"), (1, "D")}


def test_empty_like_preserves_schema(spark, source):
    e = empty_like(source)
    assert e.schema == source.schema
    assert e.count() == 0


def test_incremental_agg_maintenance_matches_recompute(spark):
    """IVM theorem on a hand-built changelog: maintained(agg(v1), changelog)
    == agg(v2) recomputed, covering an untouched key, a pure update, a
    vanishing key (count drops to 0) and a brand-new key."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import apply_changelog_to_agg

    v1 = spark.createDataFrame(
        # key 1: untouched; key 2: one row updated; key 3: vanishes;
        # key 4: appears in v2 only
        [(10, 1, 5.00), (11, 1, 7.00), (20, 2, 3.00), (30, 3, 9.00)],
        "order_id long, cust long, price double",
    )
    v2 = spark.createDataFrame(
        [(10, 1, 5.00), (11, 1, 7.00), (20, 2, 4.50), (40, 4, 1.25)],
        "order_id long, cust long, price double",
    )
    ch = build_changelog(v1, v2, ["order_id"])
    money = F.col("price").cast("decimal(18,2)")
    agg_v1 = v1.groupBy("cust").agg(
        F.sum(money).alias("total"), F.count(F.lit(1)).alias("n_rows")
    )
    got = {
        r.cust: (float(r.total), r.n_rows)
        for r in apply_changelog_to_agg(agg_v1, ch, ["cust"], {"total": money}).collect()
    }
    want = {
        r.cust: (float(r.total), r.n_rows)
        for r in v2.groupBy("cust")
        .agg(F.sum(money).alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == want
    assert 3 not in got and 4 in got  # vanished / appeared


def test_changelog_deltas_rejects_unknown_change_type(spark):
    """An unrecognized _change_type must fail loudly, not contribute 0."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.operators.incremental import changelog_deltas

    bad = spark.createDataFrame(
        [(1, 1, 5.0, "TRUNCATE")], "order_id long, cust long, price double, _change_type string"
    )
    with pytest.raises(Exception, match="unknown change type"):
        changelog_deltas(
            bad, ["cust"], {"total": F.col("price").cast("decimal(18,2)")}
        ).collect()


def test_incremental_join_agg_maintenance_matches_recompute(spark):
    """Join-IVM theorem (static dimension): maintaining the rollup of
    fact ⋈ dim by γ(Δfact ⋈ dim) equals recomputing γ(fact_v2 ⋈ dim) —
    covering an update within a segment, a delete emptying a segment, and
    an insert creating a new segment's first row."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import apply_changelog_to_agg

    dim = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C")], "cust long, seg string"
    )
    v1 = spark.createDataFrame(
        [(10, 1, 5.00), (11, 2, 7.00), (30, 3, 9.00)],
        "order_id long, cust long, price double",
    )
    v2 = spark.createDataFrame(
        # seg A: one row repriced; seg B: vanishes; seg C: appears
        [(10, 1, 6.00), (11, 2, 7.00), (40, 4, 1.25)],
        "order_id long, cust long, price double",
    )
    ch = build_changelog(v1, v2, ["order_id"])
    money = F.col("price").cast("decimal(18,2)")

    def rollup(fact):
        return (
            fact.join(F.broadcast(dim), "cust")
            .groupBy("seg")
            .agg(F.sum(money).alias("total"), F.count(F.lit(1)).alias("n_rows"))
        )

    maintained = apply_changelog_to_agg(
        rollup(v1), ch.join(F.broadcast(dim), "cust"), ["seg"], {"total": money}
    )
    got = {r.seg: (float(r.total), r.n_rows) for r in maintained.collect()}
    want = {r.seg: (float(r.total), r.n_rows) for r in rollup(v2).collect()}
    assert got == want
    assert "B" not in got and "C" in got


def test_two_sided_join_ivm_matches_recompute(spark):
    """Δ(R ⋈ S) bag algebra: fact rows repriced/inserted/deleted AND
    dimension rows re-segmented in the same tick; the maintained rollup
    must equal the from-scratch v2 rollup."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import (
        apply_signed_changelog_to_agg,
        join_changelog,
    )

    r1 = spark.createDataFrame(
        [(10, 1, 5.00), (11, 2, 7.00), (12, 2, 2.00), (30, 3, 9.00)],
        "order_id long, cust long, price double",
    )
    r2 = spark.createDataFrame(
        # 10 repriced, 12 deleted, 30 kept, 40 inserted (cust 4)
        [(10, 1, 6.00), (11, 2, 7.00), (30, 3, 9.00), (40, 4, 1.00)],
        "order_id long, cust long, price double",
    )
    s1 = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C")], "cust long, seg string"
    )
    s2 = spark.createDataFrame(
        # cust 2 moves A -> B in the SAME tick its order 12 is deleted;
        # cust 3 moves B -> C
        [(1, "A"), (2, "B"), (3, "C"), (4, "C")], "cust long, seg string"
    )
    ch_r = build_changelog(r1, r2, ["order_id"])
    ch_s = build_changelog(s1, s2, ["cust"])
    money = F.col("price").cast("decimal(18,2)")

    def rollup(fact, dim):
        return (
            fact.join(dim, "cust")
            .groupBy("seg")
            .agg(F.sum(money).alias("total"), F.count(F.lit(1)).alias("n_rows"))
        )

    signed = join_changelog(
        r1.select("cust", "order_id", "price"), ch_r.select("cust", "order_id", "price", "_change_type"),
        s1, ch_s, on=["cust"],
    )
    maintained = apply_signed_changelog_to_agg(
        rollup(r1, s1), signed, ["seg"], {"total": money}
    )
    got = {r.seg: (float(r.total), r.n_rows) for r in maintained.collect()}
    want = {r.seg: (float(r.total), r.n_rows) for r in rollup(r2, s2).collect()}
    assert got == want
    assert "A" in got and "B" in got and "C" in got


def test_expectation_report_counts_and_single_pass(spark):
    """Violation counting (NULL rule result = violation), pass flags, and
    the one-scan plan contract (a 4-rule suite is one aggregate, not four
    jobs — no more than one Exchange in the plan)."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.validate import expectation_report

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, None)], "k int, v double"
    )
    rules = {
        "k_not_null": F.col("k").isNotNull(),
        "v_positive": F.col("v") > 0,   # NULL v -> violation
        "k_small": F.col("k") < 100,    # NULL k -> violation
    }
    got = {r.rule: (r.n_checked, r.n_violations, r.passed)
           for r in expectation_report(df, rules).collect()}
    assert got == {
        "k_not_null": (4, 1, False),
        "v_positive": (4, 2, False),   # -5 and NULL
        "k_small": (4, 1, False),      # NULL k fails
    }
    ok = expectation_report(df, {"all_good": F.lit(True)})
    assert [r.passed for r in ok.collect()] == [True]
    # one table read for the whole suite (optimized logical plan — the AQE
    # executed-plan string duplicates nodes across Initial/Final sections)
    plan = ok._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_refresh_dirty_keys_maintains_minmax_under_delete_of_max(spark):
    """Non-invertible IVM: deleting a key's current max forces that key's
    re-aggregation — refresh_dirty_keys touches ONLY dirty keys and still
    lands exactly on the from-scratch rollup; untouched keys pass through
    from the old rollup without recomputation."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import refresh_dirty_keys

    v1 = spark.createDataFrame(
        # cust 1: rows 5,9 (max 9); cust 2: row 3; cust 3: row 7
        [(10, 1, 5.0), (11, 1, 9.0), (20, 2, 3.0), (30, 3, 7.0)],
        "order_id long, cust long, price double",
    )
    v2 = spark.createDataFrame(
        # delete cust 1's MAX (row 11); cust 2 gains a new max; cust 3 untouched
        [(10, 1, 5.0), (20, 2, 3.0), (21, 2, 8.0), (30, 3, 7.0)],
        "order_id long, cust long, price double",
    )
    ch = build_changelog(v1, v2, ["order_id"])
    exprs = {
        "min_price": F.min("price"),
        "max_price": F.max("price"),
        "n_rows": F.count(F.lit(1)),
    }
    agg_v1 = v1.groupBy("cust").agg(*[e.alias(n) for n, e in exprs.items()])
    got = {
        r.cust: (r.min_price, r.max_price, r.n_rows)
        for r in refresh_dirty_keys(agg_v1, v2, ch, ["cust"], exprs).collect()
    }
    want = {
        r.cust: (r.min_price, r.max_price, r.n_rows)
        for r in v2.groupBy("cust").agg(*[e.alias(n) for n, e in exprs.items()]).collect()
    }
    assert got == want
    assert got[1] == (5.0, 5.0, 1)   # max correctly fell from 9 to 5
    # a key vanishing entirely also works
    v3 = v2.filter(F.col("cust") != 3)
    ch23 = build_changelog(v2, v3, ["order_id"])
    agg_v2 = v2.groupBy("cust").agg(*[e.alias(n) for n, e in exprs.items()])
    got3 = {r.cust for r in refresh_dirty_keys(agg_v2, v3, ch23, ["cust"], exprs).collect()}
    assert got3 == {1, 2}


def test_referential_violations_finds_orphans_and_nulls(spark):
    from pyspark.sql import Row

    from iceberg_ingestion_spark.validate import referential_violations

    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99), (13, None)], "id long, fk long"
    )
    bad = {r.id for r in referential_violations(child, parent, "fk", "pk").collect()}
    assert bad == {12, 13}  # orphan AND null fk
    # clean child -> empty
    ok = child.filter(F.col("fk").isin(1, 2))
    assert referential_violations(ok, parent, "fk", "pk").count() == 0
    # real testdata: orders -> customer FK is intact
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    assert referential_violations(o, c, "o_custkey", "c_custkey").count() == 0

"""As-of join semantics (backward match, <= ties, nulls on no-match, null
payload values not skipped) and analytics-query sanity pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators.asof import asof_join


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k string, lts long, lv string")
    right = spark.createDataFrame(right_rows, "k string, rts long, payload string")
    out = asof_join(left, right, ["k"], "lts", "rts", ["payload"])
    return {(r.k, r.lts): (r.matched_rts, r.matched_payload) for r in out.collect()}


def test_asof_backward_basic(spark):
    got = _run(
        spark,
        [("a", 10, "x"), ("a", 25, "y"), ("a", 5, "z")],
        [("a", 8, "p8"), ("a", 20, "p20"), ("a", 30, "p30")],
    )
    assert got[("a", 10)] == (8, "p8")
    assert got[("a", 25)] == (20, "p20")
    assert got[("a", 5)] == (None, None)  # nothing at or before 5


def test_asof_equal_ts_matches(spark):
    got = _run(spark, [("a", 20, "x")], [("a", 20, "eq")])
    assert got[("a", 20)] == (20, "eq")  # <= semantics: same-ts right row wins


def test_asof_key_isolation(spark):
    got = _run(
        spark,
        [("a", 10, "x"), ("b", 10, "y")],
        [("a", 5, "pa")],
    )
    assert got[("a", 10)] == (5, "pa")
    assert got[("b", 10)] == (None, None)


def test_asof_null_payload_not_skipped(spark):
    # The matched right row carries a NULL payload value; the join must return
    # that NULL, not reach back to an older non-null row.
    got = _run(
        spark,
        [("a", 10, "x")],
        [("a", 3, "old"), ("a", 9, None)],
    )
    assert got[("a", 10)] == (9, None)


def test_asof_left_rows_all_preserved(spark):
    left = spark.createDataFrame(
        [("a", i, "v") for i in range(50)], "k string, lts long, lv string"
    )
    right = spark.createDataFrame([("a", 25, "p")], "k string, rts long, payload string")
    out = asof_join(left, right, ["k"], "lts", "rts", ["payload"])
    assert out.count() == 50
    matched = out.filter(F.col("matched_payload").isNotNull()).count()
    assert matched == 25  # lts 25..49


def test_rollup_levels(spark):
    from iceberg_ingestion_spark.queries_analytics import rollup_revenue

    out = rollup_revenue(spark, "/root/testdata/sf0.001").collect()
    regions = {r.region for r in out}
    assert "ALL" in regions  # grand total present
    grand = [r for r in out if r.region == "ALL" and r.nation == "ALL"]
    assert len(grand) == 1
    per_nation = sum(r.n_customers for r in out if r.region != "ALL" and r.nation != "ALL")
    assert grand[0].n_customers == per_nation


def test_topn_per_segment_rank_bounds(spark):
    from iceberg_ingestion_spark.queries_analytics import topn_orders_per_segment

    out = topn_orders_per_segment(spark, "/root/testdata/sf0.001")
    assert out.filter(F.col("rank") > 3).count() == 0
    per_seg = out.groupBy("c_mktsegment").count().collect()
    assert all(r["count"] <= 3 for r in per_seg)

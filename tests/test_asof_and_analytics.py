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


# ---------------------------------------------------------------------------
# Time-series resample / anomaly (operators/timeseries.py)
# ---------------------------------------------------------------------------

def test_resample_locf_fills_gaps_and_marks_observed(spark):
    from pyspark.sql import Row
    from iceberg_ingestion_spark.operators.timeseries import resample_locf

    # key a: buckets 0 and 3 observed -> grid 0..3, gaps carry 1.0 forward;
    # in bucket 3 two observations, later ts wins; key b: single bucket
    rows = [
        Row(k="a", ts_us=10, ev=1, v=1.0),
        Row(k="a", ts_us=310, ev=2, v=9.0),
        Row(k="a", ts_us=390, ev=3, v=5.0),
        Row(k="b", ts_us=150, ev=4, v=7.0),
    ]
    out = resample_locf(
        spark.createDataFrame(rows), ["k"], "ts_us", "v",
        bucket_us=100, tiebreak_cols=["ev"],
    )
    got = {(r.k, r.bucket): (r.value, r.observed) for r in out.collect()}
    assert got == {
        ("a", 0): (1.0, True),
        ("a", 1): (1.0, False),
        ("a", 2): (1.0, False),
        ("a", 3): (5.0, True),   # ts 390 beats 310
        ("b", 1): (7.0, True),
    }


def test_resample_locf_tiebreak_is_total(spark):
    """Same-timestamp observations resolve by the tiebreak column, not
    partition luck."""
    from pyspark.sql import Row
    from iceberg_ingestion_spark.operators.timeseries import resample_locf

    rows = [Row(k="a", ts_us=50, ev=1, v=3.0), Row(k="a", ts_us=50, ev=2, v=8.0)]
    out = resample_locf(
        spark.createDataFrame(rows).repartition(4), ["k"], "ts_us", "v",
        bucket_us=100, tiebreak_cols=["ev"],
    )
    assert [(r.value, r.observed) for r in out.collect()] == [(8.0, True)]


def test_count_anomaly_flags_spike_only(spark):
    from pyspark.sql import Row
    from iceberg_ingestion_spark.operators.timeseries import count_anomaly_flags

    # key a: buckets with counts 1,1,1,1,6 -> mean 2, var (4*1+16)/5=4, std 2
    # -> threshold 6; 6 > 6 is false at z=2, true at z=1.9
    rows = []
    for b, n in enumerate([1, 1, 1, 1, 6]):
        rows += [Row(k="a", ts_us=b * 100 + i) for i in range(n)]
    df = spark.createDataFrame(rows)
    flags2 = {r.bucket: r.is_anomaly for r in
              count_anomaly_flags(df, ["k"], "ts_us", bucket_us=100, z=2.0).collect()}
    assert flags2 == {0: False, 1: False, 2: False, 3: False, 4: False}
    flags19 = {r.bucket: r.is_anomaly for r in
               count_anomaly_flags(df, ["k"], "ts_us", bucket_us=100, z=1.9).collect()}
    assert flags19[4] is True and not any(v for b, v in flags19.items() if b != 4)


def test_time_weighted_avg_step_semantics(spark):
    from pyspark.sql import Row
    from iceberg_ingestion_spark.operators.timeseries import time_weighted_avg

    rows = [
        # user a: 2 holds for 100us, 4 holds for 200us -> (200+800)/300
        Row(k="a", ts_us=0, ev=1, v=2.0),
        Row(k="a", ts_us=100, ev=2, v=4.0),
        Row(k="a", ts_us=300, ev=3, v=9.0),   # last obs: zero weight
        # user b: single observation -> zero span -> no row
        Row(k="b", ts_us=50, ev=4, v=7.0),
        # user c: same-ts tie -> zero-width segment, later ev spans on
        Row(k="c", ts_us=10, ev=5, v=1.0),
        Row(k="c", ts_us=10, ev=6, v=3.0),
        Row(k="c", ts_us=20, ev=7, v=5.0),
    ]
    out = {r.k: r for r in time_weighted_avg(
        spark.createDataFrame(rows), ["k"], "ts_us", "v", tiebreak_cols=["ev"]
    ).collect()}
    assert set(out) == {"a", "c"}
    assert out["a"].twap == (2.0 * 100 + 4.0 * 200) / (1e6 * 300) * 1e6
    assert out["a"].span_us == 300 and out["a"].n_obs == 3
    assert out["c"].twap == 3.0  # ev 6's value spans the whole 10us


def test_sessionize_agrees_with_native_session_window(spark):
    """Cross-validation against Spark's built-in F.session_window: identical
    session partitions (per-session counts + start times) for off-boundary
    gaps, and at the exact-gap boundary: both keep an event at exactly
    prev + gap inside the session (our strict-`>` break matches the
    built-in's merge rule — verified, not assumed)."""
    from pyspark.sql import Row
    from iceberg_ingestion_spark.operators.sessionize import sessionize

    GAP = 100  # seconds
    rows = [
        Row(user_id=1, event_id=1, ts=1_000.0),
        Row(user_id=1, event_id=2, ts=1_050.0),    # same session
        Row(user_id=1, event_id=3, ts=1_250.0),    # 200s gap -> new session
        Row(user_id=2, event_id=4, ts=5_000.0),
        Row(user_id=2, event_id=5, ts=5_099.0),    # 99s -> same session
    ]
    ev = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    ours = (
        sessionize(ev, gap_seconds=GAP)
        .groupBy("user_id", "session_index")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("start"))
    )
    native = ev.groupBy(
        "user_id", F.session_window("ts", f"{GAP} seconds").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = sorted((r.user_id, r.n, r.start) for r in ours.collect())
    b = sorted((r.user_id, r.n, r.w.start) for r in native.collect())
    assert a == b
    # boundary: gap EXACTLY == GAP seconds
    edge = spark.createDataFrame(
        [Row(user_id=9, event_id=1, ts=0.0), Row(user_id=9, event_id=2, ts=100.0)]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ours_n = sessionize(edge, gap_seconds=GAP).select("session_index").distinct().count()
    native_n = edge.groupBy(
        F.session_window("ts", f"{GAP} seconds")
    ).count().count()
    assert ours_n == 1 and native_n == 1  # exactly-at-gap stays in session, both

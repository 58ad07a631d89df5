"""Salting operators (results identical to unsalted) and physical-plan
regression pins: predicate pushdown, column pruning and broadcast strategies
must survive future edits — these are the properties that matter at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators.skew import salted_join_hot_keys, salted_sum_count

SF = "/root/testdata/sf0.001"


def test_salted_sum_count_matches_plain_groupby(spark):
    # zipfian key 0 holds ~half the rows
    df = spark.range(0, 2000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    salted = salted_sum_count(
        df, ["k"], {"sum_v": F.sum("v"), "n": F.count(F.lit(1))}, n_salts=8
    )
    plain = df.groupBy("k").agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_matches_plain_join(spark):
    big = spark.range(0, 3000).select(
        F.when(F.col("id") % 3 != 0, 1).otherwise(F.col("id") % 11).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(i, f"dim_{i}") for i in range(11)], "k long, name string")
    salted = salted_join_hot_keys(big, small, "k", hot_keys=[1], n_salts=8)
    plain = big.join(small, "k")
    assert salted.count() == plain.count()
    assert sorted(map(tuple, salted.select("k", "payload", "name").collect())) == sorted(
        map(tuple, plain.select("k", "payload", "name").collect())
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_low_cardinality_top_n_matches_naive_window(spark):
    """Two-phase top-N over 3 groups == the naive single-window rank, on a
    skewed input (one group holds ~80% of rows) — every global winner
    survives its (group, salt) local cut, for n spanning the tie spectrum."""
    from pyspark.sql import Window

    from iceberg_ingestion_spark.operators.skew import low_cardinality_top_n

    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 5 != 0, "hot").otherwise(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b")
        ).alias("g"),
        (F.col("id") * 37 % 1000).alias("score"),  # heavy ties
        F.col("id"),
    )
    order = [F.col("score").desc(), F.col("id")]
    for n in (1, 3, 10):
        got = low_cardinality_top_n(df, ["g"], order, n=n, salt_on="id")
        w = Window.partitionBy("g").orderBy(*order)
        want = (
            df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= n)
        )
        assert sorted(map(tuple, got.select("g", "rank", "id").collect())) == sorted(
            map(tuple, want.select("g", "rank", "id").collect())
        )
    # deterministic across runs (salt is a content hash, not RNG)
    a = low_cardinality_top_n(df, ["g"], order, n=5, salt_on="id").collect()
    b = low_cardinality_top_n(df, ["g"], order, n=5, salt_on="id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_q1_pushes_filter_and_prunes_columns(spark):
    from iceberg_ingestion_spark.queries import q1_pricing_summary

    plan = _formatted(q1_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 needed columns — no full-row scan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read and read.count(":") <= 9


def test_q6_pushes_all_filters(spark):
    from iceberg_ingestion_spark.queries_analytics import q6_forecast_revenue

    plan = _formatted(q6_forecast_revenue(spark, SF))
    for pushed in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity,24.0)"):
        assert pushed in plan, pushed


def test_merge_legs_use_broadcast_joins(spark):
    from iceberg_ingestion_spark.queries import q_snapshot_merge_full

    plan = _formatted(q_snapshot_merge_full(spark, SF))
    assert "BroadcastHashJoin LeftAnti" in plan   # J1/J2 insert/delete legs
    assert "BroadcastHashJoin LeftSemi" in plan   # J3 update leg
    assert "CartesianProduct" not in plan


def test_fused_merge_single_join_no_single_partition_exchange(spark):
    """The fused snapshot merge must stay ONE join on the natural keys — no
    repartition(1)-style exchanges anywhere, and no extra target shuffles."""
    import re

    from iceberg_ingestion_spark.merge import merge_snapshot_fused
    from iceberg_ingestion_spark.queries import ORDERS_SPEC, read_table
    from iceberg_ingestion_spark import fixtures

    spark.catalog.clearCache()  # cached scans from other tests rewrite the plan
    orders = read_table(spark, SF, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    plan = _plan(merge_snapshot_fused(day1, day2, ORDERS_SPEC, keep_deletes=True))
    assert "SinglePartition" not in plan
    joins = re.findall(
        r"\b(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)\b",
        plan,
    )
    assert len(joins) == 1  # one full-outer join, nothing else


def test_job_merge_plan_broadcasts_small_changeset(spark, warehouse):
    """At the job layer: with a day-sized change-set against a big target, the
    anti join's change-set side must become a broadcast (AQE or static) — the
    target is rewritten in one pass with no wide shuffle of the target — and
    nothing in the merge may collapse to a single partition."""
    from iceberg_ingestion_spark.merge import merge_dataframes
    from iceberg_ingestion_spark.queries import ORDERS_SPEC, read_table

    target = read_table(spark, SF, "orders")
    # small change-set via a filter, NOT limit() (a global limit would inject
    # its own SinglePartition exchange and mask what this test pins)
    changes = target.filter(F.col("o_orderkey") % 500 == 0).withColumn("op", F.lit("U"))
    import re

    merged = merge_dataframes(target, changes, ORDERS_SPEC)
    plan = _plan(merged)
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_q3_broadcasts_dimension(spark):
    from iceberg_ingestion_spark.queries import q3_shipping_priority

    plan = _formatted(q3_shipping_priority(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed to scan


def test_zorder_value_interleaves_bits(spark):
    from iceberg_ingestion_spark.operators.layout import zorder_value

    # corners of a 2-bit grid: (min,min)->0, (max,max)->all bits set
    df = spark.createDataFrame([(0, 0), (3, 3), (3, 0), (0, 3)], "x int, y int")
    z = {(r.x, r.y): r.z for r in df.withColumn(
        "z", zorder_value(df, ["x", "y"], bits=2)).collect()}
    assert z[(0, 0)] == 0
    assert z[(3, 3)] == 0b1111
    assert z[(3, 0)] == 0b0101   # x contributes even bit positions
    assert z[(0, 3)] == 0b1010   # y contributes odd bit positions


def test_zorder_layout_clusters_space(spark):
    import itertools

    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.operators.layout import zorder_layout

    pts = spark.createDataFrame(
        [(x, y) for x, y in itertools.product(range(64), range(64))], "x int, y int"
    )
    laid = zorder_layout(pts, ["x", "y"], n_files=16)
    # each partition's bounding box must be far smaller than the full space:
    # z-range partitioning keeps files spatially compact (this is what makes
    # parquet min/max stats prune 2-D predicates)
    boxes = (
        laid.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    areas = [(r.dx + 1) * (r.dy + 1) for r in boxes]
    assert sum(areas) / len(areas) <= 64 * 64 / 4  # avg box <= quarter of space


# ---------------------------------------------------------------------------
# Data-skipping stats (layout.file_column_stats / prunable_files)
# ---------------------------------------------------------------------------

def test_file_stats_and_pruning_after_zorder_layout(spark, tmp_path):
    """End-to-end data-skipping story: write a key-clustered multi-file
    table, compute the per-file min/max index distributed, and verify a
    selective range predicate can skip all-but-one file — while the same
    index on a randomly-laid-out copy skips nothing. The stats must also
    agree with per-file recomputation."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.operators.layout import (
        file_column_stats,
        prunable_files,
    )

    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    clustered = str(tmp_path / "clustered")
    df.repartitionByRange(8, "k").write.parquet(clustered)
    shuffled = str(tmp_path / "shuffled")
    df.repartition(8).write.parquet(shuffled)

    stats_c = file_column_stats(spark, clustered, ["k"])
    rows = stats_c.collect()
    assert len(rows) == 8 and sum(r.n_rows for r in rows) == 4000
    # index correctness: ranges are disjoint and cover 0..3999
    spans = sorted((r.min_k, r.max_k) for r in rows)
    assert spans[0][0] == 0 and spans[-1][1] == 3999
    assert all(a1 < b0 for (_, a1), (b0, _) in zip(spans, spans[1:]))
    # a 100-wide predicate prunes ≥ 6 of 8 clustered files…
    assert prunable_files(stats_c, "k", 1000, 1099).count() >= 6
    # …and 0 of the randomly-laid-out ones (every file spans ~everything)
    stats_s = file_column_stats(spark, shuffled, ["k"])
    assert prunable_files(stats_s, "k", 1000, 1099).count() == 0


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The co-located join contract: two tables bucketed on the join key
    with the same bucket count sort-merge-join with NO Exchange on either
    side, while the same join over plain parquet shuffles both. This is the
    layout `save_bucketed` exists for — at 100 TB it removes the dominant
    recurring shuffle from fact-to-fact joins."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.operators.layout import save_bucketed

    a = spark.range(0, 2000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 2000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    save_bucketed(a, "bkt_a", ["k"], 8)
    save_bucketed(b, "bkt_b", ["k"], 8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # result still correct
        assert j.count() == 2000
        # control: the identical join over non-bucketed data DOES shuffle
        pa, pb = str(tmp_path / "pa"), str(tmp_path / "pb")
        a.write.parquet(pa)
        b.write.parquet(pb)
        jp = spark.read.parquet(pa).join(spark.read.parquet(pb), "k")
        assert "Exchange" in jp._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_new_entry_plans_have_no_nested_loops(spark):
    """Plan-shape regression pins for the round-4 entries: no cartesian /
    nested-loop joins anywhere, and the per-entry shuffle counts stay at
    their designed shape (gap-fill: bucket agg + span agg + window; cube:
    one expand+shuffle; window suite: one window shuffle)."""
    import __spark_entry__ as e

    qs = e.queries()
    sf = "/root/testdata/sf0.001"
    expectations = {
        "events_gap_fill": 4,
        "events_anomaly_daily": 3,
        "cube_flag_status": 2,
        "analytics_window_suite": 2,
        "sample_fixed_per_lang": 4,
        "skew_salted_join": 4,
        "text_bigram_corpus_freq": 6,
    }
    for name, max_exchanges in expectations.items():
        plan = qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        # AQE plan strings may repeat nodes across Initial/Final sections;
        # count on the final section only when present
        final = plan.split("+- == Initial Plan ==")[0]
        assert final.count("Exchange") <= max_exchanges, (
            f"{name}: {final.count('Exchange')} exchanges (cap {max_exchanges})"
        )

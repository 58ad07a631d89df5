"""Round-4 late additions: SCD2 build, mergeable HLL windows, JSON props
extraction, edit-distance near-dup verify — correctness invariants + the
plan shapes that matter at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.changes import scd2_from_history
from iceberg_ingestion_spark.operators import dedup
from iceberg_ingestion_spark.operators.sketches import hll_sliding_distinct

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _entry_plan(spark, name):
    import __spark_entry__ as entry_mod

    return _plan(entry_mod.queries()[name](spark, SF))


def _no_python_eval(plan):
    return not any(
        s in plan for s in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
    )


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def scd2(spark):
    hist = spark.createDataFrame(
        [
            ("a", 1, "v1"),
            ("a", 3, "v2"),
            ("a", 7, "v3"),
            ("b", 2, "only"),
        ],
        "k string, ts int, payload string",
    )
    return scd2_from_history(hist, ["k"], "ts").collect()


def test_scd2_ranges_tile_with_no_gaps_or_overlaps(scd2):
    by_key = {}
    for r in scd2:
        by_key.setdefault(r.k, []).append(r)
    for rows in by_key.values():
        rows.sort(key=lambda r: r.valid_from)
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.valid_to == nxt.valid_from  # half-open tiling
        assert rows[-1].valid_to is None


def test_scd2_exactly_one_current_version_per_key(scd2):
    current = [r for r in scd2 if r.is_current]
    assert sorted(r.k for r in current) == ["a", "b"]
    assert all(r.valid_to is None for r in current)
    assert [r.payload for r in current if r.k == "a"] == ["v3"]


def test_scd2_asof_probe_returns_the_version_valid_at_t(spark):
    hist = spark.createDataFrame(
        [("a", 1, "v1"), ("a", 3, "v2")], "k string, ts int, payload string"
    )
    dim = scd2_from_history(hist, ["k"], "ts")
    probe = dim.filter(
        (F.col("valid_from") <= 2)
        & (F.col("valid_to").isNull() | (F.lit(2) < F.col("valid_to")))
    ).collect()
    assert [r.payload for r in probe] == ["v1"]


def test_scd2_entry_plan_single_keyed_window(spark):
    """One window over the natural key: no SinglePartition exchange (a
    global-window SCD2 would serialize the corpus)."""
    plan = _entry_plan(spark, "ingest_scd2_history")
    assert "SinglePartition" not in plan
    assert _no_python_eval(plan)


# ---------------------------------------------------------------------------
# HLL sliding windows
# ---------------------------------------------------------------------------


def test_hll_sliding_matches_exact_within_bound(spark):
    rows = [(d, u) for d in range(10) for u in range(d * 37, d * 37 + 50)]
    df = spark.createDataFrame(rows, "bucket int, user_id int")
    got = {
        r.bucket: r.approx_distinct
        for r in hll_sliding_distinct(df, "bucket", "user_id", 3).collect()
    }
    assert set(got) == set(range(10))  # observed anchors only
    for b in range(10):
        lo = max(0, b - 2)
        exact = len({u for d in range(lo, b + 1) for u in range(d * 37, d * 37 + 50)})
        assert abs(got[b] - exact) / exact <= 3 * 1.04 / 2**6  # lgk=12

def test_hll_sliding_is_partition_order_invariant(spark):
    """Sketch union is commutative: the estimate must be identical under any
    partitioning of the input (the mergeability claim, executed)."""
    rows = [(d % 5, u) for d in range(40) for u in range(d * 11, d * 11 + 20)]
    df = spark.createDataFrame(rows, "bucket int, user_id int")
    a = sorted(
        (r.bucket, r.approx_distinct)
        for r in hll_sliding_distinct(df.repartition(17), "bucket", "user_id", 2).collect()
    )
    b = sorted(
        (r.bucket, r.approx_distinct)
        for r in hll_sliding_distinct(df.repartition(3), "bucket", "user_id", 2).collect()
    )
    assert a == b


def test_hll_windowed_entry_plan_shuffles_sketches_not_pairs(spark):
    """The approx side must aggregate hll_sketch_agg partially map-side
    (partial_hll_sketch_agg before the exchange) — the whole point of the
    mergeable-sketch rollup. The exact side exists only for the in-query
    bound check."""
    plan = _entry_plan(spark, "sketch_hll_windowed")
    assert "hll_sketch_agg" in plan and "hll_union_agg" in plan
    assert "partial_hll_sketch_agg" in plan
    assert _no_python_eval(plan)


# ---------------------------------------------------------------------------
# edit-distance near-dup verify
# ---------------------------------------------------------------------------


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "id_1 long, id_2 long, hamming int")


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_edit_distance_pairs_filters_by_relative_threshold(spark):
    docs = _docs_df(
        spark,
        [
            (1, "the quick brown fox jumps"),   # 25 chars
            (2, "the quick brown fox jumped"),  # 1 edit of 26 -> keep at 1/5
            (3, "a completely different text"),  # far -> drop
        ],
    )
    cand = _pairs_df(spark, [(1, 2, 0), (1, 3, 0)])
    got = dedup.edit_distance_pairs(
        cand, docs, "doc_id", F.col("text"), max_dist_num=1, max_dist_den=5
    ).collect()
    assert [(r.id_1, r.id_2, r.edit_dist) for r in got] == [(1, 2, 2)]


def test_edit_distance_exact_duplicates_have_distance_zero(spark):
    docs = _docs_df(spark, [(1, "same text"), (2, "same text")])
    cand = _pairs_df(spark, [(1, 2, 0)])
    got = dedup.edit_distance_pairs(cand, docs, "doc_id", F.col("text")).collect()
    assert got[0].edit_dist == 0


def test_edit_distance_keeps_candidate_columns(spark):
    docs = _docs_df(spark, [(1, "aaaaaaaaaa"), (2, "aaaaaaaaab")])
    cand = _pairs_df(spark, [(1, 2, 3)])
    got = dedup.edit_distance_pairs(cand, docs, "doc_id", F.col("text")).collect()
    assert got[0].hamming == 3  # pass-through of candidate metadata


def test_edit_distance_entry_plan_spreads_the_dp(spark):
    """The candidate set must be round-robin repartitioned BEFORE the text
    joins (RoundRobinPartitioning in the plan) so the O(len^2) verify never
    runs on an AQE-coalesced single partition; text lookups broadcast."""
    plan = _entry_plan(spark, "dedup_edit_distance")
    assert "RoundRobinPartitioning" in plan
    assert "BroadcastHashJoin" in plan
    assert "levenshtein" in plan
    # the simhash signature leaf is the one sanctioned Arrow kernel; the
    # verify itself must stay JVM (no row-at-a-time Python anywhere)
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") <= 1


# ---------------------------------------------------------------------------
# JSON props extraction
# ---------------------------------------------------------------------------


def test_json_props_absent_key_and_null_are_not_counted(spark):
    import __spark_entry__ as entry_mod
    df = spark.createDataFrame(
        [
            ("x", '{"k": 3}'),
            ("x", '{"other": 1}'),  # absent key -> NULL
            ("x", None),            # NULL props -> NULL
            ("y", '{"k": -2}'),
        ],
        "event_type string, props string",
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    got = {
        r.event_type: (r.n, r.nk, r.s)
        for r in df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.count("k").alias("nk"), F.sum("k").alias("s"))
        .collect()
    }
    assert got == {"x": (3, 1, 3), "y": (1, 1, -2)}


def test_json_props_entry_plan_is_jvm_only(spark):
    plan = _entry_plan(spark, "events_json_props")
    assert _no_python_eval(plan)
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# streaming HLL maintenance
# ---------------------------------------------------------------------------


def test_stream_hll_split_equals_batch(spark, tmp_path):
    """HLL union is a lattice (per-register max), so a stream split into two
    arbitrary drops yields the SAME estimates as one batch pass — and the
    maintained table answers windowed questions through the identical
    hll_window_union path the batch entry uses, with constant per-bucket
    state."""
    import os

    from iceberg_ingestion_spark.operators.sketches import (
        hll_bucket_sketches,
        hll_window_union,
    )
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink
    from iceberg_ingestion_spark.streaming.hll_stream import stream_hll_maintenance

    base = spark.range(0, 4000).select(
        (F.col("id") % 10).alias("bucket"), (F.col("id") % 533).alias("user_id")
    )
    d1 = base.where(F.col("id") % 3 != 0)
    d2 = base.where(F.col("id") % 3 == 0)
    in_dir, ckpt, wh = (str(tmp_path / d) for d in ("in", "ckpt", "wh"))
    os.makedirs(in_dir)
    sink = ParquetVersionedSink(spark, wh)
    d1.coalesce(1).write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    def run():
        q = stream_hll_maintenance(
            spark, in_dir, schema, sink, "db.hll", "bucket", "user_id",
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    run()
    d2.coalesce(1).write.mode("append").parquet(in_dir)
    run()

    maintained = sink.read("db.hll")
    # constant state: one sketch row per observed bucket
    assert maintained.count() == 10
    streamed = {
        (r.bucket, r.approx_distinct)
        for r in hll_window_union(maintained, "bucket", 3).collect()
    }
    batch = {
        (r.bucket, r.approx_distinct)
        for r in hll_window_union(
            hll_bucket_sketches(base, "bucket", "user_id"), "bucket", 3
        ).collect()
    }
    assert streamed == batch


def test_unpivot_entry_plan_prunes_scan_and_stays_jvm(spark):
    """Unpivot (melt) is a narrow map-side transform: column pruning must
    still reach the scan (only returnflag + the 4 measures read), no
    SinglePartition exchange, no Python eval."""
    import re

    plan = _entry_plan(spark, "analytics_unpivot_measures")
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans and all(len(s.split(",")) <= 5 for s in scans), scans
    assert "SinglePartition" not in plan
    assert _no_python_eval(plan)

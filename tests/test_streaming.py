"""Structured Streaming CDC: file-source stream + foreachBatch merge must
produce exactly the same table as sequential batch cdc_merge runs."""

from __future__ import annotations

import os

import pytest

from iceberg_ingestion_spark.model import ChangeSpec, TablePolicy
from iceberg_ingestion_spark.sinks import ParquetVersionedSink
from iceberg_ingestion_spark.streaming.cdc_stream import stream_cdc_merge

SPEC = ChangeSpec(("id",), ("mod_ts",))
SCHEMA_DDL = "id long, mod_ts long, payload string, op string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA_DDL).coalesce(1).write.mode("append").parquet(path)


@pytest.mark.usefixtures("spark")
def test_stream_cdc_merge_two_batches(spark, tmp_path):
    input_dir = str(tmp_path / "cdc_in")
    ckpt = str(tmp_path / "ckpt")
    wh = str(tmp_path / "wh")
    os.makedirs(input_dir)
    sink = ParquetVersionedSink(spark, wh)
    schema = spark.createDataFrame([], SCHEMA_DDL).schema

    # batch 1: initial inserts (one key updated twice inside the batch)
    _write_batch(
        spark, input_dir,
        [(1, 10, "a0", "I"), (2, 10, "b0", "I"), (2, 11, "b1", "U")],
    )
    q = stream_cdc_merge(spark, input_dir, schema, sink, "db.t", SPEC,
                         TablePolicy(), checkpoint_dir=ckpt)
    q.awaitTermination(120)

    got = {r.id: r.payload for r in sink.read("db.t").collect()}
    assert got == {1: "a0", 2: "b1"}  # dedup kept the newest row for key 2

    # batch 2: update key 1, delete key 2, insert key 3
    _write_batch(
        spark, input_dir,
        [(1, 20, "a1", "U"), (2, 20, "b2", "D"), (3, 20, "c0", "I")],
    )
    q = stream_cdc_merge(spark, input_dir, schema, sink, "db.t", SPEC,
                         TablePolicy(), checkpoint_dir=ckpt)
    q.awaitTermination(120)

    got = {r.id: r.payload for r in sink.read("db.t").collect()}
    assert got == {1: "a1", 3: "c0"}
    # checkpoint prevents reprocessing: batch 1 files were not re-applied
    assert sink.current_version("db.t") == 2


def test_stream_cdc_first_batch_create_keeps_soft_delete_flag(spark, tmp_path):
    """keep_deletes: the FIRST batch creates the table — it must carry the
    hard_deleted column (later merges UPDATE SET */INSERT * against it), and
    a D row in that first batch must land flagged, not as a live row."""
    input_dir = str(tmp_path / "cdc_in")
    ckpt = str(tmp_path / "ckpt")
    wh = str(tmp_path / "wh")
    os.makedirs(input_dir)
    sink = ParquetVersionedSink(spark, wh)
    schema = spark.createDataFrame([], SCHEMA_DDL).schema

    _write_batch(
        spark, input_dir,
        [(1, 10, "a0", "I"), (2, 10, "b0", "D")],
    )
    q = stream_cdc_merge(spark, input_dir, schema, sink, "db.t", SPEC,
                         TablePolicy(), checkpoint_dir=ckpt, keep_deletes=True)
    q.awaitTermination(120)
    got = {r.id: (r.payload, r.hard_deleted) for r in sink.read("db.t").collect()}
    assert got == {1: ("a0", False), 2: ("b0", True)}

    # second batch merges against the created schema without drift
    _write_batch(spark, input_dir, [(1, 20, "a1", "D"), (3, 20, "c0", "I")])
    q = stream_cdc_merge(spark, input_dir, schema, sink, "db.t", SPEC,
                         TablePolicy(), checkpoint_dir=ckpt, keep_deletes=True)
    q.awaitTermination(120)
    got = {r.id: (r.payload, r.hard_deleted) for r in sink.read("db.t").collect()}
    assert got == {1: ("a1", True), 2: ("b0", True), 3: ("c0", False)}


def test_stream_rollup_maintenance_split_changelog(spark, tmp_path):
    """Streaming IVM: a changelog split across drops — deliberately
    separating one key's UPDATE_BEFORE from its UPDATE_AFTER — folds to the
    same rollup as the from-scratch recompute of the final state."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.changes import CHANGE_TYPE_COL, build_changelog
    from iceberg_ingestion_spark.streaming.rollup_stream import stream_rollup_maintenance

    v1 = spark.createDataFrame(
        [(10, 1, 5.00), (11, 1, 7.00), (20, 2, 3.00), (30, 3, 9.00)],
        "order_id long, cust long, price double",
    )
    v2 = spark.createDataFrame(
        [(10, 1, 5.00), (11, 1, 7.25), (20, 2, 4.50), (40, 4, 1.25)],
        "order_id long, cust long, price double",
    )
    in_dir, ckpt, wh = (str(tmp_path / d) for d in ("chg_in", "ckpt", "wh"))
    os.makedirs(in_dir)
    sink = ParquetVersionedSink(spark, wh)
    # drop 1: bootstrap changelog (empty -> v1 = all INSERTs) plus the
    # UPDATE_BEFORE halves of the v1 -> v2 changelog
    ch12 = build_changelog(v1, v2, ["order_id"]).cache()
    bootstrap = v1.withColumn(CHANGE_TYPE_COL, F.lit("INSERT"))
    bootstrap.unionByName(
        ch12.filter(F.col(CHANGE_TYPE_COL) == "UPDATE_BEFORE")
    ).coalesce(1).write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    money = F.col("price").cast("decimal(18,2)")

    def run():
        q = stream_rollup_maintenance(
            spark, in_dir, schema, sink, "db.rollup", ["cust"],
            {"total": money}, checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    run()
    # drop 2: everything else (UPDATE_AFTER halves, inserts, deletes)
    ch12.filter(F.col(CHANGE_TYPE_COL) != "UPDATE_BEFORE").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run()

    got = {
        r.cust: (float(r.total), r.n_rows)
        for r in sink.read("db.rollup").collect()
    }
    want = {
        r.cust: (float(r.total), r.n_rows)
        for r in v2.groupBy("cust")
        .agg(F.sum(money).alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == want
    assert 3 not in got and got[4] == (1.25, 1)
    # two micro-batch commits -> two rollup versions (snapshot-versioned)
    assert sink.current_version("db.rollup") == 2


def test_stream_joined_rollup_maintenance_split_changelog(spark, tmp_path):
    """Streaming join-IVM (static dimension): the fact changelog split
    across drops — again separating an UPDATE pair — maintained against a
    broadcast dimension folds to the from-scratch γ(fact_v2 ⋈ dim)."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.changes import CHANGE_TYPE_COL, build_changelog
    from iceberg_ingestion_spark.streaming.rollup_stream import (
        stream_joined_rollup_maintenance,
    )

    dim = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C")], "cust long, seg string"
    )
    v1 = spark.createDataFrame(
        [(10, 1, 5.00), (11, 2, 7.00), (30, 3, 9.00)],
        "order_id long, cust long, price double",
    )
    v2 = spark.createDataFrame(
        # reprice in seg A, seg B vanishes, seg C appears
        [(10, 1, 6.00), (11, 2, 7.00), (40, 4, 1.25)],
        "order_id long, cust long, price double",
    )
    in_dir, ckpt, wh = (str(tmp_path / d) for d in ("chg_in", "ckpt", "wh"))
    os.makedirs(in_dir)
    sink = ParquetVersionedSink(spark, wh)
    ch12 = build_changelog(v1, v2, ["order_id"]).cache()
    bootstrap = v1.withColumn(CHANGE_TYPE_COL, F.lit("INSERT"))
    bootstrap.unionByName(
        ch12.filter(F.col(CHANGE_TYPE_COL) == "UPDATE_BEFORE")
    ).coalesce(1).write.mode("append").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema
    money = F.col("price").cast("decimal(18,2)")

    def run():
        q = stream_joined_rollup_maintenance(
            spark, in_dir, schema, dim, ["cust"], sink, "db.seg_rollup",
            ["seg"], {"total": money}, checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    run()
    ch12.filter(F.col(CHANGE_TYPE_COL) != "UPDATE_BEFORE").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    run()

    got = {
        r.seg: (float(r.total), r.n_rows)
        for r in sink.read("db.seg_rollup").collect()
    }
    want = {
        r.seg: (float(r.total), r.n_rows)
        for r in v2.join(dim, "cust")
        .groupBy("seg")
        .agg(F.sum(money).alias("total"), F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert got == want
    assert "B" not in got and got["C"] == (1.25, 1)

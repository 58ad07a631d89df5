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

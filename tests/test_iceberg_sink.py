"""Iceberg SQL path: golden-string shape vs the reference + call-sequence.

No iceberg-spark-runtime jar exists in this environment, so the statements
cannot be executed against a real catalog; what CAN be pinned — and is, here —
is that the SQL the sink emits matches the reference's statement shapes
(CTAS ``iceberg.py:104-149``, MERGE ``iceberg.py:233-244``, maintenance CALLs
``iceberg.py:253-270``) and that ``IcebergSink`` drives ``spark.sql`` in the
right order with the right view registrations.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.merge import merge_into_sql
from iceberg_ingestion_spark.model import ChangeSpec, OptimizeMode, TablePolicy
from iceberg_ingestion_spark.sinks import IcebergSink

SPEC = ChangeSpec(natural_keys=("k1", "k2"), updated_at_fields=("updated_at",))


def norm(sql: str) -> str:
    return re.sub(r"\s+", " ", sql).strip()


class RecordingSpark:
    """Stands in for the SparkSession inside IcebergSink: records every
    ``sql()`` statement instead of executing it (no Iceberg catalog here)."""

    def __init__(self):
        self.calls: list[str] = []

    def sql(self, q: str):
        self.calls.append(norm(q))
        return None


@pytest.fixture()
def recording_sink():
    rec = RecordingSpark()
    return IcebergSink(rec, catalog="iceberg"), rec


# -- MERGE INTO golden strings (reference iceberg.py:233-244) -----------------

def test_merge_sql_hard_delete_shape():
    sql = norm(merge_into_sql("iceberg.db.t", "changes", SPEC))
    assert "MERGE INTO iceberg.db.t AS target USING changes AS source" in sql
    assert "ON target.k1 = source.k1 AND target.k2 = source.k2" in sql
    # reference iceberg.py:241-242: op-dispatched matched actions
    assert "WHEN MATCHED AND source.op = 'D' THEN DELETE" in sql
    assert "WHEN MATCHED AND source.op = 'U' THEN UPDATE SET *" in sql
    # DELIBERATE divergence from reference iceberg.py:243 (unconditional
    # INSERT *): an absent-key delete is a no-op, not an insert — matches
    # merge_dataframes (merge.py:65). Pin it so a faithfulness review doesn't
    # "fix" it back.
    assert "WHEN NOT MATCHED AND source.op != 'D' THEN INSERT *" in sql


def test_merge_sql_soft_delete_shape():
    sql = norm(merge_into_sql("iceberg.db.t", "changes", SPEC, keep_deletes=True))
    # reference iceberg.py:224-231: delete action becomes UPDATE SET * and the
    # change rows carry the hard_deleted rewrite
    assert "WHEN MATCHED AND source.op = 'D' THEN UPDATE SET *" in sql
    assert "THEN DELETE" not in sql
    # unconditional insert is CORRECT here: absent-key deletes materialize as
    # hard_deleted=true tombstones, like merge_dataframes' union of the full
    # flagged change-set
    assert "WHEN NOT MATCHED THEN INSERT *" in sql
    assert "!= 'D'" not in sql


# -- CTAS golden strings (reference iceberg.py:104-149) -----------------------

def test_replace_emits_create_or_replace_ctas(spark, recording_sink):
    sink, rec = recording_sink
    df = spark.range(3).withColumnRenamed("id", "k1")
    sink.replace("db.t", df, TablePolicy())
    [sql] = rec.calls
    assert sql.startswith("CREATE OR REPLACE TABLE iceberg.db.t USING iceberg")
    assert sql.endswith("AS SELECT * FROM __ingest_source")
    # reference iceberg.py:53-80 property set
    assert "'format-version'='2'" in sql
    assert "'write.parquet.compression-codec'='snappy'" in sql
    assert "'write.merge.mode'='copy-on-write'" in sql
    assert "'history.expire.min-snapshots-to-keep'='90'" in sql
    # 64 MiB exactly — the reference's 64*1025*1024 typo (iceberg.py:59) fixed
    assert "'write.target-file-size-bytes'='67108864'" in sql


def test_create_is_idempotent_ctas_with_partitioning(spark, recording_sink):
    sink, rec = recording_sink
    df = spark.range(3).withColumnRenamed("id", "k1").withColumn("dt", F.lit("2026-08-13"))
    policy = TablePolicy(optimize=OptimizeMode.STORAGE, partition_by=("dt",))
    sink.create("db.t", df, policy)
    [sql] = rec.calls
    assert sql.startswith("CREATE TABLE IF NOT EXISTS iceberg.db.t USING iceberg")
    assert "PARTITIONED BY (dt)" in sql
    # storage mode: gzip + merge-on-read (reference iceberg.py:74-78)
    assert "'write.parquet.compression-codec'='gzip'" in sql
    assert "'write.delete.mode'='merge-on-read'" in sql


# -- call sequence ------------------------------------------------------------

def test_merge_registers_view_then_runs_merge(spark, recording_sink):
    sink, rec = recording_sink
    changes = spark.createDataFrame(
        [(1, 10, "2026-01-02", "U")], "k1 long, k2 long, updated_at string, op string"
    )
    sink.merge("db.t", changes, SPEC, TablePolicy())
    [sql] = rec.calls
    assert sql.startswith("MERGE INTO iceberg.db.t AS target USING __ingest_changes")
    # the view really was registered on the session the DataFrame belongs to
    assert spark.table("__ingest_changes").count() == 1


def test_merge_soft_delete_flags_view_rows(spark, recording_sink):
    """keep_deletes: the registered view must already carry the hard_deleted
    rewrite (reference iceberg.py:224-227), so UPDATE SET * / INSERT * write
    tombstones — the DataFrame path and the SQL path agree on every case,
    including a delete whose key is absent from the target."""
    sink, rec = recording_sink
    changes = spark.createDataFrame(
        [(1, 10, "2026-01-02", "D"), (2, 20, "2026-01-02", "U")],
        "k1 long, k2 long, updated_at string, op string",
    )
    sink.merge("db.t", changes, SPEC, TablePolicy(), keep_deletes=True)
    flags = {r.k1: r.hard_deleted for r in spark.table("__ingest_changes").collect()}
    assert flags == {1: True, 2: False}
    [sql] = rec.calls
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_every_emitted_statement_parses_in_spark_dialect(spark, recording_sink):
    """Syntax pin for the WHOLE IcebergSink statement surface (r4, extending
    the MERGE execution pin of test_merge_sql_semantics.py): every statement
    the sink emits across a full lifecycle — partitioned + bucketed CTAS,
    CREATE OR REPLACE, both MERGE modes, the three maintenance CALLs, the
    metadata relations — must parse through Spark's own sqlParser (Spark 4
    parses CALL and bucket() partition transforms natively). A typo or
    grammar drift in any emitted string fails here without needing an
    Iceberg catalog."""
    sink, rec = recording_sink
    df = spark.range(3).withColumnRenamed("id", "k1").withColumn("dt", F.lit("d"))
    policy = TablePolicy(partition_by=("dt",), bucket_by=("k1",), n_buckets=4)
    sink.create("db.t", df, policy)
    sink.replace("db.t", df, TablePolicy())
    changes = spark.createDataFrame(
        [(1, 10, "2026-01-02", "U")], "k1 long, k2 long, updated_at string, op string"
    )
    sink.merge("db.t", changes, SPEC, TablePolicy())
    sink.merge("db.t", changes, SPEC, TablePolicy(), keep_deletes=True)
    sink.expire_snapshots("db.t", TablePolicy())
    sink.remove_orphan_files("db.t")
    sink.rewrite_data_files("db.t", TablePolicy())
    rec.calls.append(norm("SELECT file_path FROM iceberg.db.t.files"))
    rec.calls.append(
        norm(
            "SELECT file FROM iceberg.db.t.metadata_log_entries "
            "ORDER BY timestamp DESC LIMIT 1"
        )
    )
    assert len(rec.calls) == 9
    parser = spark._jsparkSession.sessionState().sqlParser()
    for stmt in rec.calls:
        parser.parsePlan(stmt)  # raises ParseException on any syntax drift
    # and the bucket transform reached the partition spec
    ctas = rec.calls[0]
    assert "PARTITIONED BY (dt, bucket(4, k1))" in ctas


def test_maintenance_emits_call_procedures(recording_sink):
    sink, rec = recording_sink
    sink.expire_snapshots("db.t", TablePolicy())
    sink.remove_orphan_files("db.t")
    sink.rewrite_data_files("db.t", TablePolicy())
    assert rec.calls == [
        # reference iceberg.py:253-270 maintenance procedures
        "CALL iceberg.system.expire_snapshots(table => 'db.t')",
        "CALL iceberg.system.remove_orphan_files(table => 'db.t')",
        "CALL iceberg.system.rewrite_data_files(table => 'db.t')",
    ]

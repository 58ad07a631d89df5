"""Versioned-parquet sink lifecycle: atomic commits, time travel, expiry,
orphan removal, compaction, metadata relations (SURVEY §2.1 S2-S8, §2.11)."""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta, timezone

import pytest

from iceberg_ingestion_spark.model import TablePolicy
from iceberg_ingestion_spark.sinks import ParquetVersionedSink

POLICY = TablePolicy()
NAME = "dev_clean_t.tbl"


@pytest.fixture()
def sink(spark, warehouse):
    return ParquetVersionedSink(spark, warehouse)


@pytest.fixture()
def df(spark):
    return spark.range(100).withColumnRenamed("id", "k")


def test_create_is_idempotent(sink, df):
    sink.create(NAME, df, POLICY)
    sink.create(NAME, df.limit(1), POLICY)  # no-op: IF NOT EXISTS
    assert sink.read(NAME).count() == 100
    assert sink.current_version(NAME) == 1


def test_commit_recovers_from_crashed_commit(sink, df):
    """A crash between the parquet write and the log swap leaves an orphan
    v_N+1 dir; the next commit must clear it and proceed, not wedge on
    mode('errorifexists')."""
    sink.create(NAME, df, POLICY)
    orphan = sink._version_dir(NAME, 2)  # what a crashed commit leaves behind
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-junk.parquet"), "w") as f:
        f.write("partial write")
    sink.replace(NAME, df, POLICY)
    assert sink.current_version(NAME) == 2
    assert sink.read(NAME).count() == 100


def test_commit_detects_lost_race_to_concurrent_committer(sink, df):
    """If the version dir exists AND the log already records that version, a
    concurrent committer won — the commit must raise, not delete the winner's
    committed data (single-committer protocol, violation detected loudly)."""
    import pytest

    sink.create(NAME, df, POLICY)
    sink.replace(NAME, df.limit(5), POLICY)  # v2 committed (the "winner")
    # simulate this writer having read the log BEFORE the winner's commit:
    # rewind the log pointer so _commit recomputes version 2
    log = sink._read_log(NAME)
    log["current"] = 1
    sink._write_log(NAME, log)

    class _RacingSink(type(sink)):
        def _read_log(self, name):
            # first read (version calc) sees the rewound log; restore the
            # winner's log before the rename-conflict check re-reads it
            out = super()._read_log(name)
            out2 = dict(out)
            if out["current"] == 1:
                restored = dict(out, current=2)
                super()._write_log(name, restored)
            return out2

    racing = _RacingSink(sink.spark, sink.warehouse)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        racing.replace(NAME, df.limit(3), POLICY)
    # the winner's v2 data is intact
    assert sink.read_version(NAME, 2).count() == 5


def test_replace_creates_new_version(sink, df):
    sink.create(NAME, df, POLICY)
    sink.replace(NAME, df.limit(7), POLICY)
    assert sink.read(NAME).count() == 7
    assert sink.current_version(NAME) == 2
    # time travel to v1
    assert sink.read_version(NAME, 1).count() == 100


def test_exists(sink, df):
    assert not sink.exists(NAME)
    sink.create(NAME, df, POLICY)
    assert sink.exists(NAME)


def test_list_files_and_metadata_location(sink, df):
    sink.create(NAME, df, POLICY)
    files = sink.list_files(NAME)
    assert files.columns == ["file_path"]
    paths = [r.file_path for r in files.collect()]
    assert paths and all(p.endswith(".parquet") for p in paths)
    manifest = sink.metadata_location(NAME)
    assert manifest.columns == ["manifest"]
    assert manifest.count() == 1


def test_expire_snapshots_respects_retention_and_min_keep(sink, df):
    policy = TablePolicy(retention_days=0, min_snapshots_to_keep=2)
    sink.create(NAME, df, policy)
    sink.replace(NAME, df.limit(50), policy)
    sink.replace(NAME, df.limit(10), policy)
    future = datetime.now(timezone.utc) + timedelta(days=1)
    expired = sink.expire_snapshots(NAME, policy, now=future)
    assert expired == 1  # v1 dropped, v2+v3 kept (min 2)
    assert sink.read(NAME).count() == 10
    assert not os.path.exists(sink._version_dir(NAME, 1))


def test_remove_orphan_files(sink, df):
    sink.create(NAME, df, POLICY)
    orphan = os.path.join(sink._table_dir(NAME), "v_99999")
    os.makedirs(orphan)
    assert sink.remove_orphan_files(NAME) == 1
    assert not os.path.exists(orphan)
    assert sink.read(NAME).count() == 100


def test_rewrite_data_files_compacts(sink, df, spark):
    sink.create(NAME, df.repartition(8), POLICY)
    assert sink.list_files(NAME).count() >= 8
    sink.rewrite_data_files(NAME, POLICY)
    assert sink.list_files(NAME).count() == 1  # 100 rows << 64 MiB target
    assert sink.read(NAME).count() == 100


def test_snapshot_log_is_json_with_properties(sink, df):
    sink.create(NAME, df, POLICY)
    with open(sink._log_path(NAME)) as f:
        log = json.load(f)
    assert log["current"] == 1
    assert log["properties"]["write.target-file-size-bytes"] == str(64 * 1024 * 1024)
    assert log["snapshots"][0]["operation"] == "create"


def test_export_metadata_writes_json(spark, sink, df, tmp_path):
    from iceberg_ingestion_spark.jobs import IngestionJob
    from iceberg_ingestion_spark.model import ChangeSpec

    sink.create(NAME, df, POLICY)
    job = IngestionJob(sink, ChangeSpec(("id",), ("ts",)))
    out = str(tmp_path / "export")
    job.export_metadata(NAME, out)
    files = spark.read.json(f"{out}/files")
    assert files.count() >= 1 and "file_path" in files.columns
    manifest = spark.read.json(f"{out}/manifest")
    assert manifest.count() == 1


def test_bucket_partition_ordering_clusters_rows(spark):
    from iceberg_ingestion_spark.sinks import bucket_partition_ordering

    df = spark.range(1000).withColumnRenamed("id", "k")
    out = bucket_partition_ordering(df, ["k"], n_buckets=8)
    assert out.rdd.getNumPartitions() == 8
    # within every partition, rows are clustered: bucket values non-decreasing
    from pyspark.sql import functions as F

    buckets = out.withColumn("b", F.pmod(F.hash("k"), F.lit(8)))

    def _is_sorted(it):
        vals = [r.b for r in it]
        yield vals == sorted(vals)

    assert all(buckets.select("b").rdd.mapPartitions(_is_sorted).collect())


def test_partitioned_bucketed_ingest_end_to_end(spark, warehouse):
    """D1 wired through IngestionJob.run (VERDICT r3 #7): a partitioned +
    bucketed policy must produce, across BOTH the first load and a subsequent
    snapshot merge, a file layout where (a) directories are partitioned by the
    partition column and (b) every data file contains exactly one
    pmod(hash(bucket_by), n_buckets) bucket."""
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.jobs import IngestionJob
    from iceberg_ingestion_spark.model import ChangeSpec, IngestionType

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    policy = TablePolicy(partition_by=("o_orderstatus",), bucket_by=("o_orderkey",), n_buckets=4)
    job = IngestionJob(
        ParquetVersionedSink(spark, warehouse),
        ChangeSpec(("o_orderkey",), ("o_orderdate",)),
        policy=policy,
    )
    ts = datetime(2026, 8, 13, 2, 0, 0)
    name = "dev_clean_tpch.orders_part"
    job.run(orders, name, IngestionType.FULL, ts)              # first load
    day2 = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice")),
    ).withColumn(
        "o_orderdate",
        F.when(F.col("o_orderkey") % 7 == 0, F.date_add("o_orderdate", 1))
        .otherwise(F.col("o_orderdate")),
    )
    job.run(day2, name, IngestionType.FULL, ts)                # merge commit

    sink = job.sink
    assert sink.current_version(name) == 2
    vdir = sink._version_dir(name, 2)
    # (a) hive-style partition dirs by o_orderstatus
    parts = sorted(d for d in os.listdir(vdir) if d.startswith("o_orderstatus="))
    assert parts, os.listdir(vdir)
    # (b) per-file bucket purity, checked through the actual file layout
    per_file = (
        spark.read.parquet(vdir)
        .select(
            F.input_file_name().alias("file"),
            F.pmod(F.hash("o_orderkey"), F.lit(policy.n_buckets)).alias("b"),
        )
        .groupBy("file")
        .agg(F.countDistinct("b").alias("nb"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_file and all(r.nb == 1 for r in per_file), per_file
    # every (partition, bucket) combination still reads back complete
    assert spark.read.parquet(vdir).count() == orders.count()
    # merged values survived the clustered rewrite
    merged = sink.read(name)
    touched = merged.filter(F.col("o_orderkey") % 7 == 0).count()
    assert touched == orders.filter(F.col("o_orderkey") % 7 == 0).count()


def test_read_changes_between_versions(sink, spark):
    from pyspark.sql import Row

    from iceberg_ingestion_spark.changes import (
        CT_DELETE,
        CT_INSERT,
        CT_UPDATE_AFTER,
        CT_UPDATE_BEFORE,
    )

    v1 = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    v2 = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")]
    )
    sink.create(NAME, v1, POLICY)
    sink.replace(NAME, v2, POLICY)

    rows = sink.read_changes(NAME, 1, 2, keys=["k"]).collect()
    got = sorted((r["k"], r["v"], r["_change_type"]) for r in rows)
    assert got == [
        (2, "B", CT_UPDATE_AFTER),
        (2, "b", CT_UPDATE_BEFORE),
        (3, "c", CT_DELETE),
        (4, "d", CT_INSERT),
    ]  # k=1 unchanged: never surfaces


def test_read_changes_net_semantics_skips_transient_rows(sink, spark):
    from pyspark.sql import Row

    v1 = spark.createDataFrame([Row(k=1, v="a")])
    v2 = spark.createDataFrame([Row(k=1, v="a"), Row(k=9, v="transient")])
    v3 = spark.createDataFrame([Row(k=1, v="a")])
    sink.create(NAME, v1, POLICY)
    sink.replace(NAME, v2, POLICY)
    sink.replace(NAME, v3, POLICY)

    assert sink.read_changes(NAME, 1, 3, keys=["k"]).count() == 0


def test_read_changes_consistent_with_snapshot_diff(sink, spark):
    """Changelog-vs-snapshots invariant over a 3-version lineage: applying
    read_changes(1, 3) to v1 reproduces v3 exactly (inserts+update-afters
    added, deletes+update-befores removed) — the consumer contract an
    incremental pipeline relies on."""
    from pyspark.sql import Row, functions as F

    from iceberg_ingestion_spark.changes import (
        CHANGE_TYPE_COL,
        CT_DELETE,
        CT_INSERT,
        CT_UPDATE_AFTER,
    )

    v1 = spark.createDataFrame([Row(k=i, v=f"a{i}") for i in range(20)])
    v2 = spark.createDataFrame(
        [Row(k=i, v=("B" if i % 3 == 0 else f"a{i}")) for i in range(2, 22)]
    )
    v3 = spark.createDataFrame(
        [Row(k=i, v=("C" if i % 5 == 0 else ("B" if i % 3 == 0 else f"a{i}")))
         for i in range(4, 24)]
    )
    sink.create(NAME, v1, POLICY)
    sink.replace(NAME, v2, POLICY)
    sink.replace(NAME, v3, POLICY)

    ch = sink.read_changes(NAME, 1, 3, keys=["k"])
    apply_side = ch.filter(
        F.col(CHANGE_TYPE_COL).isin([CT_INSERT, CT_UPDATE_AFTER])
    ).select("k", "v")
    removed_keys = {
        r["k"]
        for r in ch.filter(~F.col(CHANGE_TYPE_COL).isin([CT_INSERT, CT_UPDATE_AFTER]))
        .select("k").collect()
    }
    kept = sink.read_version(NAME, 1).filter(~F.col("k").isin(list(removed_keys)))
    rebuilt = sorted((r["k"], r["v"]) for r in kept.unionByName(apply_side).collect())
    expected = sorted((r["k"], r["v"]) for r in sink.read_version(NAME, 3).collect())
    assert rebuilt == expected


def test_schema_evolution_contract(spark, warehouse):
    """Schema-change semantics, as designed: REPLACE mode adopts a new
    column (CTAS-refresh — each replace is a fresh definition). The
    DataFrame merge TOLERATES a source missing target columns by
    NULL-filling (the documented partial-change-set behavior, mirroring
    the reference's source-shaped legs): touched rows get NULL for the
    missing column, untouched rows keep their values. The LOUD failure
    for real drift lives at the validation gate — diff_count raises
    ValueError when column sets differ (SURVEY §7.4)."""
    import pytest
    from pyspark.sql import functions as F

    from iceberg_ingestion_spark.changes import build_changeset
    from iceberg_ingestion_spark.merge import merge_dataframes
    from iceberg_ingestion_spark.model import ChangeSpec, TablePolicy
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink
    from iceberg_ingestion_spark.validate import diff_count

    sink = ParquetVersionedSink(spark, warehouse)
    v1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "id long, ver long, payload string"
    )
    sink.create("db.t", v1, TablePolicy())

    # replace with an extra column: version advances, schema evolves
    v2 = v1.withColumn("extra", F.lit(7))
    sink.replace("db.t", v2, TablePolicy())
    assert "extra" in sink.read("db.t").columns
    assert sink.current_version("db.t") == 2

    # drifted source (no payload/extra): merge NULL-fills touched rows only
    spec = ChangeSpec(natural_keys=("id",), updated_at_fields=("ver",))
    drifted = spark.createDataFrame([(2, 11), (3, 11)], "id long, ver long")
    target = sink.read("db.t")
    merged = merge_dataframes(
        target, build_changeset(drifted, target, spec, include_deletes=False), spec
    )
    got = {r.id: (r.payload, r.extra) for r in merged.collect()}
    assert got[1] == ("a", 7)          # untouched row keeps its columns
    assert got[2] == (None, None)      # updated row NULL-fills the drifted cols
    assert got[3] == (None, None)      # inserted row never had them

    # the loud gate: column-set drift raises at validation, not silently 0
    with pytest.raises(ValueError, match="column sets differ"):
        diff_count(drifted, target)

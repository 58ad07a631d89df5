"""Pluggable table sinks.

The reference hard-wires Iceberg-on-Glue (reference
``src/data_ingestion/common/iceberg.py:82-149,233-289``). Here the same table
lifecycle is a protocol with two implementations:

- :class:`ParquetVersionedSink` — a self-contained snapshot-versioned parquet
  layout (``<warehouse>/<db>/<table>/v_NNNNN/`` + an atomically-swapped
  ``_snapshots.json`` log). It reproduces, for real, the Iceberg behaviors the
  engine relies on: atomic snapshot commits, time-travel-able version history,
  snapshot expiry (reference ``iceberg.py:253-259``), orphan-file removal
  (``iceberg.py:260-262``), compaction (``iceberg.py:264-270``), the ``.files``
  metadata relation (``iceberg.py:272-278``) and the metadata-location probe
  (``iceberg.py:280-289``).
- :class:`IcebergSink` — drives a real Iceberg catalog through Spark SQL
  (CTAS / ``MERGE INTO`` / ``CALL`` procedures) when the iceberg-spark-runtime
  jar is on the classpath. Untestable in this environment (no jar installed);
  the SQL it emits mirrors the reference statement-for-statement.

Merge application goes through :func:`iceberg_ingestion_spark.merge.
merge_dataframes` on the parquet sink and ``MERGE INTO`` on the Iceberg sink —
same logical semantics, pinned by shared tests at the job layer.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from datetime import datetime, timedelta, timezone
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_ingestion_spark.changes import build_changelog
from iceberg_ingestion_spark.merge import merge_dataframes, merge_into_sql
from iceberg_ingestion_spark.model import ChangeSpec, TablePolicy

SNAPSHOT_LOG = "_snapshots.json"


def bucket_partition_ordering(
    df: DataFrame, cols: list[str], n_buckets: int = 8
) -> DataFrame:
    """D1: bucket-partitioned write ordering (reference declares the hook at
    ``iceberg.py:332-338`` and implements it — commented out — via a JVM
    ``iceberg_bucket_bigint`` UDF, ``dmsdatabase1.py:79-93``). The bucket id is
    ``pmod(hash(cols), n)`` — no py4j UDF registration needed — realized by
    hash-repartitioning DIRECTLY on the key columns with ``n_buckets``
    partitions: Spark's HashPartitioning assigns partition =
    ``pmod(murmur3(cols), n)``, i.e. the partition id IS the bucket id, so
    every task (and therefore every output file, per dir-partition) holds
    exactly one bucket. Repartitioning on a precomputed bucket COLUMN would
    re-hash it and collide several buckets into one task — per-file purity
    would silently fail (caught by the end-to-end layout test). Rows are
    additionally sorted by the key within each bucket for tight parquet
    min/max stats."""
    key = [F.col(c) for c in cols]
    return df.repartition(n_buckets, *key).sortWithinPartitions(*key)


class TableSink(Protocol):
    def exists(self, name: str) -> bool: ...
    def read(self, name: str) -> DataFrame: ...
    def create(self, name: str, df: DataFrame, policy: TablePolicy) -> None: ...
    def replace(self, name: str, df: DataFrame, policy: TablePolicy) -> None: ...
    def overwrite(self, name: str, df: DataFrame, policy: TablePolicy) -> None: ...
    def merge(
        self, name: str, changes: DataFrame, spec: ChangeSpec, policy: TablePolicy,
        keep_deletes: bool = False,
    ) -> None: ...
    def list_files(self, name: str) -> DataFrame: ...
    def metadata_location(self, name: str) -> DataFrame: ...
    def expire_snapshots(self, name: str, policy: TablePolicy) -> int: ...
    def remove_orphan_files(self, name: str) -> int: ...
    def rewrite_data_files(self, name: str, policy: TablePolicy) -> None: ...


class ParquetVersionedSink:
    """Snapshot-versioned parquet tables with an atomic commit log.

    Layout::

        <warehouse>/<db>/<table>/
            _snapshots.json      # {"current": N, "snapshots": [...]}  (os.replace-swapped)
            v_00001/ ... parquet files (one dir per committed snapshot)

    Commits write a brand-new version directory and then atomically swap the
    log — readers always see a complete snapshot, never a partial write. This is
    the same reader/writer isolation Iceberg's metadata pointer provides
    (scoped to a single filesystem).
    """

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- paths / log ---------------------------------------------------------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.warehouse, *name.split("."))

    def _log_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), SNAPSHOT_LOG)

    def _read_log(self, name: str) -> dict:
        with open(self._log_path(name)) as f:
            return json.load(f)

    def _write_log(self, name: str, log: dict) -> None:
        """Atomic swap: tmp file + os.replace (POSIX-atomic)."""
        d = self._table_dir(name)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(log, f, indent=1)
        os.replace(tmp, self._log_path(name))

    def _version_dir(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"v_{version:05d}")

    def current_version(self, name: str) -> int:
        return self._read_log(name)["current"]

    # -- commit protocol -----------------------------------------------------

    def _commit(self, name: str, df: DataFrame, policy: TablePolicy, operation: str) -> None:
        d = self._table_dir(name)
        os.makedirs(d, exist_ok=True)
        if os.path.exists(self._log_path(name)):
            log = self._read_log(name)
        else:
            log = {"current": 0, "snapshots": [], "properties": {}}
        version = log["current"] + 1
        vdir = self._version_dir(name, version)
        # Write to a private in-flight dir, then rename into place. Crash
        # recovery (an unrecorded v_NNNNN dir left by a commit that died
        # before the log swap) therefore never has to delete data at the
        # final path while another writer might be producing it; stale
        # .inflight-* dirs are inert garbage swept by remove_orphan_files.
        # The log swap itself assumes a SINGLE COMMITTER per table (the
        # reference delegates this to Iceberg's catalog CAS); a lost race is
        # DETECTED below and raised, never silently absorbed.
        tmp = f"{vdir}.inflight-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        if policy.bucket_by:
            # D1 end-to-end: cluster rows so each output file covers exactly
            # one hash bucket (with partition_by, one file per (dir-partition,
            # bucket) pair) — co-located scans and merge joins downstream.
            df = bucket_partition_ordering(df, list(policy.bucket_by), policy.n_buckets)
        writer = df.write.mode("errorifexists").option("compression", policy.compression_codec)
        if policy.partition_by:
            writer = writer.partitionBy(*policy.partition_by)
        writer.parquet(tmp)
        try:
            os.rename(tmp, vdir)
        except OSError:
            # vdir exists: either an orphan of a crashed commit (the log —
            # the source of truth — does not record it) or a concurrent
            # committer won the race (it does). The log distinguishes them.
            if os.path.exists(self._log_path(name)) and self._read_log(name)[
                "current"
            ] >= version:
                shutil.rmtree(tmp, ignore_errors=True)
                raise RuntimeError(
                    f"concurrent commit detected on {name} v{version}: the "
                    "versioned-parquet log protocol is single-committer per "
                    "table — serialize writers or use the Iceberg sink, whose "
                    "catalog provides the compare-and-swap"
                )
            shutil.rmtree(vdir)
            os.rename(tmp, vdir)

        log["current"] = version
        log["properties"] = policy.iceberg_table_properties()
        log["snapshots"].append(
            {
                "version": version,
                "operation": operation,
                "committed_at": datetime.now(timezone.utc).isoformat(),
            }
        )
        self._write_log(name, log)

    # -- TableSink API -------------------------------------------------------

    def exists(self, name: str) -> bool:
        # reference iceberg.py:246-251 existence probe
        return os.path.exists(self._log_path(name))

    def read(self, name: str) -> DataFrame:
        version = self.current_version(name)
        return self.spark.read.parquet(self._version_dir(name, version))

    def read_version(self, name: str, version: int) -> DataFrame:
        """Time travel (Iceberg ``VERSION AS OF`` analogue)."""
        return self.spark.read.parquet(self._version_dir(name, version))

    def read_changes(
        self, name: str, from_version: int, to_version: int, keys: list[str]
    ) -> DataFrame:
        """Incremental consumption (Iceberg changelog scan / ``table_changes``
        analogue): NET row-level changes between two committed versions, typed
        INSERT / DELETE / UPDATE_BEFORE / UPDATE_AFTER in ``_change_type``.

        "Net" because a versioned-parquet sink stores full snapshots, not
        per-commit manifest diffs: a row inserted at v+1 and deleted at v+2
        never appears in ``read_changes(v, v+2)``. Computed distributively by
        the key-equi changelog calculus (``changes.build_changelog``) — no
        driver collects, AQE broadcasts the smaller version.
        """
        old = self.read_version(name, from_version)
        new = self.read_version(name, to_version)
        return build_changelog(old, new, keys)

    def create(self, name: str, df: DataFrame, policy: TablePolicy) -> None:
        # reference iceberg.py:122-149 CREATE TABLE IF NOT EXISTS ... AS SELECT
        if self.exists(name):
            return
        self._commit(name, df, policy, "create")

    def replace(self, name: str, df: DataFrame, policy: TablePolicy) -> None:
        # reference iceberg.py:104-119 CREATE OR REPLACE TABLE ... AS SELECT
        self._commit(name, df, policy, "replace")

    def overwrite(self, name: str, df: DataFrame, policy: TablePolicy) -> None:
        self._commit(name, df, policy, "overwrite")

    def merge(
        self, name: str, changes: DataFrame, spec: ChangeSpec, policy: TablePolicy,
        keep_deletes: bool = False,
    ) -> None:
        # Same logical semantics as reference iceberg.py:233-244 MERGE INTO.
        target = self.read(name)
        merged = merge_dataframes(target, changes, spec, keep_deletes=keep_deletes)
        self._commit(name, merged, policy, "merge")

    def merge_snapshot(
        self,
        name: str,
        source: DataFrame,
        spec: ChangeSpec,
        policy: TablePolicy,
        options=None,
        ingestion_ts=None,
        include_deletes: bool = True,
        keep_deletes: bool = False,
        soft_delete_col: str | None = None,
    ) -> None:
        """Snapshot merge via the fused single-pass plan (merge.py:
        merge_snapshot_fused — one full-outer join instead of the leg-based
        changeset's four target shuffles; bag-equal, pinned by tests). Only the
        DataFrame sink offers this: the Iceberg sink's primitive is MERGE INTO
        on a changeset, where the engine fuses server-side."""
        from iceberg_ingestion_spark.merge import merge_snapshot_fused

        target = self.read(name)
        merged = merge_snapshot_fused(
            target,
            source,
            spec,
            options=options,
            ingestion_ts=ingestion_ts,
            include_deletes=include_deletes,
            keep_deletes=keep_deletes,
            soft_delete_col=soft_delete_col,
        )
        self._commit(name, merged, policy, "merge")

    def list_files(self, name: str) -> DataFrame:
        """``SELECT file_path FROM db.tbl.files`` analogue (reference
        ``iceberg.py:272-278``)."""
        vdir = self._version_dir(name, self.current_version(name))
        paths = []
        for root, _dirs, files in os.walk(vdir):
            paths.extend(
                os.path.join(root, f) for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        return self.spark.createDataFrame([(p,) for p in sorted(paths)], "file_path string")

    def metadata_location(self, name: str) -> DataFrame:
        """Single-row manifest DataFrame (reference ``iceberg.py:280-289`` lifts
        Glue's ``metadata_location``; the reference does this with
        ``parallelize().map(Row).toDF()`` — a 1-row ``createDataFrame`` is the
        idiomatic replacement, SURVEY §1.4)."""
        return self.spark.createDataFrame([(self._log_path(name),)], "manifest string")

    # -- maintenance (reference iceberg.py:253-270) --------------------------

    def expire_snapshots(self, name: str, policy: TablePolicy, now: datetime | None = None) -> int:
        """Drop snapshot versions older than the retention window, always keeping
        at least ``min_snapshots_to_keep`` and the current version (reference
        ``iceberg.py:253-259`` + retention properties ``iceberg.py:54-58``)."""
        log = self._read_log(name)
        now = now or datetime.now(timezone.utc)
        cutoff = now - timedelta(days=policy.retention_days)
        snaps = sorted(log["snapshots"], key=lambda s: s["version"])
        keep_floor = max(0, len(snaps) - policy.min_snapshots_to_keep)
        expired = [
            s for i, s in enumerate(snaps)
            if i < keep_floor
            and datetime.fromisoformat(s["committed_at"]) < cutoff
            and s["version"] != log["current"]
        ]
        for s in expired:
            shutil.rmtree(self._version_dir(name, s["version"]), ignore_errors=True)
        log["snapshots"] = [s for s in snaps if s not in expired]
        self._write_log(name, log)
        return len(expired)

    def remove_orphan_files(self, name: str) -> int:
        """Delete version directories not referenced by the snapshot log
        (reference ``iceberg.py:260-262``)."""
        log = self._read_log(name)
        live = {f"v_{s['version']:05d}" for s in log["snapshots"]}
        removed = 0
        for entry in os.listdir(self._table_dir(name)):
            if entry.startswith("v_") and entry not in live:
                shutil.rmtree(os.path.join(self._table_dir(name), entry), ignore_errors=True)
                removed += 1
        return removed

    def rewrite_data_files(self, name: str, policy: TablePolicy) -> None:
        """Compaction: rewrite the current snapshot into ~target-file-size files
        (reference ``iceberg.py:264-270`` ``rewrite_data_files``)."""
        vdir = self._version_dir(name, self.current_version(name))
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _d, files in os.walk(vdir)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total // policy.target_file_size_bytes))  # ceil
        df = self.read(name).coalesce(int(n_files))
        self._commit(name, df, policy, "rewrite_data_files")


class IcebergSink:
    """Real-Iceberg sink: emits the reference's SQL against a configured catalog.

    Requires a session built with ``iceberg_catalog=...`` (session.py) and the
    iceberg-spark-runtime jar. Statements mirror the reference:
    CTAS ``iceberg.py:104-149``, MERGE ``iceberg.py:233-244``, maintenance CALLs
    ``iceberg.py:253-270``.
    """

    def __init__(self, spark: SparkSession, catalog: str = "iceberg"):
        self.spark = spark
        self.catalog = catalog

    def _fq(self, name: str) -> str:
        return f"{self.catalog}.{name}"

    def _props_clause(self, policy: TablePolicy) -> str:
        props = policy.iceberg_table_properties()
        return ", ".join(f"'{k}'='{v}'" for k, v in props.items())

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._fq(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.table(self._fq(name))

    def create(self, name: str, df: DataFrame, policy: TablePolicy) -> None:
        df.createOrReplaceTempView("__ingest_source")
        # Iceberg expresses bucketing as a partition transform, so
        # policy.bucket_by becomes bucket(n, col) in the spec (the parquet
        # sink realizes the same clustering via bucket_partition_ordering).
        transforms = list(policy.partition_by) + [
            f"bucket({policy.n_buckets}, {c})" for c in policy.bucket_by
        ]
        partition = f"PARTITIONED BY ({', '.join(transforms)})" if transforms else ""
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._fq(name)} USING iceberg {partition} "
            f"TBLPROPERTIES ({self._props_clause(policy)}) AS SELECT * FROM __ingest_source"
        )

    def replace(self, name: str, df: DataFrame, policy: TablePolicy) -> None:
        df.createOrReplaceTempView("__ingest_source")
        self.spark.sql(
            f"CREATE OR REPLACE TABLE {self._fq(name)} USING iceberg "
            f"TBLPROPERTIES ({self._props_clause(policy)}) AS SELECT * FROM __ingest_source"
        )

    def overwrite(self, name: str, df: DataFrame, policy: TablePolicy) -> None:
        df.writeTo(self._fq(name)).overwritePartitions()

    def merge(
        self, name: str, changes: DataFrame, spec: ChangeSpec, policy: TablePolicy,
        keep_deletes: bool = False,
    ) -> None:
        if keep_deletes:
            # Soft-delete rewrite BEFORE the view registration, so the MERGE's
            # UPDATE SET * / INSERT * carry hard_deleted (reference
            # iceberg.py:224-227 does the same rewrite ahead of the MERGE).
            # Keeps this path row-identical to merge_dataframes, including the
            # absent-key-delete tombstone (see merge_into_sql docstring).
            from iceberg_ingestion_spark.changes import with_soft_delete_flag

            changes = with_soft_delete_flag(changes, spec.op_col)
        changes.createOrReplaceTempView("__ingest_changes")
        self.spark.sql(
            merge_into_sql(self._fq(name), "__ingest_changes", spec, keep_deletes=keep_deletes)
        )

    def list_files(self, name: str) -> DataFrame:
        return self.spark.sql(f"SELECT file_path FROM {self._fq(name)}.files")

    def metadata_location(self, name: str) -> DataFrame:
        loc = (
            self.spark.sql(f"SELECT file FROM {self._fq(name)}.metadata_log_entries "
                           f"ORDER BY timestamp DESC LIMIT 1")
            .first()[0]
        )
        return self.spark.createDataFrame([(loc,)], "manifest string")

    def expire_snapshots(self, name: str, policy: TablePolicy) -> int:
        self.spark.sql(f"CALL {self.catalog}.system.expire_snapshots(table => '{name}')")
        return 0

    def remove_orphan_files(self, name: str) -> int:
        self.spark.sql(f"CALL {self.catalog}.system.remove_orphan_files(table => '{name}')")
        return 0

    def rewrite_data_files(self, name: str, policy: TablePolicy) -> None:
        self.spark.sql(f"CALL {self.catalog}.system.rewrite_data_files(table => '{name}')")

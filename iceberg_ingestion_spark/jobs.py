"""Composite ingestion jobs — the reference's four modes (SURVEY §2.12).

``create_or_update_iceberg_table`` (reference
``src/data_ingestion/common/iceberg.py:82-244``) packed all modes into one
160-line method; here each mode is a small composition over the change calculus
(changes.py), the merge application (merge.py / sink) and the sink lifecycle:

1. replace      — stamp audit, CREATE OR REPLACE        (iceberg.py:104-119)
2. first load   — stamp audit (+soft-delete flag, drop op for CDC), CREATE
                  IF NOT EXISTS                          (iceberg.py:122-149)
3. snapshot     — I/U/D legs -> changeset -> MERGE;  ``incremental`` = no
   merge          delete leg                             (iceberg.py:151-244)
4. cdc merge    — window dedup latest-per-key -> MERGE using the source's op
                                                         (iceberg.py:203-244)
plus the equivalence test (iceberg.py:291-301) and post-run maintenance
(iceberg.py:253-270).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_ingestion_spark.changes import (
    build_changeset,
    dedup_latest,
    stamp_audit,
)
from iceberg_ingestion_spark.model import (
    HARD_DELETED_COL,
    INGESTION_DATETIME_COL,
    ChangeSpec,
    IngestionType,
    MergeOptions,
    TablePolicy,
)
from iceberg_ingestion_spark.sinks import TableSink
from iceberg_ingestion_spark.validate import diff_count


class IngestionJob:
    """One target table's ingestion lifecycle against a pluggable sink."""

    def __init__(
        self,
        sink: TableSink,
        spec: ChangeSpec,
        policy: TablePolicy = TablePolicy(),
        options: MergeOptions = MergeOptions(),
    ):
        self.sink = sink
        self.spec = spec
        self.policy = policy
        self.options = options

    # -- modes ----------------------------------------------------------------

    def replace(self, source: DataFrame, name: str, ingestion_ts: datetime) -> None:
        """Full replace: CREATE OR REPLACE with audit stamp (reference
        ``iceberg.py:104-119``)."""
        self.sink.replace(name, stamp_audit(source, ingestion_ts), self.policy)

    def first_load(
        self, source: DataFrame, name: str, ingestion_ts: datetime, is_cdc: bool = False
    ) -> None:
        """First load of an absent table (reference ``iceberg.py:122-149``).

        Adds ``hard_deleted=false`` when soft deletes are kept (``iceberg.py:127``)
        and drops the ``op`` column on CDC first loads (``iceberg.py:131-132``).
        """
        df = source
        if is_cdc and self.spec.op_col in df.columns:
            df = df.drop(self.spec.op_col)
        if self.options.keep_deletes:
            df = df.withColumn(HARD_DELETED_COL, F.lit(False).cast("boolean"))
        self.sink.create(name, stamp_audit(df, ingestion_ts), self.policy)

    def snapshot_merge(
        self,
        source: DataFrame,
        name: str,
        ingestion_ts: datetime,
        ingestion_type: IngestionType = IngestionType.FULL,
    ) -> None:
        """Diff a snapshot against the target and merge (reference
        ``iceberg.py:151-244``). ``INCREMENTAL`` skips the delete leg
        (``iceberg.py:177-178``).

        Sinks exposing ``merge_snapshot`` (the DataFrame sink) get the fused
        single-pass plan — one full-outer join instead of four target shuffles
        (4x at 3M keys; bag-equal by tests). The Iceberg path keeps the
        changeset + MERGE INTO contract, where the engine itself fuses."""
        source = source.drop(INGESTION_DATETIME_COL, HARD_DELETED_COL)
        if hasattr(self.sink, "merge_snapshot"):
            self.sink.merge_snapshot(
                name,
                source,
                self.spec,
                self.policy,
                options=self.options,
                ingestion_ts=ingestion_ts,
                include_deletes=(ingestion_type is IngestionType.FULL),
                keep_deletes=self.options.keep_deletes,
                soft_delete_col=HARD_DELETED_COL if self.options.keep_deletes else None,
            )
            return
        target = self.sink.read(name)
        # reference iceberg.py:153-158 caches both sides across the multi-pass
        # diff; at 100 TB caching the target is not viable, so cache only the
        # (usually far smaller) source — the target legs reuse one shuffle.
        source = source.cache()
        changes = build_changeset(
            source,
            target,
            self.spec,
            options=self.options,
            ingestion_ts=ingestion_ts,
            include_deletes=(ingestion_type is IngestionType.FULL),
            soft_delete_col=HARD_DELETED_COL if self.options.keep_deletes else None,
        )
        self.sink.merge(
            name, changes, self.spec, self.policy, keep_deletes=self.options.keep_deletes
        )

    def cdc_merge(self, cdc: DataFrame, name: str, ingestion_ts: datetime) -> None:
        """Apply a CDC batch: latest-row-per-key dedup, audit stamp, merge using
        the source-provided op (reference ``iceberg.py:203-244``)."""
        changes = stamp_audit(dedup_latest(cdc, self.spec), ingestion_ts)
        self.sink.merge(
            name, changes, self.spec, self.policy, keep_deletes=self.options.keep_deletes
        )

    # -- dispatch (reference app.py:92-141 + iceberg.py:92-102) ---------------

    def run(
        self,
        source: DataFrame,
        name: str,
        ingestion_type: IngestionType,
        ingestion_ts: datetime,
    ) -> None:
        if ingestion_type is IngestionType.REPLACE:
            self.replace(source, name, ingestion_ts)
            return
        if not self.sink.exists(name):
            self.first_load(
                source, name, ingestion_ts, is_cdc=(ingestion_type is IngestionType.CDC)
            )
            return
        if ingestion_type is IngestionType.CDC:
            self.cdc_merge(source, name, ingestion_ts)
        else:
            self.snapshot_merge(source, name, ingestion_ts, ingestion_type)

    # -- validation + maintenance ---------------------------------------------

    def test(self, source: DataFrame, name: str) -> int:
        """Equivalence check; 0 means target == source modulo audit/soft-deletes
        (reference ``iceberg.py:291-301``)."""
        return diff_count(source.drop(INGESTION_DATETIME_COL), self.sink.read(name))

    def export_metadata(self, name: str, out_dir: str) -> None:
        """S10: write the table's data-file list and manifest pointer as JSON
        (reference ``salesforce.py:71-77``, ``dmsdatabase1.py:106-112`` — the
        handoff contract for downstream consumers reading outside the engine).
        """
        import os

        self.sink.list_files(name).write.mode("overwrite").json(
            os.path.join(out_dir, "files")
        )
        self.sink.metadata_location(name).write.mode("overwrite").json(
            os.path.join(out_dir, "manifest")
        )

    def maintain(self, name: str, run_date: datetime | None = None) -> None:
        """Post-run maintenance (reference ``salesforce.py:64-69``,
        ``dmsdatabase1.py:99-104``): expire snapshots + orphan removal every run,
        compaction on the 1st of the month."""
        self.sink.expire_snapshots(name, self.policy)
        self.sink.remove_orphan_files(name)
        if run_date is not None and run_date.day == 1:
            self.sink.rewrite_data_files(name, self.policy)

"""CLI entry point, flag-for-flag with the reference's ``app.py:15-59``.

    python -m iceberg_ingestion_spark.cli -d <iso-datetime> -e <env> -s <source>
        -t <table> [--type full|incremental|cdc|replace]
        [--no-insert] [--no-update] [--no-delete] [--keep-deletes]
        [--optimize storage|speed] [--test] [--warehouse DIR] [--input PATH]
        [--changes FROM TO] [--partition-by COLS] [--bucket-by COLS]
        [--n-buckets N]

The reference dispatches on hard-coded source names to subclasses
(``app.py:92-141``); here sources are data (``SourceConfig``) and the job is
generic. ``--input`` points at the raw snapshot/CDC parquet directory (the
reference derives it from SSM-configured buckets, ``s3_bucket_names_config.py``
— an AWS coupling this engine replaces with explicit paths/env config).
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime

from iceberg_ingestion_spark.jobs import IngestionJob
from iceberg_ingestion_spark.model import (
    ChangeSpec,
    IngestionType,
    MergeOptions,
    OptimizeMode,
    TablePolicy,
)
from iceberg_ingestion_spark.session import session
from iceberg_ingestion_spark.sinks import ParquetVersionedSink
from iceberg_ingestion_spark.sources import read_snapshot, table_name


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="PySpark-native ingestion engine")
    # reference app.py:16-38
    p.add_argument("-d", "--date", required=True, help="ISO datetime of the run")
    p.add_argument("-e", "--env", required=True, help="environment (dev/stg/prd)")
    p.add_argument("-s", "--source", required=True, help="source system name")
    p.add_argument("-t", "--table", required=True, help="table name")
    p.add_argument(
        "--type",
        default=IngestionType.FULL.value,
        choices=[t.value for t in IngestionType],  # reference iceberg.py:9-10
    )
    # reference app.py:39-50
    p.add_argument("--no-insert", action="store_true")
    p.add_argument("--no-update", action="store_true")
    p.add_argument("--no-delete", action="store_true")
    p.add_argument("--keep-deletes", action="store_true")  # app.py:51-53
    p.add_argument(
        "--optimize",
        default=OptimizeMode.SPEED.value,
        choices=[m.value for m in OptimizeMode],  # reference iceberg.py:12-14
    )
    p.add_argument("--test", action="store_true")  # app.py:54-56
    # engine-specific (replaces SSM bucket lookup)
    p.add_argument("--warehouse", default="spark-warehouse")
    # D1 layout controls: hive-style directory partitioning and hash-bucket
    # write clustering (reference declares the bucket hook, iceberg.py:332-338)
    p.add_argument(
        "--partition-by", help="comma-separated partition columns", default=None
    )
    p.add_argument(
        "--bucket-by",
        help="comma-separated bucket-clustering columns (one file per bucket)",
        default=None,
    )
    p.add_argument("--n-buckets", type=int, default=8)
    p.add_argument("--input", help="raw parquet path for this run")
    p.add_argument(
        "--changes",
        nargs=2,
        type=int,
        metavar=("FROM", "TO"),
        help="print per-type counts of the changelog between two committed "
        "versions (Iceberg table_changes analogue) instead of ingesting",
    )
    p.add_argument("--keys", required=True, help="comma-separated natural keys")
    p.add_argument("--updated-at", required=True, help="comma-separated updated-at fields")
    p.add_argument("--lowercase-columns", action="store_true")
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    run_ts = datetime.fromisoformat(args.date)
    spec = ChangeSpec(
        natural_keys=tuple(args.keys.split(",")),
        updated_at_fields=tuple(args.updated_at.split(",")),
    )
    options = MergeOptions(
        insert=not args.no_insert,
        update=not args.no_update,
        delete=not args.no_delete,
        keep_deletes=args.keep_deletes,
    )
    policy = TablePolicy(
        optimize=OptimizeMode(args.optimize),
        partition_by=tuple(args.partition_by.split(",")) if args.partition_by else (),
        bucket_by=tuple(args.bucket_by.split(",")) if args.bucket_by else (),
        n_buckets=args.n_buckets,
    )
    name = table_name(args.env, args.source, args.table)

    if args.changes is None and args.input is None:
        print("error: --input is required unless --changes is given", file=sys.stderr)
        return 2

    with session(app_name=f"ingest-{args.source}-{args.table}") as spark:
        sink = ParquetVersionedSink(spark, args.warehouse)
        if args.changes is not None:
            from pyspark.sql import functions as F

            from iceberg_ingestion_spark.changes import CHANGE_TYPE_COL

            ch = sink.read_changes(
                name, args.changes[0], args.changes[1], list(spec.natural_keys)
            )
            for r in sorted(
                ch.groupBy(CHANGE_TYPE_COL).agg(F.count(F.lit(1)).alias("n")).collect()
            ):
                print(f"{r[CHANGE_TYPE_COL]}={r['n']}")
            return 0
        job = IngestionJob(sink, spec, policy, options)
        source = read_snapshot(spark, args.input, lowercase_columns=args.lowercase_columns)
        if args.test:
            diff = job.test(source, name)
            print(f"diff_count={diff}")
            return 0 if diff == 0 else 1
        job.run(source, name, IngestionType(args.type), run_ts)
        job.maintain(name, run_date=run_ts)
    return 0


if __name__ == "__main__":
    sys.exit(main())

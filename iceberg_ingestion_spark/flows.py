"""Config-driven multi-table ingestion runner — the engine-side equivalent of
the reference's flows DAG (``dags/data_ingestion_dms.py:151-182``): one YAML
maps ``source -> table -> {type, schema, size, keep_deletes}`` and every
table runs through the generic :class:`IngestionJob` with the DAG's exact
defaults (``:166-169`` — type=full, size=M, schema=dbo, keep_deletes=false),
followed — for full/replace, the DAG's ``test_operator`` gating (``:179-181``)
— by the source↔target equivalence test.

Scheduling, retries and task fan-out belong to whatever invokes this (cron,
an orchestrator, a driver script); what this module reproduces is the DAG's
COMPUTATIONAL content: config parsing + defaults, per-table mode dispatch,
and the post-ingest test gate. ``size`` maps to a per-job
``spark.sql.shuffle.partitions`` override (S/M/L/XL → 8/32/128/512) — the
local-session analogue of the DAG's per-size EMR executor profiles; AQE
coalesces the excess at runtime, so oversizing is cheap and undersizing a
big table is the only real misconfiguration, exactly as on a cluster.

Tables run SEQUENTIALLY in one Spark session (each job is internally
parallel across the cluster); a pipeline wanting cross-table concurrency
submits sources as separate driver processes, which is also how the DAG's
per-source structure parallelizes.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from datetime import datetime
from typing import Any

from pyspark.sql import SparkSession

from iceberg_ingestion_spark.jobs import IngestionJob
from iceberg_ingestion_spark.model import (
    ChangeSpec,
    IngestionType,
    MergeOptions,
    TablePolicy,
)
from iceberg_ingestion_spark.sinks import ParquetVersionedSink
from iceberg_ingestion_spark.sources import read_snapshot, table_name

#: reference DAG defaults (data_ingestion_dms.py:166-169)
DEFAULT_TYPE = "full"
DEFAULT_SIZE = "M"
DEFAULT_SCHEMA = "dbo"

#: local analogue of the DAG's size -> EMR profile map
SIZE_SHUFFLE_PARTITIONS = {"S": 8, "M": 32, "L": 128, "XL": 512}


@dataclass(frozen=True)
class TableFlow:
    table: str
    source_table: str
    schema: str = DEFAULT_SCHEMA
    ingest_type: str = DEFAULT_TYPE
    size: str = DEFAULT_SIZE
    keep_deletes: bool = False


def load_flows(path: str) -> dict[str, list[TableFlow]]:
    """Parse a flows YAML (the reference's ``dms_flows.yaml`` shape) into
    per-source table lists, applying the DAG's defaults for absent keys.
    Unknown per-table keys are rejected loudly — a typo'd ``keep_delete``
    silently hard-deleting rows is the failure mode config files invite."""
    import yaml

    with open(path) as fh:
        raw = yaml.safe_load(fh) or {}
    known = {"source", "schema", "type", "size", "keep_deletes"}
    flows: dict[str, list[TableFlow]] = {}
    for source, tables in raw.items():
        out = []
        for table, cfg in (tables or {}).items():
            cfg = cfg or {}
            unknown = set(cfg) - known
            if unknown:
                raise ValueError(
                    f"flows: unknown keys {sorted(unknown)} for {source}.{table}"
                )
            ingest_type = cfg.get("type", DEFAULT_TYPE)
            if ingest_type not in {t.value for t in IngestionType}:
                raise ValueError(
                    f"flows: bad type {ingest_type!r} for {source}.{table}"
                )
            size = cfg.get("size", DEFAULT_SIZE)
            if size not in SIZE_SHUFFLE_PARTITIONS:
                raise ValueError(f"flows: bad size {size!r} for {source}.{table}")
            out.append(
                TableFlow(
                    table=table,
                    source_table=cfg.get("source", table),
                    schema=cfg.get("schema", DEFAULT_SCHEMA),
                    ingest_type=ingest_type,
                    size=size,
                    keep_deletes=bool(cfg.get("keep_deletes", False)),
                )
            )
        flows[source] = out
    return flows


def run_flows(
    spark: SparkSession,
    flows: dict[str, list[TableFlow]],
    *,
    input_root: str,
    warehouse: str,
    env: str,
    run_ts: datetime,
    specs: dict[str, ChangeSpec],
    policies: dict[str, TablePolicy] | None = None,
) -> list[dict[str, Any]]:
    """Run every configured table; return one report row per table:
    (source, table, type, size, version, rows, diff_count).

    ``specs`` carries the natural-key/updated-at contract, keyed by source
    with an optional ``"source.table"`` override — mirroring the reference,
    where keys live on the source subclass (``salesforce.py:48-52``,
    ``dmsdatabase1.py:73-77``), not in the flows file. ``diff_count`` is
    reported for full/replace tables (the DAG's test task); a nonzero value
    after a merge of touched-but-not-newer rows is the strict-``>`` contract,
    surfaced for the operator to judge, not an automatic failure — the DAG
    likewise separates the test task's outcome from the cleaning task's.

    Input layout: ``{input_root}/{source}/{table}`` (raw parquet drop per
    table — the engine's explicit-path replacement for the reference's
    SSM-derived bucket paths)."""
    sink = ParquetVersionedSink(spark, warehouse)
    policies = policies or {}
    report: list[dict[str, Any]] = []
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for source, tables in flows.items():
            for tf in tables:
                spec = specs.get(f"{source}.{tf.table}") or specs.get(source)
                if spec is None:
                    raise ValueError(f"flows: no ChangeSpec for {source}.{tf.table}")
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    str(SIZE_SHUFFLE_PARTITIONS[tf.size]),
                )
                policy = policies.get(f"{source}.{tf.table}") or policies.get(
                    source, TablePolicy()
                )
                job = IngestionJob(
                    sink, spec, policy, MergeOptions(keep_deletes=tf.keep_deletes)
                )
                name = table_name(env, source, tf.table)
                src = read_snapshot(spark, f"{input_root}/{source}/{tf.source_table}")
                job.run(src, name, IngestionType(tf.ingest_type), run_ts)
                job.maintain(name, run_date=run_ts)
                diff = (
                    job.test(src, name)
                    if tf.ingest_type in ("full", "replace")
                    else None
                )
                report.append(
                    {
                        "source": source,
                        "table": tf.table,
                        "type": tf.ingest_type,
                        "size": tf.size,
                        "version": sink.current_version(name),
                        "rows": sink.read(name).count(),
                        "diff_count": diff,
                    }
                )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    return report


def main(argv: list[str] | None = None) -> int:
    """``python -m iceberg_ingestion_spark.flows <flows.yaml> --input-root R
    --warehouse W --env E --date ISO --keys K --updated-at U [--source-keys
    src=K1;U1 ...]`` — the single-spec form covers the common one-source
    case; per-source specs via repeated ``--source-keys``."""
    import argparse

    from iceberg_ingestion_spark.session import session

    p = argparse.ArgumentParser(description="config-driven multi-table ingest")
    p.add_argument("flows")
    p.add_argument("--input-root", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--env", required=True)
    p.add_argument("--date", required=True)
    p.add_argument("--keys", help="default natural keys (comma-separated)")
    p.add_argument("--updated-at", help="default updated-at fields")
    p.add_argument(
        "--source-keys",
        action="append",
        default=[],
        metavar="SRC=KEYS;UPDATED",
        help="per-source spec override, e.g. crm=id;modstamp",
    )
    args = p.parse_args(argv)
    flows = load_flows(args.flows)
    specs: dict[str, ChangeSpec] = {}
    if args.keys and args.updated_at:
        default = ChangeSpec(
            tuple(args.keys.split(",")), tuple(args.updated_at.split(","))
        )
        specs.update({s: default for s in flows})
    for ov in args.source_keys:
        src, rest = ov.split("=", 1)
        keys, updated = rest.split(";", 1)
        specs[src] = ChangeSpec(tuple(keys.split(",")), tuple(updated.split(",")))
    with session(app_name="ingest-flows") as spark:
        for row in run_flows(
            spark,
            flows,
            input_root=args.input_root,
            warehouse=args.warehouse,
            env=args.env,
            run_ts=datetime.fromisoformat(args.date),
            specs=specs,
        ):
            print(
                f"{row['source']}.{row['table']} type={row['type']} "
                f"v{row['version']} rows={row['rows']} diff_count={row['diff_count']}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

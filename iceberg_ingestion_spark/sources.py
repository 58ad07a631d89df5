"""Source adapters: raw parquet snapshots and CDC drops.

Reproduces the reference's source contracts (reference
``src/data_ingestion/ingestion/salesforce.py`` and ``dmsdatabase1.py``) without
the AWS coupling: dated-path conventions, schema-inferred parquet reads, DMS
column-name lower-casing, and the (snapshot | change-stream) distinction.
A source yields ``(DataFrame, ChangeSpec)`` — the keyed change-set abstraction
(SURVEY §1.1).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

from iceberg_ingestion_spark.model import ChangeSpec


def snapshot_path(base: str, source: str, table: str, run_date: datetime) -> str:
    """``{base}/raw/{source}/{table}/{YYYY-mm-dd}`` (reference
    ``salesforce.py:27-29``, ``dmsdatabase1.py:43-46``)."""
    return f"{base}/raw/{source}/{table}/{run_date.strftime('%Y-%m-%d')}"


def cdc_path(base: str, source: str, schema: str, table: str, run_date: datetime) -> str:
    """``{base}/raw/{source}/dms/cdc/{schema}/{TABLE}/{YYYY/MM/DD}`` (reference
    ``dmsdatabase1.py:36-42``; DMS upper-cases the table segment)."""
    return (
        f"{base}/raw/{source}/dms/cdc/{schema}/{table.upper()}/"
        f"{run_date.strftime('%Y/%m/%d')}"
    )


def normalize_columns_lower(df: DataFrame) -> DataFrame:
    """Lower-case every column (reference ``dmsdatabase1.py:60-63`` does this with
    a ``withColumnRenamed`` loop; ``toDF`` is the single-plan-node idiom)."""
    return df.toDF(*[c.lower() for c in df.columns])


def read_snapshot(spark: SparkSession, path: str, lowercase_columns: bool = False) -> DataFrame:
    """Schema-inferred parquet snapshot read (reference ``salesforce.py:39-40``,
    ``dmsdatabase1.py:57-58``)."""
    df = spark.read.parquet(path)
    return normalize_columns_lower(df) if lowercase_columns else df


def read_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSONL (one JSON object per line) corpus read — the interchange format
    most training-data tooling emits/consumes. Pass an explicit DDL ``schema``
    in production: schema inference over JSON is a FULL extra pass over the
    data (at 100 TB that is a second 100 TB scan), and silently widens types
    on dirty input. Permissive mode with a ``_corrupt_record`` column is the
    contract: malformed lines land there instead of failing the job, so the
    caller can route them to quarantine (``WHERE _corrupt_record IS NOT
    NULL``) — the same fail-soft posture as the NULL-text kernels."""
    if schema is None:
        # inference path (dev/exploration only — see docstring)
        return spark.read.option("mode", "PERMISSIVE").json(path)
    # text + from_json instead of spark.read.json: identical PERMISSIVE
    # semantics, but corrupt-record queries are fully plannable — the raw
    # JSON reader rejects any plan whose pruned schema is corrupt-only
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which would
    # make the quarantine count itself illegal. Partition-directory columns
    # survive (text is a normal file source with partition discovery).
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    part_cols = [c for c in raw.columns if c != "value"]
    parsed = F.from_json(
        F.col("value"),
        f"{schema}, _corrupt_record string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return raw.select(parsed.alias("_r"), *part_cols).select("_r.*", *part_cols)


def write_jsonl(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ()
) -> None:
    """JSONL training-export: one JSON object per line, optionally
    hive-partitioned (pair with ``corpus.shard_assign`` for stable shard
    dirs). Compression stays off by default — training loaders stream-seek
    into shards, and gzip would serialize each file's read."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.json(path)


@dataclass(frozen=True)
class SourceConfig:
    """Static per-source config, replacing the reference's abstract-method
    subclassing (reference ``iceberg.py:303-330``; Salesforce uses
    ``Id``/``SystemModstamp`` at ``salesforce.py:48-52``, DMS uses
    ``recid``/``modifieddatetime`` at ``dmsdatabase1.py:73-77``)."""

    name: str
    natural_keys: tuple[str, ...]
    updated_at_fields: tuple[str, ...]
    lowercase_columns: bool = False
    partition_by: tuple[str, ...] = ()

    @property
    def change_spec(self) -> ChangeSpec:
        return ChangeSpec(self.natural_keys, self.updated_at_fields)


def table_name(env: str, source: str, table: str) -> str:
    """``{env}_clean_{source}.{table}`` with ``-`` → ``_`` normalization
    (reference ``salesforce.py:42-46``, ``dmsdatabase1.py:67-71``)."""
    return f"{env}_clean_{source}.{table.replace('-', '_')}"

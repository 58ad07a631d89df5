"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``iceberg_ingestion_spark.queries`` — one entry per
implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline extension
operators), each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full end-to-end snapshot-merge through the versioned-parquet
    sink — first-load day1, merge day2 (I/U/D via anti/semi-theta joins), read
    the committed table back (SURVEY §2.12 mode 3)."""
    from iceberg_ingestion_spark.fixtures import orders_day1, orders_day2
    from iceberg_ingestion_spark.jobs import IngestionJob
    from iceberg_ingestion_spark.model import IngestionType, TablePolicy
    from iceberg_ingestion_spark.queries import ORDERS_SPEC, read_table
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink

    orders = read_table(spark, SF0001, "orders")
    warehouse = tempfile.mkdtemp(prefix="flagship_wh_")
    sink = ParquetVersionedSink(spark, warehouse)
    job = IngestionJob(sink, ORDERS_SPEC, TablePolicy())
    name = "dev_clean_tpch.orders"
    ts = datetime.fromisoformat("2026-08-13T02:00:00")
    job.run(orders_day1(orders), name, IngestionType.FULL, ts)   # first load
    job.run(orders_day2(orders), name, IngestionType.FULL, ts)   # snapshot merge
    return sink.read(name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from iceberg_ingestion_spark.queries import QUERIES
    from iceberg_ingestion_spark.queries_analytics import QUERIES_ANALYTICS
    from iceberg_ingestion_spark.queries_ext import QUERIES_EXT

    return {**QUERIES, **QUERIES_ANALYTICS, **QUERIES_EXT}


def oracle_sql() -> dict[str, str]:
    from iceberg_ingestion_spark.queries import ORACLES
    from iceberg_ingestion_spark.queries_analytics import ORACLES_ANALYTICS
    from iceberg_ingestion_spark.queries_ext import ORACLES_EXT

    return {**ORACLES, **ORACLES_ANALYTICS, **ORACLES_EXT}

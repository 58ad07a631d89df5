"""SparkSession factory.

Replaces the reference's ``ClosableSparkSession`` (reference
``src/data_ingestion/common/spark.py:61-109``): same tuning stance — AQE with
partition coalescing and ``parallelismFirst=false`` (``spark.py:88-90``), dynamic
partition overwrite (``spark.py:69``), parquet datetime rebase CORRECTED
(``spark.py:94``) — without the AWS/Glue coupling, and with Arrow enabled for the
Pandas-UDF operators. Iceberg catalog configs are applied only when an Iceberg
runtime jar is actually on the classpath (none is in this environment; the
versioned-parquet sink supplies the merge/lifecycle semantics instead).
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def default_driver_memory() -> str:
    """Driver-JVM heap default, derived from host RAM (quarter of physical,
    clamped to [2g, 32g]) so fresh environments still start — a fixed 32g
    fails JVM startup (or OOM-kills) on smaller hosts. On the 128 GiB bench
    host this resolves to the measured-good 32g. ``SPARK_GRAFT_DRIVER_MEM``
    overrides."""
    override = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if override:
        return override
    total_gib = 16.0
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gib = int(line.split()[1]) / (1024 * 1024)
                    break
    except (OSError, ValueError, IndexError):
        pass
    return f"{max(2, min(32, int(total_gib // 4)))}g"


def build_session(
    app_name: str = "iceberg-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    iceberg_catalog: str | None = None,
    iceberg_warehouse: str | None = None,
) -> SparkSession:
    """Build a tuned SparkSession.

    Scale stance: AQE owns runtime partition sizing (coalescing,
    skew-join splitting) so plans built at sf0.01 survive a 1000-executor
    100 TB run without hand-tuned partition counts.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # AQE: reference spark.py:88-90, kept — runtime coalesce + skew handling.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # DIVERGENCE from the reference (spark.py:90 pins false): with
        # parallelismFirst=false, AQE coalesces any shuffle smaller than the
        # 64MB advisory size down to ONE partition, serializing mid-size
        # aggregations onto a single core (measured 2x on the inverted-index
        # join at sf0.1). true — Spark's own default — only affects shuffles
        # smaller than advisory*parallelism: at 100 TB bytes/64MB dwarfs the
        # core count so coalescing targets the advisory size regardless, while
        # small shuffles spread across the cluster bounded below by
        # minPartitionSize (1MB), which is the right behavior at every scale.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # reference spark.py:69 — overwrite only touched partitions.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # reference spark.py:94 — legacy parquet dates.
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # Split even single small files across the cluster: scans are sized by
        # maxPartitionBytes at 100 TB, but a sub-128MB file must not serialize
        # expression-heavy work (shingling, hashing) onto one core.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # Arrow transfer for the Pandas-UDF operator surface.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode "driver" memory IS the whole JVM (driver + all 32
        # executor threads). 8g starved long suites: by query ~40 of a
        # 74-query bench the heap was full of retained UI plan strings,
        # unpersisted caches and localCheckpoint blocks, and GC pauses
        # inflated ~1s queries to ~26s. Default scales with host RAM
        # (quarter, clamped 2g-32g) so small hosts still boot; a real
        # cluster sizes executors separately.
        .config("spark.driver.memory", default_driver_memory())
        # Bound UI/listener retention: TPC-H-size plan strings x 1000
        # retained executions is real heap at suite scale.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
    )
    if iceberg_catalog:
        # Only meaningful when the iceberg-spark-runtime jar is deployed
        # (reference spark.py:79-86 wires GlueCatalog + extensions).
        builder = (
            builder.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config(f"spark.sql.catalog.{iceberg_catalog}", "org.apache.iceberg.spark.SparkCatalog")
            .config(f"spark.sql.catalog.{iceberg_catalog}.type", "hadoop")
            .config(
                f"spark.sql.catalog.{iceberg_catalog}.warehouse",
                iceberg_warehouse or "spark-warehouse/iceberg",
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@contextmanager
def session(**kwargs) -> Iterator[SparkSession]:
    """Context-managed session (reference ``spark.py:105-109`` guarantees
    stop()) — but only stops a session it actually created: ``getOrCreate``
    returns any live session, and stopping a borrowed one would kill the
    caller's (e.g. a test harness embedding the CLI)."""
    existing = SparkSession.getActiveSession()
    spark = build_session(**kwargs)
    try:
        yield spark
    finally:
        if existing is None or existing is not spark:
            spark.stop()

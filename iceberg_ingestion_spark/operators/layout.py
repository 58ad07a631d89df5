"""Data-layout operators: Z-order clustering for multi-dimensional scan pruning.

Parquet pruning works off per-file min/max stats; a file sorted on one column
prunes only that column's predicates. Z-ordering interleaves the bits of
several columns so files cover compact hyper-rectangles — predicates on ANY of
the ordered columns skip most files (the same trick `OPTIMIZE ZORDER BY`
performs in lakehouse engines; Iceberg exposes it via
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')``).

All pure JVM expressions: per-column min/max normalization to a fixed-bit grid
(one tiny two-row aggregate collected to the driver — the codebook pattern),
then bit interleaving as a sum of shifts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "_zvalue"


def zorder_value(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-value column: each column scaled to ``[0, 2^bits)`` by its min/max,
    bits interleaved (column i contributes bit position ``b*len(cols)+i``)."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).first()
    grid = (1 << bits) - 1
    quantized = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit(grid),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(grid + 1)),
        ).cast("long")
        quantized.append(q)
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, q in enumerate(quantized):
            z = z + (q.bitwiseAND(F.lit(1 << b).cast("long")) / F.lit(1 << b)).cast(
                "long"
            ) * F.lit(1 << (b * n + i)).cast("long")
    return z


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int = 32, bits: int = 8
) -> DataFrame:
    """Cluster rows into ``n_files`` partitions by z-value range so each output
    file covers a compact region of the ``cols`` space (write with one file per
    partition to materialize the layout)."""
    z = zorder_value(df, cols, bits)
    return (
        df.withColumn(Z_COL, z)
        .repartitionByRange(n_files, Z_COL)
        .sortWithinPartitions(Z_COL)
        .drop(Z_COL)
    )


def file_column_stats(spark, path: str, cols: list[str]) -> DataFrame:
    """The data-skipping index a scan planner consults: per input FILE min/max
    of the given columns + row count, computed distributed from the hidden
    ``_metadata.file_path`` column (no driver-side footer walking — at 100 TB
    the stats job is itself a cluster job). This is what Iceberg keeps in its
    manifest entries (``lower_bounds``/``upper_bounds``) and what
    :func:`zorder_layout` exists to make tight: after z-ordering, each file's
    [min, max] boxes are compact, so predicate ∩ box = ∅ prunes most files.
    """
    df = spark.read.parquet(path)
    return (
        df.select(F.col("_metadata.file_path").alias("file_path"), *cols)
        .groupBy("file_path")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.min(c).alias(f"min_{c}") for c in cols],
            *[F.max(c).alias(f"max_{c}") for c in cols],
        )
    )


def prunable_files(stats: DataFrame, col: str, lo, hi) -> DataFrame:
    """Files a ``col BETWEEN lo AND hi`` scan can SKIP per the stats relation:
    the file's [min, max] range misses the predicate interval entirely."""
    return stats.filter(
        (F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi))
    )


def save_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int
) -> None:
    """Persist as a catalog table bucketed (and sorted) on ``keys`` — the
    co-located-join layout: two tables bucketed the same way join WITHOUT a
    shuffle (each task zips bucket i with bucket i), the single biggest
    recurring-join optimization at 100 TB. Spark-native bucketing
    (``bucketBy``/``sortBy`` + ``saveAsTable``); the bucket function is the
    same ``pmod(hash(keys), n)`` the parquet sink's D1 clustering uses, so
    layouts written by either path agree."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )

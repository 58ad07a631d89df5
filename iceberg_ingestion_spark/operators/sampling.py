"""Sampling and dataset-split operators for training-data pipelines.

- :func:`hash_split` — reproducible train/val/test assignment by content hash:
  md5-derived bucket in [0,100), thresholded into named splits. Deterministic
  across engines, runs, and cluster sizes (no RNG state, no row order
  dependence) — the property a training pipeline needs so a document never
  migrates between splits when the corpus grows. md5 keeps the DuckDB oracle
  bit-identical (same primitive as the dedup fingerprints).
- :func:`stratified_sample` — per-stratum Bernoulli sampling via
  ``DataFrame.sampleBy`` (seeded, deterministic given partitioning); rate
  correctness is pinned by tests, not an oracle (engine RNGs differ).

Both are map-only: no shuffle, linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_ingestion_spark.operators.text import hex_to_long


def hash_split_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string form."""
    c = F.col(key) if isinstance(key, str) else key
    return hex_to_long(F.md5(c.cast("string")), 1, 12) % buckets


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Add a ``split`` column. ``splits`` maps name -> percentage (must sum to
    100); default 90/5/5 train/val/test."""
    splits = splits or {"train": 90, "val": 5, "test": 5}
    assert sum(splits.values()) == 100, "split percentages must sum to 100"
    bucket = hash_split_bucket(key)
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (e.g. downweight overrepresented languages
    in a pretraining mix). Seeded and deterministic for a fixed partitioning."""
    return df.sampleBy(stratum_col, fractions, seed=seed)


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    components: DataFrame,
    splits: dict[str, int] | None = None,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: documents are split by their near-dup COMPONENT id (from
    ``dedup.connected_components``), not their own id, so every member of a
    duplicate cluster lands in the same split. A benchmark doc's near-copy
    sitting in train is exactly the contamination a per-doc hash split
    permits and this closes — the standard eval-integrity requirement for
    pretraining corpora.

    ``components`` is (id, component); docs absent from it (singletons by
    construction in sparse component relations) split by their own id, which
    IS their component under the min-reachable-id convention. One left join
    (AQE broadcasts the component relation when small — pair-graph components
    are tiny next to the corpus) + the same md5-bucket split as
    :func:`hash_split`; growth-stable for the same reason.
    """
    comp = components.select(
        F.col(components.columns[0]).alias(id_col),
        F.col("component").alias("_comp"),
    )
    joined = df.join(comp, on=id_col, how="left")
    key = F.coalesce(F.col("_comp"), F.col(id_col))
    splits = splits or {"train": 90, "val": 5, "test": 5}
    assert sum(splits.values()) == 100, "split percentages must sum to 100"
    bucket = hash_split_bucket(key)
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return joined.withColumn("split", expr).drop("_comp")

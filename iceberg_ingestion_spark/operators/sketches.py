"""Approximate (sketch-based) analytics: cardinality and quantiles.

At 100 TB, exact COUNT(DISTINCT) and exact quantiles force wide shuffles of
the full key set; sketches trade bounded error for one map-side pass +
constant-size merge. These wrap Spark's built-ins (HyperLogLog++ and the
Greenwald-Khanna epsilon-approximate quantile) with the error contract stated
and pinned by tests — they have no cross-engine oracle because sketch
implementations differ by engine (the driver records rows-only for such ops;
the exact counterparts in the query suite are the correctness anchors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """HLL++ distinct count per group; relative standard deviation ``rsd``
    (memory per group ~ 1/rsd², independent of cardinality)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float],
    relative_error: float = 0.01,
) -> DataFrame:
    """Greenwald-Khanna approximate quantiles per group: rank error bounded by
    ``relative_error * n`` with sketch size O(1/relative_error).

    Output is one SCALAR row per (group, probability): ``(*group_cols,
    probability, value)`` — never an array column, so results sort/hash
    cleanly in any downstream harness (arrays are unhashable in pandas
    canonicalization)."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    agg = df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, probabilities, int(1.0 / relative_error)
        ).alias("_qs")
    )
    return agg.select(
        *group_cols, F.posexplode("_qs").alias("_i", "value")
    ).select(
        *group_cols,
        F.element_at(probs, F.col("_i") + 1).alias("probability"),
        "value",
    )

"""Skew-mitigation primitives: salted aggregation and salted broadcast join.

AQE's skew-join splitting handles sort-merge joins, but two shapes still
hot-spot at 100 TB and need explicit salting:

- a groupBy where one key holds a double-digit percentage of all rows
  (the classic zipfian user/domain): salt -> partial agg -> final agg turns
  one monster partition into ``n_salts`` even ones, at the cost of a second
  (tiny) shuffle of partial results;
- a broadcast join against a skewed *build* side is fine, but a shuffle join
  with one hot key needs the hot side exploded against a salted replica.

Both are pure DataFrame compositions — no custom partitioner, so they compose
with AQE and whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    agg_cols: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for decomposable aggregates (sum/count/min/max):
    phase 1 groups on (key, random-ish salt) so a hot key spreads over
    ``n_salts`` reducers; phase 2 re-aggregates the ``n_salts`` partials.

    ``agg_cols`` maps output name -> phase-1 aggregate expression; phase 2
    re-combines with SUM for sums/counts. (For min/max pass the matching
    combiner yourself — this helper targets the sum/count hot path.)
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    phase1 = (
        df.withColumn(SALT_COL, salt)
        .groupBy(*key_cols, SALT_COL)
        .agg(*[expr.alias(name) for name, expr in agg_cols.items()])
    )
    return phase1.groupBy(*key_cols).agg(
        *[F.sum(name).alias(name) for name in agg_cols]
    )


def low_cardinality_top_n(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    salt_on: str | None = None,
    fanout: int = 64,
) -> DataFrame:
    """Exact top-``n`` rows per group when the group key is LOW-CARDINALITY —
    the shape where a plain ``Window.partitionBy(group)`` funnels the whole
    relation through #groups tasks (5 market segments = 5 tasks for 100 TB).

    Two-phase distributed selection, same stance as ``exact_quantiles``:

    1. rank within (group, salt) — ``fanout`` x #groups window partitions,
       spread across the cluster; keep each partition's local top-``n``;
    2. re-rank the surviving ``#groups * fanout * n`` candidate rows (driver-
       scale, not data-scale) within the group alone.

    Exactness: every global top-``n`` row is its (group, salt) partition's
    local top-``n``, so phase 1 never discards a winner. ``order_cols`` must
    be a TOTAL order (include a key column) for deterministic results. The
    salt is a deterministic row hash (``salt_on`` names a single column to
    hash instead, e.g. the key) so re-runs rank identically. Adds one extra
    (tiny) shuffle over the naive window — the price of not serializing on
    #groups at scale.
    """
    salt_inputs = [F.col(salt_on)] if salt_on else [F.col(c) for c in df.columns]
    salt = F.pmod(F.hash(*salt_inputs), F.lit(fanout))
    w_local = Window.partitionBy(*group_cols, SALT_COL).orderBy(*order_cols)
    w_final = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(SALT_COL, salt)
        .withColumn("_local_rank", F.row_number().over(w_local))
        .filter(F.col("_local_rank") <= n)
        .withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= n)
        .drop(SALT_COL, "_local_rank")
    )


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with explicit hot-key salting: the big side's hot rows get
    a random salt, the small side's hot rows are exploded ``n_salts`` times so
    every salted partition finds its match; cold keys join normally (salt 0).

    ``hot_keys`` comes from a cheap pre-pass (e.g. approx top-k of the key
    histogram) or from AQE skew metrics of a previous run."""
    hot = F.col(key).isin(hot_keys)
    big_salted = big.withColumn(
        SALT_COL,
        F.when(hot, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts)))
        .otherwise(F.lit(0)),
    )
    small_salted = small.withColumn(
        SALT_COL,
        F.when(hot, F.sequence(F.lit(0), F.lit(n_salts - 1))).otherwise(F.array(F.lit(0))),
    ).withColumn(SALT_COL, F.explode(SALT_COL))
    return big_salted.join(small_salted, on=[key, SALT_COL], how=how).drop(SALT_COL)

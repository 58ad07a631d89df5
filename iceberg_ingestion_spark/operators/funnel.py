"""Ordered funnel analysis over an event stream table.

For a stage sequence (e.g. view -> click -> purchase), a user converts to
stage k when an event of type k occurs AT OR AFTER their earliest conversion
to stage k-1. One aggregation pass per stage, each a conditional min on the
user key (same shuffle partitioning reused across passes — Catalyst plans a
single exchange chain). Timestamps are integers, so min() is exact and the
operator oracles cleanly across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """One row per user: ``t_<stage>`` = earliest timestamp completing each
    stage in order (NULL once the funnel is dropped)."""
    out = None
    prev_t = None
    for i, stage in enumerate(stages):
        tcol = f"t_{stage}"
        if i == 0:
            stage_min = (
                events.filter(F.col(type_col) == stage)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(tcol))
            )
            out = stage_min
        else:
            joined = events.filter(F.col(type_col) == stage).join(
                out.select(user_col, F.col(prev_t)), user_col
            )
            stage_min = (
                joined.filter(F.col(ts_col) >= F.col(prev_t))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(tcol))
            )
            out = out.join(stage_min, user_col, "left")
        prev_t = tcol
    return out


WEEK_US = 7 * 24 * 3600 * 1_000_000
DAY_US = 24 * 3600 * 1_000_000


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    max_offset: int = 3,
    bucket_us: int = WEEK_US,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity bucket (week by
    default; pass ``bucket_us=DAY_US`` for daily cohorts), counted per bucket
    offset (0..max_offset) in which they were active again.

    Pure integer arithmetic (epoch-µs floor-division into buckets) so the
    result is exact on any engine. Shape: per-user min -> per-(user, bucket)
    distinct -> pivot on offset. Output: cohort_week, then ``w0..wN`` columns.
    """
    first = events.groupBy(user_col).agg(
        F.floor(F.min(ts_col) / F.lit(bucket_us)).alias("cohort_week")
    )
    active = events.select(
        user_col, F.floor(F.col(ts_col) / F.lit(bucket_us)).alias("week")
    ).distinct()
    offsets = (
        active.join(first, user_col)
        .withColumn("offset", (F.col("week") - F.col("cohort_week")).cast("int"))
        .filter(F.col("offset").between(0, max_offset))
        .select(user_col, "cohort_week", "offset")
        .distinct()
    )
    return (
        offsets.groupBy("cohort_week")
        .pivot("offset", list(range(max_offset + 1)))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "cohort_week",
            *[F.col(str(i)).alias(f"w{i}") for i in range(max_offset + 1)],
        )
    )


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """(stage, stage_index, n_users) — how many users reach each stage in
    order."""
    times = funnel_stage_times(events, stages, user_col, type_col, ts_col)
    counts = times.agg(
        *[F.count(f"t_{s}").alias(f"n_{s}") for s in stages]
    )
    spark = events.sparkSession
    rows = counts.first()
    return spark.createDataFrame(
        [(s, i + 1, rows[f"n_{s}"]) for i, s in enumerate(stages)],
        "stage string, stage_index int, n_users long",
    )

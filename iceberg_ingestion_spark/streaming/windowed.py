"""Watermarked windowed aggregation over an event stream.

The batch engine's sessionize/rollup analytics have a continuous analogue:
tumbling event-time windows with a watermark bounding state and dropping
too-late rows. Append output mode means a window row is emitted exactly once,
when the watermark passes the window end — the contract a downstream table
sink wants (no in-place updates to reconcile).

Scale notes: state is one aggregate row per (window, event_type) per key —
bounded by the watermark horizon, independent of stream length. Skewed keys
shuffle like any groupBy; AQE does not apply inside streaming micro-batches,
so the shuffle-partition count is the knob that matters here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-window, per-event-type counts and value sums with late-data cutoff.

    Rows later than ``watermark_delay`` behind the max observed event time are
    dropped; windows finalize (and emit, in append mode) once the watermark
    passes their end.
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )

"""Watermarked stream-stream interval join.

The batch engine's binned interval join (``operators/interval.py``:
click-within-2h-after-error) has a continuous analogue: Structured
Streaming's stream-stream inner join with watermarks on BOTH sides and a
time-range join condition. The range condition is what lets the engine
garbage-collect state: an error row can only ever match clicks in
``[error.ts, error.ts + max_lag)``, so once the click-side watermark passes
``error.ts + max_lag`` the buffered error row is dropped. State is bounded
by (watermark delay + lag horizon) × arrival rate — independent of stream
length; without the range condition the same join would buffer both streams
forever.

Shuffle shape matches the batch operator: both sides hash-partition on
``user_id`` (the equi half of the condition), the range half evaluates
within partitions. AQE does not run inside micro-batches, so the
shuffle-partition count is the sizing knob.

Batch/stream parity is pinned by tests/test_streaming_windowed_stateful.py:
the same drops through this join and through the batch composition produce
identical bags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    events: DataFrame,
    primary_type: str = "click",
    interval_type: str = "error",
    max_lag: str = "2 hours",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Pairs of (primary, interval-opening) events for the same user where
    the primary lands in ``[open.ts, open.ts + max_lag)`` — the streaming
    twin of ``interval.events_interval_join``. ``events`` is a streaming
    DataFrame with (event_id, ts, user_id, event_type); both filtered
    branches carry their own watermark.
    """
    p = (
        events.where(F.col("event_type") == primary_type)
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    i = (
        events.where(F.col("event_type") == interval_type)
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("user_id").alias("i_user_id"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("i_ts"),
        )
    )
    cond = (
        (F.col("p_user_id") == F.col("i_user_id"))
        & (F.col("p_ts") >= F.col("i_ts"))
        & (F.col("p_ts") < F.col("i_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return p.join(i, cond, "inner").select(
        F.col("p_user_id").alias("user_id"),
        "click_id",
        "error_id",
        (F.unix_micros("p_ts") - F.unix_micros("i_ts")).alias("us_after_error"),
    )

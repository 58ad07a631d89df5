"""Streaming exact deduplication with bounded state.

The batch engine's exact_dedup (hash-groupBy) has a streaming analogue with a
crucial scale twist: unbounded ``dropDuplicates`` state grows forever, so the
watermark variant keeps a key in state only until the event-time watermark
passes — the standard shape for at-least-once sources (Kinesis/Kafka replays,
DMS re-drops) feeding a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exact_dedup_stream(
    stream: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Drop rows whose ``subset`` key was already seen within the watermark
    horizon. State is O(keys per horizon), not O(stream); duplicates arriving
    later than ``watermark_delay`` after the original are NOT caught — pick the
    delay to cover the source's replay window."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        subset
    )

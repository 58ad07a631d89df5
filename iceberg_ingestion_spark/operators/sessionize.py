"""Event sessionization: gap-based sessions over an event stream table.

Batch analogue of streaming session windows (SURVEY §7.5): a session breaks
when the gap to the previous event of the same user exceeds ``gap_seconds``.
Two windows over one shuffle on user_id: lag to flag session starts, running
sum to number sessions; then one aggregation per session.

At 100 TB: the shuffle key is user_id (naturally high-cardinality, low skew);
both window passes and the final groupBy share the same partitioning, so
Catalyst plans a single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: float = 8 * 3600.0,
) -> DataFrame:
    """Assign ``session_index`` (1-based per user) to every event."""
    order = [F.col(ts_col), F.col(order_tiebreak)]
    w = Window.partitionBy(user_col).orderBy(*order)
    epoch = F.col(ts_col).cast("double")
    prev = F.lag(epoch).over(w)
    is_start = F.when(
        prev.isNull() | ((epoch - prev) > F.lit(gap_seconds)), 1
    ).otherwise(0)
    wcum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("_start", is_start).withColumn(
        "session_index", F.sum("_start").over(wcum)
    ).drop("_start")


def normalize_per_user(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user z-score normalization of ``value_col`` via grouped-map
    ``applyInPandas`` — the batch grouped-map shape (one Arrow batch per key
    group) for per-entity feature normalization in a training pipeline.

    Numpy double math (mean/std are reduction-order dependent, so this is
    pinned by tests, not a bit-exact oracle). Groups shuffle on the user key;
    skewed users are the usual salting candidates (operators/skew.py)."""
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in events.schema.fields)
    schema += ", value_z double"

    def norm(pdf):
        v = pdf[value_col].to_numpy()
        sd = v.std()
        pdf = pdf.copy()
        pdf["value_z"] = (v - v.mean()) / sd if sd > 0 else 0.0
        return pdf

    return events.groupBy(user_col).applyInPandas(norm, schema=schema)


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 8 * 3600.0,
) -> DataFrame:
    """One row per session: event count, distinct event types, value sum,
    start/end, duration in seconds."""
    s = sessionize(events, user_col=user_col, ts_col=ts_col, gap_seconds=gap_seconds)
    return s.groupBy(user_col, "session_index").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double"))).alias(
            "duration_sec"
        ),
    )

"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with a lag/cumulative-sum window
(operators/sessionize.py); streams can't look ahead, so the continuous form
keeps one open session per user in state and closes it when an event arrives
more than ``gap`` after the last one. Closed sessions are emitted exactly once
(output mode append); the open tail session stays in state.

This is the pattern for any custom stateful operator the built-in streaming
aggregates can't express (per-key HLL, decaying counters, CEP-ish matching):
group by key, Arrow-batch the group's rows into pandas, fold them through a
typed state tuple.

Late data: events arriving with ts older than the open session's last-seen
timestamp are dropped (they cannot rewind or re-extend state) — the poor
man's watermark for cross-batch disorder; within a batch, events are sorted.

Scale notes: state size is O(active keys), not O(events). With
``watermark_delay`` set, idle sessions flush via an EVENT-TIME TIMEOUT
(``GroupStateTimeout.EventTimeTimeout``): each update arms a timeout at
``last_event + gap``; when the stream's watermark passes it, the open session
is emitted and its state removed — without waiting for the key's next event
(which for a churned user never comes, so without the timeout that state —
and the session — would be held forever).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

#: open-session state: (start_us, last_ts_us, n_events)
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(
    stream: DataFrame, gap_us: int, watermark_delay: str | None = None
) -> DataFrame:
    """Emit (user_id, session_start_us, session_end_us, n_events) for every
    session closed by a later event arriving > ``gap_us`` after it.

    Input stream needs columns ``user_id: long`` and ``ts_us: long``.

    ``watermark_delay`` (e.g. ``"1 hour"``): enable the event-time timeout —
    a session idle past the gap is flushed once the watermark (max event time
    minus the delay) passes ``last_event + gap``, instead of staying open
    until the key's next event. Required for bounded state under key churn.
    """

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        if watermark_delay is not None and state.hasTimedOut:
            # Watermark passed last + gap with no new events: the open session
            # can never be extended (anything older would be late-dropped) —
            # flush it exactly once and clear the key's state.
            state.remove()
            if last is not None:
                yield pd.DataFrame(
                    [(user_id, start, last, n)],
                    columns=["user_id", "session_start_us", "session_end_us", "n_events"],
                )
            return
        closed: list[tuple[int, int, int, int]] = []
        ts_all = sorted(int(t) for pdf in pdfs for t in pdf["ts_us"])
        # Late-data guard: an event older than the stored last timestamp would
        # rewind `last` and could re-extend (or mis-close) the open session.
        # Events are ordered within a batch by the sort above, but only the
        # state carries order ACROSS micro-batches — drop anything behind it.
        if last is not None:
            ts_all = [t for t in ts_all if t >= last]
        for ts in ts_all:
            if last is not None and ts - last > gap_us:
                closed.append((user_id, start, last, n))
                start, n = ts, 0
            if start is None:
                start = ts
            last = ts
            n += 1
        state.update((start, last, n))
        if watermark_delay is not None and last is not None:
            # Arm the idle flush: fires when the watermark passes last + gap.
            state.setTimeoutTimestamp((last + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )

    timeout = GroupStateTimeout.NoTimeout
    if watermark_delay is not None:
        # EventTimeTimeout requires a watermark on an event-time column; the
        # stream carries integer microseconds, so derive one.
        stream = stream.withColumn(
            "_event_ts", F.timestamp_micros(F.col("ts_us"))
        ).withWatermark("_event_ts", watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    return stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )

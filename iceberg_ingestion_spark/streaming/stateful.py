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

Scale notes: state size is O(active keys), not O(events). For production add
an event-time timeout (GroupStateTimeout.EventTimeTimeout) so idle sessions
flush when the watermark passes, instead of waiting for the key's next event.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
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


def sessionize_stream(stream: DataFrame, gap_us: int) -> DataFrame:
    """Emit (user_id, session_start_us, session_end_us, n_events) for every
    session closed by a later event arriving > ``gap_us`` after it.

    Input stream needs columns ``user_id: long`` and ``ts_us: long``.
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
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

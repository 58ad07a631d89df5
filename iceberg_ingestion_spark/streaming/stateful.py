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


SEQUENCE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("matched_at_us", LongType()),
        StructField("match_seq", LongType()),
    ]
)

#: per-key automaton state: (next stage index, last processed ts, matches so far)
SEQUENCE_STATE = StructType(
    [
        StructField("stage_idx", LongType()),
        StructField("last_us", LongType()),
        StructField("n_matches", LongType()),
    ]
)


def sequence_detect_stream(
    stream: DataFrame,
    stages: list[str],
    reset_types: list[str] = (),
) -> DataFrame:
    """Continuous ordered-pattern detection (the streaming counterpart of
    ``funnel.sequence_match``'s journey regex, CEP-style): emit a row the
    moment a user completes ``stages`` in order — e.g. view → click →
    purchase — where any ``reset_types`` event (e.g. an error) in between
    aborts the attempt, matching the batch pattern ``v[^e]*c[^e]*p``.

    Input stream needs ``user_id: long``, ``event_type: string``,
    ``ts_us: long``. Output: (user_id, matched_at_us, match_seq) per
    completed, NON-OVERLAPPING match (the automaton restarts at stage 0
    after emitting — the greedy leftmost semantics a funnel alert wants).

    Scale posture — the reason this exists instead of "rerun the batch regex
    per batch": per-key state is THREE INTEGERS (automaton stage, last ts,
    match count), not the journey string, which grows with user activity and
    would make a regex-over-state approach unbounded. Events advance the
    automaton one at a time: stage-matching event → advance (emit + restart
    on the final stage); reset-type event → back to stage 0; anything else —
    including uncoded types — is ignored, exactly like the batch regex's
    ``[^e]*`` wildcard over coded events. Within a batch events process in
    (ts_us, arrival) order; across batches the stored ``last_us`` drops
    older late arrivals (the same poor-man's-watermark contract as
    ``sessionize_stream``; add ``withWatermark`` upstream to bound
    disorder). Batch/stream parity and split-invariance are pinned in
    tests/test_streaming_windowed_stateful.py.
    """
    if len(set(stages)) != len(stages):
        # the advance rule keys each event type to ONE stage index; a stage
        # list like [a, b, a] needs a real NFA, not this three-int automaton
        raise ValueError(f"sequence_detect_stream: stages must be distinct, got {stages}")
    stage_of = {s: i for i, s in enumerate(stages)}
    resets = set(reset_types)
    n_stages = len(stages)

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            stage_idx, last, n_matches = state.get
        else:
            stage_idx, last, n_matches = 0, None, 0
        # (ts, event_id, type) — the same total order as the batch operator's
        # journey string; event_id is optional in the stream schema (ties
        # then break on the type string, still deterministic)
        events: list[tuple[int, int, str]] = sorted(
            (int(t), int(i), str(e))
            for pdf in pdfs
            for t, i, e in zip(
                pdf["ts_us"],
                pdf["event_id"] if "event_id" in pdf.columns else [0] * len(pdf),
                pdf["event_type"],
            )
        )
        if last is not None:
            events = [ev for ev in events if ev[0] >= last]
        matches: list[tuple[int, int, int]] = []
        for ts, _i, et in events:
            last = ts
            if et in resets:
                stage_idx = 0
            elif stage_of.get(et) == stage_idx:
                stage_idx += 1
                if stage_idx == n_stages:
                    n_matches += 1
                    matches.append((user_id, ts, n_matches))
                    stage_idx = 0
        state.update((stage_idx, last, n_matches))
        if matches:
            yield pd.DataFrame(
                matches, columns=["user_id", "matched_at_us", "match_seq"]
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SEQUENCE_OUTPUT,
        stateStructType=SEQUENCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

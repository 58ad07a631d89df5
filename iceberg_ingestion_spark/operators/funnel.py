"""Ordered funnel analysis over an event stream table.

For a stage sequence (e.g. view -> click -> purchase), a user converts to
stage k when an event of type k occurs AT OR AFTER their earliest conversion
to stage k-1. ONE shuffle total: group the (stage-relevant) events per user,
then each stage time is a conditional ``array_min`` expression over the
per-user event array referencing the previous stage's column — the sequential
dependency between stages becomes expression chaining on one row instead of a
join chain (the previous implementation's k-stage plan was ~2k shuffles on
the user key; at suite scale the per-stage exchange overhead dominated the
actual work). Timestamps are integers, so min() is exact and the operator
oracles cleanly across engines.

Scale note: per-user state is the user's own stage-relevant events — bounded
by per-user activity, the same invariant sessionization already relies on; a
pathological single user with millions of events would need a pre-aggregation
(per (user, stage) min-candidates) before the group-by.
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
    """One row per user WHO ENTERED THE FUNNEL (has a stage-0 event):
    ``t_<stage>`` = earliest timestamp completing each stage in order (NULL
    once the funnel is dropped). Users with only later-stage events (e.g. a
    click but never a view) emit no row — pinned so the single-shuffle
    rewrite keeps the original join-chain row contract."""
    ev = events.filter(F.col(type_col).isin(list(stages)))
    out = ev.groupBy(user_col).agg(
        F.collect_list(
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
        ).alias("_evs")
    )
    prev_t = None
    for i, stage in enumerate(stages):
        tcol = f"t_{stage}"
        if i == 0:
            matches = F.filter("_evs", lambda e: e["et"] == stage)
        else:
            p = F.col(prev_t)
            matches = F.when(
                p.isNotNull(),
                F.filter("_evs", lambda e: (e["et"] == stage) & (e["ts"] >= p)),
            )
        out = out.withColumn(
            tcol, F.array_min(F.transform(matches, lambda e: e["ts"]))
        )
        prev_t = tcol
    return out.drop("_evs").filter(F.col(f"t_{stages[0]}").isNotNull())


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


def sequence_match(
    events: DataFrame,
    pattern: str,
    codes: dict[str, str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """MATCH_RECOGNIZE-style ordered pattern detection per user: encode each
    event type as one character (``codes``), build the user's journey string
    in exact (ts, tiebreak) order, and test it against a regex ``pattern``
    (e.g. ``'v[^e]*c[^e]*p'`` = view, then click, then purchase, with no
    error anywhere between view and purchase). Spark has no MATCH_RECOGNIZE;
    this is the engine's equivalent for order-sensitive behavioral queries
    that funnels (which only look at earliest-completion times) can't
    express — "did X happen WITHOUT Y in between" is the canonical case.

    Emits (user, n_events, journey, matched). ONE shuffle: group events per
    user, sort the per-user array, join to a string, regex it — the same
    bounded-per-user-state invariant as sessionization/funnels. The journey
    string is one char per stage-relevant event, so memory per user is bytes,
    not structs. Unknown event types (no code) are excluded.

    Determinism: ordering is total via the integer (ts, tiebreak) pair, codes
    are fixed single chars, regex is anchored only as written — identical
    semantics in DuckDB via string_agg(... ORDER BY ts, tiebreak) +
    regexp_matches, so the operator oracles exactly.
    """
    if not codes:
        raise ValueError("sequence_match: codes must be non-empty")
    code_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in codes.items() for x in kv]),
        F.col(type_col),
    )
    per_user = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            code_expr.alias("_c"),
        )
        .filter(F.col("_c").isNotNull())
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(ts_col, tiebreak_col, "_c"))
                    ),
                    lambda e: e["_c"],
                ),
                "",
            ).alias("journey"),
        )
    )
    return per_user.select(
        user_col,
        "n_events",
        "journey",
        F.col("journey").rlike(pattern).alias("matched"),
    )

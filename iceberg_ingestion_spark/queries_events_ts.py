"""LLM-pipeline driver queries: sessionization, event-time analytics
(interval/gap-fill/anomaly/rolling/TWAP/funnel/sequence/histogram/cohort),
train-split counts, SCD2, JSON props, windowed HLL and edit-distance dedup
(split out of queries_ext.py in round 5 — pure mechanical move)."""

from __future__ import annotations

from iceberg_ingestion_spark.queries_text_dedup import *  # noqa: F401,F403

def q_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_us(spark, sf_dir)
    s = sessionize.sessionize(
        ev, user_col="user_id", ts_col="ts_us", gap_seconds=SESSION_GAP_US
    )
    out = s.groupBy("user_id", "session_index").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
    )
    return out.select(
        "user_id", "session_index", "n_events",
        F.date_format(F.timestamp_micros(F.col("start_us")), TS_FMT_SPARK + "SSS").alias(
            "session_start"
        ),
        "duration_us", "n_purchases",
    )


def q_sessionize_user_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_us(spark, sf_dir)
    s = sessionize.sessionize(
        ev, user_col="user_id", ts_col="ts_us", gap_seconds=SESSION_GAP_US
    )
    return s.groupBy("user_id").agg(
        F.max("session_index").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
    )


def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval join: every click landing inside a same-user 2-hour
    error window [error_ts, error_ts + 2h). The bin-explode + equi-join plan
    is the scale story — a naive BETWEEN theta-join degrades to
    BroadcastNestedLoopJoin (plan-pinned in tests/test_operators.py); this one
    hash-partitions on (user_id, bin) like any keyed join."""
    from iceberg_ingestion_spark.operators.interval import interval_join

    two_hours_us = 2 * 3600 * 1_000_000
    ev = read_events_us(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts_us"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + F.lit(two_hours_us)).alias("end_us"),
    )
    j = interval_join(
        clicks, errors, "ts_us", "start_us", "end_us",
        key_cols=["user_id"], bin_width=float(two_hours_us),
    )
    return j.select(
        "user_id", "click_id",
        F.col("iv_error_id").alias("error_id"),
        (F.col("ts_us") - F.col("iv_start_us")).alias("us_after_error"),
    )


#: Day buckets for the time-series entries (events span 30 days).
TS_BUCKET_US = 24 * 3600 * 1_000_000
ANOMALY_Z = 2.0


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample: per-user daily last-value series over each
    user's observed span, gaps filled by last-observation-carried-forward
    (``operators/timeseries.resample_locf``)."""
    from iceberg_ingestion_spark.operators.timeseries import resample_locf

    ev = read_events_us(spark, sf_dir)
    return resample_locf(
        ev, ["user_id"], "ts_us", "value",
        bucket_us=TS_BUCKET_US, tiebreak_cols=["event_id"],
    )


def q_events_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily volume anomalies: bucket count vs the user's own
    mean + 2σ (population σ from integer sums — oracle-exact doubles)."""
    from iceberg_ingestion_spark.operators.timeseries import count_anomaly_flags

    ev = read_events_us(spark, sf_dir)
    return count_anomaly_flags(
        ev, ["user_id"], "ts_us", bucket_us=TS_BUCKET_US, z=ANOMALY_Z
    )


ROLLING_DAYS = 7


def q_events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event counts with a trailing-7-day rolling total via a
    RANGE frame on the day index — value-based framing, so activity gaps
    never silently widen the time span the way a ROWS frame would. Window
    partitions are per-key daily relations (bounded by active days), never
    the corpus; counts are integers, so the rolling sums are cross-engine
    exact."""
    from iceberg_ingestion_spark.operators.timeseries import rolling_bucket_counts

    ev = read_events_us(spark, sf_dir)
    return rolling_bucket_counts(
        ev, ["user_id"], "ts_us", bucket_us=TS_BUCKET_US, window_buckets=ROLLING_DAYS
    )


def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value`` (step-function semantics,
    exact decimal·µs weighted sum, one double division at the end)."""
    from iceberg_ingestion_spark.operators.timeseries import time_weighted_avg

    ev = read_events_us(spark, sf_dir)
    return time_weighted_avg(
        ev, ["user_id"], "ts_us", "value", tiebreak_cols=["event_id"]
    )


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel over events (integer-exact mins,
    one conditional aggregation per stage)."""
    from iceberg_ingestion_spark.operators.funnel import funnel_counts

    ev = read_events_us(spark, sf_dir)
    return funnel_counts(ev, ["view", "click", "purchase"])


#: Single-char journey codes + the pattern for the sequence-match entry:
#: view, later a click, later a purchase, with NO error anywhere between the
#: matched view and purchase — the order-sensitive query funnels can't ask.
SEQ_CODES = {"view": "v", "click": "c", "purchase": "p", "error": "e", "signup": "s"}
SEQ_PATTERN = "v[^e]*c[^e]*p"


def q_events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style ordered pattern detection per user (one grouped
    journey string per user in exact (ts, event_id) order, then a regex)."""
    from iceberg_ingestion_spark.operators.funnel import sequence_match

    ev = read_events_us(spark, sf_dir)
    return sequence_match(ev, SEQ_PATTERN, SEQ_CODES)


def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI-scored collocations over the corpus (integer counts, single
    double division, total tie-break order — exact across engines)."""
    d = read_table(spark, sf_dir, "documents", spread=True)
    return text.pmi_top_collocations(d, min_count=5, k=50)


#: Fixed-width histogram bin for the value-histogram entry (value in [0, 330)
#: in the generated data; bins are exact integer floors, so counts oracle
#: bit-identically).
HIST_BIN_WIDTH = 25


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``value`` per event type — the engine's
    histogram primitive: bin = floor(value / width) computed as an integer,
    ONE groupBy shuffle on (event_type, bin), counts + decimal-exact bin
    sums. The bin column is data, not a pivot — cardinality is bounded by
    range/width, so the result relation stays tiny at any corpus scale."""
    ev = read_events_us(spark, sf_dir)
    bin_ = F.floor(F.col("value") / HIST_BIN_WIDTH).cast("long")
    return (
        ev.groupBy("event_type", bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .withColumn("bin_lo", (F.col("bin") * HIST_BIN_WIDTH).cast("double"))
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention counts (integer day buckets, pivot on offset)."""
    from iceberg_ingestion_spark.operators.funnel import DAY_US, cohort_retention

    ev = read_events_us(spark, sf_dir)
    return cohort_retention(ev, max_offset=3, bucket_us=DAY_US)


# ---------------------------------------------------------------------------
# Dataset splits
# ---------------------------------------------------------------------------

def q_data_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible hash-based train/val/test split: per (split, lang) counts.
    A document's split never changes as the corpus grows (content-hash
    bucketing, no RNG)."""
    from iceberg_ingestion_spark.operators.sampling import hash_split

    d = read_table(spark, sf_dir, "documents", spread=True)
    return hash_split(d, "doc_id").groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )



# ---------------------------------------------------------------------------
# r4 late additions: mergeable-sketch windows, SCD2, JSON props, edit-distance
# ---------------------------------------------------------------------------

#: Datasketches HLL lgConfigK for the windowed entry; relative std-dev is the
#: standard HLL bound 1.04 / sqrt(2^lgk) (~1.6% at lgk=12).
HLL_LGK = 12
HLL_RSD = 1.04 / (2 ** (HLL_LGK / 2))


def q_sketch_hll_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day from MERGEABLE per-day HLL
    sketches (``hll_sketch_agg`` + ``hll_union_agg``): the raw events are
    scanned once into constant-size daily sketches; every window answer is a
    union of 7 sketches — at 100 TB the windowed rollup moves kilobytes per
    day instead of re-shuffling the (day, user) pair set per window.

    Bound-check form (sketch estimates are engine-specific):
    ``(bucket, exact_users_7d, within_3rsd)`` with the exact windowed
    distinct computed in-query and the HLL estimate asserted within 3 rsd."""
    from iceberg_ingestion_spark.operators.sketches import hll_sliding_distinct

    ev = read_events_us(spark, sf_dir).select(
        F.expr(f"ts_us div {TS_BUCKET_US}").alias("bucket"), "user_id"
    )
    approx = hll_sliding_distinct(
        ev, "bucket", "user_id", window_buckets=ROLLING_DAYS, lgk=HLL_LGK
    )
    pairs = ev.distinct()
    anchors = pairs.select("bucket").distinct()
    exact = (
        pairs.select(
            F.explode(
                F.sequence(F.col("bucket"), F.col("bucket") + (ROLLING_DAYS - 1))
            ).alias("bucket"),
            "user_id",
        )
        .join(anchors, "bucket", "left_semi")
        .groupBy("bucket")
        .agg(F.countDistinct("user_id").alias("exact_users_7d"))
    )
    return approx.join(exact, "bucket").select(
        "bucket",
        "exact_users_7d",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_users_7d"))
            / F.col("exact_users_7d")
            <= 3 * HLL_RSD
        ).alias("within_3rsd"),
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build over the CDC fixture history: first-load rows
    plus every CDC insert/update image become validity-ranged versions
    (half-open [valid_from, valid_to), ``is_current`` on the open one) — the
    warehouse complement to the reference's keep-latest-only merge
    (reference ``iceberg.py:203-216`` dedups to rn=1; SCD2 keeps every
    version). One window over the natural key — the same shuffle key the
    whole calculus uses."""
    from iceberg_ingestion_spark.changes import scd2_from_history

    orders = read_table(spark, sf_dir, "orders")
    day1 = fixtures.orders_day1(orders)
    cdc_iu = fixtures.orders_cdc(orders).filter(F.col("op") != "D").drop("op")
    hist = day1.unionByName(cdc_iu)
    return scd2_from_history(hist, ["o_orderkey"], "o_orderdate").select(
        *fixtures.ORDERS_COLS, "valid_from", "valid_to", "is_current"
    )


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON ``props``
    column with ``get_json_object`` (JVM-side JSON path, no Python) and
    aggregate per event type. Integer-only outputs (count/sum/min/max), so
    values are cross-engine exact."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


#: Edit-similarity threshold for the verified near-dup pairs: distance at
#: most 1/5 of the longer text (edit similarity >= 0.8).
EDIT_NUM, EDIT_DEN = 1, 5
#: Candidate radius for the edit-distance entry. The hamming radius is the
#: recall/cost knob of the operator: the Levenshtein DP is O(len^2) PER
#: CANDIDATE, so candidate volume — set by the radius and the corpus's
#: signature density — is the entire cost model. On this template-generated
#: corpus simhash signatures concentrate (4.3% of ALL pairs collide within
#: hamming 4 — organic text is orders of magnitude sparser), so the entry
#: pins the tight radius; the operator takes any radius.
EDIT_MAX_HAMMING = 2


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup dedup: SimHash pigeonhole banding generates
    the candidate pairs (equi-join, zero false negatives within the hamming
    radius), then exact Levenshtein verifies edit similarity >= 0.8 on
    whitespace-normalized text. The quadratic edit-distance kernel only ever
    touches the banded candidate set — never all pairs."""
    d = read_table(spark, sf_dir, "documents", spread=True)
    # per-item banding is the corpus-appropriate default here (signatures are
    # nearly distinct at every driver SF; measured min-of-2 at sf0.1: 2.9s
    # per-item vs 3.5s grouped — the grouped form's expansion joins buy
    # nothing without duplicates). For duplicate-heavy corpora swap in
    # dedup.simhash_pairs_grouped — byte-identical candidate set
    # (pytest-pinned), flat join cost in clique size (--phash curve).
    cand = dedup.simhash_pairs(
        text.simhash60(d, "doc_id"), "doc_id", max_hamming=EDIT_MAX_HAMMING
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return dedup.edit_distance_pairs(
        cand, d, "doc_id", norm, max_dist_num=EDIT_NUM, max_dist_den=EDIT_DEN
    )




DAY_US = 86_400_000_000


def q_events_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-exposed STREAMING evidence #2: the Spark side EXECUTES one
    real Structured Streaming ``availableNow`` drain of
    ``streaming.windowed.windowed_event_stats`` — a file-source event feed
    processed as four per-file time-ordered micro-batches
    (maxFilesPerTrigger=1), watermarked tumbling 1-day windows, APPEND
    output mode into a parquet sink — and returns the finalized window
    rows. The feed arrives as two time-ordered halves (so the second batch
    exercises a carried-forward watermark), then two far-future SENTINEL
    events: append mode only emits a window once the watermark passes its
    end, so the sentinels push the watermark past every real window and
    the trailing no-data micro-batch flushes them. (The multi-drain
    restart form — watermark + state restore across separate start()s —
    is pytest-pinned in tests/test_streaming_windowed_stateful.py.) The
    sentinel rows are feed plumbing, not data — whether their own windows
    finalize depends on how the runtime schedules its flush batches, so
    the result contract keeps only windows starting at or before the last
    REAL event (the injected rows sit days past it; no event-type name is
    reserved).

    ``value`` sums use the exact decimal·1e6 integer scaling (the TWAP
    convention) so the per-window sum is an order-independent BIGINT — the
    oracle is the plain batch tumbling-window GROUP BY. State at scale is
    one row per (window, event_type) inside the watermark horizon,
    independent of stream length."""
    import os as _os
    import tempfile

    from iceberg_ingestion_spark.streaming.windowed import windowed_event_stats

    ev = read_events_us(spark, sf_dir)
    v_micro = (
        F.col("value").cast("decimal(18,6)") * F.lit(1_000_000).cast("decimal(7,0)")
    ).cast("long")
    feed_df = ev.select(
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        F.col("event_type"),
        v_micro.alias("value"),
    )
    lo, hi = feed_df.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2

    root = tempfile.mkdtemp(prefix="stream_win_")
    feed, ckpt, out = (
        _os.path.join(root, "feed"),
        _os.path.join(root, "ckpt"),
        _os.path.join(root, "out"),
    )

    def sentinel(ts_expr: str):
        return spark.range(1).select(
            F.expr(ts_expr).alias("ts"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0).cast("long").alias("value"),
        )

    # drops written in TIME ORDER and mtime-STAMPED per drop (ADVICE r11:
    # file-source batch order follows mtime, and an mtime tie between drops
    # could replay them inverted — advancing the watermark past real events
    # and silently dropping their windows as late data; the explicit
    # strictly-increasing stamps make the replay order deterministic)
    from iceberg_ingestion_spark.streaming.feed import write_drops

    # all four drops (two time-ordered halves + the two far-future
    # sentinels) in ONE write job (r13 — the per-drop filter+write loop
    # scanned the event feed once per half). The drop index is a pure
    # function of ts: real events are <= hi, the sentinels sit at exactly
    # hi + 4d / hi + 8d.
    write_drops(
        feed_df.unionByName(sentinel(f"timestamp'{hi}' + interval 4 days"))
        .unionByName(sentinel(f"timestamp'{hi}' + interval 8 days")),
        F.when(F.col("ts") < F.lit(mid), F.lit(0))
        .when(F.col("ts") <= F.lit(hi), F.lit(1))
        .when(F.col("ts") <= F.expr(f"timestamp'{hi}' + interval 5 days"), F.lit(2))
        .otherwise(F.lit(3))
        .cast("int"),
        4,
        feed,
    )
    # one drain, one micro-batch per drop file; append mode still only
    # emits a window once the watermark passes its end, and the trailing
    # no-data micro-batch flushes after the sentinels push it. The
    # multi-drain restart form (carried-forward watermark + state restore
    # across start()s) is pytest-pinned (tests/test_streaming_windowed_stateful.py)
    stream = (
        spark.readStream.schema(feed_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        windowed_event_stats(stream, "ts", "1 day", "2 hours")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # a timed-out drain must FAIL the entry: a read of the partially-flushed
    # sink would silently return incomplete windows
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("events_stream_windowed: drain exceeded 300s")

    # sentinels are excluded by TIME, not by event_type: every real window
    # starts at or before the last real event, while the injected rows sit
    # >= 4 days past it — so a (hypothetical) legitimate event_type named
    # 'sentinel' in the data would still be counted, matching the oracle
    return (
        spark.read.parquet(out)
        .filter(F.col("window_start") <= F.lit(hi))
        .select(
            F.unix_micros("window_start").alias("window_start_us"),
            "event_type",
            "n_events",
            F.col("sum_value").alias("sum_value_micros"),
        )
    )

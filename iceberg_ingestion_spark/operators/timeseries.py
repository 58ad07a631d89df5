"""Time-series resampling and per-key anomaly flagging over event streams.

The hypertable/rollup family the reference-class engines expose as custom
operators is a composition of built-ins in Spark:

- :func:`resample_locf` — fixed-width bucket resampling with
  last-observation-carried-forward gap fill. The bucket grid is generated
  PER KEY over [min_bucket, max_bucket] (``sequence`` + ``explode``), so a
  key active for a week never pays for the corpus' full history — the
  exploded relation is Σ_key span_key/bucket, not |keys| × global_span.
  LOCF is one ``last(value, ignorenulls)`` running window per key: keys are
  high-cardinality (user/device/series ids), so the window partitioning is
  the natural parallelism, no low-cardinality serialization.
- :func:`count_anomaly_flags` — per-key volume anomalies: bucket counts vs
  the key's own mean/std, flagged at ``n > mean + z*std``. All statistics
  derive from integer sums (count, Σn, Σn²), so the doubles computed at the
  end are bit-identical across engines/partitionings — the operator is
  oracle-exact, unlike naive float accumulation.

Both are two-shuffle plans (bucket agg keyed by (key, bucket), then a per-key
window / agg); nothing driver-side, nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HOUR_US = 3600 * 1_000_000
DAY_US = 24 * HOUR_US


def bucket_of(ts_us: Column | str, bucket_us: int) -> Column:
    """Integer bucket index of a microsecond timestamp (floor division —
    exact for the non-negative epochs event data lives in)."""
    c = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    return (c - F.pmod(c, F.lit(bucket_us))) / F.lit(bucket_us)


def rolling_bucket_counts(
    df: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    bucket_us: int = DAY_US,
    window_buckets: int = 7,
) -> DataFrame:
    """Per-(key, bucket) event count plus the rolling sum over the trailing
    ``window_buckets`` buckets, using a RANGE frame on the bucket index.

    RANGE (value-based), not ROWS, is the point: with gaps in a key's
    activity a ROWS frame silently widens the trailing TIME span to whatever
    the last N occupied buckets cover; the RANGE frame keeps the window a
    fixed ``window_buckets`` time units regardless of gaps — the correct
    "events in the last 7 days" semantics.

    Plan: one aggregation keyed by (key, bucket) — uniform — then a per-key
    window over the (tiny) per-key daily relation: partitions are bounded by
    each key's active-day count, never the corpus. Counts are integers, so
    the rolling sums are cross-engine exact.
    """
    bucket = bucket_of(F.col(ts_us_col), bucket_us).cast("long").alias("bucket")
    daily = df.select(*key_cols, bucket).groupBy(*key_cols, "bucket").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rangeBetween(-(window_buckets - 1), 0)
    )
    return daily.withColumn("n_rolling", F.sum("n_events").over(w))


def resample_locf(
    df: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    value_col: str,
    bucket_us: int = DAY_US,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Resample ``value_col`` to one row per (key, bucket) over each key's
    observed [first, last] bucket range, carrying the last observed value
    forward through empty buckets.

    Within a bucket the kept observation is the one with the greatest
    (ts, *tiebreak) — pass ``tiebreak_cols`` (e.g. an event id) to make the
    choice total when timestamps can tie; determinism of the result requires
    it. Returns key_cols + (bucket, value, observed) where ``observed`` is
    False for gap rows the fill synthesized.
    """
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    bucket = bucket_of(ts_us_col, bucket_us).cast("long").alias("bucket")
    # last observation per occupied bucket: lexicographic struct max carries
    # the value along with its (ts, tiebreak) rank — one shuffle
    per_bucket = (
        df.select(*key_cols, bucket, F.struct(F.col(ts_us_col), *tb, F.col(value_col).alias("_v")).alias("_o"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("_o")["_v"].alias("_last_v"), F.max(F.lit(True)).alias("_obs"))
    )
    # per-key grid over the observed span; sequence+explode is bounded by the
    # key's own span, and empty buckets join to NULL then fill by LOCF
    spans = per_bucket.groupBy(*key_cols).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = spans.select(
        *key_cols, F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias("bucket")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_bucket, [*key_cols, "bucket"], "left")
        .select(
            *key_cols,
            "bucket",
            F.last("_last_v", ignorenulls=True).over(w).alias("value"),
            # join marker, not value-null-ness: a bucket observed with a NULL
            # value still counts as observed (its fill skips it by ignorenulls)
            F.coalesce(F.col("_obs"), F.lit(False)).alias("observed"),
        )
    )


def count_anomaly_flags(
    df: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    bucket_us: int = DAY_US,
    z: float = 2.0,
) -> DataFrame:
    """Per-(key, bucket) event counts flagged against the key's own volume
    distribution: ``is_anomaly`` when the bucket's count exceeds
    mean + z·std over that key's occupied buckets (population std).

    Exactness: mean and std are derived from the integer sums (Σn, Σn², #b)
    of the bucket counts, so the final doubles are reproducible bit-for-bit
    in any engine — no float accumulation order in play. Two shuffles:
    (key, bucket) count, then the per-key stats broadcast back via a window
    aggregate over the (small) per-bucket relation.
    """
    bucket = bucket_of(ts_us_col, bucket_us).cast("long").alias("bucket")
    counts = (
        df.select(*key_cols, bucket)
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy(*key_cols)
    n = F.col("n_events").cast("double")
    nb = F.count(F.lit(1)).over(w)
    mean = (F.sum("n_events").over(w) / nb).alias("mean_events")
    # population variance from integer sums: (Σn² - (Σn)²/#b) / #b
    sum_n = F.sum("n_events").over(w)
    sum_n2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    var = (sum_n2 - sum_n * sum_n / nb) / nb
    std = F.sqrt(var).alias("std_events")
    return counts.select(
        *key_cols,
        "bucket",
        "n_events",
        mean,
        std,
        (n > mean + F.lit(float(z)) * std).alias("is_anomaly"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_us_col: str,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key time-weighted average under step-function semantics: each
    observation holds its value until the next one, so
    twap = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first). The financial/telemetry
    average that event-count averages misstate when sampling is irregular.

    Exactness: the weighted sum is DECIMAL(value)·(µs duration) — exact
    integer×decimal arithmetic, order-independent — with ONE double division
    at the end, so results are engine-reproducible (a float accumulation
    would not be). Same-timestamp ties contribute zero-width segments;
    ``tiebreak_cols`` makes the which-value-spans-on choice total. Keys with
    a single observation (zero span) have no average and emit no row.
    One window (high-cardinality keys) + one aggregation.
    """
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_us_col), *tb)
    # exact integer arithmetic end-to-end: value quantized to micro-units
    # (x1e6, exact 6-dp decimal then long), weighted by the µs duration in
    # DECIMAL so no operand promotion can cross precision 38 (a raw long
    # promotes to 20 digits and Spark silently drops a scale digit there;
    # DuckDB's int64 decimal kernel overflows outright — integers sidestep
    # both). One double division chain at the very end.
    dur = (F.lead(ts_us_col).over(w) - F.col(ts_us_col)).cast("decimal(18,0)")
    v_micro = (
        F.col(value_col).cast("decimal(18,6)") * F.lit(1_000_000).cast("decimal(7,0)")
    ).cast("long")
    seg = df.select(
        *key_cols,
        F.col(ts_us_col),
        (v_micro.cast("decimal(18,0)") * dur).alias("_wv"),
    )
    agg = seg.groupBy(*key_cols).agg(
        F.sum("_wv").alias("_sum_wv"),
        (F.max(ts_us_col) - F.min(ts_us_col)).alias("span_us"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    return agg.filter(F.col("span_us") > 0).select(
        *key_cols,
        "n_obs",
        "span_us",
        # int -> STRING -> double, then ONE division by an explicitly-built
        # divisor. The string hop is load-bearing: wide-integer-to-double
        # casts are not correctly rounded in every engine (DuckDB's
        # HUGEINT->DOUBLE measurably lands 1 ulp off; BigDecimal.doubleValue
        # has the same hazard), while decimal-string parsing is correctly
        # rounded everywhere.
        (
            F.col("_sum_wv").cast("string").cast("double")
            / (F.lit(1_000_000.0) * F.col("span_us"))
        ).alias("twap"),
    )

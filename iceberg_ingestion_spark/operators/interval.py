"""Binned interval (range-containment) join — Spark's join menu lacks it.

A naive ``p.ts BETWEEN i.start AND i.end`` theta-join gives Catalyst nothing
to hash on: without an equi-key the physical plan degrades to
BroadcastNestedLoopJoin (or a cartesian product), O(|points| x |intervals|)
compares — the classic silent scale killer. The standard distributed fix
(used by every range-join-capable engine, e.g. the bin-bucketed range joins
in Databricks' runtime and the interval-bin strategy of genomic engines) is
to discretize time into fixed-width bins:

- each interval is exploded to the bins it overlaps (``sequence(floor(s/w),
  floor(e/w))`` — ~len/w + 1 rows),
- each point maps to exactly ONE bin (``floor(ts/w)``),
- candidates come from an EQUI-join on (key..., bin) — hash-partitionable,
  AQE-skew-splittable, no nested loop anywhere in the plan (test-pinned),
- the exact ``s <= ts < e`` predicate filters bin-collision false positives.

Because the join hits only the point's own bin, a (point, interval) pair can
match at most once — no post-join dedup. Bin width trades explode factor
(long intervals / small bins) against bin occupancy (short bins / hot
buckets): pick w ~ the typical interval length.

Composition-over-UDF stance per SURVEY §7.5 — the whole plan is built-in
expressions inside WholeStageCodegen; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "_iv_bin"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    key_cols: list[str] | None = None,
    bin_width: float = 600.0,
    prefix: str = "iv_",
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start_ts <= point_ts < end_ts`` (half-open) and equal ``key_cols``.

    ``bin_width`` is in the unit of the ts columns after ``cast("double")``:
    seconds for TIMESTAMP columns, the column's own unit for numerics (e.g.
    microseconds for an epoch-µs bigint — exact under double below 2^53).

    Output: all point columns + every interval column ``prefix``-ed (key
    columns appear once, unprefixed). Intervals with ``end <= start`` are
    empty under half-open semantics and can never match.
    """
    key_cols = key_cols or []
    pb = points.withColumn(
        _BIN, F.floor(F.col(point_ts).cast("double") / F.lit(float(bin_width)))
    )
    iv = intervals
    for c in iv.columns:
        if c not in key_cols:
            iv = iv.withColumnRenamed(c, prefix + c)
    ib = iv.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(prefix + start_ts).cast("double") / F.lit(float(bin_width))),
                F.floor(F.col(prefix + end_ts).cast("double") / F.lit(float(bin_width))),
            )
        ),
    )
    return (
        pb.join(ib, [*key_cols, _BIN])
        .filter(
            (F.col(point_ts) >= F.col(prefix + start_ts))
            & (F.col(point_ts) < F.col(prefix + end_ts))
        )
        .drop(_BIN)
    )

"""As-of (backward) join — an operator Spark's join menu lacks, expressed as a
composition of built-in operators (SURVEY §7.5 stance: composition before UDF).

For each left row, attach the right row with the greatest ``right_ts <=
left_ts`` for the same key. Implemented as a union merge-scan: tag both sides,
sort within each key partition by (ts, side) and carry the latest right payload
forward with ``last(..., ignorenulls=True)``. This is one shuffle on the key —
no range-explosion join, no per-row lookups — and at 100 TB it scales exactly
like any keyed window (AQE handles skewed keys; a salting pass can pre-split
monster keys).

The right payload is packed into a single struct so a legitimately-NULL value
column can't be skipped over: the struct itself is non-null for every right row.

Ties: right rows sort before left rows at equal ts (<= semantics). Multiple
right rows with the same (key, ts) are ambiguous — pre-aggregate the right side
to one row per (key, ts) for deterministic output (asof_join does not do this
for you; see tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_VAL = "_asof_val"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of left join. Output: every left row + ``prefix``-ed
    ``value_cols`` and ``prefix + right_ts`` from the latest right row at or
    before the left row's timestamp (NULLs when no such row exists)."""
    payload = [right_ts, *value_cols]
    lt = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(1))
        .withColumn(_VAL, F.lit(None).cast(
            "struct<" + ",".join("`%s` %s" % (c, dict(right.dtypes)[c]) for c in payload) + ">"
        ))
    )
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*payload).alias(_VAL),
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.withColumn(_VAL, F.last(_VAL, ignorenulls=True).over(w))
    out = filled.filter(F.col(_SIDE) == 1)
    for c in payload:
        out = out.withColumn(prefix + c, F.col(_VAL).getField(c))
    return out.drop(_SIDE, _TS, _VAL)

"""Incremental aggregate maintenance from a changelog (IVM).

A per-key aggregate table (the materialized GROUP BY every warehouse keeps)
can be maintained from the row-level changelog the sink already exposes
(``changes.build_changelog`` / ``ParquetVersionedSink.read_changes`` — the
Iceberg changelog-scan analogue) WITHOUT rescanning the base table: each
changelog row contributes ``+x`` (INSERT / UPDATE_AFTER) or ``-x``
(DELETE / UPDATE_BEFORE) to its key's running aggregate. This is classic
incremental view maintenance for distributive aggregates (sum / count, and
avg as sum÷count at read time) — the 100 TB path for keeping daily rollups
current costs O(|changelog|), not O(|base|).

Plan shape: one shuffle of the (small) changelog to per-key deltas, one
key-equi full-outer join against the aggregate table — AQE broadcasts the
delta side in the daily case. Exactness requires commutative addition:
money columns must come in as DECIMAL (caller's cast), never float.

Correctness contract (pinned by the driver oracle): maintained(agg(v1),
changelog(v1→v2)) == agg(v2) recomputed from scratch — bag-equal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_ingestion_spark.changes import (
    CHANGE_TYPE_COL,
    CT_DELETE,
    CT_INSERT,
    CT_UPDATE_AFTER,
    CT_UPDATE_BEFORE,
)

ROW_COUNT_COL = "n_rows"


def changelog_deltas(
    changelog: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column],
) -> DataFrame:
    """Per-key signed deltas of the given sums plus the row-count delta."""
    sign = (
        F.when(F.col(CHANGE_TYPE_COL).isin(CT_INSERT, CT_UPDATE_AFTER), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin(CT_DELETE, CT_UPDATE_BEFORE), F.lit(-1))
        # an unrecognized change type silently contributing 0 would corrupt
        # the rollup without a trace — fail the task loudly instead
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("changelog_deltas: unknown change type "),
                    F.col(CHANGE_TYPE_COL),
                )
            )
        )
    )
    return changelog.groupBy(*keys).agg(
        *[F.sum(sign * col).alias(name) for name, col in sum_cols.items()],
        F.sum(sign).alias(ROW_COUNT_COL),
    )


def apply_changelog_to_agg(
    agg: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column],
) -> DataFrame:
    """Maintain ``agg`` (columns: keys + ``sum_cols`` names + ``n_rows``)
    with a changelog of the base table. Keys whose row count drops to zero
    vanish (a group with no rows has no aggregate row); brand-new keys
    appear. Returns the updated aggregate table, same schema as ``agg``.
    """
    deltas = changelog_deltas(changelog, keys, sum_cols)
    a, d = agg.alias("a"), deltas.alias("d")
    joined = a.join(d, on=keys, how="full_outer")

    def _upd(name: str) -> Column:
        return (
            F.coalesce(F.col(f"a.{name}"), F.lit(0))
            + F.coalesce(F.col(f"d.{name}"), F.lit(0))
        ).alias(name)

    out = joined.select(
        *keys,
        *[_upd(name) for name in sum_cols],
        _upd(ROW_COUNT_COL),
    )
    return out.filter(F.col(ROW_COUNT_COL) > 0)

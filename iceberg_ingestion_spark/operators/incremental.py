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


# ---------------------------------------------------------------------------
# Two-sided join maintenance: V = γ(R ⋈ S) when BOTH inputs change
# ---------------------------------------------------------------------------

SIGN_COL = "_sign"


def changelog_sign(changelog: DataFrame) -> DataFrame:
    """Signed-bag form of a changelog: ``+1`` rows entering (INSERT /
    UPDATE_AFTER), ``-1`` rows leaving (DELETE / UPDATE_BEFORE), change-type
    column replaced by ``_sign``. Unknown types fail loudly (same stance as
    :func:`changelog_deltas`)."""
    sign = (
        F.when(F.col(CHANGE_TYPE_COL).isin(CT_INSERT, CT_UPDATE_AFTER), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin(CT_DELETE, CT_UPDATE_BEFORE), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("changelog_sign: unknown change type "),
                    F.col(CHANGE_TYPE_COL),
                )
            )
        )
    )
    return changelog.withColumn(SIGN_COL, sign).drop(CHANGE_TYPE_COL)


def join_changelog(
    r_old: DataFrame,
    ch_r: DataFrame,
    s_old: DataFrame,
    ch_s: DataFrame,
    on: list[str],
) -> DataFrame:
    """The signed changelog of ``R ⋈ S`` (equi-join on ``on``) from the two
    sides' changelogs — the bag-algebra delta rule

        Δ(R ⋈ S) = ΔR ⋈ S_old  ∪  R_old ⋈ ΔS  ∪  ΔR ⋈ ΔS

    with signs multiplying in the cross term (an UPDATE_BEFORE meeting an
    UPDATE_BEFORE contributes +1: the old-old pairing is removed twice by
    the first two legs and restored once here). Feed the result to
    :func:`apply_signed_changelog_to_agg` to maintain any distributive
    rollup of the join without rescanning either input.

    Cost at scale: three equi-joins whose left/right sizes are
    |ΔR|·|S|, |R|·|ΔS|, |ΔR|·|ΔS| RELATION-wise — i.e. the big base tables
    are each touched once as a join PROBE side keyed by the join key, and
    AQE broadcasts whichever changelog is small (the daily case). No
    full-table aggregation is recomputed.
    """
    dr = changelog_sign(ch_r)
    ds = changelog_sign(ch_s)
    dr_s = dr.withColumnRenamed(SIGN_COL, "_sign_r")
    ds_s = ds.withColumnRenamed(SIGN_COL, "_sign_s")
    leg_r = dr.join(s_old, on=on, how="inner")
    leg_s = r_old.join(ds, on=on, how="inner")
    leg_rs = (
        dr_s.join(ds_s, on=on, how="inner")
        .withColumn(SIGN_COL, F.col("_sign_r") * F.col("_sign_s"))
        .drop("_sign_r", "_sign_s")
    )
    return leg_r.unionByName(leg_s).unionByName(leg_rs)


def apply_signed_changelog_to_agg(
    agg: DataFrame,
    signed: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column],
) -> DataFrame:
    """Maintain ``agg`` (keys + ``sum_cols`` names + ``n_rows``) with a
    SIGNED changelog (rows carrying ``_sign`` ±1, e.g. from
    :func:`join_changelog`). Same vanish/appear contract as
    :func:`apply_changelog_to_agg`."""
    deltas = signed.groupBy(*keys).agg(
        *[
            F.sum(F.col(SIGN_COL) * col).alias(name)
            for name, col in sum_cols.items()
        ],
        F.sum(SIGN_COL).alias(ROW_COUNT_COL),
    )
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


def refresh_dirty_keys(
    agg: DataFrame,
    base_new: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    agg_exprs: dict[str, Column],
) -> DataFrame:
    """Maintain a rollup with NON-invertible aggregates (min / max /
    count-distinct / top-k...) — the aggregates signed deltas cannot
    maintain: a DELETE of a key's current max forces a look at that key's
    remaining rows, full stop. The standard answer, implemented here: only
    the changelog's DIRTY keys are re-aggregated from the new base, merged
    with the untouched rows of the old rollup.

    Cost shape: one distinct over the changelog's keys (delta-sized), one
    left-semi of the base against the dirty set (the base is READ but only
    dirty-key rows reach the aggregation shuffle — with the base partitioned
    or clustered on the key prefix the read itself prunes; AQE broadcasts
    the dirty set in the daily case), one anti-join pass-through of the old
    rollup. O(|dirty keys' rows|) aggregation instead of O(|base|), and the
    untouched 99% of the rollup is never recomputed.

    ``agg_exprs`` maps output column name -> aggregate expression over
    ``base_new``; the old ``agg`` must carry the same columns. Keys whose
    rows all vanished disappear (they aggregate to no row).
    """
    dirty = changelog.select(*keys).distinct()
    recomputed = (
        base_new.join(dirty, on=keys, how="left_semi")
        .groupBy(*keys)
        .agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
    )
    untouched = agg.join(dirty, on=keys, how="left_anti")
    return untouched.unionByName(recomputed)

"""merge_snapshot_fused must be bag-equal to the leg-based composition
(build_changeset + merge_dataframes) across every toggle combination."""

from __future__ import annotations

import itertools

import pytest

from iceberg_ingestion_spark import fixtures
from iceberg_ingestion_spark.changes import build_changeset
from iceberg_ingestion_spark.merge import merge_dataframes, merge_snapshot_fused
from iceberg_ingestion_spark.model import HARD_DELETED_COL, ChangeSpec, MergeOptions
from iceberg_ingestion_spark.validate import bag_diff

SPEC = ChangeSpec(natural_keys=("o_orderkey",), updated_at_fields=("o_orderdate",))
TS = "2026-08-13 02:00:00"


@pytest.fixture(scope="module")
def days(spark):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").cache()
    return fixtures.orders_day1(orders).cache(), fixtures.orders_day2(orders).cache()


@pytest.mark.parametrize(
    "keep_deletes,include_deletes,insert,update,delete,ts",
    [
        pytest.param(kd, inc, i, u, d, ts, id=f"kd={kd}-inc={inc}-i={i}-u={u}-d={d}-ts={ts is not None}")
        for kd, inc, i, u, d, ts in itertools.product(
            [False, True], [False, True], [False, True], [False, True], [False, True], [None, TS]
        )
    ],
)
def test_fused_equals_leg_path(spark, days, keep_deletes, include_deletes, insert, update, delete, ts):
    day1, day2 = days
    options = MergeOptions(insert=insert, update=update, delete=delete, keep_deletes=keep_deletes)
    changes = build_changeset(
        day2, day1, SPEC,
        options=options,
        ingestion_ts=ts,
        include_deletes=include_deletes,
        soft_delete_col=HARD_DELETED_COL if keep_deletes else None,
    )
    legs = merge_dataframes(day1, changes, SPEC, keep_deletes=keep_deletes)
    fused = merge_snapshot_fused(
        day1, day2, SPEC,
        options=options,
        ingestion_ts=ts,
        include_deletes=include_deletes,
        keep_deletes=keep_deletes,
        soft_delete_col=HARD_DELETED_COL if keep_deletes else None,
    )
    assert sorted(legs.columns) == sorted(fused.columns)
    assert bag_diff(legs, fused.select(*legs.columns)).count() == 0


def test_fused_idempotent_on_soft_deleted_target(spark, days):
    """A second full run over a soft-deleted table must leave the tombstones
    untouched (the delete leg excludes already-deleted rows)."""
    day1, day2 = days
    options = MergeOptions(keep_deletes=True)
    once = merge_snapshot_fused(
        day1, day2, SPEC, options=options, keep_deletes=True,
        soft_delete_col=HARD_DELETED_COL,
    ).cache()
    twice = merge_snapshot_fused(
        once, day2, SPEC, options=options, keep_deletes=True,
        soft_delete_col=HARD_DELETED_COL,
    )
    assert bag_diff(once, twice.select(*once.columns)).count() == 0

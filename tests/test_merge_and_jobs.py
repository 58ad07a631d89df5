"""Merge application + composite job modes (SURVEY §2.12) against the
versioned-parquet sink, including the reference's own invariant: after any
full-load sequence the target is bag-equal to the source (iceberg.py:291-301),
and idempotency (re-running the same batch changes nothing — guaranteed by the
strict-> update condition)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.fixtures import orders_cdc, orders_day1, orders_day2
from iceberg_ingestion_spark.jobs import IngestionJob
from iceberg_ingestion_spark.merge import merge_dataframes
from iceberg_ingestion_spark.model import (
    ChangeSpec,
    IngestionType,
    MergeOptions,
    TablePolicy,
)
from iceberg_ingestion_spark.queries import ORDERS_SPEC
from iceberg_ingestion_spark.sinks import ParquetVersionedSink
from iceberg_ingestion_spark.validate import diff_count

TS = datetime.fromisoformat("2026-08-13T02:00:00")
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").cache()


def _job(spark, warehouse, **opts):
    sink = ParquetVersionedSink(spark, warehouse)
    return IngestionJob(sink, ORDERS_SPEC, TablePolicy(), MergeOptions(**opts)), sink


def test_full_load_then_merge_matches_source(spark, warehouse, orders):
    """Reference invariant: target == source after full merge (iceberg.py:291-301)
    — holds when every changed row bumps its updated-at field, so neutralize the
    fixture's touched-but-same-timestamp rows (k%10==4) first."""
    job, sink = _job(spark, warehouse)
    name = "dev_clean_t.orders"
    k = F.col("o_orderkey")
    day1 = orders_day1(orders)
    day2_clean = orders_day2(orders).withColumn(
        "o_totalprice",
        F.when(k % 10 == 4, F.col("o_totalprice") - F.lit(1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    job.run(day1, name, IngestionType.FULL, TS)
    job.run(day2_clean, name, IngestionType.FULL, TS)
    assert job.test(day2_clean, name) == 0
    assert sink.current_version(name) == 2


def test_full_merge_strictness_leaves_touched_rows(spark, warehouse, orders):
    """Rows whose payload changed but whose updated-at did NOT bump are not
    merged (strict >, reference iceberg.py:162) — the bag diff vs the source is
    exactly those rows, both directions."""
    job, _ = _job(spark, warehouse)
    name = "dev_clean_t.orders"
    day1, day2 = orders_day1(orders), orders_day2(orders)
    job.run(day1, name, IngestionType.FULL, TS)
    job.run(day2, name, IngestionType.FULL, TS)
    touched = day2.filter(F.col("o_orderkey") % 10 == 4).count()
    assert job.test(day2, name) == 2 * touched


def test_full_merge_is_idempotent(spark, warehouse, orders):
    job, sink = _job(spark, warehouse)
    name = "dev_clean_t.orders"
    day2 = orders_day2(orders)
    job.run(orders_day1(orders), name, IngestionType.FULL, TS)
    job.run(day2, name, IngestionType.FULL, TS)
    before = sink.read(name).orderBy("o_orderkey").collect()
    job.run(day2, name, IngestionType.FULL, TS)  # same batch again
    after = sink.read(name).orderBy("o_orderkey").collect()
    assert before == after


def test_incremental_keeps_missing_rows(spark, warehouse, orders):
    job, sink = _job(spark, warehouse)
    name = "dev_clean_t.orders"
    day1, day2 = orders_day1(orders), orders_day2(orders)
    job.run(day1, name, IngestionType.INCREMENTAL, TS)
    job.run(day2, name, IngestionType.INCREMENTAL, TS)
    # deleted keys (k%20==11) survive incremental mode (iceberg.py:177-178)
    survivors = sink.read(name).filter(F.col("o_orderkey") % 20 == 11).count()
    assert survivors == day1.filter(F.col("o_orderkey") % 20 == 11).count()
    assert survivors > 0


def test_soft_delete_flags_instead_of_removing(spark, warehouse, orders):
    job, sink = _job(spark, warehouse, keep_deletes=True)
    name = "dev_clean_t.orders"
    day1, day2 = orders_day1(orders), orders_day2(orders)
    job.run(day1, name, IngestionType.FULL, TS)
    job.run(day2, name, IngestionType.FULL, TS)
    tbl = sink.read(name)
    deleted = tbl.filter(F.col("hard_deleted"))
    assert deleted.count() == day1.filter(F.col("o_orderkey") % 20 == 11).count()
    # validation excludes soft-deleted rows (iceberg.py:297-298); the only
    # remaining diff is the touched-not-newer rows (strict >), both directions.
    touched = day2.filter(F.col("o_orderkey") % 10 == 4).count()
    assert job.test(day2, name) == 2 * touched


def test_cdc_merge(spark, warehouse, orders):
    job, sink = _job(spark, warehouse)
    name = "dev_clean_t.orders"
    day1 = orders_day1(orders)
    job.run(day1, name, IngestionType.FULL, TS)
    job.run(orders_cdc(orders), name, IngestionType.CDC, TS)
    tbl = sink.read(name).cache()
    # D keys removed
    assert tbl.filter(F.col("o_orderkey") % 10 == 6).count() == 0
    # I keys present
    assert tbl.filter(F.col("o_orderkey") % 10 == 7).count() > 0
    # U keys took the LATEST cdc row (+20.0 price)
    orig = {r.o_orderkey: r.o_totalprice for r in orders.filter(F.col("o_orderkey") % 10 == 2).collect()}
    got = {r.o_orderkey: r.o_totalprice for r in tbl.filter(F.col("o_orderkey") % 10 == 2).collect()}
    assert got == {k: v + 20.0 for k, v in orig.items()}


def test_cdc_first_load_drops_op(spark, warehouse, orders):
    job, sink = _job(spark, warehouse)
    name = "dev_clean_t.orders_cdc_first"
    job.run(orders_cdc(orders), name, IngestionType.CDC, TS)
    assert "op" not in sink.read(name).columns  # iceberg.py:131-132


def test_replace_mode(spark, warehouse, orders):
    job, sink = _job(spark, warehouse)
    name = "dev_clean_t.orders"
    job.run(orders_day1(orders), name, IngestionType.REPLACE, TS)
    job.run(orders_day2(orders), name, IngestionType.REPLACE, TS)
    assert job.test(orders_day2(orders), name) == 0


def test_merge_dataframes_requires_unique_keys_upstream(spark):
    """MERGE semantics assume at most one change row per key (Iceberg raises on
    ambiguous matches; our calculus guarantees it via dedup_latest)."""
    spec = ChangeSpec(("id",), ("ts",))
    target = spark.createDataFrame([(1, 1, "t")], "id long, ts long, payload string")
    changes = spark.createDataFrame(
        [(1, 2, "a", "U"), (2, 3, "b", "I")], "id long, ts long, payload string, op string"
    )
    got = merge_dataframes(target, changes, spec)
    assert {(r.id, r.payload) for r in got.collect()} == {(1, "a"), (2, "b")}


def test_diff_count_detects_drift(spark, orders):
    day1, day2 = orders_day1(orders), orders_day2(orders)
    assert diff_count(day1, day1) == 0
    assert diff_count(day1, day2) > 0


def test_diff_count_rejects_asymmetric_columns(spark, orders):
    """Schema drift is a validation failure, not something to project away: a
    target with an unexpected extra column (or missing a source column) must
    raise, or --test could report 0 despite the drift."""
    import pytest

    from pyspark.sql import functions as F

    day1 = orders_day1(orders)
    extra = day1.withColumn("surprise", F.lit(1))
    with pytest.raises(ValueError, match="surprise"):
        diff_count(day1, extra)
    with pytest.raises(ValueError, match="o_orderpriority"):
        diff_count(day1, day1.drop("o_orderpriority"))

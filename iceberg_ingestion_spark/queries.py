"""Headline queries: SURVEY §2 composite operators + analytics, each with a
DuckDB oracle.

Every entry in ``QUERIES`` has a Spark implementation ``(spark, sf_dir) ->
DataFrame`` and (where SQL-expressible) a DuckDB oracle in ``ORACLES`` computing
identical rows on the same parquet. Conventions that make cross-engine
value-hash comparison exact:

- timestamps are emitted as ``yyyy-MM-dd HH:mm:ss.SSS`` strings
  (DuckDB ``%Y-%m-%d %H:%M:%S.%g``);
- money aggregates are summed in exact DECIMAL and cast to double at the end
  (order-independent, bit-identical across engines); averages are computed as
  double/double division of those exact results;
- fixture arithmetic is addition-only on doubles (no rounding-mode hazards);
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_ingestion_spark import fixtures
from iceberg_ingestion_spark.changes import (
    build_changeset,
    dedup_latest,
    detect_deletes,
    detect_inserts,
    detect_updates,
)
from iceberg_ingestion_spark.merge import merge_dataframes
from iceberg_ingestion_spark.model import ChangeSpec
from iceberg_ingestion_spark.validate import bag_diff

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%g"

#: the ingestion-scenario ChangeSpec (FIXTURES.md group B)
ORDERS_SPEC = ChangeSpec(natural_keys=("o_orderkey",), updated_at_fields=("o_orderdate",))

#: fixed audit timestamp (FIXTURES.md B4)
INGESTION_TS = "2026-08-13 02:00:00"


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one testdata table. ``spread=True`` repartitions to the session's
    parallelism straight off the scan: the driver's parquet is a single row
    group, so without it every expression evaluated at the scan (shingling,
    hashing, vector folds) runs on ONE core. At real scale the scan yields
    thousands of splits and the repartition is a cheap narrow shuffle that
    guarantees compute-heavy projections never under-parallelize."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread:
        from iceberg_ingestion_spark.session import default_parallelism

        df = df.repartition(default_parallelism())
    return df


def _fmt_ts(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        if c in df.columns:
            df = df.withColumn(c, F.date_format(F.col(c), TS_FMT_SPARK))
    return df


def _orders_out(df: DataFrame) -> DataFrame:
    return _fmt_ts(df, "o_orderdate", "ingestion_datetime")


_ORDERS_OUT_SQL = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
    f"strftime(o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate, o_orderpriority"
)


# ---------------------------------------------------------------------------
# Change-calculus queries (SURVEY §2.4 J1/J2/J3, §2.6 W1)
# ---------------------------------------------------------------------------

def q_detect_inserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — left anti join (reference iceberg.py:167-170)."""
    orders = read_table(spark, sf_dir, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    return _orders_out(detect_inserts(day2, day1, ORDERS_SPEC))


def q_detect_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — reversed left anti join (reference iceberg.py:178-183)."""
    orders = read_table(spark, sf_dir, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    return _orders_out(detect_deletes(day2, day1, ORDERS_SPEC))


def q_detect_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — left semi join with strictly-newer theta conjunct (reference
    iceberg.py:162,189-194); touched-but-same-timestamp rows excluded."""
    orders = read_table(spark, sf_dir, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    return _orders_out(detect_updates(day2, day1, ORDERS_SPEC))


def q_cdc_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — latest-row-per-key window dedup (reference iceberg.py:203-216)."""
    orders = read_table(spark, sf_dir, "orders")
    return _orders_out(dedup_latest(fixtures.orders_cdc(orders), ORDERS_SPEC))


# ---------------------------------------------------------------------------
# Composite merge modes (SURVEY §2.12)
# ---------------------------------------------------------------------------

def _merged_full(orders: DataFrame) -> DataFrame:
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    changes = build_changeset(day2, day1, ORDERS_SPEC)
    return merge_dataframes(day1, changes, ORDERS_SPEC)


def q_snapshot_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 3 (full): I∪U∪D change-set merged into the target
    (reference iceberg.py:151-244)."""
    return _orders_out(_merged_full(read_table(spark, sf_dir, "orders")))


def q_snapshot_merge_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 3 (incremental): full merge minus the delete leg (reference
    iceberg.py:177-178), through the fused single-pass plan — the strategy the
    sink actually runs at scale. ``ingest_snapshot_merge_full`` stays on the
    leg-based composition as the reference-faithful pin; the fused/leg
    equivalence is swept across all toggles in tests/test_merge_fused.py."""
    from iceberg_ingestion_spark.merge import merge_snapshot_fused

    orders = read_table(spark, sf_dir, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    return _orders_out(
        merge_snapshot_fused(day1, day2, ORDERS_SPEC, include_deletes=False)
    )


def q_snapshot_merge_soft_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 3 with keep_deletes: deletes flip ``hard_deleted`` instead of
    removing rows (reference iceberg.py:127,224-227,241), through the fused
    single-pass plan (see q_snapshot_merge_incremental on why)."""
    from iceberg_ingestion_spark.merge import merge_snapshot_fused

    orders = read_table(spark, sf_dir, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    return _orders_out(merge_snapshot_fused(day1, day2, ORDERS_SPEC, keep_deletes=True))


def q_snapshot_merge_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 3 (full) through the single-pass fused merge (merge.py:
    merge_snapshot_fused) — one full-outer join instead of four target
    shuffles; oracle identical to the leg-based form (bag-equal by tests)."""
    from iceberg_ingestion_spark.merge import merge_snapshot_fused

    orders = read_table(spark, sf_dir, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    return _orders_out(merge_snapshot_fused(day1, day2, ORDERS_SPEC))


def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 4: CDC batch -> window dedup -> merge on source op
    (reference iceberg.py:203-244)."""
    orders = read_table(spark, sf_dir, "orders")
    day1 = fixtures.orders_day1(orders)
    changes = dedup_latest(fixtures.orders_cdc(orders), ORDERS_SPEC)
    return _orders_out(merge_dataframes(day1, changes, ORDERS_SPEC))


def q_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 1: CREATE OR REPLACE with audit stamp (reference iceberg.py:104-119)."""
    orders = read_table(spark, sf_dir, "orders")
    day2 = fixtures.orders_day2(orders).withColumn(
        "ingestion_datetime", F.lit(INGESTION_TS).cast("timestamp")
    )
    return _orders_out(day2)


def q_first_load_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode 2 on a CDC source: the op column is dropped on first load
    (reference iceberg.py:131-132)."""
    orders = read_table(spark, sf_dir, "orders")
    cdc = fixtures.orders_cdc(orders).drop("op").withColumn(
        "ingestion_datetime", F.lit(INGESTION_TS).cast("timestamp")
    )
    return _orders_out(cdc)


# ---------------------------------------------------------------------------
# Validation (SURVEY §2.8 U2 / §2.12.5)
# ---------------------------------------------------------------------------

def q_bag_diff_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — symmetric exceptAll between the merged table and... itself shifted:
    merged-full vs day2 differs exactly on the touched-not-updated rows
    (k%10==4, both directions), pinning strict-``>`` semantics
    (reference iceberg.py:291-301)."""
    orders = read_table(spark, sf_dir, "orders")
    merged = _merged_full(orders)
    day2 = fixtures.orders_day2(orders)
    return bag_diff(merged, day2).agg(F.count(F.lit(1)).alias("diff_count"))


def q_bag_diff_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — a table is bag-equal to itself (diff_count == 0), the reference's
    post-ingest assertion (salesforce.py:80-83)."""
    orders = read_table(spark, sf_dir, "orders")
    day2 = fixtures.orders_day2(orders)
    return bag_diff(day2, fixtures.orders_day2(orders)).agg(
        F.count(F.lit(1)).alias("diff_count")
    )


def q_changelog_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg changelog-scan analogue: net row-level changes between two
    committed table versions (v1 = day1 first load, v2 = merged-full), typed
    INSERT / DELETE / UPDATE_BEFORE / UPDATE_AFTER. Unlike the ingest-time
    update leg, no ``updated_at`` contract — an update is a key in both
    versions whose payload differs (null-safe). The sink-backed path
    (``ParquetVersionedSink.read_changes``) commits real versions and is
    pinned by tests/test_sinks.py."""
    from iceberg_ingestion_spark.changes import build_changelog

    orders = read_table(spark, sf_dir, "orders")
    day1 = fixtures.orders_day1(orders)
    merged = _merged_full(orders)
    ch = build_changelog(day1, merged, list(ORDERS_SPEC.natural_keys))
    return _orders_out(ch)


def q_changelog_scan_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink-backed changelog scan with time travel: commit v1 (day1 first
    load) and v2 (day2 snapshot merge) through ``IngestionJob`` into a
    versioned-parquet sink, then count net changes per type from
    ``sink.read_changes(1, 2)`` — Iceberg's ``table_changes`` analogue
    executed against REAL committed versions (reference
    ``iceberg.py:104-149`` commit modes). ``ingest_changelog_versions``
    pinned the same calculus on in-memory fixtures; this entry drives the
    commit log + ``read_version`` time-travel path the pytest suite
    previously covered alone. The audit timestamp is the fixed fixture
    literal on both commits, so the changelog's payload compare (which
    includes audit columns) is deterministic."""
    import tempfile

    from iceberg_ingestion_spark.jobs import IngestionJob
    from iceberg_ingestion_spark.model import IngestionType, TablePolicy
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink

    orders = read_table(spark, sf_dir, "orders")
    sink = ParquetVersionedSink(spark, tempfile.mkdtemp(prefix="tt_wh_"))
    job = IngestionJob(sink, ORDERS_SPEC, TablePolicy())
    name = "dev_clean_tpch.orders_tt"
    ts = datetime.fromisoformat(INGESTION_TS.replace(" ", "T"))
    job.run(fixtures.orders_day1(orders), name, IngestionType.FULL, ts)
    job.run(fixtures.orders_day2(orders), name, IngestionType.FULL, ts)
    ch = sink.read_changes(name, 1, 2, list(ORDERS_SPEC.natural_keys))
    return ch.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def q_stream_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-exposed STREAMING evidence (VERDICT r4 next-round #5): the Spark
    side EXECUTES two real Structured Streaming runs of
    ``streaming.cdc_stream.stream_cdc_merge`` — a file-source feed drained
    with ``availableNow`` into a versioned parquet sink via ``foreachBatch``
    — and returns the final committed table. Batch 1 streams the day1
    snapshot (first-load create); batch 2 streams the CDC fixture (window
    dedup + merge). The oracle is the BATCH cdc-merge SQL over the same
    fixtures: batch/streaming parity is the module's core contract
    (previously pytest-only, tests/test_streaming.py).

    Restarting the query between file drops (same checkpoint) pins the batch
    boundary deterministically — the same pattern a scheduled
    ``availableNow`` backfill runs in production; the checkpoint guarantees
    batch 1's file is not reprocessed. The audit timestamp each micro-batch
    stamps is wall-clock, so the entry projects the payload columns only
    (same projection as ``ingest_cdc_merge``)."""
    import tempfile

    from iceberg_ingestion_spark.model import TablePolicy
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink
    from iceberg_ingestion_spark.streaming.cdc_stream import stream_cdc_merge

    orders = read_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="stream_cdc_")
    feed, ckpt = os.path.join(root, "feed"), os.path.join(root, "ckpt")
    day1 = fixtures.orders_day1(orders).withColumn("op", F.lit("I"))
    cdc = fixtures.orders_cdc(orders)
    schema = day1.schema
    sink = ParquetVersionedSink(spark, os.path.join(root, "wh"))
    name = "dev_clean_tpch.orders_stream"

    def drain(df) -> None:
        df.coalesce(1).write.mode("append").parquet(feed)
        q = stream_cdc_merge(
            spark, feed, schema, sink, name, ORDERS_SPEC, TablePolicy(),
            checkpoint_dir=ckpt,
        )
        # a timed-out drain must FAIL the entry: restarting against the same
        # checkpoint while this query runs, or reading the sink mid-commit,
        # would silently return a partially-merged table
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("ingest_stream_cdc_merge: drain exceeded 300s")

    drain(day1)
    drain(cdc)

    out = sink.read(name).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    )
    return _orders_out(out)


def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the per-customer order rollup of table
    version v1 (= day1 first load), maintained to v2 (= merged-full) by
    applying ONLY the v1→v2 changelog (``operators/incremental.py``) — never
    rescanning the base. The oracle recomputes the v2 rollup from scratch,
    so a green row IS the IVM correctness theorem (maintained == recomputed,
    bag-equal) on the driver's data. Cost at scale: O(|changelog|) + one
    key-equi join against the rollup, vs O(|base|) for the rescan. (This
    entry CONSTRUCTS the changelog inline from the deterministic fixtures so
    the oracle can mirror it; in production the changelog comes pre-computed
    from the sink — ``ParquetVersionedSink.read_changes`` / Iceberg's
    changelog scan — and the base is never touched.)"""
    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import apply_changelog_to_agg

    orders = read_table(spark, sf_dir, "orders")
    day1 = fixtures.orders_day1(orders)
    merged = _merged_full(orders)
    ch = build_changelog(day1, merged, list(ORDERS_SPEC.natural_keys))
    money = F.col("o_totalprice").cast("decimal(18,2)")
    agg_v1 = day1.groupBy("o_custkey").agg(
        F.sum(money).alias("total_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    out = apply_changelog_to_agg(agg_v1, ch, ["o_custkey"], {"total_price": money})
    return out.select(
        "o_custkey",
        F.col("total_price").cast("double").alias("total_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


def q_incremental_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM *through a join*: the per-market-segment rollup of
    ``orders ⋈ customer``, maintained v1→v2 by the delta rule for a static
    dimension — Δ(γ(R ⋈ S)) = γ(ΔR ⋈ S) when only the fact side changes.
    Each changelog row is enriched with its segment via a **broadcast** join
    against the dimension (the same plan the from-scratch rollup would use,
    but over O(|changelog|) rows instead of O(|base|)), then applied as
    signed deltas. The oracle recomputes the v2 joined rollup from scratch —
    a green row is the join-IVM correctness equality. At 100 TB this is the
    difference between touching a day's changelog and rescanning the fact
    table for every dashboard refresh."""
    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import apply_changelog_to_agg

    orders = read_table(spark, sf_dir, "orders")
    dim = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    day1 = fixtures.orders_day1(orders)
    merged = _merged_full(orders)
    ch = build_changelog(day1, merged, list(ORDERS_SPEC.natural_keys))
    money = F.col("o_totalprice").cast("decimal(18,2)")
    agg_v1 = (
        day1.join(F.broadcast(dim), day1["o_custkey"] == dim["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.sum(money).alias("total_price"), F.count(F.lit(1)).alias("n_rows"))
    )
    ch_seg = ch.join(F.broadcast(dim), ch["o_custkey"] == dim["c_custkey"])
    out = apply_changelog_to_agg(agg_v1, ch_seg, ["c_mktsegment"], {"total_price": money})
    return out.select(
        "c_mktsegment",
        F.col("total_price").cast("double").alias("total_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


def q_incremental_two_sided(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVM when BOTH join inputs change in the same tick: the per-segment
    rollup of orders ⋈ customer maintained through the full bag-algebra
    delta rule Δ(R⋈S) = ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS
    (``operators/incremental.join_changelog``). The fact side takes the
    day1→day2 snapshot changelog; the dimension side re-segments every 7th
    customer — so deltas land in segments whose fact rows ALSO moved. The
    oracle recomputes γ(orders_v2 ⋈ customer_v2) from scratch; a green row
    is the two-sided join-maintenance equality on the driver's data."""
    from iceberg_ingestion_spark.changes import build_changelog
    from iceberg_ingestion_spark.operators.incremental import (
        apply_signed_changelog_to_agg,
        join_changelog,
    )

    orders = read_table(spark, sf_dir, "orders")
    cust_v1 = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cust_v2 = cust_v1.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("MACHINERY")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    day1 = fixtures.orders_day1(orders)
    merged = _merged_full(orders)
    # the fact changelog's subtree is referenced by two delta legs and
    # re-evaluated per leg; measured A/B at sf0.1 shows a localCheckpoint
    # here is time-neutral-to-worse (materialization cost ≈ the saved
    # recompute), so the lineage is left intact — in production the
    # changelog arrives materialized from the sink anyway
    # (ParquetVersionedSink.read_changes / Iceberg changelog scan)
    ch_o = build_changelog(day1, merged, list(ORDERS_SPEC.natural_keys))
    ch_c = build_changelog(cust_v1, cust_v2, ["c_custkey"])
    money = F.col("o_totalprice").cast("decimal(18,2)")
    fact_cols = ["o_orderkey", "o_totalprice"]
    fact_v1 = day1.select(F.col("o_custkey").alias("c_custkey"), *fact_cols)
    ch_o_k = ch_o.select(
        F.col("o_custkey").alias("c_custkey"), *fact_cols, "_change_type"
    )
    agg_v1 = (
        fact_v1.join(cust_v1, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.sum(money).alias("total_price"), F.count(F.lit(1)).alias("n_rows"))
    )
    signed = join_changelog(fact_v1, ch_o_k, cust_v1, ch_c, on=["c_custkey"])
    out = apply_signed_changelog_to_agg(
        agg_v1, signed, ["c_mktsegment"], {"total_price": money}
    )
    return out.select(
        "c_mktsegment",
        F.col("total_price").cast("double").alias("total_price"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


#: Accepted priority domain for the expectations entry.
PRIORITY_DOMAIN = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def q_validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over orders in ONE scan
    (``validate.expectation_report``): null check, key uniqueness (window
    count over the high-cardinality key), range check, domain check — the
    dbt-test/Great-Expectations shape as a single Spark job. One rule
    (totalprice under an artificially low ceiling) is designed to FAIL so
    the report proves it actually counts violations rather than
    rubber-stamping."""
    from iceberg_ingestion_spark.validate import expectation_report
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    kc = F.count(F.lit(1)).over(Window.partitionBy("o_orderkey"))
    df = o.withColumn("_kc", kc)
    rules = {
        "orderkey_not_null": F.col("o_orderkey").isNotNull(),
        "orderkey_unique": F.col("_kc") == 1,
        "totalprice_positive": F.col("o_totalprice") > 0,
        "totalprice_under_100k": F.col("o_totalprice") < 100_000,
        "priority_in_domain": F.col("o_orderpriority").isin(*PRIORITY_DOMAIN),
    }
    return expectation_report(df, rules)


#: Columns profiled by the drift entry; the numeric subset gets decimal-exact
#: value sums (q1 convention), the rest profile with NULL sums.
DRIFT_COLUMNS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
_DRIFT_NUMERIC = {"o_orderkey", "o_custkey", "o_totalprice"}


def q_validate_drift_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot column-profile drift (``validate.profile_drift``)
    between the day1 and day2 ingest fixtures: per column, row / NULL /
    exact-distinct counts and decimal-exact sums for both sides plus the row
    delta — the publish-gate metrics a daily pipeline alerts on. One scan per
    side; the reshape runs on two 1-row aggregates."""
    from iceberg_ingestion_spark.validate import profile_drift

    orders = read_table(spark, sf_dir, "orders")
    day1, day2 = fixtures.orders_day1(orders), fixtures.orders_day2(orders)
    return profile_drift(day1, day2, DRIFT_COLUMNS)


def _drift_side_sql(rel: str, suffix: str) -> str:
    parts = []
    for c in DRIFT_COLUMNS:
        s = (
            f"CAST(SUM(CAST({c} AS DECIMAL(30,2))) AS DOUBLE)"
            if c in _DRIFT_NUMERIC
            else "CAST(NULL AS DOUBLE)"
        )
        parts.append(
            f'SELECT \'{c}\' AS "column", count(*) AS n_{suffix}, '
            f"CAST(count(*) FILTER ({c} IS NULL) AS BIGINT) AS n_null_{suffix}, "
            f"count(DISTINCT {c}) AS ndv_{suffix}, {s} AS sum_{suffix} FROM {rel}"
        )
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# Analytics (engine breadth + bench anchors; decimal-exact aggregation)
# ---------------------------------------------------------------------------

def _dec(c: str, p: int = 18) -> F.Column:
    return F.col(c).cast(f"decimal({p},2)")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem. Filter pushes to the parquet
    scan; sums are exact DECIMAL then cast to double."""
    l = read_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice", 12) * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 12))
    charge = disc_price * (F.lit(1).cast("decimal(12,2)") + _dec("l_tax", 12))
    out = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )
    return out


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 orders by revenue for one market segment.
    customer is broadcast-joined (small dim); deterministic tie-break by key."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    revenue = F.sum(
        _dec("l_extendedprice", 12) * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 12))
    ).cast("double")
    out = (
        # orders is fact-sized — shuffle join (AQE broadcast-converts when the
        # filtered side is small); customer is a dim — always broadcast.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )
    return _fmt_ts(out, "o_orderdate")


def q5_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier share the
    nation. All dims broadcast; single shuffle on the fact-side group keys."""
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice", 12) * (F.lit(1).cast("decimal(12,2)") - _dec("l_discount", 12))
    ).cast("double")
    out = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.alias("revenue"), F.count(F.lit(1)).alias("lineitem_count"))
    )
    return out


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ingest_detect_inserts": q_detect_inserts,
    "ingest_detect_deletes": q_detect_deletes,
    "ingest_detect_updates": q_detect_updates,
    "ingest_cdc_dedup_latest": q_cdc_dedup_latest,
    "ingest_snapshot_merge_full": q_snapshot_merge_full,
    "ingest_snapshot_merge_incremental": q_snapshot_merge_incremental,
    "ingest_snapshot_merge_soft_delete": q_snapshot_merge_soft_delete,
    "ingest_snapshot_merge_fused": q_snapshot_merge_fused,
    "ingest_cdc_merge": q_cdc_merge,
    "ingest_replace": q_replace,
    "ingest_first_load_cdc": q_first_load_cdc,
    "validate_bag_diff_strictness": q_bag_diff_clean,
    "validate_bag_diff_identity": q_bag_diff_identity,
    "ingest_changelog_versions": q_changelog_versions,
    "ingest_changelog_scan_sink": q_changelog_scan_sink,
    "ingest_stream_cdc_merge": q_stream_cdc_merge,
    "ingest_incremental_agg": q_incremental_agg_maintenance,
    "ingest_incremental_join_agg": q_incremental_join_agg,
    "ingest_incremental_two_sided": q_incremental_two_sided,
    "validate_expectations": q_validate_expectations,
    "validate_drift_stats": q_validate_drift_stats,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_supplier_volume": q5_supplier_volume,
}


_AUDIT_SQL = f"'{INGESTION_TS}.000' AS ingestion_datetime"

ORACLE_MERGE_FULL = fixtures.with_ctes(
    f"""
    SELECT {_ORDERS_OUT_SQL} FROM day1 t
    WHERE EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
      AND NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                      AND s.o_orderdate > t.o_orderdate)
    UNION ALL
    SELECT {_ORDERS_OUT_SQL} FROM day2 s
    WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                  AND s.o_orderdate > t.o_orderdate)
    UNION ALL
    SELECT {_ORDERS_OUT_SQL} FROM day2 s
    WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
    """
)

ORACLES: dict[str, str] = {
    "ingest_detect_inserts": fixtures.with_ctes(
        f"SELECT {_ORDERS_OUT_SQL}, 'I' AS op FROM day2 "
        "WHERE NOT EXISTS (SELECT 1 FROM day1 WHERE day1.o_orderkey = day2.o_orderkey)"
    ),
    "ingest_detect_deletes": fixtures.with_ctes(
        f"SELECT {_ORDERS_OUT_SQL}, 'D' AS op FROM day1 "
        "WHERE NOT EXISTS (SELECT 1 FROM day2 WHERE day2.o_orderkey = day1.o_orderkey)"
    ),
    "ingest_detect_updates": fixtures.with_ctes(
        f"SELECT {_ORDERS_OUT_SQL}, 'U' AS op FROM day2 "
        "WHERE EXISTS (SELECT 1 FROM day1 WHERE day1.o_orderkey = day2.o_orderkey "
        "AND day2.o_orderdate > day1.o_orderdate)"
    ),
    "ingest_cdc_dedup_latest": fixtures.with_ctes(
        f"SELECT {_ORDERS_OUT_SQL}, op FROM cdc "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY o_orderdate DESC) = 1"
    ),
    "ingest_snapshot_merge_full": ORACLE_MERGE_FULL,
    "ingest_snapshot_merge_incremental": fixtures.with_ctes(
        f"""
        SELECT {_ORDERS_OUT_SQL} FROM day1 t
        WHERE NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                          AND s.o_orderdate > t.o_orderdate)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL} FROM day2 s
        WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                      AND s.o_orderdate > t.o_orderdate)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL} FROM day2 s
        WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
        """
    ),
    "ingest_snapshot_merge_soft_delete": fixtures.with_ctes(
        f"""
        SELECT {_ORDERS_OUT_SQL}, FALSE AS hard_deleted FROM day1 t
        WHERE EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
          AND NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                          AND s.o_orderdate > t.o_orderdate)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL}, FALSE AS hard_deleted FROM day2 s
        WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                      AND s.o_orderdate > t.o_orderdate)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL}, FALSE AS hard_deleted FROM day2 s
        WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL}, TRUE AS hard_deleted FROM day1 t
        WHERE NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
        """
    ),
    "ingest_snapshot_merge_fused": ORACLE_MERGE_FULL,
    "ingest_cdc_merge": fixtures.with_ctes(
        f"""
        , latest AS (
            SELECT * FROM cdc
            QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY o_orderdate DESC) = 1
        )
        SELECT {_ORDERS_OUT_SQL} FROM day1 t
        WHERE NOT EXISTS (SELECT 1 FROM latest s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL} FROM latest WHERE op <> 'D'
        """
    ),
    # batch/streaming parity: the STREAMING entry must land exactly the batch
    # cdc-merge table (same fixtures, same projection)
    "ingest_stream_cdc_merge": fixtures.with_ctes(
        f"""
        , latest AS (
            SELECT * FROM cdc
            QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY o_orderdate DESC) = 1
        )
        SELECT {_ORDERS_OUT_SQL} FROM day1 t
        WHERE NOT EXISTS (SELECT 1 FROM latest s WHERE s.o_orderkey = t.o_orderkey)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL} FROM latest WHERE op <> 'D'
        """
    ),
    "ingest_replace": fixtures.with_ctes(
        f"SELECT {_ORDERS_OUT_SQL}, {_AUDIT_SQL} FROM day2"
    ),
    "ingest_first_load_cdc": fixtures.with_ctes(
        f"SELECT {_ORDERS_OUT_SQL}, {_AUDIT_SQL} FROM cdc"
    ),
    "validate_bag_diff_strictness": fixtures.with_ctes(
        f"""
        , merged AS (
            SELECT * FROM day1 t
            WHERE EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
              AND NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                              AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                          AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
        )
        SELECT count(*) AS diff_count FROM (
            (SELECT * FROM merged EXCEPT ALL SELECT * FROM day2)
            UNION ALL
            (SELECT * FROM day2 EXCEPT ALL SELECT * FROM merged)
        )
        """
    ),
    "validate_bag_diff_identity": fixtures.with_ctes(
        """
        SELECT count(*) AS diff_count FROM (
            (SELECT * FROM day2 EXCEPT ALL SELECT * FROM day2)
            UNION ALL
            (SELECT * FROM day2 EXCEPT ALL SELECT * FROM day2)
        )
        """
    ),
    # changelog: v1 = day1, v2 = merged-full; update = key in both versions
    # with any payload column IS DISTINCT FROM its counterpart.
    "ingest_changelog_versions": fixtures.with_ctes(
        f"""
        , merged AS (
            SELECT * FROM day1 t
            WHERE EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
              AND NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                              AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                          AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
        ),
        pairs AS (
            SELECT t.o_orderkey AS k FROM day1 t JOIN merged m
                ON t.o_orderkey = m.o_orderkey
            WHERE t.o_custkey IS DISTINCT FROM m.o_custkey
               OR t.o_orderstatus IS DISTINCT FROM m.o_orderstatus
               OR t.o_totalprice IS DISTINCT FROM m.o_totalprice
               OR t.o_orderdate IS DISTINCT FROM m.o_orderdate
               OR t.o_orderpriority IS DISTINCT FROM m.o_orderpriority
        )
        SELECT {_ORDERS_OUT_SQL}, 'INSERT' AS _change_type FROM merged m
        WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = m.o_orderkey)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL}, 'UPDATE_AFTER' AS _change_type FROM merged m
        WHERE EXISTS (SELECT 1 FROM pairs p WHERE p.k = m.o_orderkey)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL}, 'UPDATE_BEFORE' AS _change_type FROM day1 t
        WHERE EXISTS (SELECT 1 FROM pairs p WHERE p.k = t.o_orderkey)
        UNION ALL
        SELECT {_ORDERS_OUT_SQL}, 'DELETE' AS _change_type FROM day1 t
        WHERE NOT EXISTS (SELECT 1 FROM merged m WHERE m.o_orderkey = t.o_orderkey)
        """
    ),
    # IVM oracle: recompute the v2 rollup FROM SCRATCH — equality with the
    # changelog-maintained Spark result is the maintenance-correctness proof.
    "ingest_incremental_agg": fixtures.with_ctes(
        """
        , merged AS (
            SELECT * FROM day1 t
            WHERE EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
              AND NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                              AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                          AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
        )
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               COUNT(*) AS n_rows
        FROM merged GROUP BY 1
        """
    ),
    # Join-IVM oracle: the v2 JOINED rollup from scratch — equality with the
    # delta-rule-maintained Spark result is the join-maintenance proof.
    "ingest_incremental_join_agg": fixtures.with_ctes(
        """
        , merged AS (
            SELECT * FROM day1 t
            WHERE EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
              AND NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                              AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                          AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
        )
        SELECT c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               COUNT(*) AS n_rows
        FROM merged JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
        """
    ),
    # Two-sided join-IVM oracle: v2 of BOTH inputs recomputed from scratch.
    "ingest_incremental_two_sided": fixtures.with_ctes(
        """
        , merged AS (
            SELECT * FROM day1 t
            WHERE EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey)
              AND NOT EXISTS (SELECT 1 FROM day2 s WHERE s.o_orderkey = t.o_orderkey
                              AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey
                          AND s.o_orderdate > t.o_orderdate)
            UNION ALL
            SELECT * FROM day2 s
            WHERE NOT EXISTS (SELECT 1 FROM day1 t WHERE t.o_orderkey = s.o_orderkey)
        ),
        cust2 AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY'
                        ELSE c_mktsegment END AS c_mktsegment
            FROM customer
        )
        SELECT c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               COUNT(*) AS n_rows
        FROM merged JOIN cust2 ON o_custkey = c_custkey
        GROUP BY 1
        """
    ),
    "validate_expectations": """
        WITH base AS (
            SELECT o.*, count(*) OVER (PARTITION BY o_orderkey) AS kc FROM orders o
        )
        SELECT 'orderkey_not_null' AS rule, count(*) AS n_checked,
               count(*) - CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               count(*) - CAST(sum(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) = 0 AS passed
        FROM base
        UNION ALL
        SELECT 'orderkey_unique', count(*),
               count(*) - CAST(sum(CASE WHEN kc = 1 THEN 1 ELSE 0 END) AS BIGINT),
               count(*) - CAST(sum(CASE WHEN kc = 1 THEN 1 ELSE 0 END) AS BIGINT) = 0
        FROM base
        UNION ALL
        SELECT 'totalprice_positive', count(*),
               count(*) - CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT),
               count(*) - CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT) = 0
        FROM base
        UNION ALL
        SELECT 'totalprice_under_100k', count(*),
               count(*) - CAST(sum(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT),
               count(*) - CAST(sum(CASE WHEN o_totalprice < 100000 THEN 1 ELSE 0 END) AS BIGINT) = 0
        FROM base
        UNION ALL
        SELECT 'priority_in_domain', count(*),
               count(*) - CAST(sum(CASE WHEN o_orderpriority IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                   THEN 1 ELSE 0 END) AS BIGINT),
               count(*) - CAST(sum(CASE WHEN o_orderpriority IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                   THEN 1 ELSE 0 END) AS BIGINT) = 0
        FROM base
    """,
    "validate_drift_stats": fixtures.with_ctes(
        f'SELECT a."column", a.n_a, a.n_null_a, a.ndv_a, a.sum_a, '
        f"b.n_b, b.n_null_b, b.ndv_b, b.sum_b, b.n_b - a.n_a AS delta_rows "
        f'FROM ({_drift_side_sql("day1", "a")}) a '
        f'JOIN ({_drift_side_sql("day2", "b")}) b USING ("column")'
    ),
    # decimal -> double goes through VARCHAR: DuckDB's direct decimal cast is
    # hugeint/10^s double-rounded and drifts 1 ulp from Spark's correctly-
    # rounded BigDecimal.doubleValue once a sum needs >= 17 significant
    # digits (first seen on sum_charge at sf1 — BASELINE.md r5); the string
    # parse is correctly rounded, so both engines agree at any magnitude.
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
            CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
            CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
            CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
                 AS sum_disc_price,
            CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                 * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
                 AS sum_charge,
            count(*) AS count_order,
            CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
            CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT o_orderkey, strftime(o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate,
               o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                    AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q5_supplier_volume": """
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                    AS revenue,
               count(*) AS lineitem_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name
    """,
}

# Sink-backed changelog scan: per-type counts of the SAME net change set the
# fixture changelog oracle computes (the sink path commits exactly day1 ->
# merged-full, and the fixed audit literal cannot produce spurious updates).
ORACLES["ingest_changelog_scan_sink"] = (
    f"SELECT _change_type AS change_type, count(*) AS n_rows FROM "
    f"({ORACLES['ingest_changelog_versions']}) GROUP BY 1"
)

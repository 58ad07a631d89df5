"""Config-driven multi-table runner (flows.py) — YAML parsing with the
reference DAG's defaults, per-table mode dispatch through IngestionJob,
size -> shuffle-partition mapping, and the full/replace test gate."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.flows import (
    SIZE_SHUFFLE_PARTITIONS,
    TableFlow,
    load_flows,
    run_flows,
)
from iceberg_ingestion_spark.model import ChangeSpec

SF = "/root/testdata/sf0.001"
TS = datetime(2026, 8, 13, 2, 0, 0)

FLOWS_YAML = """
crm:
  orders_full:
    source: orders
    type: full
    size: S
    keep_deletes: true
  orders_replace:
    source: orders
    type: replace
ops:
  orders_plain: {}
"""


def _stage(spark, root):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    for source, table in [("crm", "orders"), ("ops", "orders_plain")]:
        orders.write.mode("overwrite").parquet(f"{root}/{source}/{table}")


def _specs():
    spec = ChangeSpec(("o_orderkey",), ("o_orderdate",))
    return {"crm": spec, "ops": spec}


def test_load_flows_defaults_and_validation(tmp_path):
    path = tmp_path / "flows.yaml"
    path.write_text(FLOWS_YAML)
    flows = load_flows(str(path))
    by_name = {t.table: t for t in flows["crm"]}
    assert by_name["orders_full"] == TableFlow(
        "orders_full", "orders", "dbo", "full", "S", True
    )
    # DAG defaults: type=full, size=M, schema=dbo, keep_deletes=false
    assert flows["ops"][0] == TableFlow(
        "orders_plain", "orders_plain", "dbo", "full", "M", False
    )

    path.write_text("s:\n  t:\n    keep_delete: true\n")  # typo'd key
    with pytest.raises(ValueError, match="unknown keys"):
        load_flows(str(path))
    path.write_text("s:\n  t:\n    size: XXL\n")
    with pytest.raises(ValueError, match="bad size"):
        load_flows(str(path))
    path.write_text("s:\n  t:\n    type: upsert\n")
    with pytest.raises(ValueError, match="bad type"):
        load_flows(str(path))


def test_run_flows_end_to_end_and_rerun_merges(spark, tmp_path):
    raw, wh = str(tmp_path / "raw"), str(tmp_path / "wh")
    _stage(spark, raw)
    path = tmp_path / "flows.yaml"
    path.write_text(FLOWS_YAML)
    flows = load_flows(str(path))

    report = run_flows(
        spark, flows, input_root=raw, warehouse=wh, env="dev",
        run_ts=TS, specs=_specs(),
    )
    by_key = {(r["source"], r["table"]): r for r in report}
    n = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert set(by_key) == {
        ("crm", "orders_full"), ("crm", "orders_replace"), ("ops", "orders_plain")
    }
    for r in report:
        assert r["version"] == 1
        assert r["rows"] == n
        assert r["diff_count"] == 0  # first load == source, all modes tested here

    # re-run: full tables merge (version 2), replace recreates; warehouse
    # layout is per-table so sources don't collide
    report2 = run_flows(
        spark, flows, input_root=raw, warehouse=wh, env="dev",
        run_ts=TS, specs=_specs(),
    )
    for r in report2:
        assert r["version"] == 2
        assert r["rows"] == n
        assert r["diff_count"] == 0  # identical snapshot -> no drift

    # shuffle-partition override is restored after the run
    assert spark.conf.get("spark.sql.shuffle.partitions") not in (
        str(SIZE_SHUFFLE_PARTITIONS["S"]),
    )


def test_run_flows_requires_spec(spark, tmp_path):
    path = tmp_path / "flows.yaml"
    path.write_text("lonely:\n  t1: {}\n")
    with pytest.raises(ValueError, match="no ChangeSpec"):
        run_flows(
            spark, load_flows(str(path)), input_root="/nonexistent",
            warehouse=str(tmp_path / "wh"), env="dev", run_ts=TS, specs={},
        )

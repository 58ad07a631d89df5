"""CLI end-to-end: full load -> snapshot merge -> --test equivalence gate, and
the CDC path, all through main() exactly as spark-submit would run it."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_ingestion_spark.cli import main


@pytest.fixture()
def staged(spark, tmp_path):
    """day1/day2 snapshot drops + a CDC batch, staged as parquet dirs."""
    d = {}
    day1 = [(k, k * 10, "v1") for k in range(1, 51)]
    day2 = [(k, k * 10 + (5 if k % 5 == 0 else 0), "v2" if k % 5 == 0 else "v1")
            for k in range(3, 51)] + [(99, 990, "new")]
    cdc = [(1, 999, "patched", "U"), (2, 999, None, "D"), (100, 1000, "ins", "I")]
    for name, rows, ddl in [
        ("day1", day1, "id long, ts long, payload string"),
        ("day2", day2, "id long, ts long, payload string"),
        ("cdc", cdc, "id long, ts long, payload string, op string"),
    ]:
        p = str(tmp_path / name)
        spark.createDataFrame(rows, ddl).write.parquet(p)
        d[name] = p
    d["wh"] = str(tmp_path / "wh")
    return d


def _run(staged, input_key, *extra):
    argv = [
        "-d", "2026-08-13T02:00:00", "-e", "dev", "-s", "src", "-t", "tbl",
        "--input", staged[input_key], "--keys", "id", "--updated-at", "ts",
        "--warehouse", staged["wh"], *extra,
    ]
    return main(argv)


def test_cli_full_then_merge_then_test_gate(spark, staged):
    assert _run(staged, "day1", "--type", "full") == 0          # first load
    assert _run(staged, "day2", "--type", "full") == 0          # snapshot merge
    # target must now equal day2 exactly -> --test exits 0
    assert _run(staged, "day2", "--test") == 0
    # and differ from day1 -> --test exits 1
    assert _run(staged, "day1", "--test") == 1


def test_cli_cdc_merge_applies_ops(spark, staged):
    assert _run(staged, "day1", "--type", "full") == 0
    assert _run(staged, "cdc", "--type", "cdc") == 0
    table_dir = os.path.join(staged["wh"], "dev_clean_src", "tbl")
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink

    sink = ParquetVersionedSink(spark, staged["wh"])
    got = {r.id: r.payload for r in sink.read("dev_clean_src.tbl").collect()}
    assert got[1] == "patched"      # U applied
    assert 2 not in got             # D applied
    assert got[100] == "ins"        # I applied
    assert os.path.exists(os.path.join(table_dir, "_snapshots.json"))


def test_cli_incremental_keeps_unmatched_target_rows(spark, staged):
    assert _run(staged, "day1", "--type", "full") == 0
    assert _run(staged, "day2", "--type", "incremental") == 0
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink

    sink = ParquetVersionedSink(spark, staged["wh"])
    ids = {r.id for r in sink.read("dev_clean_src.tbl").select("id").collect()}
    assert {1, 2} <= ids            # no delete leg: day1-only rows survive
    assert 99 in ids                # inserts still applied


def test_cli_partitioned_bucketed_layout(spark, staged):
    """--partition-by/--bucket-by reach the commit: hive partition dirs plus
    per-file bucket purity, through the real spark-submit surface."""
    assert _run(
        staged, "day1", "--type", "full",
        "--partition-by", "payload", "--bucket-by", "id", "--n-buckets", "4",
    ) == 0
    vdir = os.path.join(staged["wh"], "dev_clean_src", "tbl", "v_00001")
    assert any(d.startswith("payload=") for d in os.listdir(vdir))
    per_file = (
        spark.read.parquet(vdir)
        .select(
            F.input_file_name().alias("f"),
            F.pmod(F.hash("id"), F.lit(4)).alias("b"),
        )
        .groupBy("f")
        .agg(F.countDistinct("b").alias("nb"))
        .collect()
    )
    assert per_file and all(r.nb == 1 for r in per_file)


def test_cli_changes_reports_changelog_counts(spark, staged, capsys):
    assert _run(staged, "day1", "--type", "full") == 0
    assert _run(staged, "day2", "--type", "full") == 0
    argv = [
        "-d", "2026-08-13T02:00:00", "-e", "dev", "-s", "src", "-t", "tbl",
        "--keys", "id", "--updated-at", "ts",
        "--warehouse", staged["wh"], "--changes", "1", "2",
    ]
    assert main(argv) == 0
    out = dict(
        line.split("=") for line in capsys.readouterr().out.strip().splitlines()
    )
    # day1 has keys 1..50; day2 has 3..50 + 99 -> 2 deletes, 1 insert;
    # k%5==0 rows have newer ts -> merged as updates (before+after rows)
    assert out["DELETE"] == "2" and out["INSERT"] == "1"
    assert out["UPDATE_BEFORE"] == out["UPDATE_AFTER"] == "10"

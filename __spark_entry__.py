"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``iceberg_ingestion_spark.queries`` — one entry per
implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline extension
operators), each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full end-to-end snapshot-merge through the versioned-parquet
    sink — first-load day1, merge day2 (I/U/D via anti/semi-theta joins), read
    the committed table back (SURVEY §2.12 mode 3)."""
    from iceberg_ingestion_spark.fixtures import orders_day1, orders_day2
    from iceberg_ingestion_spark.jobs import IngestionJob
    from iceberg_ingestion_spark.model import IngestionType, TablePolicy
    from iceberg_ingestion_spark.queries import ORDERS_SPEC, read_table
    from iceberg_ingestion_spark.sinks import ParquetVersionedSink

    orders = read_table(spark, SF0001, "orders")
    warehouse = tempfile.mkdtemp(prefix="flagship_wh_")
    sink = ParquetVersionedSink(spark, warehouse)
    job = IngestionJob(sink, ORDERS_SPEC, TablePolicy())
    name = "dev_clean_tpch.orders"
    ts = datetime.fromisoformat("2026-08-13T02:00:00")
    job.run(orders_day1(orders), name, IngestionType.FULL, ts)   # first load
    job.run(orders_day2(orders), name, IngestionType.FULL, ts)   # snapshot merge
    return sink.read(name)


#: Names promoted to the front of ``queries()``. The driver checks entries in
#: insertion order (it records rows for exactly the first 50), so the window
#: rotates each round under two rules: (1) every entry whose code path changed
#: or was created THIS round must be in; (2) entries displaced must be
#: function-level byte-unchanged (implementation + oracle + every project
#: function they transitively call) since their latest green evidence.
#:
#: The rotation ledger is MECHANIZED since round 6 (VERDICT r5 #4): see
#: ``tools/rotation_check.py`` — it hashes each entry's transitive closure
#: (function source bytes + oracle text) into ``tools/rotation_ledger.json``
#: together with the newest green evidence label, and ``--check`` fails when
#: a changed entry is outside the window or a displaced entry's hash drifted
#: since its recorded evidence (pytest gate: tests/test_rotation_ledger.py).
#: The r1-r5 prose rotation history this block used to carry lives in git
#: (`git log -p __spark_entry__.py`, commits up to round 5).
#:
#: ROUND-7 rotation (VERDICT r6 #7 — deliberate staleness-driven refresh):
#: in by rule (1), the five entries whose closures changed or were created
#: this round — dedup_incremental_tfidf (NEW: frozen-stats weighted prefix
#: index probe), dedup_substring_spans (NEW: winnowing any-offset substring
#: dedup), dedup_incremental_substring (NEW: per-doc-selection index probe),
#: dedup_tfidf_cosine (fused suffix-norm window + semi-join-restricted
#: verify), dedup_incremental_containment (persisted-dfreq probe variant).
#: The other 45 slots go to the entries with the OLDEST driver correctness
#: row: all 19 whose newest driver row is CORRECTNESS_r02 and 26 of the 42
#: r3-era ones (alphabetical within a staleness class — no cherry-picking).
#: Everything displaced is byte-stable per tools/rotation_check.py (ledger
#: re-stamped from this round's full 126/126 sf0.01 sweep, final sweep
#: re-stamps again) and its newest evidence is at worst that full sweep;
#: the remaining r3/r4-era driver rows rotate in next round.
_PRIORITY = [
    # r7 additions / changed closures (rule 1)
    "dedup_incremental_tfidf",
    "dedup_substring_spans",
    "dedup_incremental_substring",
    "dedup_tfidf_cosine",
    "dedup_incremental_containment",
    # driver-row refresh: last green driver row r2
    "analytics_running_totals",
    "cohort_retention",
    "data_split_counts",
    "dedup_exact",
    "dedup_fingerprint_groups",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "q12_return_class_priority",
    "rollup_revenue",
    "sessionize_user_summary",
    "text_fingerprint",
    "text_quality",
    "text_repetition",
    "text_token_counts",
    "topn_orders_per_segment",
    "validate_bag_diff_identity",
    # driver-row refresh: last green driver row r3
    "decon_benchmark_overlap",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "events_interval_join",
    "ingest_cdc_dedup_latest",
    "ingest_cdc_merge",
    "ingest_changelog_versions",
    "ingest_detect_deletes",
    "ingest_detect_inserts",
    "ingest_detect_updates",
    "ingest_first_load_cdc",
    "ingest_replace",
    "ingest_snapshot_merge_full",
    "ingest_snapshot_merge_fused",
    "ingest_snapshot_merge_incremental",
    "ingest_snapshot_merge_soft_delete",
    "mix_weighted_sample",
    "pack_token_budget",
    "q10_returned_items",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_bracketed_revenue",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from iceberg_ingestion_spark.queries import QUERIES
    from iceberg_ingestion_spark.queries_analytics import QUERIES_ANALYTICS
    from iceberg_ingestion_spark.queries_ext import QUERIES_EXT

    merged = {**QUERIES, **QUERIES_ANALYTICS, **QUERIES_EXT}
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:  # not assert: survives python -O with the diagnostic intact
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    out = {n: merged[n] for n in _PRIORITY}
    out.update({n: fn for n, fn in merged.items() if n not in out})
    return out


def oracle_sql() -> dict[str, str]:
    from iceberg_ingestion_spark.queries import ORACLES
    from iceberg_ingestion_spark.queries_analytics import ORACLES_ANALYTICS
    from iceberg_ingestion_spark.queries_ext import ORACLES_EXT

    return {**ORACLES, **ORACLES_ANALYTICS, **ORACLES_EXT}

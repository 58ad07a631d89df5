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
#: insertion order (round 1 recorded rows for exactly the first 50), so order
#: by verification value: the SURVEY §2 ingest calculus, then every
#: LLM-pipeline extension operator (unchecked in round 1), then the
#: distinctive analytics operators. The TPC-H shape variants (q2-q22) trail —
#: they exercise join/agg shapes already verified by the front of the list.
_PRIORITY = [
    # SURVEY §2 core calculus + validation (13)
    "ingest_detect_inserts",
    "ingest_detect_deletes",
    "ingest_detect_updates",
    "ingest_cdc_dedup_latest",
    "ingest_snapshot_merge_full",
    "ingest_snapshot_merge_incremental",
    "ingest_snapshot_merge_soft_delete",
    "ingest_snapshot_merge_fused",
    "ingest_cdc_merge",
    "ingest_replace",
    "ingest_first_load_cdc",
    "validate_bag_diff_strictness",
    "validate_bag_diff_identity",
    # text analysis (6)
    "text_token_counts",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_pii_scrub",
    "text_repetition",
    # dedup family (7)
    "dedup_exact",
    "dedup_fingerprint_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    # similarity search (5)
    "dedup_embedding_cosine",
    "sim_ann_topk_bruteforce",
    "sim_ann_topk_lsh",
    "sim_ann_topk_ivf",
    "sim_knn_label_vote",
    # event analytics (5)
    "sessionize_stats",
    "sessionize_user_summary",
    "funnel_conversion",
    "cohort_retention",
    "data_split_counts",
    # sketches (2, rows-only)
    "sketch_approx_distinct",
    "sketch_approx_quantiles",
    # multimodal plumbing (3)
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    # distinctive analytics operators (8)
    "q12_return_class_priority",  # round-1 hash FAIL, fixed — re-verify early
    "analytics_exact_quantiles",  # rewritten two-phase selection — re-verify
    "analytics_tfidf_top_terms",
    "analytics_running_totals",
    "rollup_revenue",
    "topn_orders_per_segment",
    "asof_last_click_before_purchase",
    "q1_pricing_summary",
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

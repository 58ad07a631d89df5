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
#: ROUND-6 rotation: in by rule (1) — sim_bm25_multi_query (batched
#: retrieval over a query relation), dedup_incremental_containment
#: (frozen-order prefix-index probe), dedup_stream_near_dup (the THIRD
#: streaming-executed row: 3 availableNow drains of the persisted-index
#: near-dup stream); plus the r6-changed paths already in-window:
#: dedup_tfidf_cosine (Bayardo weighted-prefix rewrite + overflow guard),
#: dedup_clusters / corpus_quality_funnel / corpus_dedup_by_source
#: (connected_components self-pair fix; the two reports now run over the
#: shared-labels operators), sim_bm25_topk (expression builders factored —
#: emitted strings byte-identical). Displaced, all r5-green
#: (CORRECTNESS_r05 hash_match) and byte-unchanged this round, each leaving
#: family representatives in-window: text_vocab_coverage (text family keeps
#: bigram_corpus_freq, pmi_bigrams, boilerplate_scrub,
#: token_quantile_filter), dedup_edit_distance (its simhash60 + banding
#: machinery executes in-window inside dedup_stream_near_dup's closure;
#: banded-Levenshtein verify pytest-pinned), q15_top_supplier (the r4
#: broadcast-1-row-aggregate rewrite family keeps q11_important_parts and
#: q1 in-window).
_PRIORITY = [
    # r6 additions
    "sim_bm25_multi_query",
    "dedup_incremental_containment",
    "dedup_stream_near_dup",
    # r5 additions (block h)
    "ingest_stream_cdc_merge",
    "sim_ann_topk_ivf_trained",
    "q1_pricing_summary",
    # r5 continuation additions (blocks i, j)
    "dedup_containment",
    "sim_bm25_topk",
    "dedup_tfidf_cosine",
    "events_stream_windowed",
    "corpus_quality_funnel",
    "corpus_dedup_by_source",
    # r4 final additions (block f)
    "dedup_jaccard_prefix",
    "text_pmi_bigrams",
    "validate_drift_stats",
    # SURVEY §2 core calculus + validation
    "ingest_changelog_scan_sink",
    "analytics_unpivot_measures",
    "ingest_scd2_history",
    "sketch_hll_windowed",
    "events_json_props",
    "validate_expectations",
    "layout_zorder_values",
    # NEW in r4, late-session additions (block a)
    "decon_bloom_prefilter",
    "ingest_incremental_join_agg",
    "ingest_incremental_two_sided",
    "events_gap_fill",
    "text_bigram_corpus_freq",
    "skew_salted_join",
    "analytics_window_suite",
    # early-r4 new entries + r4-changed entries (blocks a/b)
    "corpus_feed_health",         # NEW: batch analogue of the streaming feed metrics
    "funnel_conversion",          # funnel_stage_times row-contract fix
    "dedup_clusters",             # connected_components convergence-check fix
    "analytics_exact_quantiles",  # cache -> localCheckpoint
    "analytics_tfidf_top_terms",  # N folded into the plan
    "sim_ann_topk_ivf",           # md5 hash-spread centroid draw
    "dedup_exact_chunks",         # chunk_table NULL-text guard
    "skew_salted_agg",            # NEW: driver evidence for the skew family
    # r4 scale rewrites: empty-partitionBy global windows replaced by
    # broadcast 1-row aggregates — changed this round, so in-window
    "q11_important_parts",
    # NEW in r4: single-sided aggregate IVM (the join/two-sided variants are
    # in block (a) above)
    "ingest_incremental_agg",
    # r4 continuation additions (block d) — displace the seven
    # block-(c) names (see comment above)
    "corpus_shard_stats",
    "text_boilerplate_scrub",
    "sketch_count_min",
    "embedding_kmeans_assign",
    "dedup_semantic_blocked",
    "text_token_quantile_filter",
    "events_rolling_7d",
    # r2-era evidence refresh (block c; analytics_tfidf_top_terms above is
    # the 25th of VERDICT r3's list)
    "multimodal_phash_pairs",  # block (g): r4-new aHash64 + 64-bit banding
    "sessionize_stats",
    "dedup_incremental_minhash",  # block (g): NEW index-probe increment dedup
    "asof_last_click_before_purchase",
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

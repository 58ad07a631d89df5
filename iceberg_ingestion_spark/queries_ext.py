"""Extension registry: every LLM-data-pipeline driver query plus its DuckDB
oracle. Round 5 split the former 2,100-line module into themed files —
``queries_text_dedup`` / ``queries_events_ts`` / ``queries_corpus_mm`` (Spark
sides), ``queries_ext_sql`` (oracle SQL fragments) and ``queries_ext_oracles``
(the oracle dict) — as a PURE MECHANICAL move: this module re-exports
everything, so ``__spark_entry__`` and every external import are unchanged and
the registry below is byte-identical to the pre-split dict."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_ingestion_spark.queries_text_dedup import *  # noqa: F401,F403
from iceberg_ingestion_spark.queries_events_ts import *  # noqa: F401,F403
from iceberg_ingestion_spark.queries_corpus_mm import *  # noqa: F401,F403
from iceberg_ingestion_spark.queries_graph import *  # noqa: F401,F403
from iceberg_ingestion_spark.queries_ext_oracles import ORACLES_EXT  # noqa: F401

# ---------------------------------------------------------------------------
# Registry + generated oracles
# ---------------------------------------------------------------------------

QUERIES_EXT: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_token_counts": q_text_token_counts,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "text_fingerprint": q_text_fingerprint,
    "text_pii_scrub": q_text_pii_scrub,
    "text_repetition": q_text_repetition,
    "text_bigram_corpus_freq": q_text_bigram_corpus_freq,
    "dedup_exact": q_dedup_exact,
    "dedup_fingerprint_groups": q_dedup_fingerprint_groups,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
    "dedup_containment": q_dedup_containment,  # directed |A∩B|/|A| prefix join
    "dedup_incremental_containment": q_dedup_incremental_containment,  # frozen-order index probe
    "dedup_stream_near_dup": q_dedup_stream_near_dup,  # REAL streaming: 3 availableNow drains
    "dedup_tfidf_cosine": q_dedup_tfidf_cosine,  # integer-exact weighted cosine
    "dedup_incremental_tfidf": q_dedup_incremental_tfidf,  # frozen-stats weighted index probe
    "dedup_substring_spans": q_dedup_substring_spans,  # winnowing any-offset substring dedup
    "dedup_substring_scrub": q_dedup_substring_scrub,  # keep-first span removal (Lee et al. step)
    "dedup_substring_self": q_dedup_substring_self,  # within-doc duplicated runs
    "dedup_self_scrub": q_dedup_self_scrub,  # act on within-doc runs (keep first)
    "decon_span_scrub": q_decon_span_scrub,  # span-level benchmark decontamination
    "dedup_chained_substring": q_dedup_chained_substring,  # 3-day chained probes == batch
    "dedup_incremental_substring": q_dedup_incremental_substring,  # per-doc-selection index probe
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_incremental_minhash": q_dedup_incremental_minhash,  # index-probe increment dedup
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_clusters": q_dedup_clusters,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "sim_ann_topk_bruteforce": q_ann_topk_bruteforce,
    "sim_ann_topk_lsh": q_ann_topk_lsh,  # recall bound-check vs brute force
    "sim_ann_topk_ivf": q_ann_topk_ivf,  # recall bound-check vs brute force
    "sim_ann_topk_ivf_trained": q_ann_topk_ivf_trained,  # k-means codebook
    "sim_ann_topk_pq": q_ann_topk_pq,  # product-quantization ADC + exact re-rank
    "sim_ann_topk_pq_trained": q_ann_topk_pq_trained,  # per-subspace Lloyd codebooks
    "sim_ann_chained_pq": q_ann_chained_pq,  # frozen-codebook appended index probe
    "sim_ann_stream_pq": q_ann_stream_pq,  # REAL streaming: 3 drains maintain the PQ index
    "sim_ann_topk_ivfpq": q_ann_topk_ivfpq,  # IVF cells x PQ codes (IVFADC shape)
    "sim_ann_topk_ivfpq_residual": q_ann_topk_ivfpq_residual,  # full IVFADC, coarse budget
    "sim_knn_label_vote": q_knn_label_vote,
    "sim_bm25_topk": q_sim_bm25_topk,  # Okapi BM25 keyword retrieval, shared-expr oracle
    "sim_bm25_multi_query": q_sim_bm25_multi_query,  # batched retrieval, query relation
    "sim_bm25_rerank": q_sim_bm25_rerank,  # retrieve-then-rerank via the pair-scoring seam
    "events_interval_join": q_events_interval_join,
    "events_gap_fill": q_events_gap_fill,
    "events_anomaly_daily": q_events_anomaly_daily,
    "events_rolling_7d": q_events_rolling_7d,
    "events_twap": q_events_twap,
    "events_sequence_match": q_events_sequence_match,
    "events_value_histogram": q_events_value_histogram,
    "events_stream_windowed": q_events_stream_windowed,  # real streaming runs, append mode
    "text_pmi_bigrams": q_text_pmi_bigrams,
    "text_vocab_coverage": q_text_vocab_coverage,  # top-K vocab + coverage curve
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "data_split_counts": q_data_split_counts,
    "decon_benchmark_overlap": q_decon_benchmark_overlap,
    "decon_bloom_prefilter": q_decon_bloom_prefilter,
    "corpus_feed_health": q_corpus_feed_health,
    "mix_weighted_sample": q_mix_weighted_sample,
    "pack_token_budget": q_pack_token_budget,
    "tokenize_pack_budget": q_tokenize_pack_budget,  # batch_tokenize seam drives packing
    "dedup_exact_chunks": q_dedup_exact_chunks,
    "skew_salted_agg": q_skew_salted_agg,
    "skew_salted_join": q_skew_salted_join,
    "sample_fixed_per_lang": q_sample_fixed_per_lang,
    "sessionize_stats": q_sessionize_stats,
    "sessionize_user_summary": q_sessionize_user_summary,
    "sketch_approx_distinct": q_sketch_approx_distinct,  # HLL error bound-check
    "sketch_approx_quantiles": q_sketch_approx_quantiles,  # GK rank-error bound-check
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_resize_plan": q_multimodal_resize_plan,
    "multimodal_phash_pairs": q_multimodal_phash_pairs,  # aHash64 + pigeonhole banding
    "corpus_shard_stats": q_corpus_shard_stats,
    "corpus_quality_funnel": q_corpus_quality_funnel,  # cumulative gate attrition
    "corpus_dedup_by_source": q_corpus_dedup_by_source,  # per-feed near-dup health
    "text_boilerplate_scrub": q_text_boilerplate_scrub,
    "sketch_count_min": q_sketch_count_min,  # md5-CMS: oracle recomputes the sketch
    "embedding_kmeans_assign": q_embedding_kmeans_assign,
    "dedup_semantic_blocked": q_dedup_semantic_blocked,  # oracle recomputes both sides
    "text_token_quantile_filter": q_text_token_quantile_filter,
    "sketch_hll_windowed": q_sketch_hll_windowed,  # HLL union bound-check
    "ingest_scd2_history": q_scd2_history,
    "events_json_props": q_events_json_props,
    "dedup_edit_distance": q_dedup_edit_distance,
    "quality_classifier_gate": q_quality_classifier_gate,  # batch_score seam, exact-logit oracle
    "corpus_prep_pipeline": q_corpus_prep_pipeline,  # scrub->dedup->decon->mix->pack->shard composed
    "corpus_prep_pipeline_v2": q_corpus_prep_pipeline_v2,  # span scrubs + classifier gate + BPE pack
    "sketch_kmv_distinct": q_sketch_kmv_distinct,  # md5-KMV: oracle recomputes the sketch
    "sketch_kmv_intersection": q_sketch_kmv_intersection,  # union-KMV set algebra
    "sketch_heavy_hitters": q_sketch_heavy_hitters,  # merged Misra-Gries, integer-exact
    "graph_triangle_count": q_graph_triangle_count,  # degree-oriented triangle census
    "graph_bfs_hops": q_graph_bfs_hops,  # bounded frontier BFS, recursive-CTE oracle
    "graph_triangle_sampled": q_graph_triangle_sampled,  # DOULION md5-coin estimate vs exact
    "sketch_kmv_stream": q_sketch_kmv_stream,  # REAL streaming: 3 drains maintain the KMV table
    "graph_chained_triangles": q_graph_chained_triangles,  # Δ-driven IVM == batch census
    "sketch_join_size": q_sketch_join_size,  # end-biased correlated-sample join sizing
    "sketch_mg_stream": q_sketch_mg_stream,  # REAL streaming: 3 drains maintain the MG summary
    "graph_connected_components": q_graph_connected_components,  # star-contraction CC, CTE oracle
    "graph_pagerank": q_graph_pagerank,  # integer-exact fixed-iteration PageRank
    "graph_label_propagation": q_graph_label_propagation,  # sync LPA communities, unrolled oracle
    "graph_pagerank_converged": q_graph_pagerank_converged,  # delta-threshold stop, oracle re-derives the stop round
    "graph_stream_triangles": q_graph_stream_triangles,  # REAL streaming: ledgered triangle-index maintenance
    "graph_pagerank_weighted": q_graph_pagerank_weighted,  # weight-proportional mass split, unrolled oracle
    "graph_pagerank_personalized": q_graph_pagerank_personalized,  # seed-restricted teleport, unrolled oracle
    "graph_stream_pagerank": q_graph_stream_pagerank,  # REAL streaming: maintained-state PR recompute
    "graph_kcore": q_graph_kcore,  # bounded min-degree peel, maintained-degree unrolled oracle
}


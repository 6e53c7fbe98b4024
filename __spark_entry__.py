"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator plan from SURVEY.md §2
plus the beyond-reference LLM-data-pipeline surface, paired with DuckDB
oracle SQL (beavers_spark/plans/*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the ETF-valuation shape
    (broadcast join -> arithmetic -> keyed sum), reference
    examples/pyarrow_concepts.py:64-74."""
    from beavers_spark.plans import QUERIES

    return QUERIES["etf_valuation"](spark, "/root/testdata/sf0.001")


#: HISTORY-ONLY lattice record (the per-round driver windows,
#: verbatim) — only the exposure blocks at the bottom feed
#: queries()' ordering.
#: Queries with a green driver row in CORRECTNESS_r01..r04.json. The
#: driver checks the registry in iteration order with a cap (each round
#: recorded exactly the first 50 entries), so ``queries()`` yields the
#: not-yet-checked names first, THEN the least-recently-checked block —
#: rotating coverage so every plan keeps earning fresh driver-green rows.
#: r01/r02 checked the r01 block; r03 checked the r03 block; r04 checked
#: the 18 round-4 additions plus a re-check of the r01 block. Round 5
#: therefore re-exposes the r03 block (dedup/ANN/curation — refactored
#: several times since their one green row) right after the new plans.
_CHECKED_R01 = [
    "etf_valuation", "filter_predicate", "projection_rename", "last_by_keys",
    "argmax_latest", "concat_streams", "distinct_values", "set_dedup_batch",
    "merge_sorted_union", "semi_join", "anti_join", "delta_fanout",
    "isin_filter", "groupby_sum", "groupby_max", "word_count",
    "weighted_average", "join_counts_pivot", "pivot_linestatus", "rollup_agg",
    "time_delay", "topk_customers", "window_rank", "running_sum",
    "tumbling_window", "scalar_transform", "json_extract", "hourly_rollup",
    "stats_by_segment", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q4",
    "tpch_q10", "tpch_q14", "tpch_q22", "tpch_q2", "tpch_q7", "tpch_q8",
    "tpch_q9", "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q21", "tpch_q11", "tpch_q16",
]

_CHECKED_R03 = [
    "tpch_q20", "dedup_exact", "doc_fingerprint", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_clusters", "dedup_simhash", "lang_id",
    "quality_score", "token_count", "ann_cosine_topk",
    "dedup_embedding_cosine", "dedup_embedding_cosine_exact",
    "dedup_embedding_recall", "semantic_dedup", "semantic_dedup_check",
    "ann_lsh_topk", "ann_ivf_topk", "ann_lsh_recall", "ann_ivf_recall",
    "binary_meta", "winnow_fingerprint", "winnow_near_dup", "dedup_apply",
    "deterministic_sample", "train_val_test_split", "daily_uniques",
    "decontaminate_ngram", "domain_cap", "corpus_shuffle",
    "repetition_quality", "stratified_sample", "pack_sequences",
    "asof_join_events", "sessionize", "interval_join_events",
    "funnel_conversion", "cohort_retention", "live_view", "except_all",
    "intersect_distinct", "grouping_sets", "count_distinct",
    "approx_distinct", "approx_distinct_error", "lead_lag",
    "median_quantile", "gopher_quality", "pii_redact", "tfidf_top_terms",
]

_CHECKED_R04 = [
    "rolling_avg", "anomaly_zscore", "time_weighted_avg", "ann_pq_topk",
    "ann_pq_recall", "ann_ivfpq_topk", "ann_ivfpq_recall", "chunk_dedup",
    "token_budget_mix", "vocab_coverage", "unigram_logprob", "bigram_pmi",
    "label_centroids", "embedding_outliers", "heavy_hitters",
    "bucketed_quantile", "vocab_drift", "hashed_features",
]

#: round 5's 50 rows = these 8 round-5 additions + the first 42 of the
#: r03 block (count_distinct..tfidf_top_terms missed the cap; they keep
#: their r03 green row and r03-block priority).
_CHECKED_R05 = [
    "ann_knn_join", "ann_knn_join_recall", "ann_lsh_exact_twin",
    "ann_ivf_exact_twin", "ann_ivfpq_exact_twin", "substring_dedup",
    "substring_dedup_apply", "dup_rate_by_source",
]

#: round 6's 50 rows = the 22 round-6 selection-tier additions + the
#: r04 analytics block (18) + the first 10 of the r01 block
#: (CORRECTNESS_r06.json keys, verbatim).
_CHECKED_R06 = [
    "dedup_tfidf_cosine", "dedup_tfidf_clusters", "dedup_minhash_capped",
    "ann_knn_join_exact_twin", "temperature_mix", "lm_perplexity_holdout",
    "zorder_scan", "dsir_logweights", "dsir_select", "kmeans_assign",
    "kmeans_centroids", "cluster_balanced_sample",
    "quality_classifier_weights", "quality_classifier_score",
    "quality_classifier_select", "quality_threshold_by_source",
    "pca_component", "pca_project", "pca_residual_outliers", "bpe_merges",
    "bpe_vocab", "bpe_token_count", "rolling_avg", "anomaly_zscore",
    "time_weighted_avg", "ann_pq_topk", "ann_pq_recall", "ann_ivfpq_topk",
    "ann_ivfpq_recall", "chunk_dedup", "token_budget_mix", "vocab_coverage",
    "unigram_logprob", "bigram_pmi", "label_centroids",
    "embedding_outliers", "heavy_hitters", "bucketed_quantile",
    "vocab_drift", "hashed_features", "etf_valuation", "filter_predicate",
    "projection_rename", "last_by_keys", "argmax_latest", "concat_streams",
    "distinct_values", "set_dedup_batch", "merge_sorted_union", "semi_join",
]


#: round 7's 50 rows, verbatim CORRECTNESS_r07.json keys: the 4 round-7
#: additions + the r05 block + r03 tail + winnowing/live_view + the
#: head of the r03 block (the cap cut at domain_cap).
_CHECKED_R07 = [
    "simhash_pairs", "chunk_documents", "bm25_top_terms",
    "bpe_token_count_holdout", "ann_knn_join", "ann_knn_join_recall",
    "ann_lsh_exact_twin", "ann_ivf_exact_twin", "ann_ivfpq_exact_twin",
    "substring_dedup", "substring_dedup_apply", "dup_rate_by_source",
    "count_distinct", "approx_distinct", "approx_distinct_error",
    "lead_lag", "median_quantile", "gopher_quality", "pii_redact",
    "tfidf_top_terms", "winnow_fingerprint", "winnow_near_dup",
    "live_view", "tpch_q20", "dedup_exact", "doc_fingerprint",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_clusters",
    "dedup_simhash", "lang_id", "quality_score", "token_count",
    "ann_cosine_topk", "dedup_embedding_cosine",
    "dedup_embedding_cosine_exact", "dedup_embedding_recall",
    "semantic_dedup", "semantic_dedup_check", "ann_lsh_topk",
    "ann_ivf_topk", "ann_lsh_recall", "ann_ivf_recall", "binary_meta",
    "dedup_apply", "deterministic_sample", "train_val_test_split",
    "daily_uniques", "decontaminate_ngram", "domain_cap",
]


#: round 8's 50 rows, verbatim CORRECTNESS_r08.json keys: the 5
#: round-8 additions (media decodes + capped simhash) + the first 45
#: of the round-8 exposure order (the r06 block through the r01 head's
#: argmax_latest).
_CHECKED_R08 = [
    "wav_meta", "ppm_meta", "avi_meta", "video_frame_plan",
    "simhash_pairs_capped", "dedup_tfidf_cosine", "dedup_tfidf_clusters",
    "dedup_minhash_capped", "ann_knn_join_exact_twin", "temperature_mix",
    "lm_perplexity_holdout", "zorder_scan", "dsir_logweights",
    "dsir_select", "kmeans_assign", "kmeans_centroids",
    "cluster_balanced_sample", "quality_classifier_weights",
    "quality_classifier_score", "quality_classifier_select",
    "quality_threshold_by_source", "pca_component", "pca_project",
    "pca_residual_outliers", "bpe_merges", "bpe_vocab", "bpe_token_count",
    "rolling_avg", "anomaly_zscore", "time_weighted_avg", "ann_pq_topk",
    "ann_pq_recall", "ann_ivfpq_topk", "ann_ivfpq_recall", "chunk_dedup",
    "token_budget_mix", "vocab_coverage", "unigram_logprob", "bigram_pmi",
    "label_centroids", "embedding_outliers", "heavy_hitters",
    "bucketed_quantile", "vocab_drift", "hashed_features",
    "etf_valuation", "filter_predicate", "projection_rename",
    "last_by_keys", "argmax_latest",
]


#: round 9's 50 rows, verbatim CORRECTNESS_r09.json keys: the 5
#: round-9 payload-kernel additions + the r01 remainder (TPC-H suite,
#: word_count, pivots, windows) that round 8's rotation fronted.
_CHECKED_R09 = [
    "wav_stats", "ppm_stats", "avi_frames", "video_frame_dedup",
    "ppm_resize", "anti_join", "delta_fanout", "isin_filter",
    "groupby_sum", "groupby_max", "word_count", "weighted_average",
    "join_counts_pivot", "pivot_linestatus", "rollup_agg", "time_delay",
    "topk_customers", "window_rank", "running_sum", "tumbling_window",
    "scalar_transform", "json_extract", "hourly_rollup",
    "stats_by_segment", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "tpch_q4", "tpch_q10", "tpch_q14", "tpch_q22", "tpch_q2", "tpch_q7",
    "tpch_q8", "tpch_q9", "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q17",
    "tpch_q18", "tpch_q19", "tpch_q21", "tpch_q11", "tpch_q16",
    "concat_streams", "distinct_values", "set_dedup_batch",
    "merge_sorted_union", "semi_join",
]

#: round 10's 50 rows, verbatim CORRECTNESS_r10.json keys: the 11
#: round-10 perceptual-media additions + the r05-stale dozen + the
#: r03-block remainder (48 green + the 2 by-construction ``no_oracle``
#: rows ``ann_knn_join`` / ``approx_distinct``).
_CHECKED_R10 = [
    "wav_segment_stats", "wav_resample", "audio_activity",
    "audio_fingerprint", "audio_neardup", "audio_neardup_clusters",
    "image_neardup", "image_neardup_clusters", "video_frame_neardup",
    "video_frame_neardup_clusters", "video_scene_cuts", "corpus_shuffle",
    "repetition_quality", "stratified_sample", "pack_sequences",
    "asof_join_events", "sessionize", "interval_join_events",
    "funnel_conversion", "cohort_retention", "except_all",
    "intersect_distinct", "grouping_sets", "simhash_pairs",
    "chunk_documents", "bm25_top_terms", "bpe_token_count_holdout",
    "ann_knn_join", "ann_knn_join_recall", "ann_lsh_exact_twin",
    "ann_ivf_exact_twin", "ann_ivfpq_exact_twin", "substring_dedup",
    "substring_dedup_apply", "dup_rate_by_source", "count_distinct",
    "approx_distinct", "approx_distinct_error", "lead_lag",
    "median_quantile", "gopher_quality", "pii_redact", "tfidf_top_terms",
    "winnow_fingerprint", "winnow_near_dup", "live_view", "tpch_q20",
    "dedup_exact", "doc_fingerprint", "dedup_ngram_jaccard",
]

#: the 23 plans whose LAST driver-window appearance is round 7 (the 19
#: whose latest direct-oracle green is r07, plus the 4 by-construction
#: rows-only approximates checked alongside them:
#: dedup_embedding_cosine, semantic_dedup, ann_lsh_topk, ann_ivf_topk).
#: VERDICT r10 item 1 fronts these for round 11.
_LAST_SEEN_R07 = [
    "dedup_minhash_lsh", "dedup_clusters", "dedup_simhash", "lang_id",
    "quality_score", "token_count", "ann_cosine_topk",
    "dedup_embedding_cosine", "dedup_embedding_cosine_exact",
    "dedup_embedding_recall", "semantic_dedup", "semantic_dedup_check",
    "ann_lsh_topk", "ann_ivf_topk", "ann_lsh_recall", "ann_ivf_recall",
    "binary_meta", "dedup_apply", "deterministic_sample",
    "train_val_test_split", "daily_uniques", "decontaminate_ngram",
    "domain_cap",
]

#: the 50 plans whose LAST driver-window appearance is round 8 (the 49
#: r08-stale greens plus the rows-only ``ann_ivfpq_topk``).
_LAST_SEEN_R08 = [
    "etf_valuation", "filter_predicate", "projection_rename",
    "last_by_keys", "argmax_latest", "rolling_avg", "anomaly_zscore",
    "time_weighted_avg", "dedup_tfidf_cosine", "dedup_tfidf_clusters",
    "dedup_minhash_capped", "ann_knn_join_exact_twin", "ann_pq_topk",
    "ann_pq_recall", "ann_ivfpq_topk", "ann_ivfpq_recall", "wav_meta",
    "ppm_meta", "avi_meta", "video_frame_plan", "simhash_pairs_capped",
    "chunk_dedup", "token_budget_mix", "temperature_mix",
    "vocab_coverage", "unigram_logprob", "lm_perplexity_holdout",
    "bigram_pmi", "label_centroids", "embedding_outliers",
    "heavy_hitters", "bucketed_quantile", "vocab_drift",
    "hashed_features", "zorder_scan", "dsir_logweights", "dsir_select",
    "kmeans_assign", "kmeans_centroids", "cluster_balanced_sample",
    "quality_classifier_weights", "quality_classifier_score",
    "quality_classifier_select", "quality_threshold_by_source",
    "pca_component", "pca_project", "pca_residual_outliers",
    "bpe_merges", "bpe_vocab", "bpe_token_count",
]

#: exposure order after the never-checked plans (round 11's additions
#: auto-front): strict least-recently-checked — the 23 r07-stale plans
#: first (VERDICT r10 item 1), then the 50-plan r08-stale block, then
#: the r09 window, then the r10 window. The four blocks partition all
#: 173 registry plans (23+50+50+50); names dedupe to their FIRST
#: position (queries() builds a dict).
_DRIVER_CHECKED = (
    _LAST_SEEN_R07
    + _LAST_SEEN_R08
    + _CHECKED_R09
    + _CHECKED_R10
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2), not-yet-
    driver-checked plans first (see ``_DRIVER_CHECKED``)."""
    from beavers_spark.plans import QUERIES

    checked = set(_DRIVER_CHECKED)
    ordered = [n for n in QUERIES if n not in checked]
    ordered += [n for n in _DRIVER_CHECKED if n in QUERIES]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here (approximate or
    non-SQL-expressible operators) get the driver's rows-only check."""
    from beavers_spark.plans import ORACLES

    return dict(ORACLES)

"""Gate-overflow registry: operators added past the driver's original
50-row correctness budget.

Round 5 rotation: the driver records the FIRST 50 entries of the
registry, and `__spark_entry__.DRIVER_GATE_PRIORITY` now places these
30 operators (plus the 20 most load-bearing core entries) at the front
so each gets a driver-verified CORRECTNESS row. The 30 core entries
displaced past the budget remain hash-verified by
`tools/local_verify.py` (which always checks the whole registry) at
sf0.01 and sf0.1. Keep new operators registering in this module — the
priority list, not module order, decides what the driver sees.
"""

from __future__ import annotations

from propensity_spark.operators.extended import (
    _BASKET_AFFINITY_SQL,
    _BASKET3_SQL,
    BLOOM_SEMIJOIN_SQL,
    CDC_APPLY_SQL,
    HLL_ROLLUP_SQL,
    SALTED_JOIN_SQL,
    SCD2_SQL,
    MAX_BASKET_ITEMS,
    MIN_SUPPORT,
    TRIPLE_MIN_SUPPORT,
    q_basket_affinity,
    q_basket_affinity_3,
    q_bloom_semijoin,
    q_cdc_apply,
    q_hll_rollup,
    q_salted_join,
    q_scd2_history,
)
from propensity_spark.operators.stats import (
    ANOMALY_SQL,
    BENFORD_SQL,
    CHI_SQUARE_SQL,
    CV_FOLDS_SQL,
    FEATURE_SCALING_SQL,
    KEY_SKEW_SQL,
    QUANTILE_BUCKET_SQL,
    STRATIFIED_SQL,
    q_anomaly_mad,
    q_benford_audit,
    q_chi_square_assoc,
    q_cv_fold_audit,
    q_feature_scaling,
    q_key_skew,
    q_quantile_bucket,
    q_stratified_sample,
)
from propensity_spark.operators.behavior import (
    ACTIVE_USERS_SQL,
    COHORT_SQL,
    FUNNEL_SQL,
    PATH_SQL,
    RFM_SQL,
    TRANSITIONS_SQL,
    q_active_users,
    q_cohort_retention,
    q_event_transitions,
    q_funnel_conversion,
    q_path_analysis,
    q_rfm_segments,
)
from propensity_spark.operators.profiling import (
    CORR_SQL,
    HISTOGRAM_SQL,
    LINKAGE_SQL,
    PROFILE_SQL,
    RI_CHECK_SQL,
    q_column_histogram,
    q_corr_matrix,
    q_record_linkage,
    q_ri_check,
    q_table_profile,
)
from propensity_spark.operators.timeseries import (
    ATTRIBUTION_SQL,
    EWMA_SQL,
    GAPFILL_SQL,
    MOVING_AVG_SQL,
    SEASONALITY_SQL,
    q_attribution_last_touch,
    q_ewma_revenue,
    q_gapfill_revenue,
    q_moving_average,
    q_seasonality_dow,
)
from propensity_spark.operators.maintenance import (
    FINGERPRINT_SQL,
    INCREMENTAL_AGG_SQL,
    q_incremental_agg,
    q_table_fingerprint,
)
from propensity_spark.operators.graph import (
    PAGERANK_SQL,
    TRIANGLE_SQL,
    q_pagerank_affinity,
    q_triangle_count,
)
from propensity_spark.operators.relational import SILVER_SQL
from propensity_spark.text.dedup import EXACTSUBSTR_SQL, q_exactsubstr_dedup
from propensity_spark.vector.similarity import SEMDEDUP_SQL, q_semdedup
from propensity_spark.text.analysis import (
    BM25_SQL,
    DOC_EMBED_SQL,
    DSIR_SQL,
    REPETITION_SQL,
    PERPLEXITY_SQL,
    VOCAB_HEAVY_HITTERS_SQL,
    q_bm25_search,
    q_doc_embed,
    q_dsir_select,
    q_repetition_signals,
    q_perplexity_filter,
    q_vocab_heavy_hitters,
    CHAR_ENTROPY_SQL,
    WEIGHTED_SAMPLE_SQL,
    q_char_entropy,
    q_weighted_sample,
)

QUERIES = {
    "basket_affinity": q_basket_affinity,
    "basket_affinity_3": q_basket_affinity_3,
    "vocab_heavy_hitters": q_vocab_heavy_hitters,
    "perplexity_filter": q_perplexity_filter,
    "bm25_search": q_bm25_search,
    "semdedup": q_semdedup,
    "bloom_semijoin": q_bloom_semijoin,
    "repetition_signals": q_repetition_signals,
    "exactsubstr_dedup": q_exactsubstr_dedup,
    "dsir_select": q_dsir_select,
    "doc_embed": q_doc_embed,
    "pagerank_affinity": q_pagerank_affinity,
    "hll_rollup": q_hll_rollup,
    "scd2_history": q_scd2_history,
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "rfm_segments": q_rfm_segments,
    "gapfill_revenue": q_gapfill_revenue,
    "attribution_last_touch": q_attribution_last_touch,
    "table_profile": q_table_profile,
    "record_linkage": q_record_linkage,
    "cdc_apply": q_cdc_apply,
    "chi_square_assoc": q_chi_square_assoc,
    "quantile_bucket": q_quantile_bucket,
    "key_skew": q_key_skew,
    "path_analysis": q_path_analysis,
    "stratified_sample": q_stratified_sample,
    "anomaly_mad": q_anomaly_mad,
    "triangle_count": q_triangle_count,
    "moving_average": q_moving_average,
    "ri_check": q_ri_check,
    "weighted_sample": q_weighted_sample,
    "char_entropy": q_char_entropy,
    "incremental_agg": q_incremental_agg,
    "table_fingerprint_suite": q_table_fingerprint,
    "column_histogram": q_column_histogram,
    "event_transitions": q_event_transitions,
    "ewma_revenue": q_ewma_revenue,
    "cv_fold_audit": q_cv_fold_audit,
    "corr_matrix": q_corr_matrix,
    "feature_scaling": q_feature_scaling,
    "salted_join": q_salted_join,
    "active_users": q_active_users,
    "seasonality_dow": q_seasonality_dow,
    "benford_audit": q_benford_audit,
}

ORACLES = {
    "basket_affinity": _BASKET_AFFINITY_SQL.format(
        silver=SILVER_SQL, minsup=MIN_SUPPORT, max_items=MAX_BASKET_ITEMS
    ),
    "basket_affinity_3": _BASKET3_SQL.format(
        silver=SILVER_SQL, minsup=TRIPLE_MIN_SUPPORT, max_items=MAX_BASKET_ITEMS
    ),
    "vocab_heavy_hitters": VOCAB_HEAVY_HITTERS_SQL,
    "perplexity_filter": PERPLEXITY_SQL,
    "bm25_search": BM25_SQL,
    "semdedup": SEMDEDUP_SQL,
    "bloom_semijoin": BLOOM_SEMIJOIN_SQL,
    "repetition_signals": REPETITION_SQL,
    "exactsubstr_dedup": EXACTSUBSTR_SQL,
    "dsir_select": DSIR_SQL,
    "doc_embed": DOC_EMBED_SQL,
    "pagerank_affinity": PAGERANK_SQL,
    "hll_rollup": HLL_ROLLUP_SQL,
    "scd2_history": SCD2_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
    "rfm_segments": RFM_SQL,
    "gapfill_revenue": GAPFILL_SQL,
    "attribution_last_touch": ATTRIBUTION_SQL,
    "table_profile": PROFILE_SQL,
    "record_linkage": LINKAGE_SQL,
    "cdc_apply": CDC_APPLY_SQL,
    "chi_square_assoc": CHI_SQUARE_SQL,
    "quantile_bucket": QUANTILE_BUCKET_SQL,
    "key_skew": KEY_SKEW_SQL,
    "path_analysis": PATH_SQL,
    "stratified_sample": STRATIFIED_SQL,
    "anomaly_mad": ANOMALY_SQL,
    "triangle_count": TRIANGLE_SQL,
    "moving_average": MOVING_AVG_SQL,
    "ri_check": RI_CHECK_SQL,
    "weighted_sample": WEIGHTED_SAMPLE_SQL,
    "char_entropy": CHAR_ENTROPY_SQL,
    "incremental_agg": INCREMENTAL_AGG_SQL,
    "table_fingerprint_suite": FINGERPRINT_SQL,
    "column_histogram": HISTOGRAM_SQL,
    "event_transitions": TRANSITIONS_SQL,
    "ewma_revenue": EWMA_SQL,
    "cv_fold_audit": CV_FOLDS_SQL,
    "corr_matrix": CORR_SQL,
    "feature_scaling": FEATURE_SCALING_SQL,
    "salted_join": SALTED_JOIN_SQL,
    "active_users": ACTIVE_USERS_SQL,
    "seasonality_dow": SEASONALITY_SQL,
    "benford_audit": BENFORD_SQL,
}

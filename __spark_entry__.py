"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries and oracles live next to their operators inside
``propensity_spark`` and are aggregated here.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_SMOKE = "/root/testdata/sf0.001"
# Guard against an optional module silently dropping out of the gate
# (e.g. a transitive import typo): the registry must never shrink below
# the committed surface.
EXPECTED_MIN_QUERIES = 162

# The driver's CORRECTNESS report records the FIRST 50 registered entries;
# `tools/local_verify.py` checks the whole registry regardless. Round-6
# rotation (ledger: COVERAGE.md): slots 1-2 re-verify the two r05 driver
# failures after their root-cause fixes (build_postings scalarized,
# anomaly_mad integer-exact); slots 3-50 are 48 of the 62 entries that
# have never appeared in ANY driver report (everything else already has a
# green row in CORRECTNESS_r01-r05). The 14 lowest-value never-checked
# diagnostics (readability, activity_heatmap, char_entropy,
# column_histogram, seasonality_dow, benford_audit, cat_entropy,
# period_growth, new_vs_returning, active_users, cv_fold_audit, zipf_fit,
# durbin_watson, gini_coefficient) defer to the r07 rotation; they stay
# hash-verified by tools/local_verify.py at sf0.01 meanwhile. New operator
# additions are FROZEN until the never-checked backlog fits one rotation.
DRIVER_GATE_PRIORITY = [
    # -- r05 driver failures, fixed this round: re-verify first --
    "build_postings",
    "anomaly_mad",
    # -- 48 never-driver-checked entries, registry order --
    "weighted_sample",
    "event_transitions",
    "ewma_revenue",
    "corr_matrix",
    "feature_scaling",
    "trend_fit",
    "changepoint_cusum",
    "mutual_information",
    "ab_test_ztest",
    "hill_tail_index",
    "cohort_ltv",
    "forecast_linear",
    "active_users_hll",
    "incremental_join",
    "ks_drift",
    "cuped_adjustment",
    "mann_whitney",
    "woe_iv",
    "diff_in_diff",
    "pareto_frontier",
    "quantile_normalize",
    "time_to_convert",
    "cross_correlation",
    "entity_resolution",
    "silhouette",
    "revenue_concentration",
    "price_elasticity",
    "pca_pc1",
    "window_funnel",
    "weighted_median",
    "negative_sample",
    "seasonal_anomaly",
    "forecast_backtest",
    "mix_decomposition",
    "cumulative_distinct",
    "bfs_hops",
    "threshold_sweep",
    "graph_stats",
    "scd2_lookup",
    "rank_aggregation",
    "audience_overlap",
    "bootstrap_ci",
    "shapley_attribution",
    "ipw_ate",
    "conformal_interval",
    "theil_sen",
    "ppr_affinity",
    "huber_trend",
]


def _registry():
    from propensity_spark.operators import relational

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    modules = [relational]
    # Registration order = the order the driver checks entries. The whole
    # surface (50 entries) fits its 50-row budget; the extension families
    # that went unchecked in round 1 register right after the core anyway,
    # as insurance against a smaller budget.
    for optional in (
        "propensity_spark.operators.features",
        "propensity_spark.text.dedup",
        "propensity_spark.vector.similarity",
        "propensity_spark.streaming.windows",
        "propensity_spark.streaming.stateful",
        "propensity_spark.multimodal.media",
        "propensity_spark.ml.training",
        "propensity_spark.feature_store",
        "propensity_spark.text.analysis",
        "propensity_spark.pipeline",
        "propensity_spark.operators.extended",
        # LAST: post-budget entries (driver checks the first 50; these
        # are hash-verified by tools/local_verify.py instead)
        "propensity_spark.operators.overflow",
    ):
        try:
            module = __import__(optional, fromlist=["QUERIES", "ORACLES"])
        except ImportError as exc:
            # Only a genuinely missing THIRD-PARTY dependency may soft-skip
            # a module; a broken import inside the package must fail loudly
            # instead of silently shrinking the verified surface.
            if (getattr(exc, "name", "") or "").startswith("propensity_spark"):
                raise
            print(f"[__spark_entry__] skipping {optional}: {exc}", file=sys.stderr)
            continue
        modules.append(module)
    for module in modules:
        queries.update(getattr(module, "QUERIES", {}))
        oracles.update({k: v for k, v in getattr(module, "ORACLES", {}).items() if v})
    if len(queries) < EXPECTED_MIN_QUERIES:
        raise RuntimeError(
            f"registry shrank to {len(queries)} entries (< {EXPECTED_MIN_QUERIES}): "
            "an operator module silently dropped out"
        )
    missing = [n for n in DRIVER_GATE_PRIORITY if n not in queries]
    if missing:
        raise RuntimeError(f"DRIVER_GATE_PRIORITY names absent from registry: {missing}")
    ordered = {n: queries[n] for n in DRIVER_GATE_PRIORITY}
    ordered.update(queries)  # tail keeps module registration order
    return {k: _pinned(v) for k, v in ordered.items()}, oracles


def _pinned(fn):
    """The caller owns the SparkSession; pin the confs the engine's
    semantics assume (reference behavior: div/0 -> NULL, silent casts;
    oracle comparison: UTC timestamps)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top-k commodity
    selection (02_Initialize_Solution.py:38-47) — scan -> join ->
    broadcast dim join -> countDistinct agg -> TakeOrderedAndProject."""
    from propensity_spark.operators.relational import q_topk_commodities

    return q_topk_commodities(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]

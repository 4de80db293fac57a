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
# `tools/local_verify.py` checks the whole registry regardless. Round-7
# rotation (ledger: COVERAGE.md): slots 1-3 re-verify the r06 signed-zero
# reds on the FIXED code (anomaly_mad, mix_decomposition driver-red;
# dsir_select latent at sf0.1 — all three now normalize -0.0 -> +0.0 in
# both engines and the -0.0 lint in tools/gate_lint.py is registry-wide);
# slots 4-17 are the LAST 14 never-driver-checked diagnostics (completing
# driver coverage of all 162 entries); slots 18-50 refresh the 33 oldest
# driver rows — the SURVEY.md §2 core anchors plus the dedup/ANN/streaming
# heads, all last driver-checked in r04 on a codebase three rounds old.
# The 17 remaining r04-last entries rotate in r08 (listed in COVERAGE.md).
DRIVER_GATE_PRIORITY = [
    # -- r06 signed-zero class, fixed this round: re-verify first --
    "anomaly_mad",
    "mix_decomposition",
    "dsir_select",
    # -- final 14 never-driver-checked diagnostics --
    "readability",
    "activity_heatmap",
    "char_entropy",
    "column_histogram",
    "seasonality_dow",
    "benford_audit",
    "cat_entropy",
    "period_growth",
    "new_vs_returning",
    "active_users",
    "cv_fold_audit",
    "zipf_fit",
    "durbin_watson",
    "gini_coefficient",
    # -- 33 oldest driver rows (last checked r04): SURVEY §2 core first --
    "topk_commodities",
    "household_commodity_features",
    "pipeline_e2e",
    "feature_store_roundtrip",
    "train_score_propensity",
    "silver_projection",
    "date_bounds_suite",
    "household_agg_suite",
    "cross_universe",
    "left_join_fillna",
    "labels",
    "class_ratios",
    "set_ops_suite",
    "pivot_unpivot_scores",
    "date_functions",
    "window_topk_per_group",
    "tpch_q1",
    "household_features",
    "commodity_features",
    "dedup_exact",
    "minhash_signatures",
    "minhash_band_pairs",
    "minhash_lsh_mllib",
    "dedup_components",
    "neardup_suite",
    "ann_cosine_topk",
    "asof_join",
    "ingest_roundtrip",
    "range_join",
    "batch_windows",
    "stream_ops_suite",
    "doc_profile",
    "sampling_suite",
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

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
EXPECTED_MIN_QUERIES = 163

# The driver's CORRECTNESS report records the FIRST 50 registered entries;
# `tools/local_verify.py` checks the whole registry regardless. Round-8
# rotation (ledger: COVERAGE.md): after r07, all 162 entries have at least
# one driver-verified row; 17 were last checked in r04 and 47 in r05.
# Slots 1-17 are the 17 r04-last entries (embedding/ANN tail, media,
# streaming-stateful, TPC-H suites — the oldest driver evidence anywhere
# in the registry); slots 18-50 refresh the first 33 of the 47 r05-last
# entries in registry order. The remaining 14 r05-last entries
# (sessionize, hierarchy_rollup .. open_orders_daily) rotate in r09 and stay covered
# by tools/local_verify.py at sf0.01 meanwhile.
DRIVER_GATE_PRIORITY = [
    # -- 17 r04-last entries: the stalest driver rows in the registry --
    "embedding_dup_pairs",
    "label_centroids",
    "ann_lsh",
    "ann_ivf",
    "embedding_quantize",
    "stream_stateful",
    "media_pipeline",
    "media_bridge",
    "pii_scrub",
    "chunk_documents",
    "tfidf_keywords",
    "percentiles",
    "grouping_analytics",
    "approx_stats",
    "salted_agg",
    "tpch_mini_suite",
    "tpch_join_suite",
    # -- first 33 of the 47 r05-last entries (registry order) --
    "basket_affinity",
    "basket_affinity_3",
    "vocab_heavy_hitters",
    "perplexity_filter",
    "bm25_search",
    "semdedup",
    "bloom_semijoin",
    "repetition_signals",
    "exactsubstr_dedup",
    "doc_embed",
    "pagerank_affinity",
    "hll_rollup",
    "scd2_history",
    "funnel_conversion",
    "cohort_retention",
    "rfm_segments",
    "gapfill_revenue",
    "attribution_last_touch",
    "table_profile",
    "record_linkage",
    "cdc_apply",
    "chi_square_assoc",
    "quantile_bucket",
    "key_skew",
    "path_analysis",
    "stratified_sample",
    "triangle_count",
    "moving_average",
    "ri_check",
    "incremental_agg",
    "table_fingerprint_suite",
    "salted_join",
    # sessionize (r05-last) yields its slot to the NEW quality_filter
    # entry (never driver-checked, which outranks a staleness refresh);
    # sessionize joins the r09 rotation with the other 14 r05-last.
    "quality_filter",
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
        "propensity_spark.ml.quality",
        "propensity_spark.feature_store",
        "propensity_spark.text.analysis",
        "propensity_spark.pipeline",
        "propensity_spark.operators.extended",
        # Post-budget operator families (the driver checks the first 50
        # per DRIVER_GATE_PRIORITY; everything else is hash-verified by
        # tools/local_verify.py). Each module registers its own entries
        # in a QUERIES/ORACLES pair next to the operator code.
        "propensity_spark.operators.stats",
        "propensity_spark.operators.behavior",
        "propensity_spark.operators.profiling",
        "propensity_spark.operators.timeseries",
        "propensity_spark.operators.maintenance",
        "propensity_spark.operators.graph",
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

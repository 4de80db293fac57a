"""Score/feature drift monitoring for the deployed propensity pipeline.

The reference retrains weekly and scores daily (03_Define_Workflow.py)
but ships no drift detection between the two cadences — a score
distribution that shifts mid-week silently degrades every downstream
campaign. The standard ops metric is the Population Stability Index
(PSI) over the score (or any numeric feature) distribution:

    PSI = sum_bins (actual_frac - expected_frac)
                   * ln(actual_frac / expected_frac)

with the usual reading: < 0.1 stable, 0.1-0.25 drifting, > 0.25 broken.

Scale shape: the expected-side bounds come from ONE 1-row aggregate
(broadcast back into the plan — the C4 pattern, no driver collect in
the returned plan), both sides bin map-side, and each side reduces to
`bins` rows with a single partial-aggregated groupBy. The join of two
`bins`-row frames is trivially broadcast. Works unchanged whether the
inputs are yesterday's scores vs today's or a 100 TB feature history
vs a fresh day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-6  # empty-bin floor — the standard PSI epsilon


def score_psi(
    expected: DataFrame, actual: DataFrame, col: str, bins: int = 10
) -> DataFrame:
    """Per-bin PSI decomposition between two numeric distributions.

    Bins are fixed-width over the EXPECTED side's [min, max] (the
    baseline defines the grid, as in standard PSI practice); actual
    values outside the baseline range clamp into the edge bins. NULLs
    are dropped on both sides. Returns one row per bin:

        (bin, expected_frac, actual_frac, psi_term)

    `sum(psi_term)` is the PSI. Fractions and terms round to 6 places
    so cross-engine float comparison is stable.
    """
    bounds = expected.agg(
        F.min(col).cast("double").alias("__lo"), F.max(col).cast("double").alias("__hi")
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        width = (F.col("__hi") - F.col("__lo")) / F.lit(bins)
        # Degenerate baseline (all expected values equal -> zero
        # width): the match goes to bin 0 and ANY other value to the
        # top bin, so a constant-scoring baseline against a moved
        # actual still reports drift instead of collapsing both sides
        # into one bucket and declaring PSI = 0 "stable".
        bin_expr = F.when(
            width <= 0,
            F.when(F.col(col).cast("double") == F.col("__lo"), F.lit(0)).otherwise(
                F.lit(bins - 1)
            ),
        ).otherwise(
            F.least(
                F.lit(bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col(col).cast("double") - F.col("__lo")) / width).cast(
                        "int"
                    ),
                ),
            )
        )
        return (
            df.where(F.col(col).isNotNull())
            .join(F.broadcast(bounds))
            .select(bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    e = binned(expected, "n_expected")
    a = binned(actual, "n_actual")
    joined = e.join(a, "bin", "full_outer").fillna(0, ["n_expected", "n_actual"])
    # unbounded window over <= `bins` rows: totals without a second
    # aggregation pass or a driver round-trip
    tot_e = F.sum("n_expected").over(Window.partitionBy())
    tot_a = F.sum("n_actual").over(Window.partitionBy())
    ef = F.greatest(F.col("n_expected") / tot_e, F.lit(EPS))
    af = F.greatest(F.col("n_actual") / tot_a, F.lit(EPS))
    return joined.select(
        F.col("bin").cast("bigint").alias("bin"),
        F.round(ef + 1e-9, 6).alias("expected_frac"),
        F.round(af + 1e-9, 6).alias("actual_frac"),
        F.round((af - ef) * F.log(af / ef) + 1e-9, 6).alias("psi_term"),
    )


def psi_value(expected: DataFrame, actual: DataFrame, col: str, bins: int = 10) -> float:
    """Driver-side convenience: the scalar PSI (a `bins`-row collect)."""
    rows = score_psi(expected, actual, col, bins).agg(F.sum("psi_term")).collect()
    return float(rows[0][0] or 0.0)

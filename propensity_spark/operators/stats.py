"""Statistical / diagnostic operators (extension scope; the
reference's statistics stop at class-ratio windows, SURVEY.md §2.5).

* `q_chi_square_assoc` — chi-square test of independence between two
  categorical columns (market segment x order priority), the standard
  pre-modeling feature-association screen. One contingency aggregation
  (|cells| rows, bounded by the category-domain product) and window
  sums over the tiny cell frame for the marginals; expected counts and
  per-cell contributions are pure arithmetic. At 100 TB only the first
  aggregation touches the fact — everything downstream is O(cells).

* `q_quantile_bucket` — quantile discretization (decile binning) of a
  numeric column: exact decile boundaries as ONE 1-row aggregate,
  broadcast, and each row bucketed map-side by counting boundaries
  below it with an array `filter` HOF — no per-row join, no sort of
  the fact. This is the shuffle-free bucketing pattern the RFM
  docstring names as the 10^9-row alternative to a global `ntile`
  (operators/behavior.py): swap the exact `percentile` for
  `percentile_approx` at scale and nothing else changes.

* `q_key_skew` — join/agg-key skew diagnostic: per-key counts, the
  top-10 heaviest keys (TakeOrdered, no full sort) with their share of
  rows and their multiple of the mean key load. Run this before
  choosing a shuffle key; a skew_ratio in the hundreds is the signal
  to salt (operators/extended.q_salted_agg) or rely on AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propensity_spark.io import load_table

N_BUCKETS = 10
TOP_SKEW_KEYS = 10


def q_chi_square_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cells = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    row_w = Window.partitionBy("segment")
    col_w = Window.partitionBy("priority")
    all_w = Window.partitionBy()
    # row marginal promoted to DOUBLE before the product, mirroring the
    # oracle's `* 1.0`: BIGINT*BIGINT marginals wrap silently past 2^63
    # at ~1e11-row scale (the double product is correctly rounded and
    # value-identical below 2^53)
    expected = (
        F.sum("observed").over(row_w).cast("double")
        * F.sum("observed").over(col_w)
        / F.sum("observed").over(all_w)
    )
    return cells.select(
        "segment",
        "priority",
        "observed",
        F.round(expected + 1e-9, 4).alias("expected"),
        F.round(
            F.pow(F.col("observed") - expected, 2) / expected + 1e-9, 4
        ).alias("contrib"),
    )


CHI_SQUARE_SQL = """
    WITH cells AS (
        SELECT c_mktsegment AS segment, o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS observed
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    ),
    marg AS (
        SELECT *,
               sum(observed) OVER (PARTITION BY segment) * 1.0
                 * sum(observed) OVER (PARTITION BY priority)
                 / sum(observed) OVER () AS expected
        FROM cells
    )
    SELECT segment, priority, observed,
           round(expected + 1e-9, 4) AS expected,
           round(pow(observed - expected, 2) / expected + 1e-9, 4) AS contrib
    FROM marg
"""


def quantile_bucket(
    df: DataFrame, value_col: str, n_buckets: int = N_BUCKETS,
    exact: bool = False,
) -> DataFrame:
    """Map-side quantile discretization: adds `bucket` (1..n_buckets).
    Boundaries come from one 1-row aggregate — the `percentile_approx`
    sketch by default (constant memory, the only sane default at
    100 TB; same convention as the `percentiles()` production API in
    operators/extended.py), `exact=True` opting into exact boundaries —
    broadcast to every row; assignment is `1 + |{b : value > b}|` via
    an array HOF, so the fact is never sorted or shuffled."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    fn_name = "percentile" if exact else "percentile_approx"
    bounds = df.agg(
        F.expr(
            # the D suffix forces DOUBLE literals — bare 0.1 parses as
            # DECIMAL(1,1) in Spark SQL and percentile rejects it
            f"transform({fn_name}({value_col}, array({', '.join(f'{q}D' for q in qs)})),"
            " b -> round(b + 1e-9, 6))"
        ).alias("__bounds")
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bucket",
            (
                F.lit(1)
                + F.size(
                    F.expr(f"filter(__bounds, b -> {value_col} > b)")
                )
            ).cast("int"),
        )
        .drop("__bounds")
    )


def q_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry runs exact boundaries so the DuckDB hash-compare is
    well-defined; production callers keep the sketch default."""
    orders = load_table(spark, sf_dir, "orders")
    return quantile_bucket(
        orders.select("o_orderkey", "o_totalprice"), "o_totalprice",
        exact=True,
    )


QUANTILE_BUCKET_SQL = f"""
    WITH bounds AS (
        SELECT list_transform(
                   quantile_cont(o_totalprice,
                       [{', '.join(str(i / N_BUCKETS) for i in range(1, N_BUCKETS))}]),
                   b -> round(b + 1e-9, 6)) AS bs
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           CAST(1 + len(list_filter(bs, b -> o_totalprice > b)) AS INT)
               AS bucket
    FROM orders CROSS JOIN bounds
"""


def key_skew(df: DataFrame, key_col: str, top_k: int = TOP_SKEW_KEYS) -> DataFrame:
    """Top-`top_k` heaviest values of `key_col` with row share and
    multiple of the mean per-key load. One key-grain agg; the global
    stats are a broadcast 1-row aggregate; top-k plans as
    TakeOrderedAndProject."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_k)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), F.asc("key")))
            .alias("rank"),
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("__total") + 1e-9, 6).alias("share"),
            F.round(
                F.col("cnt") * F.col("__nkeys") / F.col("__total") + 1e-9, 4
            ).alias("skew_ratio"),
        )
    )


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew(load_table(spark, sf_dir, "lineitem"), "l_partkey")


KEY_SKEW_SQL = f"""
    WITH counts AS (
        SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_partkey
    ),
    stats AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                     CAST(count(*) AS BIGINT) AS nkeys FROM counts),
    top AS (
        SELECT key, cnt FROM counts ORDER BY cnt DESC, key
        LIMIT {TOP_SKEW_KEYS}
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, key) AS INT) AS rank,
           key, cnt,
           round(cnt * 1.0 / total + 1e-9, 6) AS share,
           round(cnt * 1.0 * nkeys / total + 1e-9, 4) AS skew_ratio
    FROM top CROSS JOIN stats
"""
STRATUM_N = 5
MAD_K = 0.6745  # Phi^-1(0.75): scales MAD to sigma-equivalents
MAD_THRESHOLD = 3.5  # Iglewicz-Hoaglin modified z-score cutoff


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int = STRATUM_N
) -> DataFrame:
    """Exact-n-per-stratum deterministic sample: rank rows inside each
    stratum by the md5 of their key (append-stable pseudo-random order,
    same convention as split_by_hash in text/analysis.py) and keep the
    first n. One stratum-keyed window shuffle; no full-table sort, no
    driver-side sampling state. Unlike `sampleBy`, the stratum size is
    exact, and unlike `ORDER BY rand()` the sample is reproducible and
    stable under appends of other strata."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string").cast("binary")), key_col
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= n_per_stratum)
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return stratified_sample(
        customer.select("c_mktsegment", "c_custkey"), "c_mktsegment", "c_custkey"
    )


STRATIFIED_SQL = f"""
    SELECT c_mktsegment, c_custkey, CAST(rn AS INT) AS rn
    FROM (
        SELECT c_mktsegment, c_custkey,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey
               ) AS rn
        FROM customer
    ) WHERE rn <= {STRATUM_N}
"""


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: modified z-scores
    (Iglewicz-Hoaglin 1993) of daily brand revenue against the brand's
    median and MAD — median/MAD instead of mean/stddev so the outliers
    being hunted cannot mask themselves. med2/mad4 are whole-partition
    window `percentile`s over the one daily aggregate (r09: was three
    recomputations of `daily` merged by broadcast joins); a zero MAD
    (constant series) yields NULL z and no flag in both engines via
    nullif. At 100 TB swap `percentile` for `percentile_approx` — the
    brand grain and plan shape are unchanged (same trade documented in
    quantile_bucket)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Bit-determinism across engines (GATE_CONTRACT.md): revenue is summed
    # as exact BIGINT in half-ten-thousandths of a dollar (r2 = 2 * sum of
    # cents*percent products), so the per-brand medians interpolate between
    # integers and land on exact-integer doubles in BOTH Spark `percentile`
    # and DuckDB `quantile_cont` — no float-boundary flake at the 4-dp
    # round (the r05 driver mismatch). med2 is the median of even ints
    # (integer), mad4 doubles the deviations first so its median is also
    # integer; z = K * 2 * (r2 - med2) / mad4 reduces to the documented
    # K * (rev - med) / mad over identical doubles in both engines.
    daily = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.to_date("l_shipdate").alias("day"),
        )
        .agg(
            (
                F.sum(
                    F.expr(
                        "cast(round(l_extendedprice * 100, 0) as bigint)"
                        " * cast(round((1 - l_discount) * 100, 0) as bigint)"
                    )
                )
                * F.lit(2)
            )
            .cast("bigint")
            .alias("r2")
        )
    )
    # r09 (guide §2.4 "remove shuffles outright"): med2/mad4 were separate
    # groupBy aggregates broadcast-joined back onto `daily` — Catalyst does
    # not dedupe the shared subtree, so the physical plan recomputed the
    # lineitem⋈part daily aggregation THREE times (16 scans / 28 exchanges,
    # plans/r09/anomaly_mad_before.txt). Whole-partition windows compute
    # the same exact percentiles over the same multiset (no ORDER BY -> the
    # frame is the full partition, order-insensitive) from ONE daily pass,
    # and both windows share the brand hash-partitioning: 2 scans / 2
    # exchanges total. Values are bit-identical: same `percentile` exact
    # interpolation over the same BIGINT inputs.
    with_stats = daily.withColumn(
        "med2",
        F.expr("cast(percentile(r2, 0.5D) over (partition by brand) as bigint)"),
    ).withColumn(
        "mad4",
        F.expr(
            "cast(percentile(2 * abs(r2 - med2), 0.5D)"
            " over (partition by brand) as bigint)"
        ),
    )
    # `+ 0.0` after the round normalizes IEEE signed zero: DuckDB's
    # round() preserves -0.0 (e.g. round(-3e-5, 4)) while Spark's goes
    # through BigDecimal and emits +0.0; the driver canonicalizes at
    # fixed precision so "-0.000000" != "0.000000" (the r06 hash red).
    # x + 0.0 is a no-op for every value except -0.0 -> +0.0.
    z = F.expr(
        f"round({MAD_K} * 2.0 * (r2 - med2)"
        " / nullif(cast(mad4 as double), 0.0) + 1e-9, 4) + 0.0"
    )
    return (
        with_stats
        .select(
            "brand",
            "day",
            # half-up to cents in pure integer arithmetic (r2/2 is the
            # exact revenue in 1e-4 dollars): round(double, 2) would hit
            # the .xx50 half-boundary on ~1% of 4-dp values and Spark /
            # DuckDB disagree there; floor((n + 50) / 100.0) cannot.
            # 100.0D not 100.0: a bare decimal literal makes Spark compute
            # in DECIMAL and emit Decimal('...'), which canonicalizes
            # differently from DuckDB's DOUBLE.
            F.expr("floor((r2 / 2 + 50) / 100.0D) / 100.0D").alias("revenue"),
            z.alias("robust_z"),
            F.when(F.abs(z) > MAD_THRESHOLD, 1).otherwise(0).alias("is_anomaly"),
        )
    )


ANOMALY_SQL = f"""
    WITH daily AS (
        SELECT p_brand AS brand, CAST(l_shipdate AS DATE) AS day,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * CAST(round((1 - l_discount) * 100, 0) AS BIGINT))
                    * 2 AS BIGINT) AS r2
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2
    ),
    meds AS (
        SELECT brand, CAST(quantile_cont(r2, 0.5) AS BIGINT) AS med2
        FROM daily GROUP BY brand
    ),
    mads AS (
        SELECT d.brand,
               CAST(quantile_cont(2 * abs(d.r2 - m.med2), 0.5) AS BIGINT)
                   AS mad4
        FROM daily d JOIN meds m ON d.brand = m.brand
        GROUP BY d.brand
    )
    SELECT d.brand, d.day,
           floor((d.r2 / 2 + 50) / 100.0) / 100.0 AS revenue,
           round({MAD_K} * 2.0 * (d.r2 - m.med2)
                 / nullif(CAST(a.mad4 AS DOUBLE), 0.0) + 1e-9, 4) + 0.0
               AS robust_z,
           CASE WHEN abs(round({MAD_K} * 2.0 * (d.r2 - m.med2)
                               / nullif(CAST(a.mad4 AS DOUBLE), 0.0) + 1e-9, 4))
                     > {MAD_THRESHOLD}
                THEN 1 ELSE 0 END AS is_anomaly
    FROM daily d
    JOIN meds m ON d.brand = m.brand
    JOIN mads a ON d.brand = a.brand
"""
CV_FOLDS_K = 5


def q_cv_fold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-validation fold audit: assign every order to one of
    CV_FOLDS_K folds by the GROUP-AWARE deterministic hash that
    `ml.training.cross_validate` uses (md5-uniform of the customer
    key mod k — all of a customer's rows share a fold), then report
    per-fold row count, distinct-customer count, and revenue. This is
    the balance sheet read before trusting a CV estimate: fold sizes
    within a few percent of each other and customer counts that sum
    to the distinct-customer total (folds partition entities, never
    split them). Map-only fold assignment + one aggregation — the
    audit costs one shuffle at any scale."""
    from propensity_spark.ml.training import fold_expr

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("fold", fold_expr("o_custkey", CV_FOLDS_K))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice") + 1e-6, 2).alias("revenue"),
        )
    )


CV_FOLDS_SQL = f"""
    SELECT CAST(CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                     AS BIGINT) % {CV_FOLDS_K} AS INT) AS fold,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           round(sum(o_totalprice) + 1e-6, 2) AS revenue
    FROM orders
    GROUP BY 1
"""
# All register in operators/overflow.py (post-budget).


# ---------------------------------------------------------------------------
# Feature scaling: the standardization pass between feature assembly
# and model fitting (MLlib's StandardScaler/MinMaxScaler semantics,
# expressed relationally so the stats are auditable and the transform
# is a map-side expression instead of an opaque model object).

WINSOR_LO, WINSOR_HI = 0.01, 0.99


def scale_features(
    df: DataFrame, value_col: str, exact: bool = False
) -> DataFrame:
    """Z-score, min-max, and winsorized variants of `value_col` from
    ONE 1-row stats aggregate (mean/stddev/min/max/p01/p99)
    broadcast-joined back — the input is scanned once for stats and
    once for the transform; the transform itself is pure map-side
    arithmetic, so at 100 TB this is two scans and zero data shuffles
    (MLlib StandardScaler/MinMaxScaler semantics, relational and
    auditable). Winsor bounds default to the `percentile_approx`
    sketch (constant memory — the only sane default at scale; same
    convention as `quantile_bucket` above); `exact=True` opts into
    exact percentiles for the oracle gate."""
    fn = "percentile" if exact else "percentile_approx"
    stats = df.agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sd"),
        F.min(value_col).alias("__lo"),
        F.max(value_col).alias("__hi"),
        F.expr(f"{fn}({value_col}, {WINSOR_LO}D)").alias("__p01"),
        F.expr(f"{fn}({value_col}, {WINSOR_HI}D)").alias("__p99"),
    )
    v = F.col(value_col)
    # nullif guards: a constant column (sd = 0, hi = lo) yields NULL
    # scores in BOTH engines instead of Spark-NULL-vs-DuckDB-inf drift
    sd = F.nullif(F.col("__sd"), F.lit(0.0))
    span = F.nullif(F.col("__hi") - F.col("__lo"), F.lit(0.0))
    return df.crossJoin(F.broadcast(stats)).select(
        *[c for c in df.columns],
        (F.round((v - F.col("__mu")) / sd + 1e-9, 6) + 0.0).alias("zscore"),  # rule 7
        F.round((v - F.col("__lo")) / span + 1e-9, 6).alias("minmax"),
        F.round(
            F.least(F.greatest(v, F.col("__p01")), F.col("__p99")) + 1e-9, 4
        ).alias("winsorized"),
    )


def q_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: exact percentile bounds so the DuckDB hash-compare
    is well-defined; production callers keep the sketch default."""
    customer = load_table(spark, sf_dir, "customer")
    return scale_features(
        customer.select("c_custkey", F.col("c_acctbal").alias("acctbal")),
        "acctbal",
        exact=True,
    )


FEATURE_SCALING_SQL = f"""
    WITH stats AS (
        SELECT avg(c_acctbal) AS mu, stddev_samp(c_acctbal) AS sd,
               min(c_acctbal) AS lo, max(c_acctbal) AS hi,
               quantile_cont(c_acctbal, {WINSOR_LO}) AS p01,
               quantile_cont(c_acctbal, {WINSOR_HI}) AS p99
        FROM customer
    )
    SELECT c_custkey, c_acctbal AS acctbal,
           round((c_acctbal - mu) / nullif(sd, 0.0) + 1e-9, 6) + 0.0 AS zscore,
           round((c_acctbal - lo) / nullif(hi - lo, 0.0) + 1e-9, 6) AS minmax,
           round(least(greatest(c_acctbal, p01), p99) + 1e-9, 4) AS winsorized
    FROM customer CROSS JOIN stats
"""
# Registers in operators/overflow.py.


BENFORD = [0.30103, 0.17609, 0.12494, 0.09691, 0.07918,
           0.06695, 0.05799, 0.05115, 0.04576]  # log10(1 + 1/d)


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    fabricated-data / unit-mixup screen auditors run on financial
    facts: observed first-significant-digit frequencies vs the
    log10(1+1/d) expectation, with per-digit chi-square contributions.
    First digit is string surgery on the absolute value (no float log
    — identical in both engines); one 9-row aggregation, map-side
    partials; the expectation is a 9-literal array. O(9) tail at any
    scale."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.regexp_replace(
            F.format_string("%.2f", F.abs(F.col("o_totalprice"))), "[.0]", ""
        ),
        1,
        1,
    ).cast("int")
    counts = (
        orders.where(F.abs(F.col("o_totalprice")) >= 1.0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    total = counts.agg(F.sum("observed").alias("__n"))
    expected_expr = "element_at(array({}), digit)".format(
        ", ".join(f"{p!r}D" for p in BENFORD)
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "observed",
        F.round(F.col("observed") / F.col("__n") + 1e-9, 6).alias("obs_frac"),
        F.expr(expected_expr).alias("benford_frac"),
        F.round(
            F.pow(
                F.col("observed") - F.expr(expected_expr) * F.col("__n"), 2
            )
            / (F.expr(expected_expr) * F.col("__n"))
            + 1e-9,
            4,
        ).alias("chi2_contrib"),
    )


BENFORD_SQL = f"""
    WITH digits AS (
        SELECT CAST(substr(regexp_replace(
                   printf('%.2f', abs(o_totalprice)), '[.0]', '', 'g'),
                   1, 1) AS INT) AS digit
        FROM orders WHERE abs(o_totalprice) >= 1.0
    ),
    counts AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS observed
        FROM digits GROUP BY digit
    ),
    total AS (SELECT sum(observed) AS n FROM counts),
    exp_tbl AS (
        SELECT * FROM (VALUES
            {", ".join(f"({d + 1}, {p!r})" for d, p in enumerate(BENFORD))})
            AS t(digit, benford_frac)
    )
    SELECT c.digit, c.observed,
           round(c.observed * 1.0 / n + 1e-9, 6) AS obs_frac,
           CAST(e.benford_frac AS DOUBLE) AS benford_frac,
           round(pow(c.observed - e.benford_frac * n, 2)
                 / (e.benford_frac * n) + 1e-9, 4) AS chi2_contrib
    FROM counts c JOIN exp_tbl e ON c.digit = e.digit CROSS JOIN total
"""


def mutual_information(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Mutual information between two categorical columns, reported
    per cell: I(X;Y) = Σ p(x,y)·ln(p(x,y) / (p(x)·p(y))). The joint
    contingency table is ONE hash aggregate over the scan; the
    marginals are window sums OVER THE TINY JOINT TABLE (|X|·|Y|
    rows), not re-scans — so feature-pair screening at 100 TB costs
    one shuffle per pair regardless of row count. The log argument is
    the integer ratio (c·n)/(px·py), bit-identical across engines
    before the single libm call; mi contributions round at 6dp
    (chi_square_assoc's convention). Sister operator to
    chi_square_assoc — MI ranks feature pairs on the same table."""
    joint = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    m = (
        joint.withColumn("px_n", F.sum("c").over(wx))
        .withColumn("py_n", F.sum("c").over(wy))
        .withColumn("n", F.sum("c").over(wall))
    )
    return m.select(
        "x",
        "y",
        F.col("c").alias("n_xy"),
        F.round(F.col("c") / F.col("n") + 1e-9, 6).alias("p_xy"),
        # counts promoted to DOUBLE before multiplying (BIGINT*BIGINT
        # wraps silently past 2^63 at ~1e11-row scale while the oracle
        # errors; correctly-rounded & value-identical below 2^53), and
        # mi_contrib — negative for anti-correlated cells — carries the
        # rule-7 `+ 0.0` signed-zero normalizer in both engines.
        F.round(
            (F.col("c").cast("double") * F.col("n"))
            / (F.col("px_n").cast("double") * F.col("py_n"))
            + 1e-9,
            6,
        ).alias("lift"),
        (
            F.round(
                (F.col("c") / F.col("n"))
                * F.log(
                    (F.col("c").cast("double") * F.col("n"))
                    / (F.col("px_n").cast("double") * F.col("py_n"))
                )
                + 1e-9,
                6,
            )
            + 0.0
        ).alias("mi_contrib"),
    )


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MI cells for two feature pairs, unioned with a pair label:
    orders (priority vs status) and part (brand vs first type word)."""
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").withColumn(
        "p_type_head", F.split("p_type", " ")[0]
    )
    a = mutual_information(orders, "o_orderpriority", "o_orderstatus")
    b = mutual_information(part, "p_brand", "p_type_head")
    return a.select(F.lit("priority_status").alias("pair"), "*").unionByName(
        b.select(F.lit("brand_type").alias("pair"), "*")
    )


_MI_CELL_SQL = """
    SELECT '{label}' AS pair, x, y, n_xy,
           round(n_xy * 1.0 / n + 1e-9, 6) AS p_xy,
           round((n_xy * 1.0 * n) / (px_n * 1.0 * py_n) + 1e-9, 6) AS lift,
           round((n_xy * 1.0 / n)
                 * ln((n_xy * 1.0 * n) / (px_n * 1.0 * py_n)) + 1e-9, 6) + 0.0
               AS mi_contrib
    FROM (
        SELECT x, y, c AS n_xy,
               sum(c) OVER (PARTITION BY x) AS px_n,
               sum(c) OVER (PARTITION BY y) AS py_n,
               sum(c) OVER () AS n
        FROM (SELECT {x} AS x, {y} AS y, count(*) AS c
              FROM {table} GROUP BY 1, 2)
    )
"""

MUTUAL_INFO_SQL = (
    _MI_CELL_SQL.format(
        label="priority_status",
        x="o_orderpriority",
        y="o_orderstatus",
        table="orders",
    )
    + " UNION ALL "
    + _MI_CELL_SQL.format(
        label="brand_type",
        x="p_brand",
        y="string_split(p_type, ' ')[1]",
        table="part",
    )
)


AB_SIG_Z = 1.96  # two-sided 5%


def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users are
    assigned a deterministic md5-hash variant (append-stable — the
    same property split_by_hash gives training splits), conversion is
    "made >= 1 purchase", and the pooled-variance z-score compares
    the rates. One user-grain agg + one 1-row conditional agg — the
    whole readout is two shuffles of user-grain rows regardless of
    event volume. sqrt is IEEE-correctly-rounded (not libm-variant),
    so the z only needs the standard 4dp float rounding."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted")
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(cast(user_id as string) as binary)),"
        " 1, 8), 16, 10) as bigint) % 2"
    )
    users = users.withColumn(
        "variant", F.when(bucket == 0, "A").otherwise("B")
    )
    g = users.agg(
        F.count_if(F.col("variant") == "A").alias("n_a"),
        F.sum(
            F.when(F.col("variant") == "A", F.col("converted")).otherwise(0)
        ).alias("conv_a"),
        F.count_if(F.col("variant") == "B").alias("n_b"),
        F.sum(
            F.when(F.col("variant") == "B", F.col("converted")).otherwise(0)
        ).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a").cast("double")
    p_b = F.col("conv_b") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (1 - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    # nullif: a degenerate arm (pooled rate 0 or 1, or an empty arm)
    # yields NULL z in both engines rather than engine-specific 0/0
    # behavior (rule 4); + 0.0 normalizes a tiny-negative z's signed
    # zero at the 4dp round (rule 7)
    z = (p_a - p_b) / F.nullif(se, F.lit(0.0))
    return g.select(
        "n_a",
        "conv_a",
        F.round(p_a + 1e-9, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(p_b + 1e-9, 6).alias("rate_b"),
        (F.round(z + 1e-9, 4) + 0.0).alias("z_score"),
        F.when(F.abs(z) > AB_SIG_Z, 1).otherwise(0).alias("significant"),
    )


AB_TEST_SQL = f"""
    WITH users AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(count(*) FILTER (variant = 'A') AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
                   AS BIGINT) AS conv_a,
               CAST(count(*) FILTER (variant = 'B') AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
                   AS BIGINT) AS conv_b
        FROM users
    )
    SELECT n_a, conv_a, round(conv_a * 1.0 / n_a + 1e-9, 6) AS rate_a,
           n_b, conv_b, round(conv_b * 1.0 / n_b + 1e-9, 6) AS rate_b,
           round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                 / nullif(sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 0.0) + 1e-9, 4) + 0.0
               AS z_score,
           CASE WHEN abs((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                 / nullif(sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 0.0)) > {AB_SIG_Z}
                THEN 1 ELSE 0 END AS significant
    FROM g
"""


HILL_XMIN = 10  # tail threshold: keys with >= this many rows


def hill_alpha(
    df: DataFrame, key_col: str, label: str, xmin: int = HILL_XMIN
) -> DataFrame:
    """Hill (1975) power-law tail-index estimate of a key-frequency
    distribution: alpha = 1 + n / Σ ln(x_i / xmin) over keys with
    count >= xmin. The quantitative companion to key_skew's top-k
    screen — alpha ~< 2 means unbounded variance (expect a hot-key
    problem at scale; salt), alpha >~ 3 means light tail. One
    key-grain count + one 1-row agg; the ln argument is an integer
    ratio, bit-identical pre-libm in both engines."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("x"))
    tail = counts.where(F.col("x") >= xmin)
    return tail.agg(
        F.lit(label).alias("dist"),
        F.lit(xmin).cast("int").alias("xmin"),
        F.count(F.lit(1)).alias("n_tail"),
        # nullif: all tail counts exactly at xmin make the ln-sum 0;
        # NULL alpha in both engines beats engine-specific 0/0 (rule 4)
        F.round(
            F.lit(1.0)
            + F.count(F.lit(1))
            / F.nullif(
                F.sum(F.ln(F.col("x") / F.lit(float(xmin)))), F.lit(0.0)
            )
            + 1e-9,
            4,
        ).alias("alpha"),
    )


def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail index of two key-frequency distributions: lineitem rows
    per part and orders per customer."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    a = hill_alpha(lineitem, "l_partkey", "lineitem_per_part")
    b = hill_alpha(orders, "o_custkey", "orders_per_customer")
    return a.unionByName(b)


HILL_SQL = f"""
    WITH pc AS (
        SELECT l_partkey, count(*) AS x FROM lineitem GROUP BY 1
    ),
    oc AS (
        SELECT o_custkey, count(*) AS x FROM orders GROUP BY 1
    )
    SELECT 'lineitem_per_part' AS dist, {HILL_XMIN} AS xmin,
           CAST(count(*) AS BIGINT) AS n_tail,
           round(1.0 + count(*) / nullif(sum(ln(x * 1.0 / {HILL_XMIN})), 0.0)
                 + 1e-9, 4) AS alpha
    FROM pc WHERE x >= {HILL_XMIN}
    UNION ALL
    SELECT 'orders_per_customer' AS dist, {HILL_XMIN} AS xmin,
           CAST(count(*) AS BIGINT) AS n_tail,
           round(1.0 + count(*) / nullif(sum(ln(x * 1.0 / {HILL_XMIN})), 0.0)
                 + 1e-9, 4) AS alpha
    FROM oc WHERE x >= {HILL_XMIN}
"""


KS_CUTOFF = "1997-01-01"


def ks_statistic(
    a: DataFrame, b: DataFrame, value_col: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic: D = max |ECDF_a(x) −
    ECDF_b(x)|. The second drift detector next to ml.monitoring's PSI
    — PSI needs binning choices, KS is bin-free and catches shape
    changes PSI's 10 quantile bins smooth over. Both ECDFs are
    running-count ratios over the DISTINCT values of the union (one
    tagged union + per-value agg + one ordered window + a 1-row max),
    so the statistic is exact, not sampled. The global-order window
    is the honest cost: at 100 TB run it per segment
    (partitionBy(segment, ...)) or on a deterministic hash sample —
    D converges at O(1/sqrt(n)); note the fixed critical-value scan
    stays exact either way. Ratios of integer counts: bit-identical
    cross-engine, rounded at 6dp only for display."""
    u = a.select(F.col(value_col).alias("x"), F.lit("a").alias("src")).unionByName(
        b.select(F.col(value_col).alias("x"), F.lit("b").alias("src"))
    )
    # aggregate per DISTINCT value first: the ECDF step lands after
    # ALL ties at x (evaluating mid-tie inflates D — e.g. identical
    # samples would read D = 1/n instead of 0)
    per_x = u.groupBy("x").agg(
        F.count_if(F.col("src") == "a").alias("ca_i"),
        F.count_if(F.col("src") == "b").alias("cb_i"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    d = per_x.select(
        F.abs(
            F.sum("ca_i").over(w) / F.sum("ca_i").over(full).cast("double")
            - F.sum("cb_i").over(w) / F.sum("cb_i").over(full).cast("double")
        ).alias("diff"),
        F.sum("ca_i").over(full).alias("n_a"),
        F.sum("cb_i").over(full).alias("n_b"),
    )
    return d.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(F.max("diff") + 1e-9, 6).alias("ks_d"),
    )


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the order-price distribution drift across KS_CUTOFF?"""
    orders = load_table(spark, sf_dir, "orders")
    early = orders.where(
        F.to_date("o_orderdate") < F.lit(KS_CUTOFF).cast("date")
    )
    late = orders.where(
        F.to_date("o_orderdate") >= F.lit(KS_CUTOFF).cast("date")
    )
    return ks_statistic(early, late, "o_totalprice")


KS_SQL = f"""
    WITH u AS (
        -- IS NOT NULL mirrors the Spark side, whose two date filters
        -- both evaluate NULL (excluded) for a NULL o_orderdate; a bare
        -- CASE ELSE would bucket such rows into 'b' here only
        SELECT o_totalprice AS x,
               CASE WHEN CAST(o_orderdate AS DATE) < DATE '{KS_CUTOFF}'
                    THEN 'a' ELSE 'b' END AS src
        FROM orders WHERE o_orderdate IS NOT NULL
    ),
    per_x AS (
        SELECT x,
               count(*) FILTER (src = 'a') AS ca_i,
               count(*) FILTER (src = 'b') AS cb_i
        FROM u GROUP BY x
    ),
    e AS (
        SELECT
            sum(ca_i) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
            sum(cb_i) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
            sum(ca_i) OVER () AS na,
            sum(cb_i) OVER () AS nb
        FROM per_x
    )
    SELECT CAST(max(na) AS BIGINT) AS n_a,
           CAST(max(nb) AS BIGINT) AS n_b,
           round(max(abs(ca * 1.0 / na - cb * 1.0 / nb)) + 1e-9, 6) AS ks_d
    FROM e
"""


CUPED_SPLIT_DAY = "2024-01-16"  # fixture events: Jan 1-30; pre = first half


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng 2013) for the A/B readout: the
    experiment metric (post-period purchase revenue per user) is
    adjusted by the user's PRE-period revenue, Y' = Y − θ(X − X̄) with
    θ = cov(X,Y)/var(X) — removing the between-user variance the
    pre-period explains. The readout every experimentation platform
    ships next to the raw z-test (q_ab_test_ztest). One user-grain
    conditional agg builds (X, Y); θ, X̄ and the variance pair come
    from ONE 1-row aggregate; the output pins θ and the variance-
    reduction ratio (= r², bounded [0,1]). Cross-engine: covar_pop /
    var_pop over identical doubles, rounded at 6dp."""
    events = load_table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT_DAY).cast("date")
    rev = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(0.0)
    users = events.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.col("ts").cast("date") < split, rev).otherwise(0.0))
            + 1e-6,
            2,
        ).alias("pre"),
        F.round(
            F.sum(
                F.when(F.col("ts").cast("date") >= split, rev).otherwise(0.0)
            )
            + 1e-6,
            2,
        ).alias("post"),
    )
    return users.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("pre") + 1e-9, 4).alias("mean_pre"),
        F.round(F.avg("post") + 1e-9, 4).alias("mean_post"),
        # nullif: a constant pre-metric (var_pop = 0) yields NULL theta
        # in both engines, not Spark-NULL-vs-oracle-divergence (rule 4);
        # + 0.0 normalizes the signed zero of a tiny-negative covariance
        (
            F.round(
                F.covar_pop("pre", "post")
                / F.nullif(F.var_pop("pre"), F.lit(0.0))
                + 1e-9,
                6,
            )
            + 0.0
        ).alias("theta"),
        F.round(
            F.pow(F.covar_pop("pre", "post"), 2)
            / F.nullif(F.var_pop("pre") * F.var_pop("post"), F.lit(0.0))
            + 1e-9,
            6,
        ).alias("variance_reduction"),
    )


CUPED_SQL = f"""
    WITH users AS (
        SELECT user_id,
               round(sum(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_SPLIT_DAY}'
                          AND event_type = 'purchase'
                         THEN value ELSE 0.0 END) + 1e-6, 2) AS pre,
               round(sum(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_SPLIT_DAY}'
                          AND event_type = 'purchase'
                         THEN value ELSE 0.0 END) + 1e-6, 2) AS post
        FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(pre) + 1e-9, 4) AS mean_pre,
           round(avg(post) + 1e-9, 4) AS mean_post,
           round(covar_pop(pre, post) / nullif(var_pop(pre), 0.0) + 1e-9, 6)
               + 0.0 AS theta,
           round(pow(covar_pop(pre, post), 2)
                 / nullif(var_pop(pre) * var_pop(post), 0.0) + 1e-9, 6)
               AS variance_reduction
    FROM users
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing the post-period
    purchase-revenue distribution between the md5 A/B variants — the
    rank-based test the experimentation readout needs when the metric
    is heavy-tailed and the z-test's normality assumption is junk
    (revenue always is; cf. q_hill_tail_index). Average ranks come
    from ONE ordered window over the user-grain metric (rank+count
    per distinct value handles ties exactly); U, the tie-corrected
    variance and the normal approximation z are a 1-row aggregate.
    All inputs are integer counts/rank sums — cross-engine exact
    until the final sqrt, rounded at 4dp."""
    events = load_table(spark, sf_dir, "events")
    rev = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(0.0)
    users = events.groupBy("user_id").agg(
        F.round(F.sum(rev) + 1e-6, 2).alias("metric")
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(cast(user_id as string) as binary)),"
        " 1, 8), 16, 10) as bigint) % 2"
    )
    users = users.withColumn(
        "src", F.when(bucket == 0, "a").otherwise("b")
    )
    per_v = users.groupBy("metric").agg(
        F.count_if(F.col("src") == "a").alias("na_i"),
        F.count(F.lit(1)).alias("t_i"),
    )
    w_prev = Window.orderBy("metric").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # average rank of a tied block starting after `before` rows of
    # size t_i: before + (t_i + 1)/2
    ranked = per_v.withColumn(
        "avg_rank",
        F.coalesce(F.sum("t_i").over(w_prev), F.lit(0).cast("bigint"))
        + (F.col("t_i") + 1) / F.lit(2.0),
    )
    g = ranked.agg(
        F.sum("na_i").alias("n_a"),
        F.sum(F.col("t_i") - F.col("na_i")).alias("n_b"),
        F.sum(F.col("na_i") * F.col("avg_rank")).alias("r_a"),
        # tie addends computed in DOUBLE: t*(t^2-1) wraps BIGINT past
        # 2^63 for a ~2e6-row tie block at web scale (silent in Spark,
        # an error in DuckDB). Each addend and every partial sum is an
        # exact integer while < 2^53, so the double sum stays
        # order-independent at any feasible gate scale.
        F.sum(
            F.col("t_i").cast("double")
            * (F.col("t_i").cast("double") * F.col("t_i") - 1)
        ).alias("tie_term"),
    )
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    # n_a promoted before the products: n_a*n_b and n_a*(n_a+1) wrap
    # BIGINT past ~3e9-row arms (oracle mirrors with `* 1.0`)
    n_a_d = F.col("n_a").cast("double")
    u = F.col("r_a") - n_a_d * (F.col("n_a") + 1) / F.lit(2.0)
    mu = n_a_d * F.col("n_b") / F.lit(2.0)
    var = (
        n_a_d
        * F.col("n_b")
        / F.lit(12.0)
        * ((n + 1) - F.col("tie_term") / (n * (n - 1)))
    )
    return g.select(
        "n_a",
        "n_b",
        F.round(u + 1e-9, 2).alias("u_stat"),
        # nullif: all-tied metrics make var 0 (rule 4); + 0.0: rule 7
        (
            F.round(
                (u - mu) / F.nullif(F.sqrt(var), F.lit(0.0)) + 1e-9, 4
            )
            + 0.0
        ).alias("z_score"),
    )


MANN_WHITNEY_SQL = """
    WITH users AS (
        SELECT user_id,
               round(sum(CASE WHEN event_type = 'purchase'
                         THEN value ELSE 0.0 END) + 1e-6, 2) AS metric,
               CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 2 = 0
                    THEN 'a' ELSE 'b' END AS src
        FROM events GROUP BY user_id
    ),
    per_v AS (
        SELECT metric,
               CAST(count(*) FILTER (src = 'a') AS BIGINT) AS na_i,
               CAST(count(*) AS BIGINT) AS t_i
        FROM users GROUP BY metric
    ),
    ranked AS (
        SELECT *,
               coalesce(CAST(sum(t_i) OVER (ORDER BY metric
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) + (t_i + 1) / 2.0 AS avg_rank
        FROM per_v
    ),
    g AS (
        SELECT CAST(sum(na_i) AS BIGINT) AS n_a,
               CAST(sum(t_i - na_i) AS BIGINT) AS n_b,
               sum(na_i * avg_rank) AS r_a,
               sum((t_i * 1.0) * ((t_i * 1.0) * t_i - 1)) AS tie_term
        FROM ranked
    )
    SELECT n_a, n_b,
           round(r_a - n_a * 1.0 * (n_a + 1) / 2.0 + 1e-9, 2) AS u_stat,
           round((r_a - n_a * 1.0 * (n_a + 1) / 2.0 - n_a * 1.0 * n_b / 2.0)
                 / nullif(sqrt(n_a * 1.0 * n_b / 12.0
                        * ((n_a + n_b + 1)
                           - tie_term
                             / ((n_a + n_b) * 1.0 * (n_a + n_b - 1)))), 0.0)
                 + 1e-9, 4) + 0.0 AS z_score
    FROM g
"""


TE_SMOOTHING = 10.0  # pseudo-observations pulled toward the prior


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing — the
    leakage-safe categorical encoder for tree/linear models:
    enc(row) = (sum_y(cat) − y_row + m·prior) / (n(cat) − 1 + m).
    LOO means a row never sees its own label, so the encoding is fit
    ON TRAIN USABLE AT TRAIN without target leakage. Because y is
    binary, the encoder takes exactly TWO values per category —
    reported at (category, y) grain, which pins the full row-level
    semantics at |cats|x2 rows. One hash agg over the scan; all
    inputs integer counts, so both engines divide identical exact
    numerators. Category: order priority; label: order fell through
    (status 'F')."""
    orders = load_table(spark, sf_dir, "orders")
    y = (F.col("o_orderstatus") == "F").cast("int")
    base = orders.select(F.col("o_orderpriority").alias("cat"), y.alias("y"))
    g = base.groupBy("cat", "y").agg(F.count(F.lit(1)).alias("n_rows"))
    wcat = Window.partitionBy("cat")
    wall = Window.partitionBy()
    g = (
        g.withColumn("n_cat", F.sum("n_rows").over(wcat))
        .withColumn("sum_cat", F.sum(F.col("n_rows") * F.col("y")).over(wcat))
        .withColumn("n_all", F.sum("n_rows").over(wall))
        .withColumn("sum_all", F.sum(F.col("n_rows") * F.col("y")).over(wall))
    )
    prior = F.col("sum_all") / F.col("n_all").cast("double")
    enc = (
        F.col("sum_cat") - F.col("y") + F.lit(TE_SMOOTHING) * prior
    ) / (F.col("n_cat") - 1 + F.lit(TE_SMOOTHING)).cast("double")
    return g.select(
        "cat",
        "y",
        "n_rows",
        F.round(prior + 1e-9, 6).alias("prior"),
        F.round(enc + 1e-9, 6).alias("encoded"),
    )


TARGET_ENCODE_SQL = f"""
    WITH base AS (
        SELECT o_orderpriority AS cat,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    g AS (
        SELECT cat, y, CAST(count(*) AS BIGINT) AS n_rows
        FROM base GROUP BY cat, y
    ),
    w AS (
        SELECT *,
               CAST(sum(n_rows) OVER (PARTITION BY cat) AS BIGINT) AS n_cat,
               CAST(sum(n_rows * y) OVER (PARTITION BY cat) AS BIGINT)
                   AS sum_cat,
               CAST(sum(n_rows) OVER () AS BIGINT) AS n_all,
               CAST(sum(n_rows * y) OVER () AS BIGINT) AS sum_all
        FROM g
    )
    SELECT cat, y, n_rows,
           round(sum_all * 1.0 / n_all + 1e-9, 6) AS prior,
           round((sum_cat - y + {TE_SMOOTHING!r} * (sum_all * 1.0 / n_all))
                 / (n_cat - 1 + {TE_SMOOTHING!r}) + 1e-9, 6) AS encoded
    FROM w
"""


def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence + Information Value per category bucket —
    the credit-scoring feature screen: WoE = ln(P(cat|pos)/P(cat|neg)),
    IV contribution = (P(cat|pos) − P(cat|neg))·WoE. The ln argument
    is the exact integer cross-ratio (pos·total_neg)/(neg·total_pos),
    bit-identical pre-libm; one contingency agg + window marginals
    over the |cats|-row table (chi_square_assoc's shape). IV sums
    across buckets rank features: <0.02 useless, >0.3 strong."""
    orders = load_table(spark, sf_dir, "orders")
    y = (F.col("o_orderstatus") == "F").cast("int")
    base = orders.select(F.col("o_orderpriority").alias("cat"), y.alias("y"))
    g = base.groupBy("cat").agg(
        F.sum("y").alias("pos"),
        F.sum(1 - F.col("y")).alias("neg"),
    )
    wall = Window.partitionBy()
    g = g.withColumn("tot_pos", F.sum("pos").over(wall)).withColumn(
        "tot_neg", F.sum("neg").over(wall)
    )
    fp = F.col("pos") / F.col("tot_pos").cast("double")
    fn = F.col("neg") / F.col("tot_neg").cast("double")
    # counts promoted to DOUBLE BEFORE multiplying: a BIGINT*BIGINT
    # marginal product overflows 2^63 at ~1e11-row scale (silent wrap
    # in Spark, a hard error in DuckDB); the double product is
    # correctly rounded and value-identical below 2^53. nullif kills
    # the ln(0) case identically in both engines (a zero-positive
    # bucket hard-errors DuckDB's ln but is NULL in Spark's log).
    ratio = (F.col("pos").cast("double") * F.col("tot_neg")) / (
        F.col("neg").cast("double") * F.col("tot_pos")
    )
    woe = F.log(F.nullif(ratio, F.lit(0.0)))
    return g.select(
        "cat",
        "pos",
        "neg",
        F.round(fp + 1e-9, 6).alias("frac_pos"),
        F.round(fn + 1e-9, 6).alias("frac_neg"),
        (F.round(woe + 1e-9, 6) + 0.0).alias("woe"),  # rule 7
        F.round((fp - fn) * woe + 1e-9, 6).alias("iv_contrib"),
    )


WOE_IV_SQL = """
    WITH g AS (
        SELECT o_orderpriority AS cat,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS BIGINT) AS pos,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                   AS BIGINT) AS neg
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT *,
               CAST(sum(pos) OVER () AS BIGINT) AS tot_pos,
               CAST(sum(neg) OVER () AS BIGINT) AS tot_neg
        FROM g
    )
    SELECT cat, pos, neg,
           round(pos * 1.0 / tot_pos + 1e-9, 6) AS frac_pos,
           round(neg * 1.0 / tot_neg + 1e-9, 6) AS frac_neg,
           round(ln(nullif((pos * 1.0 * tot_neg) / (neg * 1.0 * tot_pos), 0.0))
                 + 1e-9, 6) + 0.0 AS woe,
           round((pos * 1.0 / tot_pos - neg * 1.0 / tot_neg)
                 * ln(nullif((pos * 1.0 * tot_neg) / (neg * 1.0 * tot_pos), 0.0))
                 + 1e-9, 6) AS iv_contrib
    FROM w
"""


def q_psm_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-score matching (1-NN with replacement) — the causal
    readout that belongs next to a propensity engine: every treated
    user is matched to the control with the CLOSEST score, then the
    treated-vs-matched outcome gap estimates the ATT. Score here is
    the user's observable purchase propensity (purchases/events, an
    exact integer ratio); treatment is the deterministic md5 variant.

    Join-free matching: union both arms, ONE total-order window over
    (score, user_id) carries the nearest preceding control forward
    (`last(ignorenulls)`) and the nearest following control backward —
    each treated row picks the closer of the two (ties prefer the
    preceding). This is the as-of union trick (operators/extended
    .py:22-42) applied to nearest-neighbor matching: no
    treated x control join, O(1) window state, the global sort is on
    the |users|-grain frame. Ambiguity-free cross-engine because the
    order (score, user_id) is total and scores are exact ratios
    rounded at 6dp in BOTH engines before ordering."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.round(
            F.count_if(F.col("event_type") == "purchase")
            / F.count(F.lit(1)).cast("double")
            + 1e-9,
            6,
        ).alias("score"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                F.lit(0.0),
            )
            + 1e-6,
            2,
        ).alias("outcome"),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(cast(user_id as string) as binary)),"
        " 1, 8), 16, 10) as bigint) % 2"
    )
    users = users.withColumn("treated", (bucket == 0).cast("int"))
    w_fwd = Window.orderBy("score", "user_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_bwd = (
        Window.orderBy(F.desc("score"), F.desc("user_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ctrl = F.when(F.col("treated") == 0, F.struct("score", "user_id", "outcome"))
    m = users.withColumn(
        "prev_c", F.last(ctrl, ignorenulls=True).over(w_fwd)
    ).withColumn("next_c", F.last(ctrl, ignorenulls=True).over(w_bwd))
    d_prev = F.abs(F.col("score") - F.col("prev_c.score"))
    d_next = F.abs(F.col("score") - F.col("next_c.score"))
    pick_prev = F.col("next_c").isNull() | (
        F.col("prev_c").isNotNull() & (d_prev <= d_next)
    )
    chosen = F.when(pick_prev, F.col("prev_c")).otherwise(F.col("next_c"))
    return (
        m.where((F.col("treated") == 1) & chosen.isNotNull())
        .select(
            "user_id",
            "score",
            "outcome",
            chosen["user_id"].alias("control_id"),
            chosen["score"].alias("control_score"),
            F.round(F.abs(F.col("score") - chosen["score"]) + 1e-9, 6).alias(
                "score_gap"
            ),
            F.round(F.col("outcome") - chosen["outcome"] + 1e-6, 2).alias(
                "att_contrib"
            ),
        )
    )


PSM_SQL = """
    WITH users AS (
        SELECT user_id,
               round(count(*) FILTER (event_type = 'purchase') * 1.0
                     / count(*) + 1e-9, 6) AS score,
               round(coalesce(sum(value) FILTER (event_type = 'purchase'),
                              0.0) + 1e-6, 2) AS outcome,
               CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 2 = 0
                    THEN 1 ELSE 0 END AS treated
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT *,
               last_value(CASE WHEN treated = 0 THEN score END IGNORE NULLS)
                   OVER (ORDER BY score, user_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_score,
               last_value(CASE WHEN treated = 0 THEN user_id END IGNORE NULLS)
                   OVER (ORDER BY score, user_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_id,
               last_value(CASE WHEN treated = 0 THEN outcome END IGNORE NULLS)
                   OVER (ORDER BY score, user_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_outcome,
               last_value(CASE WHEN treated = 0 THEN score END IGNORE NULLS)
                   OVER (ORDER BY score DESC, user_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS next_score,
               last_value(CASE WHEN treated = 0 THEN user_id END IGNORE NULLS)
                   OVER (ORDER BY score DESC, user_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS next_id,
               last_value(CASE WHEN treated = 0 THEN outcome END IGNORE NULLS)
                   OVER (ORDER BY score DESC, user_id DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS next_outcome
        FROM users
    ),
    picked AS (
        SELECT *,
               CASE WHEN next_id IS NULL
                      OR (prev_id IS NOT NULL
                          AND abs(score - prev_score) <= abs(score - next_score))
                    THEN 1 ELSE 0 END AS use_prev
        FROM m WHERE treated = 1
          AND (prev_id IS NOT NULL OR next_id IS NOT NULL)
    )
    SELECT user_id, score, outcome,
           CASE WHEN use_prev = 1 THEN prev_id ELSE next_id END AS control_id,
           CASE WHEN use_prev = 1 THEN prev_score ELSE next_score END
               AS control_score,
           round(abs(score - CASE WHEN use_prev = 1 THEN prev_score
                                  ELSE next_score END) + 1e-9, 6) AS score_gap,
           round(outcome - CASE WHEN use_prev = 1 THEN prev_outcome
                                ELSE next_outcome END + 1e-6, 2) AS att_contrib
    FROM picked
"""


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the md5-assigned arms and the
    CUPED pre/post split: the 2x2 (arm x period) mean-outcome grid in
    ONE conditional aggregate, with the DiD estimate
    (post−pre)_treated − (post−pre)_control broadcast onto each cell
    row. Completes the causal readout family (q_ab_test_ztest raw
    lift, q_cuped_adjustment variance reduction, q_psm_match
    matching): DiD is the one that nets out time trends shared by
    both arms. Exact integer counts; means and the estimate round at
    4dp."""
    events = load_table(spark, sf_dir, "events")
    split = F.lit(CUPED_SPLIT_DAY).cast("date")
    bucket = F.expr(
        "cast(conv(substr(md5(cast(cast(user_id as string) as binary)),"
        " 1, 8), 16, 10) as bigint) % 2"
    )
    rev = F.when(
        F.col("event_type") == "purchase", F.col("value")
    ).otherwise(0.0)
    users = events.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.col("ts").cast("date") < split, rev).otherwise(0.0))
            + 1e-6,
            2,
        ).alias("pre"),
        F.round(
            F.sum(
                F.when(F.col("ts").cast("date") >= split, rev).otherwise(0.0)
            )
            + 1e-6,
            2,
        ).alias("post"),
    ).withColumn("arm", F.when(bucket == 0, "treated").otherwise("control"))
    cells = users.select(
        "arm", F.expr("stack(2, 'pre', pre, 'post', post) AS (period, y)")
    ).groupBy("arm", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("y") + 1e-9, 4).alias("mean_y"),
    )
    w = Window.partitionBy()
    pick = lambda a, p: F.max(  # noqa: E731
        F.when((F.col("arm") == a) & (F.col("period") == p), F.col("mean_y"))
    ).over(w)
    did = (pick("treated", "post") - pick("treated", "pre")) - (
        pick("control", "post") - pick("control", "pre")
    )
    return cells.select(
        "arm",
        "period",
        "n",
        "mean_y",
        F.round(did + 1e-9, 4).alias("did_estimate"),
    )


DID_SQL = f"""
    WITH users AS (
        SELECT user_id,
               CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 2 = 0
                    THEN 'treated' ELSE 'control' END AS arm,
               round(sum(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_SPLIT_DAY}'
                          AND event_type = 'purchase'
                         THEN value ELSE 0.0 END) + 1e-6, 2) AS pre,
               round(sum(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_SPLIT_DAY}'
                          AND event_type = 'purchase'
                         THEN value ELSE 0.0 END) + 1e-6, 2) AS post
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT arm, period, CAST(count(*) AS BIGINT) AS n,
               round(avg(y) + 1e-9, 4) AS mean_y
        FROM (
            SELECT arm, 'pre' AS period, pre AS y FROM users
            UNION ALL
            SELECT arm, 'post' AS period, post AS y FROM users
        ) GROUP BY arm, period
    )
    SELECT arm, period, n, mean_y,
           round(
             (max(CASE WHEN arm = 'treated' AND period = 'post'
                       THEN mean_y END) OVER ()
              - max(CASE WHEN arm = 'treated' AND period = 'pre'
                         THEN mean_y END) OVER ())
             - (max(CASE WHEN arm = 'control' AND period = 'post'
                         THEN mean_y END) OVER ()
                - max(CASE WHEN arm = 'control' AND period = 'pre'
                           THEN mean_y END) OVER ())
             + 1e-9, 4) AS did_estimate
    FROM cells
"""


UPLIFT_DECILES = 10


def q_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift (Qini) readout by score decile: users ranked by an
    observable propensity score are cut into deciles over a TOTAL
    order (score desc, user_id — deterministic ntile in both
    engines), and each decile compares conversion between the md5
    arms: uplift = rate_treated − rate_control, plus the running
    Qini-style cumulative incremental conversions normalized by
    cumulative treated count. The uplift-model evaluation that
    belongs beside decile_lift (which ranks a response model; this
    ranks an INCREMENTAL-effect model). One user-grain agg + one
    global ntile window over |users| rows + a 10-row agg; for 10^9
    users swap the ntile for percentile_approx decile BOUNDARIES and
    a map-side bucket lookup (the RFM escape hatch,
    operators/behavior.q_rfm_segments)."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.round(
            F.count_if(F.col("event_type") == "purchase")
            / F.count(F.lit(1)).cast("double")
            + 1e-9,
            6,
        ).alias("score"),
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted"),
    )
    bucket = F.expr(
        "cast(conv(substr(md5(cast(cast(user_id as string) as binary)),"
        " 1, 8), 16, 10) as bigint) % 2"
    )
    users = users.withColumn("treated", (bucket == 0).cast("int"))
    w = Window.orderBy(F.desc("score"), "user_id")
    decs = users.withColumn(
        "decile", F.ntile(UPLIFT_DECILES).over(w)
    ).groupBy("decile").agg(
        F.count_if(F.col("treated") == 1).alias("n_t"),
        F.sum(F.col("treated") * F.col("converted")).alias("conv_t"),
        F.count_if(F.col("treated") == 0).alias("n_c"),
        F.sum((1 - F.col("treated")) * F.col("converted")).alias("conv_c"),
    )
    run = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rate_t = F.col("conv_t") / F.col("n_t").cast("double")
    rate_c = F.col("conv_c") / F.col("n_c").cast("double")
    cum_qini = (
        F.sum("conv_t").over(run)
        - F.sum("conv_c").over(run)
        * F.sum("n_t").over(run)
        / F.sum("n_c").over(run).cast("double")
    ) / F.sum("n_t").over(run).cast("double")
    return decs.select(
        "decile",
        "n_t",
        "conv_t",
        "n_c",
        "conv_c",
        F.round(rate_t - rate_c + 1e-9, 6).alias("uplift"),
        F.round(cum_qini + 1e-9, 6).alias("cum_qini_per_treated"),
    )


QINI_SQL = f"""
    WITH users AS (
        SELECT user_id,
               round(count(*) FILTER (event_type = 'purchase') * 1.0
                     / count(*) + 1e-9, 6) AS score,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 2 = 0
                    THEN 1 ELSE 0 END AS treated
        FROM events GROUP BY user_id
    ),
    decs AS (
        SELECT ntile({UPLIFT_DECILES})
                   OVER (ORDER BY score DESC, user_id) AS decile,
               treated, converted
        FROM users
    ),
    g AS (
        SELECT decile,
               CAST(count(*) FILTER (treated = 1) AS BIGINT) AS n_t,
               CAST(sum(treated * converted) AS BIGINT) AS conv_t,
               CAST(count(*) FILTER (treated = 0) AS BIGINT) AS n_c,
               CAST(sum((1 - treated) * converted) AS BIGINT) AS conv_c
        FROM decs GROUP BY decile
    )
    SELECT decile, n_t, conv_t, n_c, conv_c,
           round(conv_t * 1.0 / n_t - conv_c * 1.0 / n_c + 1e-9, 6)
               AS uplift,
           round((sum(conv_t) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - sum(conv_c) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    * 1.0
                    * sum(n_t) OVER (ORDER BY decile
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    / sum(n_c) OVER (ORDER BY decile
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 / sum(n_t) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 + 1e-9, 6) AS cum_qini_per_treated
    FROM g
"""


def cat_entropy(df: DataFrame, key_col: str, cat_col: str) -> DataFrame:
    """Per-key Shannon entropy (nats) + Gini impurity + normalized
    entropy of a categorical column's distribution — the univariate
    feature screen next to mutual_information's bivariate one (a
    near-zero entropy column carries no signal; normalized entropy
    near 1 means uniform). One (key, cat) count agg + per-key window
    sums: two shuffles on the key, no collect."""
    cells = df.groupBy(key_col, cat_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(key_col)
    withp = cells.select(
        key_col,
        (F.col("c") / F.sum("c").over(w)).alias("p"),
        F.count(F.lit(1)).over(w).alias("k_cats"),
    )
    return withp.groupBy(key_col, "k_cats").agg(
        F.round(-F.sum(F.expr("p * ln(p)")) + 1e-9, 6).alias("entropy"),
        F.round(F.lit(1.0) - F.sum(F.expr("p * p")) + 1e-9, 6).alias("gini"),
        F.round(
            F.when(
                F.col("k_cats") > 1,
                -F.sum(F.expr("p * ln(p)")) / F.log(F.col("k_cats").cast("double")),
            ).otherwise(F.lit(0.0))
            + 1e-9,
            6,
        ).alias("norm_entropy"),
    ).select(
        key_col,
        F.col("k_cats").cast("int").alias("k_cats"),
        "entropy",
        "gini",
        "norm_entropy",
    )


def q_cat_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: per-user entropy/gini of the event-type mix — a
    behavioral-diversity feature (single-minded vs broad users)."""
    events = load_table(spark, sf_dir, "events")
    return cat_entropy(events, "user_id", "event_type")


CAT_ENTROPY_SQL = """
    WITH cells AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    withp AS (
        SELECT user_id,
               c * 1.0 / sum(c) OVER (PARTITION BY user_id) AS p,
               count(*) OVER (PARTITION BY user_id) AS k_cats
        FROM cells
    )
    SELECT user_id, CAST(k_cats AS INT) AS k_cats,
           round(-sum(p * ln(p)) + 1e-9, 6) AS entropy,
           round(1.0 - sum(p * p) + 1e-9, 6) AS gini,
           round(CASE WHEN k_cats > 1
                      THEN -sum(p * ln(p)) / ln(k_cats)
                      ELSE 0.0 END + 1e-9, 6) AS norm_entropy
    FROM withp GROUP BY user_id, k_cats
"""


def quantile_normalize(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """ECDF rank transform per key: percent_rank (0 at the min, 1 at
    the max, ties share a rank) and cume_dist (P(X <= x), the proper
    ECDF) — the distribution-free normalization for heavy-tailed
    features where z-scores break (feature_scaling's robust sibling).
    One sort-window per key; a single hot key serializes its
    partition, so for 10^9-row keys swap percent_rank for a
    percentile_approx-bucketed lookup (the quantile_bucket escape
    hatch) — exactness here, sketches at the extreme."""
    w = Window.partitionBy(key_col).orderBy(value_col)
    return df.select(
        key_col,
        F.col(value_col).alias("value"),
        F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w) + 1e-9, 6).alias("ecdf"),
    )


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: ECDF-normalize event values within each event type,
    rolled up to the (type, value) grain so the output is the
    deterministic normalization TABLE (join it back to facts to apply;
    same shape as a learned preprocessing artifact)."""
    events = load_table(spark, sf_dir, "events")
    # +1e-9 nudge on the GRAIN KEY round (the file-wide half-boundary
    # convention): without it a value one ulp below a .xxxx5 boundary
    # rounds up under Spark's BigDecimal HALF_UP but down under
    # DuckDB's binary-double rounding, splitting/merging grain rows
    grains = events.groupBy(
        "event_type", F.round(F.col("value") + 1e-9, 4).alias("value")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    # ECDF over the raw distribution = weighted ranks over the grains:
    # cume = running sum of counts / total, pct_rank uses the count of
    # strictly-smaller rows.
    w = Window.partitionBy("event_type").orderBy("value")
    tot = Window.partitionBy("event_type")
    run = F.sum("n_rows").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("n_rows").over(tot)
    return grains.select(
        "event_type",
        "value",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        # total == 1 (a type with a single grain row) would divide by
        # zero — NULL in Spark but NaN/inf under DuckDB's IEEE floats;
        # pin the degenerate ECDF rank to 0.0 identically in both.
        F.when(
            total > 1,
            F.round((run - F.col("n_rows")) / (total - 1) + 1e-9, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        F.round(run / total + 1e-9, 6).alias("ecdf"),
    )


QUANTILE_NORMALIZE_SQL = """
    WITH grains AS (
        SELECT event_type, round(value + 1e-9, 4) AS value, count(*) AS n_rows
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, value, CAST(n_rows AS BIGINT) AS n_rows,
           CASE WHEN sum(n_rows) OVER (PARTITION BY event_type) > 1
                THEN round((sum(n_rows) OVER (PARTITION BY event_type
                               ORDER BY value ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW)
                            - n_rows) * 1.0
                           / (sum(n_rows) OVER (PARTITION BY event_type) - 1)
                           + 1e-9, 6)
                ELSE 0.0 END AS pct_rank,
           round(sum(n_rows) OVER (PARTITION BY event_type ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1.0 / sum(n_rows) OVER (PARTITION BY event_type)
                 + 1e-9, 6) AS ecdf
    FROM grains
"""


# Wald SPRT boundaries for the sequential A/B monitor: alpha = beta =
# 0.05, H1 = treatment converts at SPRT_LIFT x the control rate. Under
# H0 each conversion is equally likely from either (equal-split) arm;
# under H1 it comes from treatment w.p. r/(1+r) — the conversion-race
# formulation, which needs only per-arm conversion COUNTS, no rates.
SPRT_LIFT = 1.5
SPRT_ALPHA = 0.05
SPRT_BETA = 0.05


def sprt_monitor(daily_counts: DataFrame) -> DataFrame:
    """Sequential probability ratio test over a (day, conv_t, conv_c)
    daily conversion table: cumulative log-likelihood ratio
    llr = cum_t * ln(2r/(1+r)) + cum_c * ln(2/(1+r)) with Wald
    boundaries — the peek-safe monitor a daily experiment dashboard
    needs (the fixed-horizon z-test is ab_test_ztest). Integer
    cumulative counts make the LLR bit-deterministic. One global
    day-ordered window over ~|days| rows — the heavy lifting is the
    upstream per-day agg, which partitions freely."""
    import math

    r = SPRT_LIFT
    lt = math.log(2 * r / (1 + r))
    lc = math.log(2 / (1 + r))
    hi = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
    lo = math.log(SPRT_BETA / (1 - SPRT_ALPHA))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_t = F.sum("conv_t").over(w)
    cum_c = F.sum("conv_c").over(w)
    llr = cum_t * F.lit(lt) + cum_c * F.lit(lc)
    return daily_counts.select(
        "day",
        cum_t.cast("bigint").alias("cum_conv_t"),
        cum_c.cast("bigint").alias("cum_conv_c"),
        F.round(llr + 1e-9, 6).alias("llr"),
        F.when(llr >= hi, F.lit("accept_h1"))
        .when(llr <= lo, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: SPRT trajectory over the md5-arm purchase counts
    by day — same deterministic assignment as ab_test_ztest, read
    sequentially instead of at a fixed horizon."""
    events = load_table(spark, sf_dir, "events")
    arm = F.expr(
        "cast(conv(substr(md5(cast(cast(user_id as string) as binary)),"
        " 1, 8), 16, 10) as bigint) % 2"
    )
    daily = (
        events.where(F.col("event_type") == "purchase")
        .select(F.to_date("ts").alias("day"), arm.alias("arm"))
        .groupBy("day")
        .agg(
            F.count_if(F.col("arm") == 0).alias("conv_t"),
            F.count_if(F.col("arm") == 1).alias("conv_c"),
        )
    )
    return sprt_monitor(daily)


def _sprt_sql() -> str:
    import math

    r = SPRT_LIFT
    lt = math.log(2 * r / (1 + r))
    lc = math.log(2 / (1 + r))
    hi = math.log((1 - SPRT_BETA) / SPRT_ALPHA)
    lo = math.log(SPRT_BETA / (1 - SPRT_ALPHA))
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               count(*) FILTER (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                       1, 8)) AS BIGINT) % 2 = 0) AS conv_t,
               count(*) FILTER (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                       1, 8)) AS BIGINT) % 2 = 1) AS conv_c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1
    ),
    cum AS (
        SELECT day,
               sum(conv_t) OVER w AS cum_conv_t,
               sum(conv_c) OVER w AS cum_conv_c
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT day, CAST(cum_conv_t AS BIGINT) AS cum_conv_t,
           CAST(cum_conv_c AS BIGINT) AS cum_conv_c,
           round(cum_conv_t * {lt!r} + cum_conv_c * {lc!r} + 1e-9, 6) AS llr,
           CASE WHEN cum_conv_t * {lt!r} + cum_conv_c * {lc!r} >= {hi!r}
                    THEN 'accept_h1'
                WHEN cum_conv_t * {lt!r} + cum_conv_c * {lc!r} <= {lo!r}
                    THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
"""


SPRT_SQL = _sprt_sql()


def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log demand curve per brand: slope of ln(quantity) on
    ln(1 - discount) across lineitems with a positive discount — the
    textbook constant-elasticity estimate (price enters via the
    discount multiplier; list price is constant within a part). One
    broadcast dim join + one brand agg over regr_* accumulators (all
    map-side combinable); slope/r2 rounded to 6dp. Brands with < 30
    discounted rows are dropped (estimate too noisy to report)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    obs = (
        # l_discount < 1: a 100% discount has undefined log-price —
        # and ln(0) is NULL in Spark but a hard ERROR in DuckDB
        li.where(
            (F.col("l_discount") > 0)
            & (F.col("l_discount") < 1)
            & (F.col("l_quantity") > 0)
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            F.log(F.col("l_quantity")).alias("lq"),
            F.log(F.lit(1.0) - F.col("l_discount")).alias("lp"),
        )
    )
    return (
        obs.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.expr("regr_slope(lq, lp)") + 1e-9, 6).alias("elasticity"),
            F.round(F.expr("regr_r2(lq, lp)") + 1e-9, 6).alias("r2"),
        )
        .where(F.col("n_obs") >= 30)
        .select(
            "brand", F.col("n_obs").cast("bigint").alias("n_obs"), "elasticity", "r2"
        )
    )


PRICE_ELASTICITY_SQL = """
    WITH obs AS (
        SELECT p.p_brand AS brand,
               ln(l.l_quantity) AS lq,
               ln(1.0 - l.l_discount) AS lp
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_discount > 0 AND l.l_discount < 1 AND l.l_quantity > 0
    )
    SELECT brand, CAST(count(*) AS BIGINT) AS n_obs,
           round(regr_slope(lq, lp) + 1e-9, 6) AS elasticity,
           round(regr_r2(lq, lp) + 1e-9, 6) AS r2
    FROM obs GROUP BY brand
    HAVING count(*) >= 30
"""


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median (and p25/p75) of unit price per
    brand: the order statistic where half the UNITS sit below, not
    half the rows — the right center for volume-skewed pricing.
    Collapse to (brand, price) grains with summed weights, one
    brand-partitioned running-weight window, pick the first grain
    whose cumulative weight crosses each target (lower weighted
    percentile; integer-exact crossing test: 2*cum >= total for the
    median etc., no float quantile arithmetic). |grains| << |rows|,
    so the sort-window runs on the collapsed table."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    grains = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_extendedprice") / F.col("l_quantity") + 1e-6, 2).alias("price"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    )
    win = Window.partitionBy("brand").orderBy("price")
    tot = Window.partitionBy("brand")
    cum = F.sum("w").over(win.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    total = F.sum("w").over(tot)
    marked = grains.select(
        "brand",
        "price",
        cum.alias("cum"),
        (cum - F.col("w")).alias("prev"),
        total.alias("total"),
    )
    # first grain crossing q: prev*den < q_num*total AND cum*den >= q_num*total
    def pick(num: int, den: int, name: str):
        return F.max(
            F.when(
                (F.col("prev") * den < F.col("total") * num)
                & (F.col("cum") * den >= F.col("total") * num),
                F.col("price"),
            )
        ).alias(name)

    return marked.groupBy("brand").agg(
        F.max(F.col("total")).cast("bigint").alias("total_units"),
        pick(1, 4, "wp25"),
        pick(1, 2, "wmedian"),
        pick(3, 4, "wp75"),
    )


WEIGHTED_MEDIAN_SQL = """
    WITH grains AS (
        SELECT p.p_brand AS brand,
               round(l.l_extendedprice / l.l_quantity + 1e-6, 2) AS price,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    marked AS (
        SELECT brand, price,
               sum(w) OVER (PARTITION BY brand ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(w) OVER (PARTITION BY brand ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - w AS prev,
               sum(w) OVER (PARTITION BY brand) AS total
        FROM grains
    )
    SELECT brand, CAST(max(total) AS BIGINT) AS total_units,
           max(CASE WHEN prev * 4 < total * 1 AND cum * 4 >= total * 1
                    THEN price END) AS wp25,
           max(CASE WHEN prev * 2 < total * 1 AND cum * 2 >= total * 1
                    THEN price END) AS wmedian,
           max(CASE WHEN prev * 4 < total * 3 AND cum * 4 >= total * 3
                    THEN price END) AS wp75
    FROM marked GROUP BY brand
"""


THRESHOLD_GRID = [i / 10.0 for i in range(1, 10)]


def threshold_sweep(scored: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Classifier operating-point table: confusion counts + precision/
    recall/F1 at each fixed threshold — the eval surface behind ROC
    threshold choices, computed WITHOUT per-threshold scans: all
    4 x |grid| conditional sums are expressions in ONE hash aggregate
    over a single pass, then the 1-row result unpivots map-side to
    the 9-row table. Integer counts, exact ratios rounded 6dp."""
    aggs = []
    for i, t in enumerate(THRESHOLD_GRID):
        pred = F.col(score_col) >= F.lit(t)
        pos = F.col(label_col) == 1
        aggs += [
            F.sum((pred & pos).cast("bigint")).alias(f"tp{i}"),
            F.sum((pred & ~pos).cast("bigint")).alias(f"fp{i}"),
            F.sum(((~pred) & pos).cast("bigint")).alias(f"fn{i}"),
            F.sum(((~pred) & ~pos).cast("bigint")).alias(f"tn{i}"),
        ]
    one = scored.agg(*aggs)
    rows = []
    for i, t in enumerate(THRESHOLD_GRID):
        rows.append(
            f"struct(cast({t} as double) as threshold,"
            f" tp{i} as tp, fp{i} as fp, fn{i} as fn, tn{i} as tn)"
        )
    stacked = one.select(
        F.explode(F.expr("array({})".format(",".join(rows)))).alias("r")
    ).select("r.*")
    # nullif guards (rule 4): a threshold that passes zero rows (tp+fp
    # = 0) or catches zero positives either way (prec = rec = 0) gets
    # NULL, identically in both engines, instead of engine-specific 0/0
    prec = F.col("tp") / F.nullif(
        (F.col("tp") + F.col("fp")).cast("double"), F.lit(0.0)
    )
    rec = F.col("tp") / F.nullif(
        (F.col("tp") + F.col("fn")).cast("double"), F.lit(0.0)
    )
    return stacked.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec + 1e-9, 6).alias("precision"),
        F.round(rec + 1e-9, 6).alias("recall"),
        F.round(
            2 * prec * rec / F.nullif(prec + rec, F.lit(0.0)) + 1e-9, 6
        ).alias("f1"),
    )


def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: operating points for the observable propensity
    score (per-user purchase share, the qini_uplift score) against
    the converted label."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.round(
            F.count_if(F.col("event_type") == "purchase")
            / F.count(F.lit(1)).cast("double")
            + 1e-9,
            6,
        ).alias("score"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("label"),
    )
    return threshold_sweep(users, "score", "label")


def _threshold_sql() -> str:
    rows = []
    for t in THRESHOLD_GRID:
        rows.append(f"""
        SELECT CAST({t} AS DOUBLE) AS threshold,
               CAST(count(*) FILTER (score >= {t} AND label = 1) AS BIGINT) AS tp,
               CAST(count(*) FILTER (score >= {t} AND label = 0) AS BIGINT) AS fp,
               CAST(count(*) FILTER (score < {t} AND label = 1) AS BIGINT) AS fn,
               CAST(count(*) FILTER (score < {t} AND label = 0) AS BIGINT) AS tn
        FROM users""")
    union = "\n        UNION ALL".join(rows)
    return f"""
    WITH users AS MATERIALIZED (
        SELECT user_id,
               round(count(*) FILTER (event_type = 'purchase') * 1.0
                     / count(*) + 1e-9, 6) AS score,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ),
    grid AS ({union})
    SELECT threshold, tp, fp, fn, tn,
           round(tp * 1.0 / nullif(tp + fp, 0) + 1e-9, 6) AS precision,
           round(tp * 1.0 / nullif(tp + fn, 0) + 1e-9, 6) AS recall,
           round(2.0 * (tp * 1.0 / nullif(tp + fp, 0))
                     * (tp * 1.0 / nullif(tp + fn, 0))
                 / nullif(tp * 1.0 / nullif(tp + fp, 0)
                          + tp * 1.0 / nullif(tp + fn, 0), 0.0)
                 + 1e-9, 6) AS f1
    FROM grid
"""


THRESHOLD_SWEEP_SQL = _threshold_sql()


# Poisson(1) CDF thresholds for the hashed bootstrap draw (exact
# double literals, identical CASE chains both engines; tail capped at 6)
_POIS1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]
BOOTSTRAP_B = 32


def _poisson_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS1_CDF)
    )
    return f"CASE {branches} ELSE 6 END"


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al. — THE distributed
    bootstrap: multinomial resampling needs global coordination;
    per-row independent Poisson(1) weights need none) for the mean
    purchase value: B=32 resamples whose weights are DETERMINISTIC
    md5(event_id:b) draws mapped through the exact Poisson CDF chain,
    so the whole CI is reproducible and oracle-checkable — no RNG
    state anywhere. One explode to B rows per observation, one
    (b)-keyed agg, order statistics over the B-row mean table.
    Reports the plug-in mean, bootstrap SE, and positional 5%/95%
    bounds."""
    events = load_table(spark, sf_dir, "events")
    obs = events.where(F.col("event_type") == "purchase").select(
        "event_id", F.col("value").alias("y")
    )
    u = (
        "cast(conv(substr(md5(cast(concat(cast(event_id as string), ':',"
        " cast(b as string)) as binary)), 1, 12), 16, 10) as bigint)"
        f" / cast({1 << 48} as double)"
    )
    drawn = obs.select(
        "event_id", "y", F.explode(F.expr(f"sequence(1, {BOOTSTRAP_B})")).alias("b")
    ).withColumn("k", F.expr(_poisson_case(u)))
    means = drawn.groupBy("b").agg(
        F.round(
            F.sum(F.col("k") * F.col("y")) / F.sum("k") + 1e-9, 6
        ).alias("m")
    )
    w = Window.orderBy("m")
    lo_pos = max(1, int(0.05 * BOOTSTRAP_B))
    hi_pos = BOOTSTRAP_B - lo_pos + 1
    ranked = means.withColumn("r", F.row_number().over(w))
    stats = means.agg(
        F.round(F.stddev_samp("m") + 1e-9, 6).alias("se_boot")
    )
    point = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("y") + 1e-9, 6).alias("point_mean"),
    )
    bounds = ranked.agg(
        F.max(F.when(F.col("r") == lo_pos, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("r") == hi_pos, F.col("m"))).alias("ci_hi"),
    )
    return (
        point.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(bounds))
        .select(
            "n",
            "point_mean",
            "se_boot",
            "ci_lo",
            "ci_hi",
            F.lit(BOOTSTRAP_B).cast("int").alias("n_resamples"),
        )
    )


def _bootstrap_sql() -> str:
    u = (
        "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'"
        f" || CAST(b AS VARCHAR)), 1, 12)) AS BIGINT) / CAST({1 << 48} AS DOUBLE)"
    )
    lo_pos = max(1, int(0.05 * BOOTSTRAP_B))
    hi_pos = BOOTSTRAP_B - lo_pos + 1
    return f"""
    WITH obs AS (
        SELECT event_id, value AS y FROM events WHERE event_type = 'purchase'
    ),
    drawn AS (
        SELECT y, b, {_poisson_case(u)} AS k
        FROM obs, (SELECT unnest(range(1, {BOOTSTRAP_B + 1})) AS b)
    ),
    means AS (
        SELECT b, round(sum(k * y) / sum(k) + 1e-9, 6) AS m
        FROM drawn GROUP BY b
    ),
    ranked AS (
        SELECT m, row_number() OVER (ORDER BY m) AS r FROM means
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM obs) AS n,
           (SELECT round(avg(y) + 1e-9, 6) FROM obs) AS point_mean,
           (SELECT round(stddev_samp(m) + 1e-9, 6) FROM means) AS se_boot,
           max(CASE WHEN r = {lo_pos} THEN m END) AS ci_lo,
           max(CASE WHEN r = {hi_pos} THEN m END) AS ci_hi,
           {BOOTSTRAP_B} AS n_resamples
    FROM ranked
"""


BOOTSTRAP_SQL = _bootstrap_sql()


IPW_BUCKETS = 5


def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted ATE for a SELF-SELECTED treatment
    (clicked at least once) on purchase conversion, deconfounded by
    activity level: propensity e(x) = P(T | activity bucket) from
    exact bucket counts (no model — stratified IPW), ATE = mean of
    y*t/e(x) - y*(1-t)/(1-e(x)). Reported beside the naive
    treated-vs-control difference the confounder inflates. The
    Horvitz-Thompson member of the causal family (psm_match matches,
    diff_in_diff nets trends, cuped reduces variance, this reweights).
    Buckets are deterministic integer activity floors via ntile on a
    total order; every quantity is an integer-count ratio."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("activity"),
        F.max((F.col("event_type") == "click").cast("int")).alias("t"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("y"),
    )
    w = Window.orderBy("activity", "user_id")
    users = users.withColumn("bucket", F.ntile(IPW_BUCKETS).over(w))
    e = users.groupBy("bucket").agg(
        (F.sum("t") / F.count(F.lit(1))).alias("e"),
        F.count(F.lit(1)).alias("nb"),
    )
    j = users.join(F.broadcast(e), "bucket")
    # guard degenerate buckets (e = 0 or 1, i.e. an all-treated or
    # all-control stratum): their users contribute 0.0 to the IPW sum in
    # BOTH engines — the estimand is then the ATE over identifiable
    # strata only, biased toward zero by the degenerate stratum's weight
    # share. Callers needing full coverage should coarsen IPW_BUCKETS
    # until every stratum has both arms.
    term = F.when(
        (F.col("e") > 0) & (F.col("e") < 1),
        F.col("y") * F.col("t") / F.col("e")
        - F.col("y") * (1 - F.col("t")) / (1 - F.col("e")),
    ).otherwise(F.lit(0.0))
    stats = j.agg(
        F.round(F.avg(term) + 1e-9, 6).alias("ate_ipw"),
        F.round(
            F.sum(F.col("y") * F.col("t")) / F.sum("t")
            - F.sum(F.col("y") * (1 - F.col("t"))) / F.sum(1 - F.col("t"))
            + 1e-9,
            6,
        ).alias("ate_naive"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("t").cast("bigint").alias("n_treated"),
    )
    return stats


IPW_SQL = f"""
    WITH users AS (
        SELECT user_id, count(*) AS activity,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    bucketed AS (
        SELECT *, ntile({IPW_BUCKETS})
                   OVER (ORDER BY activity, user_id) AS bucket
        FROM users
    ),
    e AS (
        SELECT bucket, sum(t) * 1.0 / count(*) AS e FROM bucketed GROUP BY bucket
    )
    SELECT round(avg(CASE WHEN e.e > 0 AND e.e < 1
                     THEN b.y * b.t / e.e - b.y * (1 - b.t) / (1 - e.e)
                     ELSE 0.0 END) + 1e-9, 6) AS ate_ipw,
           round(sum(b.y * b.t) * 1.0 / sum(b.t)
                 - sum(b.y * (1 - b.t)) * 1.0 / sum(1 - b.t) + 1e-9, 6)
               AS ate_naive,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(b.t) AS BIGINT) AS n_treated
    FROM bucketed b JOIN e ON b.bucket = e.bucket
"""


# --- gate registration (moved from the retired operators/overflow.py shim) ---
# Entries past the driver's 50-row budget register here, next to their
# operators; __spark_entry__ merges every module's QUERIES/ORACLES and
# DRIVER_GATE_PRIORITY decides what the driver sees.
QUERIES = {
    "chi_square_assoc": q_chi_square_assoc,
    "quantile_bucket": q_quantile_bucket,
    "key_skew": q_key_skew,
    "stratified_sample": q_stratified_sample,
    "anomaly_mad": q_anomaly_mad,
    "cv_fold_audit": q_cv_fold_audit,
    "feature_scaling": q_feature_scaling,
    "benford_audit": q_benford_audit,
    "mutual_information": q_mutual_information,
    "ab_test_ztest": q_ab_test_ztest,
    "hill_tail_index": q_hill_tail_index,
    "ks_drift": q_ks_drift,
    "cuped_adjustment": q_cuped_adjustment,
    "mann_whitney": q_mann_whitney,
    "target_encode": q_target_encode,
    "woe_iv": q_woe_iv,
    "psm_match": q_psm_match,
    "diff_in_diff": q_diff_in_diff,
    "qini_uplift": q_qini_uplift,
    "cat_entropy": q_cat_entropy,
    "quantile_normalize": q_quantile_normalize,
    "sprt_monitor": q_sprt_monitor,
    "price_elasticity": q_price_elasticity,
    "weighted_median": q_weighted_median,
    "threshold_sweep": q_threshold_sweep,
    "bootstrap_ci": q_bootstrap_ci,
    "ipw_ate": q_ipw_ate,
}

ORACLES = {
    "chi_square_assoc": CHI_SQUARE_SQL,
    "quantile_bucket": QUANTILE_BUCKET_SQL,
    "key_skew": KEY_SKEW_SQL,
    "stratified_sample": STRATIFIED_SQL,
    "anomaly_mad": ANOMALY_SQL,
    "cv_fold_audit": CV_FOLDS_SQL,
    "feature_scaling": FEATURE_SCALING_SQL,
    "benford_audit": BENFORD_SQL,
    "mutual_information": MUTUAL_INFO_SQL,
    "ab_test_ztest": AB_TEST_SQL,
    "hill_tail_index": HILL_SQL,
    "ks_drift": KS_SQL,
    "cuped_adjustment": CUPED_SQL,
    "mann_whitney": MANN_WHITNEY_SQL,
    "target_encode": TARGET_ENCODE_SQL,
    "woe_iv": WOE_IV_SQL,
    "psm_match": PSM_SQL,
    "diff_in_diff": DID_SQL,
    "qini_uplift": QINI_SQL,
    "cat_entropy": CAT_ENTROPY_SQL,
    "quantile_normalize": QUANTILE_NORMALIZE_SQL,
    "sprt_monitor": SPRT_SQL,
    "price_elasticity": PRICE_ELASTICITY_SQL,
    "weighted_median": WEIGHTED_MEDIAN_SQL,
    "threshold_sweep": THRESHOLD_SWEEP_SQL,
    "bootstrap_ci": BOOTSTRAP_SQL,
    "ipw_ate": IPW_SQL,
}

"""Extended operator surface beyond the reference's inventory
(SURVEY.md §2.3 'not present' / §2.4 notes / §7): as-of join,
exact-interpolated percentiles, grouping sets/rollup/cube, approximate
distinct, the explicit-schema CSV/ORC/JSON ingest round-trips (S1), and
six TPC-H query shapes.

These close the gap between "what the reference composes" and "what a
user of a general Spark analytics engine expects to run". Result sets
with heterogeneous schemas (the grouping-set family, the TPC-H suites)
are melted to a shared (q, k, metric, value) shape so each family is
ONE correctness-gate entry while every underlying value stays checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propensity_spark.io import SCHEMAS, load_table, read_csv


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (range semantics the reference deliberately lacks,
    04a:599): each event gets the most recent prior-or-equal 'signup'
    timestamp of the same user. Implemented as last(ignorenulls) over
    an ordered window — ONE shuffle on user_id, no range explode; the
    same plan at 100 TB (contrast pd.merge_asof per group, which would
    serialize each user through Python)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.unix_timestamp(
            F.last(F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True).over(w)
        ).alias("last_signup_epoch"),
    )


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Range (interval) join as an EQUI-join: point p matches range
    [start, end). A naive theta-join plans as BroadcastNestedLoopJoin /
    cartesian — O(|points| x |ranges|) compares, the classic 100 TB
    killer. Instead both sides are quantized to coarse buckets of
    `bucket_width`: each range explodes into the (few) buckets it
    overlaps, each point computes its single bucket, the join runs as a
    hash join on the bucket key, and the exact [start, end) predicate
    filters residues after the match. Compare cost drops to
    O(rows_per_bucket) per bucket; the plan is a shuffled (or broadcast,
    if `ranges` is small) hash join that scales horizontally. Same idea
    as the published bin-based range-join optimization in Spark-ecosystem
    engines. Pick `bucket_width` ~ the typical range length so ranges
    explode into <= 2 buckets.

    Reference parity: the reference has no range join (SURVEY.md §2.3);
    this generalizes its date-window predicates (04a:138-156) to
    arbitrary interval joins."""
    b = F.lit(bucket_width)
    pts = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    rng = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b),
                F.floor((F.col(end_col) - F.lit(1)) / b),
            )
        ),
    )
    return pts.join(
        rng,
        (pts["__bucket"] == rng["__bucket"])
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col)),
    ).drop("__bucket")


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events x overlapping campaign windows via bucketed_range_join.
    The window table derives deterministically from the data: window i
    (one per nation key, 25 of them) spans [d0 + 2i, d0 + 2i + 5) days
    where d0 = the first event day — overlapping 5-day windows stepping
    2 days, so most days match two or three windows. The anchor day d0
    comes from a broadcast 1-row aggregate (no driver collect)."""
    events = load_table(spark, sf_dir, "events").select(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        "value",
    )
    d0 = events.agg(F.min("day").alias("d0"))
    windows = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").cast("long").alias("window_id"))
        .crossJoin(F.broadcast(d0))
        .select(
            "window_id",
            (F.col("d0") + F.col("window_id") * 2).alias("start_day"),
            (F.col("d0") + F.col("window_id") * 2 + 5).alias("end_day"),
        )
    )
    joined = bucketed_range_join(events, windows, "day", "start_day", "end_day", 5)
    return joined.groupBy("window_id", "start_day", "end_day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value") + 1e-6, 2).alias("sum_value"),
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per market segment (the
    approx_percentile twin is in q_approx_stats, rows-only)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)") + 1e-9, 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)") + 1e-9, 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)") + 1e-9, 6).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_grouping_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouping-set family in one tagged union (§2.4 'no grouping
    sets in reference'): ROLLUP and GROUPING SETS over lineitem, CUBE
    over orders — each planned by Catalyst as a single Expand + agg;
    the union just concatenates the three independent plans."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def norm(df, kind: str, key1: str, key2: str, agg_val: str, n_rows: str) -> DataFrame:
        return df.select(
            F.lit(kind).alias("gset_kind"),
            F.col(key1).alias("key1"),
            F.col(key2).alias("key2"),
            F.col(agg_val).alias("agg_val"),
            F.col(n_rows).alias("n_rows"),
        )

    rollup = lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity") + 1e-6, 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    gsets = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(1e-6 + sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
    cube = orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice") + 1e-6, 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        norm(rollup, "rollup", "l_returnflag", "l_linestatus", "sum_qty", "n_rows")
        .unionByName(
            norm(gsets, "grouping_sets", "l_returnflag", "l_linestatus", "sum_qty", "n_rows")
        )
        .unionByName(
            norm(cube, "cube", "o_orderstatus", "o_orderpriority", "sum_price", "n_orders")
        )
    )


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — the 100 TB opt-in path for SURVEY.md
    §7's countDistinct-expand hazard — made oracle-checkable via
    bounded-error flags (HLL/KLL sketch INTERNALS are engine-specific;
    their error CONTRACTS are not): per return flag, the exact
    countDistinct and exact interpolated median are value-hash-checked
    against DuckDB, and the sketch results must sit inside their
    published bounds — approx_count_distinct(rsd=0.02) within 3*rsd
    relative error, percentile_approx(accuracy=10000) inside the exact
    [p49, p51] value window (rank error 1/10000 << 0.01). A sketch
    regression flips a flag and hash-fails the gate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_raw"),
        F.expr("percentile(l_extendedprice, 0.49)").alias("p49"),
        F.expr("percentile(l_extendedprice, 0.51)").alias("p51"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("ap50"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        F.round(F.expr("1e-9 + p50_raw"), 2).alias("exact_p50"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.06
        )
        .cast("int")
        .alias("approx_cd_ok"),
        F.col("ap50").between(F.col("p49"), F.col("p51")).cast("int").alias(
            "approx_p50_ok"
        ),
    )


def q_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S14 source-sink coverage beyond parquet in one tagged union:
    (a) nation+region exported to CSV and re-read with explicit
    StructType schemas (no inference), joined and aggregated;
    (b) supplier to ORC and nation to JSON (explicit-schema read back),
    joined and aggregated. The oracle reads the original parquet —
    values match iff every round-trip is byte-faithful."""
    import shutil
    import uuid
    from pathlib import Path

    from propensity_spark.feature_store import DEFAULT_STORE
    from propensity_spark.io import read_json

    base = Path(DEFAULT_STORE).parent / f"ingest_{uuid.uuid4().hex[:8]}"
    try:
        for name in ("nation", "region"):
            load_table(spark, sf_dir, name).coalesce(1).write.mode("overwrite").option(
                "header", True
            ).csv(str(base / f"csv_{name}"))
        nation_csv = read_csv(spark, str(base / "csv_nation"), SCHEMAS["nation"])
        region_csv = read_csv(spark, str(base / "csv_region"), SCHEMAS["region"])
        csv_out = (
            nation_csv.join(
                F.broadcast(region_csv), nation_csv.n_regionkey == region_csv.r_regionkey
            )
            .groupBy("r_name")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(
                F.lit("csv").alias("fmt"),
                F.col("r_name").alias("k"),
                "n_rows",
                F.lit(None).cast("double").alias("checksum"),
            )
        )
        load_table(spark, sf_dir, "supplier").write.mode("overwrite").orc(
            str(base / "supplier")
        )
        load_table(spark, sf_dir, "nation").write.mode("overwrite").json(
            str(base / "nation")
        )
        supplier = spark.read.orc(str(base / "supplier"))
        nation_json = read_json(spark, str(base / "nation"), SCHEMAS["nation"])
        orc_out = (
            supplier.join(
                F.broadcast(nation_json), supplier.s_nationkey == nation_json.n_nationkey
            )
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("s_acctbal") + 1e-6, 2).alias("checksum"),
            )
            .select(F.lit("orc_json").alias("fmt"), F.col("n_name").alias("k"), "n_rows", "checksum")
        )
        # (c) semi-structured: parse the events.props JSON column with a
        # typed from_json (schema-on-read — no inference, no UDF) and
        # aggregate the extracted field per event_type. At 100 TB JSON
        # parsing is map-side inside codegen; the agg is one shuffle.
        events = load_table(spark, sf_dir, "events")
        json_out = (
            events.withColumn("k_val", F.from_json("props", "k int")["k"])
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("k_val") + 1e-6, 2).alias("checksum"),
            )
            .select(
                F.lit("json_props").alias("fmt"),
                F.col("event_type").alias("k"),
                "n_rows",
                "checksum",
            )
        )
        out = csv_out.unionByName(orc_out).unionByName(json_out)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation: two-stage salted groupBy. Stage 1
    spreads each hot key over 16 salt buckets (deterministic salt from
    hash(basket) so re-runs agree), stage 2 merges partials. The oracle
    is a PLAIN group-by — proving the decomposition is exact. At 100 TB
    this is the manual fallback when AQE's skew handling can't help
    (e.g. skewed aggregation rather than join)."""
    from propensity_spark.operators.relational import silver_transactions

    silver = silver_transactions(spark, sf_dir)
    salted = silver.withColumn("__salt", F.pmod(F.hash("basket_id"), F.lit(16)))
    partial = salted.groupBy("household_key", "__salt").agg(
        F.sum("amount_list").alias("partial_amount"),
        F.count(F.lit(1)).alias("partial_lines"),
    )
    return partial.groupBy("household_key").agg(
        F.round(F.sum("partial_amount") + 1e-6, 2).alias("amount_list"),
        F.sum("partial_lines").alias("line_items"),
    )


# ---------------------------------------------------------------------------
# TPC-H query shapes. Each keeps its own plan; the two suite entries melt
# the heterogeneous outputs to (q, k, metric, value) for the gate.
# ---------------------------------------------------------------------------


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority query shape (customer ⋈ orders ⋈ lineitem with
    selective filters + grouped revenue + top-N): the canonical
    join-reorder / pushdown exercise."""
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(
            F.round(
                F.sum(F.expr("l_extendedprice * (1 - l_discount)")) + 1e-6, 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume shape: 6-way star join through
    region/nation on both customer and supplier sides."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.expr("l_extendedprice * (1 - l_discount)")) + 1e-6, 2
            ).alias("revenue")
        )
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change shape: pure scan + selective predicates
    + single global agg — the pushdown benchmark."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_discount").between(0.05, 0.07)) & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.expr("l_extendedprice * l_discount")) + 1e-6, 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority-checking shape (TPC-H Q4 adapted to the fixture
    schema): EXISTS correlated subquery decorrelated to a LEFT SEMI
    join — orders with at least one line shipped after the order date.
    Catalyst plans the semi join; at scale the probe side streams and
    only the distinct build keys shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (orders.o_orderkey == late.l_orderkey)
            & (late.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-effect shape (TPC-H Q14): conditional-aggregate ratio
    over a fact ⋈ broadcast-dim join — promo revenue share per month.
    The CASE lives inside the aggregate so one scan + one agg suffice."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rev = "l_extendedprice * (1 - l_discount)"
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("month"))
        .agg(
            F.round(
                (F.lit(100.0) * F.sum(F.expr(f"CASE WHEN p_type = 'PROMO' THEN {rev} ELSE 0.0 END"))
                 / F.sum(F.expr(rev))) + 1e-6,
                4,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume-customer shape (TPC-H Q18): GROUP BY ... HAVING
    subquery feeding an IN-list, planned as agg → semi join → join.
    The HAVING aggregate is partial+final; only qualifying orderkeys
    (rare) reach the second join, so the plan scales as the selective
    side."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            F.round(F.col("o_totalprice") + 1e-6, 2).alias("o_totalprice"),
            F.round(F.col("sum_qty") + 1e-6, 2).alias("sum_qty"),
        )
        .orderBy(F.desc("sum_qty"), F.asc("o_orderkey"))
        .limit(100)
    )


def _melted(df: DataFrame, q: str, key_expr: str, metrics: dict[str, str]) -> DataFrame:
    """Melt a result to (q, k, metric, value DOUBLE) — the shared suite
    shape. `metrics` maps output metric name -> source SQL expression."""
    args = ", ".join(f"'{m}', CAST({src} AS DOUBLE)" for m, src in metrics.items())
    return df.selectExpr(
        f"'{q}' AS q",
        f"CAST({key_expr} AS STRING) AS k",
        f"stack({len(metrics)}, {args}) AS (metric, value)",
    )


def q_tpch_mini_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (semi join) + Q6 (pushdown scan) + Q14 (broadcast-dim
    conditional ratio), melted into one gate entry."""
    q4 = _melted(
        q_tpch_q4(spark, sf_dir), "q4", "o_orderpriority", {"order_count": "order_count"}
    )
    q6 = _melted(
        q_tpch_q6(spark, sf_dir), "q6", "'all'", {"revenue": "revenue", "n_lines": "n_lines"}
    )
    q14 = _melted(
        q_tpch_q14(spark, sf_dir),
        "q14",
        "month",
        {"promo_share": "promo_share", "n_lines": "n_lines"},
    )
    return q4.unionByName(q6).unionByName(q14)


def q_tpch_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (join reorder + top-N) + Q5 (6-way star join) + Q18 (HAVING
    semi join), melted into one gate entry."""
    q3 = _melted(
        q_tpch_q3(spark, sf_dir),
        "q3",
        "concat(cast(l_orderkey as string), '|', cast(o_orderdate as string))",
        {"revenue": "revenue"},
    )
    q5 = _melted(q_tpch_q5(spark, sf_dir), "q5", "n_name", {"revenue": "revenue"})
    q18 = _melted(
        q_tpch_q18(spark, sf_dir),
        "q18",
        "o_orderkey",
        {
            "o_custkey": "o_custkey",
            "orderdate_day": "datediff(o_orderdate, date'1970-01-01')",
            "o_totalprice": "o_totalprice",
            "sum_qty": "sum_qty",
        },
    )
    return q3.unionByName(q5).unionByName(q18)


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_Q3_SQL = """
    SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           round(1e-6 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY 1, 2
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
"""

_Q4_SQL = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
"""

_Q5_SQL = """
    SELECT n_name,
           round(1e-6 + sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name
"""

_Q6_SQL = """
    SELECT round(1e-6 + sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""

_Q14_SQL = """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
           round(1e-6 + 100.0 *
                 sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
"""

_Q18_SQL = """
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           round(1e-6 + o_totalprice, 2) AS o_totalprice,
           round(1e-6 + sum_qty, 2) AS sum_qty
    FROM orders
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) big ON o_orderkey = big.l_orderkey
    ORDER BY sum_qty DESC, o_orderkey ASC
    LIMIT 100
"""

ORACLES = {
    "range_join": """
        WITH b AS (
            SELECT CAST(floor(epoch(min(ts)) / 86400) AS BIGINT) AS d0 FROM events
        ),
        w AS (
            SELECT CAST(n_nationkey AS BIGINT) AS window_id,
                   d0 + n_nationkey * 2 AS start_day,
                   d0 + n_nationkey * 2 + 5 AS end_day
            FROM nation, b
        ),
        e AS (
            SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, value FROM events
        )
        SELECT window_id, start_day, end_day,
               count(*) AS n_events,
               round(1e-6 + sum(value), 2) AS sum_value
        FROM w JOIN e ON e.day >= w.start_day AND e.day < w.end_day
        GROUP BY 1, 2, 3
    """,
    "asof_join": """
        SELECT event_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
               CAST(floor(epoch(
                   last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               )) AS BIGINT) AS last_signup_epoch
        FROM events
    """,
    "percentiles": """
        SELECT c_mktsegment,
               round(1e-9 + quantile_cont(o_totalprice, 0.25), 6) AS p25,
               round(1e-9 + quantile_cont(o_totalprice, 0.5), 6) AS p50,
               round(1e-9 + quantile_cont(o_totalprice, 0.75), 6) AS p75,
               count(*) AS n_orders
        FROM orders
        JOIN (SELECT c_custkey, c_mktsegment FROM customer) c
          ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "grouping_analytics": """
        SELECT 'rollup' AS gset_kind, l_returnflag AS key1, l_linestatus AS key2,
               round(1e-6 + sum(l_quantity), 2) AS agg_val, count(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        UNION ALL
        SELECT 'grouping_sets', l_returnflag, l_linestatus,
               round(1e-6 + sum(l_quantity), 2), count(*)
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        UNION ALL
        SELECT 'cube', o_orderstatus, o_orderpriority,
               round(1e-6 + sum(o_totalprice), 2), count(*)
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "ingest_roundtrip": """
        SELECT 'csv' AS fmt, r_name AS k, count(*) AS n_rows,
               CAST(NULL AS DOUBLE) AS checksum
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        UNION ALL
        SELECT 'orc_json', n_name, count(*),
               round(1e-6 + sum(s_acctbal), 2)
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        UNION ALL
        SELECT 'json_props', event_type, count(*),
               round(1e-6 + sum(CAST(json_extract(props, '$.k') AS INT)), 2)
        FROM events
        GROUP BY event_type
    """,
    # Exact columns hash-checked; the sketch columns are bounded-error
    # flags the engine must emit as 1 (see q_approx_stats docstring).
    "approx_stats": """
        SELECT l_returnflag,
               count(DISTINCT l_orderkey) AS exact_orders,
               round(1e-9 + quantile_cont(l_extendedprice, 0.5), 2) AS exact_p50,
               1 AS approx_cd_ok,
               1 AS approx_p50_ok
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "salted_agg": """
        WITH s AS (
            SELECT o_custkey AS household_key, COALESCE(l_extendedprice, 0.0) AS amount_list
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        )
        SELECT household_key,
               round(1e-6 + sum(amount_list), 2) AS amount_list,
               count(*) AS line_items
        FROM s GROUP BY household_key
    """,
    "tpch_mini_suite": f"""
        SELECT 'q4' AS q, CAST(o_orderpriority AS VARCHAR) AS k,
               'order_count' AS metric, CAST(order_count AS DOUBLE) AS value
        FROM ({_Q4_SQL}) q4
        UNION ALL
        SELECT 'q6', 'all', 'revenue', CAST(revenue AS DOUBLE) FROM ({_Q6_SQL}) a
        UNION ALL
        SELECT 'q6', 'all', 'n_lines', CAST(n_lines AS DOUBLE) FROM ({_Q6_SQL}) b
        UNION ALL
        SELECT 'q14', CAST(month AS VARCHAR), 'promo_share', CAST(promo_share AS DOUBLE)
        FROM ({_Q14_SQL}) c
        UNION ALL
        SELECT 'q14', CAST(month AS VARCHAR), 'n_lines', CAST(n_lines AS DOUBLE)
        FROM ({_Q14_SQL}) d
    """,
    "tpch_join_suite": f"""
        SELECT 'q3' AS q,
               CAST(l_orderkey AS VARCHAR) || '|' || CAST(o_orderdate AS VARCHAR) AS k,
               'revenue' AS metric, CAST(revenue AS DOUBLE) AS value
        FROM ({_Q3_SQL}) q3
        UNION ALL
        SELECT 'q5', n_name, 'revenue', CAST(revenue AS DOUBLE) FROM ({_Q5_SQL}) q5
        UNION ALL
        SELECT 'q18', CAST(o_orderkey AS VARCHAR), 'o_custkey', CAST(o_custkey AS DOUBLE)
        FROM ({_Q18_SQL}) a
        UNION ALL
        SELECT 'q18', CAST(o_orderkey AS VARCHAR), 'orderdate_day',
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)
        FROM ({_Q18_SQL}) b
        UNION ALL
        SELECT 'q18', CAST(o_orderkey AS VARCHAR), 'o_totalprice',
               CAST(o_totalprice AS DOUBLE)
        FROM ({_Q18_SQL}) c
        UNION ALL
        SELECT 'q18', CAST(o_orderkey AS VARCHAR), 'sum_qty', CAST(sum_qty AS DOUBLE)
        FROM ({_Q18_SQL}) d
    """,
}

QUERIES = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "percentiles": q_percentiles,
    "grouping_analytics": q_grouping_analytics,
    "approx_stats": q_approx_stats,
    "ingest_roundtrip": q_ingest_roundtrip,
    "salted_agg": q_salted_agg,
    "tpch_mini_suite": q_tpch_mini_suite,
    "tpch_join_suite": q_tpch_join_suite,
}

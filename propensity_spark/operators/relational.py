"""Relational operator library (SURVEY.md §2.2-2.8).

Each public ``q_*`` function is one correctness-checked query: it takes
``(spark, sf_dir)`` and returns a DataFrame whose column names/values
match the DuckDB oracle in ``ORACLES``. The reference concepts map onto
the synthetic star schema per FIXTURES.md §C:

    transactions_adj  -> lineitem JOIN orders   (the "silver" fact)
    products          -> part (p_brand plays commodity_desc)
    households        -> customer
    commodities_to_score -> top-k p_brand by countDistinct(basket)

Scale notes (these run at sf0.01 for the gate but are designed for
100 TB): dimension joins are broadcast (part/customer are small
relative to the fact at any SF); aggregates are partial+final hash
aggs; top-k plans as TakeOrderedAndProject; the cross-join universe is
|households| x k with k<=10, so it broadcasts the k-row side.

All monetary aggregate outputs are rounded to 2 decimals and ratio
outputs to 6 in BOTH engines: Spark and DuckDB sum doubles in
different orders, and rounding makes the value-hash comparison stable
without changing semantics at any meaningful precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from propensity_spark.io import load_table

TOP_K = 10


def _round(col: Column | str, scale: int) -> Column:
    """Round with a sub-precision epsilon nudge, mirrored in the DuckDB
    oracles. The fixture's monetary values sit on an exact .xx5 grid
    where Spark (BigDecimal HALF_UP) and DuckDB (C double rounding)
    disagree; shifting the boundary by 1e-6 (2dp) / 1e-9 (6dp) makes
    both engines agree without changing any meaningful digit."""
    if isinstance(col, str):
        col = F.col(col)
    eps = 1e-6 if scale <= 2 else 1e-9
    return F.round(col + F.lit(eps), scale)

# ---------------------------------------------------------------------------
# Silver transform: the discount-unpacking projection (P2/P3/F2,
# 01_Data_Prep.py:121-166) re-expressed over lineitem x orders. The
# CASE/COALESCE placement mirrors the reference exactly — null->0.0 at
# ingest, sign conventions per column (SURVEY.md §7 "null-vs-zero
# parity").
# ---------------------------------------------------------------------------

# Shared with the DuckDB oracle: keep both engines' expressions textually
# identical (the dialects agree on this subset of SQL).
_SILVER_COLS = [
    "o_custkey AS household_key",
    "l_orderkey AS basket_id",
    "CAST(l_shipdate AS DATE) AS day",
    "l_partkey AS product_id",
    "COALESCE(l_extendedprice, 0.0) AS amount_list",
    "CASE WHEN l_linenumber % 3 = 0 THEN COALESCE(l_extendedprice * l_tax * 0.5, 0.0) "
    "ELSE 0.0 END AS campaign_coupon_discount",
    "CASE WHEN l_linenumber % 3 <> 0 THEN COALESCE(l_extendedprice * l_tax * 0.5, 0.0) "
    "ELSE 0.0 END AS manuf_coupon_discount",
    "COALESCE(l_extendedprice * l_tax * 0.25, 0.0) AS manuf_coupon_match_discount",
    "COALESCE(l_extendedprice * l_tax * 0.5, 0.0) AS total_coupon_discount",
    "COALESCE(l_extendedprice * l_discount, 0.0) AS instore_discount",
    "COALESCE(l_extendedprice * (1 - l_discount - l_tax * 0.5), 0.0) AS amount_paid",
    "l_quantity AS units",
]

SILVER_SQL = (
    "SELECT "
    + ", ".join(_SILVER_COLS)
    + " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
)


def silver_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transactions_adj equivalent (01_Data_Prep.py:121-166): fact
    join + discount unpacking. The orders side carries the customer
    key; Catalyst broadcasts neither (both scale with SF) and plans a
    shuffle join on l_orderkey/o_orderkey — at 100 TB this is the one
    unavoidable fact-to-fact shuffle, mitigated in production by
    bucketing both tables on the order key."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "inner")
    return joined.selectExpr(*_SILVER_COLS)


def fact_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The silver frame's `day` column from the bare lineitem scan —
    for global, multiplicity-insensitive day aggregates (min / max /
    countDistinct) only.

    FK-constraint join elimination (the top_commodities argument):
    `day` is CAST(l_shipdate AS DATE) from lineitem, and the orders
    side of the silver join is existence-only — vacuous under the
    lineitem→orders FK — so min/max/distinct of silver.day equal the
    same aggregates over lineitem alone. Catalyst cannot dedupe the
    common subtree, so every `silver.agg(...)` bounds branch used to
    re-run the fact-to-fact join just to read one column (guide §2.4);
    this frame costs a one-column parquet scan. The DuckDB oracles
    keep aggregating over the full silver join, pinning equality."""
    return load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(l_shipdate AS DATE)").alias("day")
    )


def brand_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """products-dimension equivalent: product_id -> commodity label
    (J1's broadcast side, 04a_Task__Feature_Engineering.py:77-81)."""
    return (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("product_id"), F.col("p_brand").alias("commodity_desc"))
    )


def top_commodities(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """commodities_to_score derivation (02_Initialize_Solution.py:38-47):
    top-k commodities by countDistinct(basket_id), with the
    identifier-sanitizing rename (F4, 02:61-62). Deterministic
    tie-break on the name so LIMIT is reproducible.

    FK-constraint join elimination: the silver view's orders join only
    contributes household_key (unused here) and an existence filter
    that is vacuous under the lineitem→orders FK (basket_id IS
    l_orderkey), so the top-k reads the bare fact + broadcast dim —
    no fact-to-fact join at any scale. Catalyst can't infer the FK
    itself; this is the rewrite a constraint-aware planner would make,
    and the DuckDB oracle still runs the full silver join, pinning
    result equality."""
    from propensity_spark.io import scan_floor_target

    fact = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("product_id"), F.col("l_orderkey").alias("basket_id")
    )
    floor = scan_floor_target(spark, sf_dir, "lineitem")
    if floor:
        # Row-group-starved layout (guide §2.5): the partial
        # distinct-pair aggregation otherwise runs fused above a
        # one-row-group scan on a single core; the exchange carries
        # only the two join/agg keys.
        fact = fact.repartition(floor, F.xxhash64("basket_id"))
    dim = brand_dim(spark, sf_dir)
    return (
        fact.join(F.broadcast(dim), "product_id", "inner")
        .groupBy("commodity_desc")
        .agg(F.countDistinct("basket_id").alias("baskets"))
        .orderBy(F.desc("baskets"), F.asc("commodity_desc"))
        .limit(k)
        .withColumn(
            "commodity_clean",
            F.regexp_replace(F.regexp_replace("commodity_desc", r"[-\|\\/:;,.'\" ]", "_"), "#", "_"),
        )
    )


_CONTROL_ROWS: dict = {}


def commodities_control(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Materialized commodities_to_score control table. The reference
    computes the top-k ONCE and stores it as a table every consumer
    re-reads (02_Initialize_Solution.py:58-68); recomputing the
    fact-scan aggregate inside every consuming plan would run it twice
    per query tree (Spark does not dedupe common subtrees). We memo the
    collected k rows per (session, dir) — a bounded driver-side collect,
    the same C4 pattern the reference uses for its control loops — and
    rebuild a broadcastable local relation. Keyed by applicationId, not
    id(spark): a GC'd-then-reallocated session object could alias a
    stale id() entry, while applicationId is unique per SparkContext."""
    key = (spark.sparkContext.applicationId, sf_dir, k)
    if key not in _CONTROL_ROWS:
        _CONTROL_ROWS[key] = top_commodities(spark, sf_dir, k).collect()
    return spark.createDataFrame(
        _CONTROL_ROWS[key],
        "commodity_desc string, baskets bigint, commodity_clean string",
    )


# DuckDB twin of top_commodities (reused as a CTE by several oracles).
TOPK_SQL = f"""
SELECT commodity_desc,
       count(DISTINCT basket_id) AS baskets,
       regexp_replace(regexp_replace(commodity_desc, '[-|\\/:;,.''" ]', '_', 'g'), '#', '_', 'g')
           AS commodity_clean
FROM ({SILVER_SQL}) s
JOIN (SELECT p_partkey AS product_id, p_brand AS commodity_desc FROM part) p USING (product_id)
GROUP BY commodity_desc
ORDER BY baskets DESC, commodity_desc ASC
LIMIT {TOP_K}
"""


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------

def q_topk_commodities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (S2+J1+A2+A8+O1+F4+F5). Plan: parquet scan -> shuffle
    join -> broadcast dim join -> partial/final distinct agg ->
    TakeOrderedAndProject. The model-URI concat (04c:94) rides along as
    the string-function evidence (F5)."""
    return top_commodities(spark, sf_dir).withColumn(
        "model_uri",
        F.concat(
            F.lit("models:/propensity "), F.col("commodity_clean"), F.lit("/Production")
        ),
    )


def q_silver_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3+F2: the discount-unpacking silver projection, row
    level. No rounding: scalar IEEE expressions evaluate bit-identical
    in both engines, so raw doubles compare exactly."""
    return silver_transactions(spark, sf_dir)


def q_date_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: date-range predicates pushed to the parquet scan
    (04a:82, 04a:185). The BETWEEN bounds are derived from the data's
    own max day (reference computes them driver-side, C4; we keep the
    whole thing in-plan via a broadcast scalar join)."""
    silver = silver_transactions(spark, sf_dir)
    bounds = fact_days(spark, sf_dir).agg(
        F.date_sub(F.max("day"), 89).alias("w_start"), F.max("day").alias("w_end")
    )
    return (
        silver.join(F.broadcast(bounds))
        .where(F.col("day").between(F.col("w_start"), F.col("w_end")))
        .groupBy("household_key")
        .agg(
            F.count(F.lit(1)).alias("line_items"),
            _round(F.sum("amount_list"), 2).alias("amount_list"),
        )
    )


def q_agg_minmax_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: global no-key min/max of the dataset day span
    (04a_Task__Feature_Engineering.py:138-146)."""
    return fact_days(spark, sf_dir).agg(
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.countDistinct("day").alias("n_days"),
    )


def q_date_bounds_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the two date-bound entries (consolidated in
    round 3 to free gate slots without losing per-value checking):
    `range_filter` = q_date_range_filter per-household rows (P4/P5),
    `minmax` = q_agg_minmax_day's global span (A1) with the dates
    normalized to days-from-epoch BIGINTs. Shape: (section, k1, n, v)."""
    rf = q_date_range_filter(spark, sf_dir).select(
        F.lit("range_filter").alias("section"),
        F.col("household_key").cast("bigint").alias("k1"),
        F.col("line_items").alias("n"),
        F.col("amount_list").alias("v"),
    )
    epoch = F.lit("1970-01-01").cast("date")
    mm = q_agg_minmax_day(spark, sf_dir).select(
        F.lit("minmax").alias("section"),
        F.datediff(F.col("min_day"), epoch).cast("bigint").alias("k1"),
        F.datediff(F.col("max_day"), epoch).cast("bigint").alias("n"),
        F.col("n_days").cast("double").alias("v"),
    )
    return rf.unionByName(mm)


_RATIO_COLS = (
    "amount_list_per_day",
    "amount_list_per_basket",
    "amount_list_per_line_item",
    "amount_paid_share",
    "discount_line_share",
)


def q_household_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-A7 + F3 + P8 + P10 in ONE hash-agg pass at household grain:
    the summary block (04a:183-199), the "with activity" conditional
    distincts and count-ifs (04a:202-255), days-since-last-activity
    (04a:528-546), and the derived ratios (04a:258-524) with the
    reference's null algebra — x/0 -> NULL then fillna(0.0) (04a:595)
    and the all-DOUBLE cast (04a:556-558).

    One shuffle computes all 21 outputs (the reference's shape is one
    pass per family). The span bounds come from a broadcast 1-row agg,
    not a driver collect. The multi-countDistinct Expand (5 distinct
    exprs -> 6x row multiply before partial agg) is the known 100 TB
    hazard; the approx escape hatch is `exact_distinct=False` in
    operators/features.py for the wide-grid twin of this query."""
    silver = silver_transactions(spark, sf_dir)
    bounds = fact_days(spark, sf_dir).agg(
        F.min("day").alias("min_day"), F.max("day").alias("max_day")
    )
    with_b = silver.join(F.broadcast(bounds))
    has_instore = F.col("instore_discount") > 0
    has_coupon = F.col("total_coupon_discount") > 0
    since = lambda cond: F.min(  # noqa: E731
        F.datediff(F.col("max_day"), F.when(cond, F.col("day")).otherwise(F.col("min_day")))
    )
    # Non-distinct aggregates: plain hash agg, map-side combine, no Expand.
    base = with_b.groupBy("household_key").agg(
        # A2-A4 summary block (raw sums kept for the ratio algebra below)
        F.count("product_id").alias("products"),
        F.count(F.lit(1)).alias("line_items"),
        F.sum("amount_list").alias("_amount_list"),
        F.sum("instore_discount").alias("_instore_discount"),
        F.sum("campaign_coupon_discount").alias("_campaign_coupon_discount"),
        F.sum("manuf_coupon_discount").alias("_manuf_coupon_discount"),
        F.sum("total_coupon_discount").alias("_total_coupon_discount"),
        F.sum("amount_paid").alias("_amount_paid"),
        F.sum(F.when(has_instore, 1)).alias("line_items_with_instore_discount"),
        F.sum(F.when(has_coupon, 1)).alias("line_items_with_coupon_discount"),
        # A7 days-since block
        F.min(F.datediff(F.col("max_day"), F.col("day"))).alias("days_since_purchase"),
        since(has_instore).alias("days_since_instore_discount"),
        since(has_coupon).alias("days_since_coupon_discount"),
    )
    # The five DISTINCT families (A2 days/baskets + the A5/A6
    # conditional distincts) used to ride the same groupBy as 5
    # count(DISTINCT ...) exprs — Catalyst plans that as an Expand that
    # multiplies every input row 6x before the first shuffle (the
    # SURVEY §7 hazard; noop-measured 5.3 s of the query's cost at
    # sf0.1). r09: the feature engine's exact decomposition instead —
    # explode each row into its two entity grains (gid 0 = day,
    # 1 = basket_id), pre-aggregate per-(hh, gid, entity) existence
    # flags (2 tinyint states/row vs the 21-column 6x Expand), then
    # fold per household: count(DISTINCT CASE WHEN c THEN e END) ==
    # sum over distinct-e rows of max(CASE WHEN c THEN 1 END).
    # Bit-identical values, no Expand anywhere in the plan.
    exp = (
        silver.select(
            "household_key",
            "day",
            "basket_id",
            has_instore.alias("__hi"),
            has_coupon.alias("__hc"),
        )
        .withColumn("__gid", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn(
            "__ent",
            F.expr("CASE __gid WHEN 0 THEN unix_date(day) ELSE basket_id END"),
        )
    )
    pre = exp.groupBy("household_key", "__gid", "__ent").agg(
        F.max(F.when(F.col("__hi"), 1)).alias("__fi"),
        F.max(F.when(F.col("__hc"), 1)).alias("__fc"),
    )
    dist = pre.groupBy("household_key").agg(
        F.sum(F.when(F.col("__gid") == 0, 1)).alias("days"),
        F.sum(F.when(F.col("__gid") == 1, 1)).alias("baskets"),
        F.coalesce(
            F.sum(F.when(F.col("__gid") == 0, F.col("__fi"))), F.lit(0)
        ).alias("days_with_instore_discount"),
        F.coalesce(
            F.sum(F.when(F.col("__gid") == 1, F.col("__fi"))), F.lit(0)
        ).alias("baskets_with_instore_discount"),
        F.coalesce(
            F.sum(F.when(F.col("__gid") == 0, F.col("__fc"))), F.lit(0)
        ).alias("days_with_coupon_discount"),
    )
    # Both aggs are hash-partitioned on household_key, so the merge
    # join reuses the partitioning — no extra exchange.
    agg = base.join(dist, "household_key")
    out = agg.select(
        "household_key",
        "days",
        "baskets",
        "products",
        "line_items",
        _round("_amount_list", 2).alias("amount_list"),
        _round("_instore_discount", 2).alias("instore_discount"),
        _round("_campaign_coupon_discount", 2).alias("campaign_coupon_discount"),
        _round("_manuf_coupon_discount", 2).alias("manuf_coupon_discount"),
        _round("_total_coupon_discount", 2).alias("total_coupon_discount"),
        _round("_amount_paid", 2).alias("amount_paid"),
        "days_with_instore_discount",
        "baskets_with_instore_discount",
        "days_with_coupon_discount",
        "line_items_with_instore_discount",
        "line_items_with_coupon_discount",
        "days_since_purchase",
        "days_since_instore_discount",
        "days_since_coupon_discount",
        # F3 ratios over the RAW (unrounded) sums
        _round(F.expr("_amount_list / days"), 6).cast("double").alias("amount_list_per_day"),
        _round(F.expr("_amount_list / baskets"), 6)
        .cast("double")
        .alias("amount_list_per_basket"),
        _round(F.expr("_amount_list / line_items"), 6)
        .cast("double")
        .alias("amount_list_per_line_item"),
        _round(F.expr("_amount_paid / _amount_list"), 6)
        .cast("double")
        .alias("amount_paid_share"),
        _round(F.expr("line_items_with_instore_discount / line_items"), 6)
        .cast("double")
        .alias("discount_line_share"),
    )
    return out.fillna(0.0, subset=list(_RATIO_COLS))


def q_distinct_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: distinct entity universe (04a:102, 04b:141) — all
    households seen in the fact table."""
    silver = silver_transactions(spark, sf_dir)
    return silver.select("household_key").distinct()


def q_cross_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: households x commodities_to_score cross join (04a:105,
    04b:144, 04c:107-111). The k-row side broadcasts, so the "cross
    join" is a flat-map — no shuffle even at 10^9 households."""
    households = q_distinct_entities(spark, sf_dir)
    commodities = commodities_control(spark, sf_dir).select("commodity_desc")
    return households.crossJoin(F.broadcast(commodities))


def q_left_join_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3+J4+P8: anchor LEFT OUTER summary, nulls -> 0.0
    (04a:549-553, 04a:584-595). Anchor = full household universe from
    customer; households with no transactions keep zeros."""
    anchors = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("household_key"))
        .distinct()
    )
    silver = silver_transactions(spark, sf_dir)
    summary = silver.groupBy("household_key").agg(
        _round(F.sum("amount_list"), 2).alias("amount_list"),
        F.countDistinct("basket_id").alias("baskets"),
    )
    joined = anchors.join(summary, "household_key", "leftouter")
    return joined.select(
        "household_key",
        F.coalesce(F.col("amount_list"), F.lit(0.0)).alias("amount_list"),
        F.coalesce(F.col("baskets"), F.lit(0)).cast("bigint").alias("baskets"),
    )


def q_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5+J6+F2+F6: label assembly (04b_Task__Model_Training.py:106-163)
    — universe x top-k commodities with purchased = seen-in-window.

    Single-pass plan: the reference (and the naive translation) builds
    DISTINCT positive pairs and LEFT-joins them onto the household x
    commodity universe — two fact aggregations plus a (hh, commodity)
    shuffle join. Here ONE groupBy(household) collects the <= k-element
    set of in-window top-k commodities per household (collect_set skips
    the NULLs from off-window/off-list rows, and its size is bounded by
    k, not activity); the universe then flat-maps against the broadcast
    k-row control table with array_contains. One fact scan, one
    shuffle, no outer join — at 100 TB the (hh, commodity) pair shuffle
    this removes is the dominant cost."""
    silver = silver_transactions(spark, sf_dir)
    dim = brand_dim(spark, sf_dir)
    commodities = commodities_control(spark, sf_dir).select("commodity_desc")
    bounds = fact_days(spark, sf_dir).agg(
        F.date_sub(F.max("day"), 29).alias("label_start")
    )
    dim_topk = dim.join(F.broadcast(commodities), "commodity_desc", "left_semi")
    per_hh = (
        silver.join(F.broadcast(bounds))
        .join(F.broadcast(dim_topk), "product_id", "leftouter")
        .groupBy("household_key")
        .agg(
            F.collect_set(
                F.when(F.col("day") >= F.col("label_start"), F.col("commodity_desc"))
            ).alias("purchased_set")
        )
    )
    return per_hh.crossJoin(F.broadcast(commodities)).select(
        "household_key",
        "commodity_desc",
        F.array_contains("purchased_set", F.col("commodity_desc"))
        .cast("int")
        .alias("purchased"),
    )


def q_class_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+W1: per-(commodity, class) counts with the unbounded
    partition-window total (04b:174-182) -> pos_class_ratio."""
    from pyspark.sql import Window

    labels = q_labels(spark, sf_dir)
    counts = labels.groupBy("commodity_desc", "purchased").agg(
        F.count(F.lit(1)).alias("class_rows")
    )
    w = Window.partitionBy("commodity_desc")
    return counts.select(
        "commodity_desc",
        "purchased",
        "class_rows",
        F.sum("class_rows").over(w).alias("commodity_rows"),
        _round(F.col("class_rows") / F.sum("class_rows").over(w), 6).alias("class_ratio"),
    )


def q_set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full set-operator surface in one tagged union, normalized to
    (entity_key, side, attr):

    - LEFT SEMI (EXISTS): customers with >=1 urgent order;
    - LEFT ANTI (NOT EXISTS): customers with no orders at all (also the
      parquet-fallback MERGE building block, SURVEY §2.1 S5);
    - UNION ALL: the reference's append-per-commodity loop
      (04c:205-217) re-expressed as declarative unionByName over
      per-slice frames (§2.7), open vs closed orders;
    - INTERSECT (distinct): customers with both an urgent and an open
      order;
    - EXCEPT (distinct): customers with orders but never an urgent one.

    Semi/anti/intersect/except all shuffle on the key with partial
    distinct map-side; at 100 TB each is one balanced exchange."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    semi = customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select(
        F.col("c_custkey").alias("entity_key"),
        F.lit("semi_urgent").alias("side"),
        F.col("c_mktsegment").alias("attr"),
    )
    anti = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select(
        F.col("c_custkey").alias("entity_key"),
        F.lit("anti_no_orders").alias("side"),
        F.col("c_name").alias("attr"),
    )
    lo = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("entity_key"),
        F.lit("union_open").alias("side"),
        F.col("o_custkey").cast("string").alias("attr"),
    )
    hi = orders.where(F.col("o_orderstatus") != "O").select(
        F.col("o_orderkey").alias("entity_key"),
        F.lit("union_closed").alias("side"),
        F.col("o_custkey").cast("string").alias("attr"),
    )
    inter = (
        urgent.select("o_custkey")
        .intersect(orders.where(F.col("o_orderstatus") == "O").select("o_custkey"))
        .select(
            F.col("o_custkey").alias("entity_key"),
            F.lit("intersect_urgent_open").alias("side"),
            F.lit("").alias("attr"),
        )
    )
    exc = (
        orders.select("o_custkey")
        .subtract(urgent.select("o_custkey"))  # EXCEPT (distinct) semantics
        .select(
            F.col("o_custkey").alias("entity_key"),
            F.lit("except_never_urgent").alias("side"),
            F.lit("").alias("attr"),
        )
    )
    return semi.unionByName(anti).unionByName(lo).unionByName(hi).unionByName(inter).unionByName(exc)


# The fixture brand domain is static across scale factors
# (Brand#1..Brand#25), so the pivot column list is a compile-time
# constant — Spark skips the distinct-values pre-job AND the oracle SQL
# can be a static string. At 100 TB a data-dependent pivot would first
# collect the k-row control table (C4); same plan shape either way.
BRANDS = [f"Brand#{i}" for i in range(1, 26)]
BRANDS_CLEAN = sorted(b.replace("#", "_") for b in BRANDS)


def _scored_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    silver = silver_transactions(spark, sf_dir)
    dim = brand_dim(spark, sf_dir).withColumn(
        "commodity_clean", F.regexp_replace("commodity_desc", "#", "_")
    )
    return silver.join(F.broadcast(dim), "product_id", "inner")


def q_pivot_unpivot_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 pivot AND its inverse in one checked round-trip: per-household
    spend per commodity pivoted to one column per commodity_clean —
    replacing the reference's N-MERGE loop (04c:189-202) with ONE
    shuffle — fillna(0.0)-padded, then melted back to (household_key,
    commodity_clean, prediction) via the stack generator (the
    __UNPIVOTED table shape, 04c:274-282). Keeping the padded zeros in
    the melt makes the oracle check BOTH the pivot's fill semantics and
    the unpivot values."""
    # Scan-parallelism floor tried and REJECTED here (r09, guide §1):
    # noop 1.19 -> 1.50 s, count 1.57 -> 1.81 s (min-of-8,
    # order-alternated). The pivot's partial aggregation sits ABOVE the
    # silver shuffle join, so it is already distributed; the floor
    # exchange was pure overhead. See OPTIMIZATION_r09.md.
    pivoted = (
        _scored_spend(spark, sf_dir)
        .groupBy("household_key")
        .pivot("commodity_clean", BRANDS_CLEAN)
        .agg(_round(F.sum("amount_list"), 2))
        .fillna(0.0, subset=BRANDS_CLEAN)
    )
    stack_expr = "stack({n}, {args}) AS (commodity_clean, prediction)".format(
        n=len(BRANDS_CLEAN), args=", ".join(f"'{c}', `{c}`" for c in BRANDS_CLEAN)
    )
    return pivoted.selectExpr("household_key", stack_expr)


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F8: the int-day -> DATE epoch conversion
    (01_Data_Prep.py:68-72) and explicit datediff. l_linenumber plays
    the 1-based integer day."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.date_add(F.lit("2018-01-01").cast("date"), F.col("l_linenumber") - 1).alias("day"),
        F.datediff(F.to_date("l_shipdate"), F.lit("2018-01-01").cast("date")).alias(
            "days_from_epoch"
        ),
    )


def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-completeness window functions (§2.5) in ONE partition
    pass: ranking (row_number), offsets (lag/lead), running aggregate
    (ROWS frame), relative rank (percent_rank), bucketing (ntile), and
    a RANGE-frame peer count — all share the o_custkey partitioning so
    Catalyst plans a single window exchange + sort (the range frame
    re-sorts within the same partitioning, no second shuffle). Output
    restricted to each customer's top-3 rows to bound the result."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rng = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"))
        .rangeBetween(-100, 0)  # totalprice within $100 above current
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            _round("o_totalprice", 2).alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
            _round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            _round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            _round(F.sum("o_totalprice").over(run), 2).alias("run_sum"),
            F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pr"),
            F.ntile(4).over(w).alias("tile"),
            F.count(F.lit(1)).over(rng).alias("peers_within_100"),
        )
        .where(F.col("rn") <= 3)
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-completeness pricing-summary aggregate (the canonical
    groupBy+8-agg shape every Spark OLAP engine must plan well)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    bounds = lineitem.agg(
        F.date_sub(F.max(F.to_date("l_shipdate")), 90).alias("cutoff")
    )
    return (
        lineitem.join(F.broadcast(bounds))
        .where(F.to_date("l_shipdate") <= F.col("cutoff"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # GATE_CONTRACT rule 2: every money sum in exact BIGINT
            # (cents; cents x percent for the 4-dp discount product;
            # cents x percent x percent for the 6-dp charge product),
            # surfaced as half-up cents via INTEGER division — the old
            # round(sum(double) + 1e-6, 2) was measurably unsafe at this
            # grain: the r07 sweep measured a 7.6e-5 cross-order float
            # error on these ~150k-row groups, 76x the nudge, with the
            # nearest half-cent boundary only 0.0012 away.
            F.expr("cast(sum(cast(l_quantity as bigint)) as double)").alias(
                "sum_qty"
            ),
            F.expr(
                "sum(cast(round(l_extendedprice * 100, 0) as bigint)) / 100.0D"
            ).alias("sum_base_price"),
            F.expr(
                "((sum(cast(round(l_extendedprice * 100, 0) as bigint)"
                " * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50)"
                " div 100) / 100.0D"
            ).alias("sum_disc_price"),
            F.expr(
                "((sum(cast(round(l_extendedprice * 100, 0) as bigint)"
                " * cast(round((1 - l_discount) * 100, 0) as bigint)"
                " * cast(round((1 + l_tax) * 100, 0) as bigint)) + 5000)"
                " div 10000) / 100.0D"
            ).alias("sum_charge"),
            # averages: ONE divide chain over exact integer inputs,
            # identical association order in the oracle (rule 2).
            F.expr(
                "round(cast(sum(cast(l_quantity as bigint)) as double)"
                " / count(*) + 1e-9, 6)"
            ).alias("avg_qty"),
            F.expr(
                "round(sum(cast(round(l_extendedprice * 100, 0) as bigint))"
                " / 100.0D / count(*) + 1e-9, 6)"
            ).alias("avg_price"),
            F.expr(
                "round(sum(cast(round(l_discount * 100, 0) as bigint))"
                " / 100.0D / count(*) + 1e-9, 6)"
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Oracles (DuckDB SQL). Same aliases, same rounding, same algebra.
# ---------------------------------------------------------------------------

_HOUSEHOLD_SUITE_SQL = f"""
WITH s AS ({SILVER_SQL}),
     b AS (SELECT min(day) AS min_day, max(day) AS max_day FROM s),
     agg AS (
        SELECT household_key,
               count(DISTINCT day)       AS days,
               count(DISTINCT basket_id) AS baskets,
               count(product_id)         AS products,
               count(*)                  AS line_items,
               sum(amount_list)              AS _amount_list,
               sum(instore_discount)         AS _instore_discount,
               sum(campaign_coupon_discount) AS _campaign_coupon_discount,
               sum(manuf_coupon_discount)    AS _manuf_coupon_discount,
               sum(total_coupon_discount)    AS _total_coupon_discount,
               sum(amount_paid)              AS _amount_paid,
               count(DISTINCT CASE WHEN instore_discount > 0 THEN day END)
                   AS days_with_instore_discount,
               count(DISTINCT CASE WHEN instore_discount > 0 THEN basket_id END)
                   AS baskets_with_instore_discount,
               count(DISTINCT CASE WHEN total_coupon_discount > 0 THEN day END)
                   AS days_with_coupon_discount,
               CAST(sum(CASE WHEN instore_discount > 0 THEN 1 END) AS BIGINT)
                   AS line_items_with_instore_discount,
               CAST(sum(CASE WHEN total_coupon_discount > 0 THEN 1 END) AS BIGINT)
                   AS line_items_with_coupon_discount,
               min(date_diff('day', day, max_day)) AS days_since_purchase,
               min(date_diff('day',
                   CASE WHEN instore_discount > 0 THEN day ELSE min_day END, max_day))
                   AS days_since_instore_discount,
               min(date_diff('day',
                   CASE WHEN total_coupon_discount > 0 THEN day ELSE min_day END, max_day))
                   AS days_since_coupon_discount
        FROM s, b
        GROUP BY household_key
     )
SELECT household_key, days, baskets, products, line_items,
       round(1e-6 + _amount_list, 2)              AS amount_list,
       round(1e-6 + _instore_discount, 2)         AS instore_discount,
       round(1e-6 + _campaign_coupon_discount, 2) AS campaign_coupon_discount,
       round(1e-6 + _manuf_coupon_discount, 2)    AS manuf_coupon_discount,
       round(1e-6 + _total_coupon_discount, 2)    AS total_coupon_discount,
       round(1e-6 + _amount_paid, 2)              AS amount_paid,
       days_with_instore_discount, baskets_with_instore_discount,
       days_with_coupon_discount,
       line_items_with_instore_discount, line_items_with_coupon_discount,
       days_since_purchase, days_since_instore_discount, days_since_coupon_discount,
       coalesce(round(1e-9 + _amount_list / days, 6), 0.0) AS amount_list_per_day,
       coalesce(round(1e-9 + _amount_list / baskets, 6), 0.0) AS amount_list_per_basket,
       coalesce(round(1e-9 + _amount_list / line_items, 6), 0.0)
           AS amount_list_per_line_item,
       coalesce(round(1e-9 + _amount_paid / _amount_list, 6), 0.0) AS amount_paid_share,
       coalesce(round(1e-9 + CAST(line_items_with_instore_discount AS DOUBLE)
                / line_items, 6), 0.0) AS discount_line_share
FROM agg
"""

ORACLES: dict[str, str] = {
    "topk_commodities": f"""
        SELECT tk.*,
               'models:/propensity ' || commodity_clean || '/Production' AS model_uri
        FROM ({TOPK_SQL}) tk
    """,
    "silver_projection": SILVER_SQL,
    "date_bounds_suite": f"""
        WITH s AS ({SILVER_SQL}),
             b AS (SELECT max(day) - 89 AS w_start, max(day) AS w_end FROM s)
        SELECT 'range_filter' AS section,
               CAST(household_key AS BIGINT) AS k1,
               count(*) AS n,
               round(1e-6 + sum(amount_list), 2) AS v
        FROM s, b
        WHERE day BETWEEN w_start AND w_end
        GROUP BY household_key
        UNION ALL
        SELECT 'minmax',
               date_diff('day', DATE '1970-01-01', min(day)),
               date_diff('day', DATE '1970-01-01', max(day)),
               CAST(count(DISTINCT day) AS DOUBLE)
        FROM s
    """,
    "household_agg_suite": _HOUSEHOLD_SUITE_SQL,
    "cross_universe": f"""
        SELECT h.household_key, t.commodity_desc
        FROM (SELECT DISTINCT household_key FROM ({SILVER_SQL}) s) h
        CROSS JOIN (SELECT commodity_desc FROM ({TOPK_SQL}) tk) t
    """,
    "left_join_fillna": f"""
        WITH summary AS (
            SELECT household_key,
                   round(1e-6 + sum(amount_list), 2) AS amount_list,
                   count(DISTINCT basket_id) AS baskets
            FROM ({SILVER_SQL}) s GROUP BY household_key
        )
        SELECT c.c_custkey AS household_key,
               coalesce(summary.amount_list, 0.0) AS amount_list,
               coalesce(summary.baskets, 0) AS baskets
        FROM (SELECT DISTINCT c_custkey FROM customer) c
        LEFT JOIN summary ON summary.household_key = c.c_custkey
    """,
    "labels": f"""
        WITH s AS ({SILVER_SQL}),
             b AS (SELECT max(day) - 29 AS label_start FROM s),
             tk AS ({TOPK_SQL}),
             pos AS (
                 SELECT DISTINCT s.household_key, p.commodity_desc, 1 AS purchased
                 FROM s
                 CROSS JOIN b
                 JOIN (SELECT p_partkey AS product_id, p_brand AS commodity_desc FROM part) p
                   ON s.product_id = p.product_id
                 JOIN tk ON tk.commodity_desc = p.commodity_desc
                 WHERE s.day >= b.label_start
             ),
             universe AS (
                 SELECT h.household_key, t.commodity_desc
                 FROM (SELECT DISTINCT household_key FROM s) h
                 CROSS JOIN (SELECT commodity_desc FROM tk) t
             )
        SELECT u.household_key, u.commodity_desc,
               CAST(coalesce(pos.purchased, 0) AS INT) AS purchased
        FROM universe u
        LEFT JOIN pos ON pos.household_key = u.household_key
                     AND pos.commodity_desc = u.commodity_desc
    """,
    "class_ratios": None,  # filled below (needs labels CTE)
    "set_ops_suite": """
        SELECT c_custkey AS entity_key, 'semi_urgent' AS side, c_mktsegment AS attr
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT c_custkey, 'anti_no_orders', c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT o_orderkey, 'union_open', CAST(o_custkey AS VARCHAR)
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey, 'union_closed', CAST(o_custkey AS VARCHAR)
        FROM orders WHERE o_orderstatus <> 'O'
        UNION ALL
        SELECT entity_key, 'intersect_urgent_open', '' FROM (
            SELECT o_custkey AS entity_key FROM orders WHERE o_orderpriority = '1-URGENT'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT entity_key, 'except_never_urgent', '' FROM (
            SELECT o_custkey AS entity_key FROM orders
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
    """,
    "date_functions": """
        SELECT l_orderkey, l_linenumber,
               DATE '2018-01-01' + CAST(l_linenumber - 1 AS INT) AS day,
               date_diff('day', DATE '2018-01-01', CAST(l_shipdate AS DATE))
                   AS days_from_epoch
        FROM lineitem
    """,
    "window_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn, prev_price,
               next_price, run_sum, pr, tile, peers_within_100
        FROM (
            SELECT o_custkey, o_orderkey,
                   round(1e-6 + o_totalprice, 2) AS o_totalprice,
                   row_number() OVER ranked AS rn,
                   round(1e-6 + lag(o_totalprice) OVER ranked, 2) AS prev_price,
                   round(1e-6 + lead(o_totalprice) OVER ranked, 2) AS next_price,
                   round(1e-6 + sum(o_totalprice) OVER
                         (ranked ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                       AS run_sum,
                   round(1e-9 + percent_rank() OVER ranked, 6) AS pr,
                   ntile(4) OVER ranked AS tile,
                   count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC
                                  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
                       AS peers_within_100
            FROM orders
            WINDOW ranked AS (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC)
        ) t WHERE rn <= 3
    """,
    "tpch_q1": """
        WITH b AS (SELECT max(CAST(l_shipdate AS DATE)) - 90 AS cutoff FROM lineitem)
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
               sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
                   AS sum_base_price,
               ((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                // 100) / 100.0 AS sum_disc_price,
               ((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                     * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)
                     * CAST(round((1 + l_tax) * 100, 0) AS BIGINT)) + 5000)
                // 10000) / 100.0 AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                     / count(*) + 1e-9, 6) AS avg_qty,
               round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     / 100.0 / count(*) + 1e-9, 6) AS avg_price,
               round(sum(CAST(round(l_discount * 100, 0) AS BIGINT))
                     / 100.0 / count(*) + 1e-9, 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem, b
        WHERE CAST(l_shipdate AS DATE) <= b.cutoff
        GROUP BY l_returnflag, l_linestatus
    """,
}

_LABELS_SQL = ORACLES["labels"]
ORACLES["class_ratios"] = f"""
    WITH labels AS ({_LABELS_SQL}),
         counts AS (
             SELECT commodity_desc, purchased, count(*) AS class_rows
             FROM labels GROUP BY commodity_desc, purchased
         )
    SELECT commodity_desc, purchased, class_rows,
           CAST(sum(class_rows) OVER (PARTITION BY commodity_desc) AS BIGINT)
               AS commodity_rows,
           round(1e-9 + CAST(class_rows AS DOUBLE) /
                 sum(class_rows) OVER (PARTITION BY commodity_desc), 6) AS class_ratio
    FROM counts
"""

QUERIES = {
    "topk_commodities": q_topk_commodities,
    "silver_projection": q_silver_projection,
    "date_bounds_suite": q_date_bounds_suite,
    "household_agg_suite": q_household_agg_suite,
    "cross_universe": q_cross_universe,
    "left_join_fillna": q_left_join_fillna,
    "labels": q_labels,
    "class_ratios": q_class_ratios,
    "set_ops_suite": q_set_ops_suite,
    "pivot_unpivot_scores": q_pivot_unpivot_scores,
    "date_functions": q_date_functions,
    "window_topk_per_group": q_window_topk_per_group,
    "tpch_q1": q_tpch_q1,
}

# pivot/unpivot round-trip oracle: full household x brand grid with the
# pivot's fillna(0.0) padding, matched via cross join + left join (the
# column names are static because BRANDS is).
_SCORED_SQL = f"""
    SELECT s.household_key, replace(p.commodity_desc, '#', '_') AS commodity_clean,
           s.amount_list
    FROM ({SILVER_SQL}) s
    JOIN (SELECT p_partkey AS product_id, p_brand AS commodity_desc FROM part) p
      ON s.product_id = p.product_id
"""

_brand_list = ", ".join(f"'{c}'" for c in BRANDS_CLEAN)
ORACLES["pivot_unpivot_scores"] = f"""
    WITH scored AS ({_SCORED_SQL}),
         hh AS (SELECT DISTINCT household_key FROM scored),
         brands AS (SELECT unnest([{_brand_list}]) AS commodity_clean),
         sums AS (
             SELECT household_key, commodity_clean,
                    round(1e-6 + sum(amount_list), 2) AS prediction
             FROM scored GROUP BY 1, 2
         )
    SELECT hh.household_key, brands.commodity_clean,
           coalesce(sums.prediction, 0.0) AS prediction
    FROM hh CROSS JOIN brands
    LEFT JOIN sums ON sums.household_key = hh.household_key
                  AND sums.commodity_clean = brands.commodity_clean
"""

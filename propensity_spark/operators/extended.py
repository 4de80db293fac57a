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

from propensity_spark.io import SCHEMAS, load_table, read_csv, scan_floor_target


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
    """Distribution-statistics suite, tagged union (section, seg, m1,
    m2, m3, n):
      pct — exact interpolated percentiles per market segment (the
            approx_percentile twin is in q_approx_stats, rows-only).
      psi — per-bin Population Stability Index decomposition
            (ml/monitoring.score_psi) between the first and second
            halves of the events timeline: the drift monitor a deployed
            scoring pipeline runs between retrains. Timeline midpoint
            and bin bounds are derived in-plan (1-row broadcast aggs);
            sum(m3) over the psi rows is the PSI."""
    from propensity_spark.ml.monitoring import score_psi

    customer = load_table(spark, sf_dir, "customer")
    # r09: a scan floor on the orders side measured SLOWER (noop
    # 0.79 -> 0.84 s; the 150k-row percentile buffers are too cheap to
    # amortize the exchange — unlike approx_stats' 6-state build).
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    pct = (
        joined.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.25)") + 1e-9, 6).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.5)") + 1e-9, 6).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.75)") + 1e-9, 6).alias("p75"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.lit("pct").alias("section"),
            F.col("c_mktsegment").alias("seg"),
            F.col("p25").alias("m1"),
            F.col("p50").alias("m2"),
            F.col("p75").alias("m3"),
            F.col("n_orders").alias("n"),
        )
    )

    events = load_table(spark, sf_dir, "events")
    span = events.agg(
        F.min(F.unix_timestamp("ts")).alias("__lo"),
        F.max(F.unix_timestamp("ts")).alias("__hi"),
    )
    mid = F.floor((F.col("__lo") + F.col("__hi")) / 2.0).cast("bigint")
    tagged = events.join(F.broadcast(span)).withColumn(
        "__e", F.unix_timestamp("ts")
    )
    psi = score_psi(
        tagged.where(F.col("__e") <= mid).select("value"),
        tagged.where(F.col("__e") > mid).select("value"),
        "value",
    ).select(
        F.lit("psi").alias("section"),
        F.col("bin").cast("string").alias("seg"),
        F.col("expected_frac").alias("m1"),
        F.col("actual_frac").alias("m2"),
        F.col("psi_term").alias("m3"),
        F.lit(0).cast("bigint").alias("n"),
    )
    return pct.unionByName(psi)


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
    # money sums go through exact BIGINT cents (GATE_CONTRACT rule 2 /
    # REV_EXACT): the double sum over 1.5M orders diverged from DuckDB
    # in the 10th significant digit at sf1 (accumulation order)
    cube = orders.cube("o_orderstatus", "o_orderpriority").agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0
        ).alias("sum_price"),
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
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_extendedprice"
    )
    floor = scan_floor_target(spark, sf_dir, "lineitem")
    if floor:
        # Row-group-starved layout (guide §2.5): with only 3 groups,
        # the partial-aggregation map side — six states per row,
        # including three exact-percentile buffers and the KLL/HLL
        # sketch updates — is the ENTIRE query and otherwise runs on
        # one core (noop-measured 45 s at sf0.1, the registry's
        # single largest hidden cost). All six aggregates have
        # mergeable partials, so fanning the 3-column projection out
        # parallelizes the buffer builds and merges tiny finals.
        lineitem = lineitem.repartition(floor, F.xxhash64("l_orderkey"))
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


def percentiles(
    df: DataFrame,
    cols: list[str] | str,
    probs: list[float] = (0.25, 0.5, 0.75),
    by: list[str] | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Production percentile surface — SKETCHES BY DEFAULT.

    Spark's exact `percentile` buffers every value of a group in
    executor memory: fine for 5 market segments at sf0.1, an OOM hazard
    at 10^11 rows/group, so the default here is `percentile_approx`
    (a mergeable rank sketch: bounded memory per partition, map-side
    combinable, rank error <= 1/accuracy — at the default 10_000 the
    p50 estimate sits inside the exact [p49, p51] window). `exact=True`
    is the opt-in for small grouped data where interpolated exactness
    matters (the gate query q_percentiles uses it deliberately on a
    5-group fixture). Output columns are `<col>_p<pct>`; `by=None`
    computes global percentiles (one 1-row aggregate)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    fn = "percentile" if exact else "percentile_approx"
    aggs = []
    for c in cols:
        for p in probs:
            name = f"{c}_p{str(round(p * 100, 1)).rstrip('0').rstrip('.')}"
            expr = (
                f"{fn}(`{c}`, {p!r})"
                if exact
                else f"{fn}(`{c}`, {p!r}, {accuracy})"
            )
            aggs.append(F.expr(expr).alias(name))
    return df.groupBy(*(by or [])).agg(*aggs)


def q_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S14 source-sink coverage beyond parquet in one tagged union:
    (a) nation+region exported to CSV and re-read with explicit
    StructType schemas (no inference), joined and aggregated;
    (b) supplier to ORC and nation to JSON (explicit-schema read back),
    joined and aggregated. The oracle reads the original parquet —
    values match iff every round-trip is byte-faithful.

    NOTE: deliberately performs filesystem side-effects inside a gate
    query (uuid-scoped scratch dir, removed in `finally`) — that IS the
    surface under test. A full scratch disk fails this entry before it
    fails anything else; bounded output, no shared state."""
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
                # GATE_CONTRACT rule 2: checksum as exact BIGINT cents —
                # round(sum(double)) is order-dependent across engines.
                F.expr(
                    "sum(cast(round(s_acctbal * 100, 0) as bigint)) / 100.0D"
                ).alias("checksum"),
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
                # integer sum, surfaced as double — exact in both engines
                F.sum("k_val").cast("double").alias("checksum"),
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
    # GATE_CONTRACT rule 2: cents BIGINT through BOTH stages, so the
    # salt decomposition is exact by construction (integer addition is
    # associative; the old float partial sums were order-dependent).
    partial = salted.groupBy("household_key", "__salt").agg(
        F.sum(F.expr("cast(round(amount_list * 100, 0) as bigint)")).alias(
            "partial_cents"
        ),
        F.count(F.lit(1)).alias("partial_lines"),
    )
    return partial.groupBy("household_key").agg(
        F.expr("sum(partial_cents) / 100.0D").alias("amount_list"),
        F.sum("partial_lines").alias("line_items"),
    )


SALT_BUCKETS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = SALT_BUCKETS,
) -> DataFrame:
    """Skew-mitigated equi-join — the JOIN-side complement of
    `q_salted_agg`. The fact side gets a deterministic per-row salt
    (hash of the whole row mod n_salt — re-runs agree); the dim side
    is replicated once per salt value via a map-side
    `explode(sequence(...))`; joining on (key, salt) spreads a hot
    key's rows over n_salt reducer partitions instead of one.

    Cost model: dim bytes x n_salt extra shuffle volume buys a
    n_salt-way split of the hottest key — the classic trade when the
    dim is too big to broadcast AND the fact key is skewed (run
    `q_key_skew` first; prefer AQE's skewJoin when its thresholds
    catch the skew — this is the manual fallback, e.g. when the skew
    is in a grouping+join composite AQE can't see). Exactness: every
    fact row matches exactly one replica of its dim row, so the result
    is row-identical to the plain join — which is precisely what the
    oracle pins."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: lineitem joined to orders through the salted path,
    folded to per-priority revenue — hash-identical to the plain-join
    oracle, proving the salt decomposition changes the physical
    distribution and nothing else."""
    from propensity_spark.io import load_table

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(lineitem, orders, "l_orderkey")
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.expr(
            "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
        ).alias("revenue"),
    )


SALTED_JOIN_SQL = """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
"""


MIN_SUPPORT = 0.01  # fraction of baskets an item(set) must appear in
# Triples dilute support (a 25-brand catalog spreads mass over C(25,3)
# combos vs C(25,2)); measured max triple support is ~0.006 at sf0.01 and
# ~0.004 at sf0.1, so the size-3 rung gets its own, lower threshold.
TRIPLE_MIN_SUPPORT = 0.0035
MAX_BASKET_ITEMS = 50  # degenerate-basket guard (see q_basket_affinity)


def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity — frequent itemsets (size 1 and 2) with
    support / confidence / lift, the cross-sell analysis a propensity
    deployment runs next to per-category scoring (same retail domain
    as the reference, which stops at per-category models; this is the
    natural extension a Dunnhumby-style analyst asks for first).

    Tagged union: section 'item' rows carry (item_a, support_cnt,
    support); section 'pair' rows add directional confidence
    P(b|a) and symmetric lift. Shuffle profile at 100 TB: the
    (basket, item) distinct is one shuffle at basket grain with
    map-side combine; pair generation is a self-equi-join on
    basket_id — per-basket quadratic in DISTINCT ITEMS PER BASKET
    (bounded by catalog breadth, ~25 here; baskets wider than
    MAX_BASKET_ITEMS distinct items are excluded BEFORE the join —
    mega-baskets are degenerate for affinity and are the one input that
    could blow the self-join up; the oracle applies the same cap, and
    the 25-brand fixture never hits it), linear in baskets overall; the
    support tables and the 1-row basket count broadcast back. The
    size-3 rung is q_basket_affinity_3 (its own gate entry, apriori-
    pruned); MLlib FPGrowth over the same (basket, items) frame is
    the general-depth scale path — pytest pins both sizes 1-2 here
    and the size-3 operator equal to FPGrowth's freqItemsets."""
    from propensity_spark.operators.relational import brand_dim, silver_transactions

    silver = silver_transactions(spark, sf_dir)
    bi_all = (
        silver.join(F.broadcast(brand_dim(spark, sf_dir)), "product_id")
        .select("basket_id", F.col("commodity_desc").alias("item"))
        .dropDuplicates(["basket_id", "item"])
    )
    sizes = bi_all.groupBy("basket_id").agg(F.count(F.lit(1)).alias("__bn"))
    bi = (
        bi_all.join(sizes.where(F.col("__bn") <= MAX_BASKET_ITEMS), "basket_id")
        .drop("__bn")
    )
    nb = bi.agg(F.countDistinct("basket_id").alias("nb"))
    items = bi.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(b, (F.col("a.basket_id") == F.col("b.basket_id")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s_null = F.lit(None).cast("string")
    d_null = F.lit(None).cast("double")
    item_rows = (
        items.crossJoin(F.broadcast(nb))
        .where(F.col("cnt") / F.col("nb") >= MIN_SUPPORT)
        .select(
            F.lit("item").alias("section"),
            F.col("item").alias("item_a"),
            s_null.alias("item_b"),
            F.col("cnt").alias("support_cnt"),
            F.round(F.col("cnt") / F.col("nb") + 1e-9, 6).alias("support"),
            d_null.alias("confidence"),
            d_null.alias("lift"),
        )
    )
    s1 = items.select(F.col("item").alias("ia"), F.col("cnt").alias("cnt_a"))
    s2 = items.select(F.col("item").alias("ib"), F.col("cnt").alias("cnt_b"))
    pair_rows = (
        pairs.join(F.broadcast(s1), "ia")
        .join(F.broadcast(s2), "ib")
        .crossJoin(F.broadcast(nb))
        .where(F.col("cnt") / F.col("nb") >= MIN_SUPPORT)
        .select(
            F.lit("pair").alias("section"),
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            F.col("cnt").alias("support_cnt"),
            F.round(F.col("cnt") / F.col("nb") + 1e-9, 6).alias("support"),
            F.round(F.col("cnt") / F.col("cnt_a") + 1e-9, 6).alias("confidence"),
            F.round(
                F.col("cnt") * F.col("nb") / (F.col("cnt_a") * F.col("cnt_b")) + 1e-9, 6
            ).alias("lift"),
        )
    )
    return item_rows.unionByName(pair_rows)


def q_basket_affinity_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets — the size-3 rung of the FPGrowth-style
    scale path that q_basket_affinity stops short of. Candidate
    triples are generated MAP-SIDE by exploding the 3-combinations of
    each basket's sorted item array (nested `transform(sequence)`
    HOFs), so the whole query is TWO shuffles: the basket-grain
    collect_set agg and the (a, b, c) count agg. No self-joins.

    The blow-up is bounded, not cubic-in-data: the MAX_BASKET_ITEMS
    cap (same mega-basket guard as the pair computation, applied
    BEFORE expansion) bounds the per-basket fan-out at C(cap, 3), so
    candidate volume is LINEAR in baskets. Measured at sf0.1 this
    plan is 1.8x faster than the apriori-pruned self-join chain it
    replaced (1.9 s vs 3.5 s; 6 scans / 9 exchanges vs 42 / 64) —
    with a cap this small, pushing pair-frequency pruning between two
    extra shuffle rounds costs more than it saves. Revisit apriori
    pruning only if the cap must grow past a few hundred (C(cap,3)
    per-basket fan-out) on a catalog with sparse frequent structure.
    The oracle runs the unpruned 3-way self-join — identical output."""
    from propensity_spark.operators.relational import brand_dim, silver_transactions

    silver = silver_transactions(spark, sf_dir)
    baskets = (
        silver.join(F.broadcast(brand_dim(spark, sf_dir)), "product_id")
        .groupBy("basket_id")
        .agg(F.array_sort(F.collect_set("commodity_desc")).alias("items"))
        .where(F.size("items") <= MAX_BASKET_ITEMS)
    )
    # ONE pass over `baskets` for both the candidate triples AND the
    # basket denominator (r09, guide §2.4): Catalyst does not dedupe
    # common subtrees, so the old `baskets.agg(count)` broadcast branch
    # re-ran the whole silver join + collect_set agg a second time.
    # Each basket now also emits one all-NULL sentinel struct; the
    # sentinel group's count in the SAME triple aggregation is nb
    # (commodity_desc is never NULL — inner join on part — so no real
    # triple can collide with the sentinel). nb then reaches every row
    # via a whole-partition window over the AGGREGATED frame, whose
    # grain is catalog-bounded (distinct brand triples, ~C(|brands|,3)),
    # not data-bounded — the anomaly_mad precedent, safe at any SF.
    triples = baskets.select(
        F.explode(
            F.expr(
                """
                concat(
                    array(named_struct(
                        'ia', CAST(NULL AS STRING),
                        'ib', CAST(NULL AS STRING),
                        'ic', CAST(NULL AS STRING))),
                    CASE WHEN size(items) >= 3 THEN
                    flatten(flatten(transform(sequence(0, size(items) - 3), i ->
                        transform(sequence(i + 1, size(items) - 2), j ->
                            transform(sequence(j + 1, size(items) - 1), k ->
                                struct(items[i] AS ia, items[j] AS ib,
                                       items[k] AS ic))))))
                    ELSE CAST(array() AS ARRAY<STRUCT<
                        ia: STRING, ib: STRING, ic: STRING>>) END)
                """
            )
        ).alias("t")
    ).select("t.ia", "t.ib", "t.ic")
    counted = triples.groupBy("ia", "ib", "ic").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    counted = counted.withColumn(
        "nb", F.max(F.when(F.col("ia").isNull(), F.col("cnt"))).over(Window.partitionBy())
    )
    return (
        counted
        .where(
            F.col("ia").isNotNull()
            & (F.col("cnt") / F.col("nb") >= TRIPLE_MIN_SUPPORT)
        )
        .select(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            F.col("ic").alias("item_c"),
            F.col("cnt").alias("support_cnt"),
            F.round(F.col("cnt") / F.col("nb") + 1e-9, 6).alias("support"),
        )
    )


_BASKET3_SQL = """
    WITH s AS MATERIALIZED ({silver}),
    bi_all AS MATERIALIZED (
        SELECT DISTINCT s.basket_id, p.p_brand AS item
        FROM s JOIN part p ON s.product_id = p.p_partkey
    ),
    bi AS MATERIALIZED (
        SELECT * FROM bi_all WHERE basket_id IN (
            SELECT basket_id FROM bi_all GROUP BY basket_id
            HAVING count(*) <= {max_items}
        )
    ),
    nb AS (SELECT count(DISTINCT basket_id) AS nb FROM bi),
    triples AS (
        SELECT a.item AS ia, b.item AS ib, c.item AS ic,
               CAST(count(*) AS BIGINT) AS cnt
        FROM bi a
        JOIN bi b ON a.basket_id = b.basket_id AND a.item < b.item
        JOIN bi c ON a.basket_id = c.basket_id AND b.item < c.item
        GROUP BY 1, 2, 3
    )
    SELECT ia AS item_a, ib AS item_b, ic AS item_c,
           cnt AS support_cnt,
           round(cnt * 1.0 / nb + 1e-9, 6) AS support
    FROM triples, nb
    WHERE cnt * 1.0 / nb >= {minsup}
"""


_BASKET_AFFINITY_SQL = """
    WITH s AS MATERIALIZED ({silver}),
    bi_all AS MATERIALIZED (
        SELECT DISTINCT s.basket_id, p.p_brand AS item
        FROM s JOIN part p ON s.product_id = p.p_partkey
    ),
    bi AS MATERIALIZED (
        SELECT * FROM bi_all WHERE basket_id IN (
            SELECT basket_id FROM bi_all GROUP BY basket_id
            HAVING count(*) <= {max_items}
        )
    ),
    nb AS (SELECT count(DISTINCT basket_id) AS nb FROM bi),
    items AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM bi GROUP BY item),
    pairs AS (
        SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS cnt
        FROM bi a JOIN bi b ON a.basket_id = b.basket_id AND a.item < b.item
        GROUP BY 1, 2
    )
    SELECT 'item' AS section, item AS item_a, CAST(NULL AS VARCHAR) AS item_b,
           cnt AS support_cnt,
           round(cnt * 1.0 / nb + 1e-9, 6) AS support,
           CAST(NULL AS DOUBLE) AS confidence, CAST(NULL AS DOUBLE) AS lift
    FROM items, nb WHERE cnt * 1.0 / nb >= {minsup}
    UNION ALL
    SELECT 'pair', ia, ib, p.cnt,
           round(p.cnt * 1.0 / nb + 1e-9, 6),
           round(p.cnt * 1.0 / sa.cnt + 1e-9, 6),
           round(p.cnt * 1.0 * nb / (sa.cnt * sb.cnt) + 1e-9, 6)
    FROM pairs p
    JOIN items sa ON p.ia = sa.item
    JOIN items sb ON p.ib = sb.item, nb
    WHERE p.cnt * 1.0 / nb >= {minsup}
"""


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
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
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
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
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
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round(l_discount * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
            ).alias(
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


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-shipping shape (TPC-H Q7): revenue between every distinct
    (supplier nation, customer nation) pair per ship year. Fact-to-fact
    lineitem ⋈ orders shuffle once; customer/supplier/nation ride in as
    broadcasts (nation twice, aliased per side)."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
            ).alias("revenue")
        )
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share shape (TPC-H Q8 adapted name-independent): per
    (customer region, ship year), the share of revenue supplied LOCALLY
    (supplier nation == customer nation). The share CASE lives inside
    the aggregate — one pass, no self-join."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rev = "l_extendedprice * (1 - l_discount)"
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                (
                    F.sum(
                        F.expr(
                            f"CASE WHEN s_nationkey = c_nationkey THEN {rev} ELSE 0.0 END"
                        )
                    )
                    / F.sum(F.expr(rev))
                )
                + 1e-9,
                6,
            ).alias("local_share"),
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint)"
                " * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50)"
                " / 100.0D) / 100.0D"
            ).alias("revenue"),
        )
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item-reporting shape (TPC-H Q10): top 20 customers by
    lost revenue on returned lines. Selective returnflag filter pushes
    to the lineitem scan; customer/nation broadcast onto the aggregated
    fact; TakeOrderedAndProject caps the driver transfer."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
            ).alias("revenue"),
            F.round(F.first("c_acctbal") + 1e-6, 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-distribution shape (TPC-H Q13): LEFT OUTER join so
    zero-order customers survive with count 0, then a second aggregate
    over the counts — the two-level GROUP BY histogram. The priority
    filter stands in for the comment NOT LIKE (column not in fixture);
    it lives in the JOIN CONDITION, not a WHERE, to keep outer rows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_customer = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-supplier shape (TPC-H Q15): the revenue 'view' aggregates
    once; the scalar MAX over it is a 1-row broadcast cross join (no
    second scan of the fact), and the equality filter keeps ties —
    exactly the view + scalar-subquery semantics."""
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1996-03-31")
    )
    revenue = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(
            "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
        ).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top), revenue.total_revenue == top.max_revenue)
        .join(F.broadcast(supplier), F.col("supplier_no") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts-supplier-relationship shape (TPC-H Q16 adapted: lineitem
    is the part↔supplier relation; complaint suppliers := negative
    account balance): distinct supplier count per (brand, type, size)
    excluding one brand and the excluded suppliers via LEFT ANTI join
    (the NOT IN subquery, decorrelated)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    excluded = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    rel = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(excluded), lineitem.l_suppkey == excluded.s_suppkey, "left_anti")
        .distinct()
    )
    return (
        rel.join(F.broadcast(part), rel.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order shape (TPC-H Q17): the correlated
    per-part AVG subquery decorrelates to an aggregate joined back on
    partkey — one extra agg + one equi-join instead of a rescan per
    row. At 100 TB both sides shuffle on l_partkey and co-locate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#2")
    avg_qty = lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("qty_bound")
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(avg_qty, lineitem.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("qty_bound"))
        .agg(
            F.round((F.sum("l_extendedprice") / 7.0) + 1e-6, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waiting-supplier shape (TPC-H Q21 adapted: 'late' := shipped
    more than 60 days after order date). The EXISTS (another supplier
    on the order) and NOT EXISTS (no OTHER late supplier) correlated
    subqueries collapse into per-order aggregates — multi-supplier
    orders whose ONLY late supplier is this one — a single orderkey
    shuffle instead of two correlated rescans."""
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    flagged = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .withColumn(
            "is_late",
            (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).cast("int"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("supp_late"))
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late_supp"),
    )
    return (
        flagged.join(per_order, "l_orderkey")
        .where(
            (F.col("supp_late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity shape (TPC-H Q22 adapted: country code
    := c_nationkey % 10): customers above the average positive account
    balance (1-row broadcast scalar subquery) with NO orders (LEFT
    ANTI = the NOT EXISTS), counted per code."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal") + 1e-6, 2).alias("totacctbal"),
        )
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost-supplier shape (TPC-H Q2 adapted: lineitem is the
    part↔supplier relation, unit price = extendedprice/quantity stands
    in for ps_supplycost): per (region, small part), the suppliers
    matching the correlated MIN unit price. The correlated subquery
    decorrelates to a (region, part) aggregate joined back on equality
    of the ROUNDED price (row-level scalar, bit-identical across
    engines); ties keep all matching suppliers, output bounded by a
    deterministic top-100."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") < 10)
    lineitem = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    offers = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "r_name",
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.round(F.expr("1e-9 + l_extendedprice / l_quantity"), 6).alias(
                "unit_price"
            ),
        )
    )
    best = offers.groupBy(
        F.col("r_name").alias("b_region"), F.col("p_partkey").alias("b_partkey")
    ).agg(F.min("unit_price").alias("min_price"))
    return (
        offers.join(
            best,
            (offers.r_name == best.b_region)
            & (offers.p_partkey == best.b_partkey)
            & (offers.unit_price == best.min_price),
        )
        .select("r_name", "p_partkey", "s_suppkey", "s_name", "unit_price")
        .distinct()
        .orderBy("r_name", "p_partkey", "s_suppkey")
        .limit(100)
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type-profit shape (TPC-H Q9 adapted: cost model =
    10% of part retail price per unit, replacing ps_supplycost):
    profit per (supplier nation, order year) over parts whose name
    contains 'a' — fact ⋈ two broadcast dims ⋈ fact, CASE-free
    arithmetic inside one aggregate."""
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("a"))
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint) - cast(round(p_retailprice * 100, 0) as bigint) * cast(l_quantity as bigint) * 10) + 50) / 100.0D) / 100.0D"
            ).alias("sum_profit")
        )
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock shape (TPC-H Q11 adapted: shipped value stands
    in for stock value): parts whose value within a supplier nation
    exceeds 0.1% of that nation's total — the per-group scalar
    subquery decorrelates to a nation-level aggregate joined back
    (broadcast: one row per nation)."""
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    value = (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(F.expr("l_extendedprice")).alias("val"))
    )
    totals = value.groupBy(F.col("n_name").alias("t_nation")).agg(
        F.sum("val").alias("total")
    )
    return (
        value.join(F.broadcast(totals), value.n_name == totals.t_nation)
        .where(F.col("val") > 0.001 * F.col("total"))
        .select(
            "n_name",
            "l_partkey",
            F.round(F.col("val") + 1e-6, 2).alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("n_name"), F.asc("l_partkey"))
        .limit(100)
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode-priority shape (TPC-H Q12 adapted: return flag
    buckets stand in for ship modes, 'late' = shipped >30 days after
    order): per return flag, counts of high- vs low-priority orders
    among late lines — the two-bucket conditional aggregate over a
    fact-fact join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30))
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("high_line_count"),
            F.sum(
                F.expr(
                    "CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("low_line_count"),
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue shape (TPC-H Q19): the OR-of-ANDs predicate
    across fact and dim columns — Catalyst pushes the common
    `p_partkey = l_partkey` up, evaluates the disjunction post-join,
    and the dim side stays broadcast."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cond = (
        "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5"
        " AND l_quantity BETWEEN 1 AND 11)"
        " OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10"
        " AND l_quantity BETWEEN 10 AND 20)"
        " OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15"
        " AND l_quantity BETWEEN 20 AND 30)"
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .where(F.expr(cond))
        .agg(
            F.expr(
                "floor((sum(cast(round(l_extendedprice * 100, 0) as bigint) * cast(round((1 - l_discount) * 100, 0) as bigint)) + 50) / 100.0D) / 100.0D"
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential-part-promotion shape (TPC-H Q20 adapted: 1996 shipped
    quantity per (part, supplier) stands in for availqty): suppliers
    who moved > 50 units of any 'b'-named part in 1996 — the nested
    IN-subquery chain decorrelated to agg -> threshold -> DISTINCT ->
    LEFT SEMI join, ordered by name."""
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("b"))
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate") == 1996
    )
    qualified = (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(qualified, supplier.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
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
    """Single-fact TPC-H shapes in one gate entry: Q4 (semi join), Q6
    (pushdown scan), Q14 (broadcast-dim conditional ratio), Q13
    (outer-join two-level histogram), Q17 (decorrelated per-part AVG),
    Q22 (scalar subquery + anti join)."""
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
    q13 = _melted(
        q_tpch_q13(spark, sf_dir), "q13", "c_count", {"custdist": "custdist"}
    )
    q17 = _melted(
        q_tpch_q17(spark, sf_dir),
        "q17",
        "'all'",
        {"avg_yearly": "avg_yearly", "n_lines": "n_lines"},
    )
    q22 = _melted(
        q_tpch_q22(spark, sf_dir),
        "q22",
        "cntrycode",
        {"numcust": "numcust", "totacctbal": "totacctbal"},
    )
    q19 = _melted(
        q_tpch_q19(spark, sf_dir),
        "q19",
        "'all'",
        {"revenue": "revenue", "n_lines": "n_lines"},
    )
    out = q4
    for part in (q6, q14, q13, q17, q19, q22):
        out = out.unionByName(part)
    return out


def q_tpch_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join TPC-H shapes in one gate entry: Q3 (join reorder +
    top-N), Q5 (6-way star), Q18 (HAVING semi join), Q7 (two-nation
    volume), Q8 (market share), Q10 (returned-item top-N), Q15 (scalar
    MAX view), Q16 (anti-join distinct count), Q21 (only-late-supplier
    decorrelation)."""
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
    q7 = _melted(
        q_tpch_q7(spark, sf_dir),
        "q7",
        "concat(supp_nation, '|', cust_nation, '|', cast(l_year as string))",
        {"revenue": "revenue"},
    )
    q8 = _melted(
        q_tpch_q8(spark, sf_dir),
        "q8",
        "concat(r_name, '|', cast(l_year as string))",
        {"local_share": "local_share", "revenue": "revenue"},
    )
    q10 = _melted(
        q_tpch_q10(spark, sf_dir),
        "q10",
        "c_custkey",
        {"revenue": "revenue", "c_acctbal": "c_acctbal"},
    )
    q15 = _melted(
        q_tpch_q15(spark, sf_dir),
        "q15",
        "s_suppkey",
        {"total_revenue": "total_revenue"},
    )
    q16 = _melted(
        q_tpch_q16(spark, sf_dir),
        "q16",
        "concat(p_brand, '|', p_type, '|', cast(p_size as string))",
        {"supplier_cnt": "supplier_cnt"},
    )
    q21 = _melted(
        q_tpch_q21(spark, sf_dir), "q21", "s_name", {"numwait": "numwait"}
    )
    q2 = _melted(
        q_tpch_q2(spark, sf_dir),
        "q2",
        "concat(r_name, '|', cast(p_partkey as string), '|', cast(s_suppkey as string))",
        {"unit_price": "unit_price"},
    )
    q9 = _melted(
        q_tpch_q9(spark, sf_dir),
        "q9",
        "concat(nation, '|', cast(o_year as string))",
        {"sum_profit": "sum_profit"},
    )
    q11 = _melted(
        q_tpch_q11(spark, sf_dir),
        "q11",
        "concat(n_name, '|', cast(l_partkey as string))",
        {"value": "value"},
    )
    q12 = _melted(
        q_tpch_q12(spark, sf_dir),
        "q12",
        "l_returnflag",
        {"high_line_count": "high_line_count", "low_line_count": "low_line_count"},
    )
    q20 = _melted(
        q_tpch_q20(spark, sf_dir),
        "q20",
        "s_suppkey",
        {"name_len": "length(s_name)"},
    )
    out = q3
    for part in (q5, q18, q7, q8, q10, q15, q16, q21, q2, q9, q11, q12, q20):
        out = out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

_Q3_SQL = """
    SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue
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
           floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name
"""

_Q6_SQL = """
    SELECT floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round(l_discount * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue,
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

_Q7_SQL = """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ns.n_name <> nc.n_name
    GROUP BY 1, 2, 3
"""

_Q8_SQL = """
    SELECT r_name, year(l_shipdate) AS l_year,
           round(1e-9 + sum(CASE WHEN s_nationkey = c_nationkey
                            THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS local_share,
           floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2
"""

_Q10_SQL = """
    SELECT c_custkey, c_name, n_name,
           floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue,
           round(1e-6 + any_value(c_acctbal), 2) AS c_acctbal
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
"""

_Q13_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""

_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue
    JOIN supplier ON supplier_no = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
"""

_Q16_SQL = """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
          WHERE l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) rel
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
    GROUP BY 1, 2, 3
"""

_Q17_SQL = """
    SELECT round(1e-6 + sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN (SELECT l_partkey AS ap_partkey, 0.5 * avg(l_quantity) AS qty_bound
          FROM lineitem GROUP BY l_partkey) a
        ON l_partkey = ap_partkey
    WHERE p_brand = 'Brand#2' AND l_quantity < qty_bound
"""

_Q21_SQL = """
    WITH flagged AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                   THEN 1 ELSE 0 END) AS supp_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    per_order AS (
        SELECT l_orderkey, count(*) AS n_supp, sum(supp_late) AS n_late_supp
        FROM flagged GROUP BY 1
    )
    SELECT s_name, count(*) AS numwait
    FROM flagged
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE supp_late = 1 AND n_supp >= 2 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
"""

_Q22_SQL = """
    SELECT c_nationkey % 10 AS cntrycode,
           count(*) AS numcust,
           round(1e-6 + sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
"""

_Q2_SQL = """
    WITH offers AS (
        SELECT DISTINCT r_name, p_partkey, s_suppkey, s_name,
               round(1e-9 + l_extendedprice / l_quantity, 6) AS unit_price
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size < 10 AND l_quantity > 0
    )
    SELECT r_name, p_partkey, s_suppkey, s_name, unit_price
    FROM offers o
    WHERE unit_price = (SELECT min(unit_price) FROM offers i
                        WHERE i.r_name = o.r_name AND i.p_partkey = o.p_partkey)
    ORDER BY r_name, p_partkey, s_suppkey
    LIMIT 100
"""

_Q9_SQL = """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)
                  - CAST(round(p_retailprice * 100, 0) AS BIGINT)
                  * CAST(l_quantity AS BIGINT) * 10) + 50)
                 / 100.0) / 100.0 AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%a%'
    GROUP BY 1, 2
"""

_Q11_SQL = """
    WITH value AS (
        SELECT n_name, l_partkey, sum(l_extendedprice) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    ),
    totals AS (SELECT n_name, sum(val) AS total FROM value GROUP BY 1)
    SELECT v.n_name, v.l_partkey, round(1e-6 + v.val, 2) AS value
    FROM value v JOIN totals t ON v.n_name = t.n_name
    WHERE v.val > 0.001 * t.total
    ORDER BY value DESC, v.n_name ASC, v.l_partkey ASC
    LIMIT 100
"""

_Q12_SQL = """
    SELECT l_returnflag,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
"""

_Q19_SQL = """
    SELECT floor((sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(round((1 - l_discount) * 100, 0) AS BIGINT)) + 50)
                 / 100.0) / 100.0 AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
"""

_Q20_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%b%' AND year(l_shipdate) = 1996
        GROUP BY l_partkey, l_suppkey
        HAVING sum(l_quantity) > 50
    )
    ORDER BY s_name
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
        WITH pctq AS (
            SELECT c_mktsegment,
                   round(1e-9 + quantile_cont(o_totalprice, 0.25), 6) AS p25,
                   round(1e-9 + quantile_cont(o_totalprice, 0.5), 6) AS p50,
                   round(1e-9 + quantile_cont(o_totalprice, 0.75), 6) AS p75,
                   count(*) AS n_orders
            FROM orders
            JOIN (SELECT c_custkey, c_mktsegment FROM customer) c
              ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        ),
        span AS (
            SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS lo,
                   CAST(max(floor(epoch(ts))) AS BIGINT) AS hi
            FROM events
        ),
        halves AS (
            SELECT value,
                   CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                             <= CAST(floor((lo + hi) / 2.0) AS BIGINT)
                        THEN 'e' ELSE 'a' END AS side
            FROM events, span
            WHERE value IS NOT NULL
        ),
        eb AS (SELECT min(value) AS blo, max(value) AS bhi
               FROM halves WHERE side = 'e'),
        binned AS (
            -- zero-width baseline: matches -> bin 0, everything else
            -- -> top bin (mirrors ml/monitoring.score_psi)
            SELECT side,
                   CASE WHEN (bhi - blo) / 10.0 <= 0
                        THEN CASE WHEN value = blo THEN 0 ELSE 9 END
                        ELSE least(9, greatest(0,
                             CAST(floor((value - blo) / ((bhi - blo) / 10.0))
                                  AS INT)))
                   END AS bin
            FROM halves, eb
        ),
        ec AS (SELECT bin, count(*) AS ne FROM binned WHERE side = 'e' GROUP BY 1),
        ac AS (SELECT bin, count(*) AS na FROM binned WHERE side = 'a' GROUP BY 1),
        j AS (
            SELECT coalesce(ec.bin, ac.bin) AS bin,
                   coalesce(ne, 0) AS ne, coalesce(na, 0) AS na
            FROM ec FULL OUTER JOIN ac ON ec.bin = ac.bin
        ),
        t AS (SELECT bin, ne, na,
                     sum(ne) OVER () AS te, sum(na) OVER () AS ta
              FROM j),
        psiq AS (
            SELECT CAST(bin AS BIGINT) AS bin,
                   greatest(ne / te, 1e-6) AS ef,
                   greatest(na / ta, 1e-6) AS af
            FROM t
        )
        SELECT 'pct' AS section, c_mktsegment AS seg,
               p25 AS m1, p50 AS m2, p75 AS m3, n_orders AS n
        FROM pctq
        UNION ALL
        SELECT 'psi', CAST(bin AS VARCHAR),
               round(1e-9 + ef, 6), round(1e-9 + af, 6),
               round(1e-9 + (af - ef) * ln(af / ef), 6), CAST(0 AS BIGINT)
        FROM psiq
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
               -- exact BIGINT cents (rule 2): the double sum diverged
               -- from Spark at sf1 row counts
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   / 100.0,
               count(*)
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
               sum(CAST(round(s_acctbal * 100, 0) AS BIGINT)) / 100.0
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        UNION ALL
        SELECT 'json_props', event_type, count(*),
               CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS DOUBLE)
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
               sum(CAST(round(amount_list * 100, 0) AS BIGINT)) / 100.0
                   AS amount_list,
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
        UNION ALL
        SELECT 'q13', CAST(c_count AS VARCHAR), 'custdist', CAST(custdist AS DOUBLE)
        FROM ({_Q13_SQL}) e
        UNION ALL
        SELECT 'q17', 'all', 'avg_yearly', CAST(avg_yearly AS DOUBLE) FROM ({_Q17_SQL}) f
        UNION ALL
        SELECT 'q17', 'all', 'n_lines', CAST(n_lines AS DOUBLE) FROM ({_Q17_SQL}) g
        UNION ALL
        SELECT 'q22', CAST(cntrycode AS VARCHAR), 'numcust', CAST(numcust AS DOUBLE)
        FROM ({_Q22_SQL}) h
        UNION ALL
        SELECT 'q22', CAST(cntrycode AS VARCHAR), 'totacctbal', CAST(totacctbal AS DOUBLE)
        FROM ({_Q22_SQL}) i
        UNION ALL
        SELECT 'q19', 'all', 'revenue', CAST(revenue AS DOUBLE) FROM ({_Q19_SQL}) j
        UNION ALL
        SELECT 'q19', 'all', 'n_lines', CAST(n_lines AS DOUBLE) FROM ({_Q19_SQL}) k
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
        UNION ALL
        SELECT 'q7', supp_nation || '|' || cust_nation || '|' || CAST(l_year AS VARCHAR),
               'revenue', CAST(revenue AS DOUBLE)
        FROM ({_Q7_SQL}) e
        UNION ALL
        SELECT 'q8', r_name || '|' || CAST(l_year AS VARCHAR), 'local_share',
               CAST(local_share AS DOUBLE)
        FROM ({_Q8_SQL}) f
        UNION ALL
        SELECT 'q8', r_name || '|' || CAST(l_year AS VARCHAR), 'revenue',
               CAST(revenue AS DOUBLE)
        FROM ({_Q8_SQL}) g
        UNION ALL
        SELECT 'q10', CAST(c_custkey AS VARCHAR), 'revenue', CAST(revenue AS DOUBLE)
        FROM ({_Q10_SQL}) h
        UNION ALL
        SELECT 'q10', CAST(c_custkey AS VARCHAR), 'c_acctbal', CAST(c_acctbal AS DOUBLE)
        FROM ({_Q10_SQL}) i
        UNION ALL
        SELECT 'q15', CAST(s_suppkey AS VARCHAR), 'total_revenue',
               CAST(total_revenue AS DOUBLE)
        FROM ({_Q15_SQL}) j
        UNION ALL
        SELECT 'q16', p_brand || '|' || p_type || '|' || CAST(p_size AS VARCHAR),
               'supplier_cnt', CAST(supplier_cnt AS DOUBLE)
        FROM ({_Q16_SQL}) k
        UNION ALL
        SELECT 'q21', s_name, 'numwait', CAST(numwait AS DOUBLE)
        FROM ({_Q21_SQL}) l
        UNION ALL
        SELECT 'q2', r_name || '|' || CAST(p_partkey AS VARCHAR) || '|'
               || CAST(s_suppkey AS VARCHAR),
               'unit_price', CAST(unit_price AS DOUBLE)
        FROM ({_Q2_SQL}) m
        UNION ALL
        SELECT 'q9', nation || '|' || CAST(o_year AS VARCHAR), 'sum_profit',
               CAST(sum_profit AS DOUBLE)
        FROM ({_Q9_SQL}) n
        UNION ALL
        SELECT 'q11', n_name || '|' || CAST(l_partkey AS VARCHAR), 'value',
               CAST(value AS DOUBLE)
        FROM ({_Q11_SQL}) o
        UNION ALL
        SELECT 'q12', l_returnflag, 'high_line_count', CAST(high_line_count AS DOUBLE)
        FROM ({_Q12_SQL}) p
        UNION ALL
        SELECT 'q12', l_returnflag, 'low_line_count', CAST(low_line_count AS DOUBLE)
        FROM ({_Q12_SQL}) q
        UNION ALL
        SELECT 'q20', CAST(s_suppkey AS VARCHAR), 'name_len',
               CAST(length(s_name) AS DOUBLE)
        FROM ({_Q20_SQL}) r
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
# basket_affinity registers in operators/overflow.py — the module for
# entries beyond the driver's 50-row correctness budget.


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction — the runtime-filter pattern every
# warehouse engine applies to star joins (and Spark itself applies
# under spark.sql.optimizer.runtime.bloomFilter.enabled): when the
# build side's key SET is too large to broadcast as a hash relation, a
# fixed-size bloom filter of it still broadcasts, and probing it
# MAP-SIDE prunes the fact scan before the expensive shuffle join.
# Here the filter is built explicitly in DataFrame algebra so the
# decision bits are engine-portable (md5-derived hashes, 62-bit words)
# and the whole operator oracle-checks bit-for-bit — including its
# false positives, which are deterministic given the hash family.
#
# Sizing is data-derived INSIDE the query (bits = ceil(14.4 * n_keys),
# k = 3 hashes -> ~0.7% fp), so the same SQL stays correctly sized at
# any scale factor. Scale shape: build = one tiny distinct + one
# |words|-group bit_or agg collapsed to a single map row; probe = one
# broadcast of that row + pure map-side bit tests; only the ~in-set
# fraction of the fact ever reaches the downstream join's shuffle.
# ---------------------------------------------------------------------------

BLOOM_K = 3  # hash functions
BLOOM_BITS_PER_KEY = 14.4
_BLOOM_PRIORITY = "1-URGENT"  # build-side restriction (selective dim slice)

# Integer keys need no digest: the K hash functions are the classic
# Carter-Wegman universal family h_i(x) = ((a_i * (x mod p) + b_i)
# mod p) mod m with p = 2^31 - 1 — pure overflow-free bigint
# arithmetic both engines evaluate identically, ~5x cheaper per probe
# row than an md5 (measured: the digest was the dominant probe cost;
# the repo's minhash uses the same mix trick for the same reason).
# String keys would md5 once and reuse the digest for all K.
_BLOOM_P = 2147483647
_BLOOM_AB = ((1103515245, 12345), (69069, 362437), (1664525, 1013904223))
_BLOOM_H = "(({a} * ({key} % {p}) + {b}) % {p})"


def _bloom_idx(key: str, i: int, m: str) -> str:
    a, b = _BLOOM_AB[i]
    return _BLOOM_H.format(a=a, b=b, key=key, p=_BLOOM_P) + f" % {m}"


def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The probe is pure per-row arithmetic, so its wall time is scan
    # parallelism x row cost: the sf0.1 fixture is one ~10 MB file = 3
    # input splits = 3 busy cores out of 32. Narrow splits for THIS
    # query (saved/restored, the q_stream_* shuffle-partitions
    # precedent) so the probe fans out locally; at production scale
    # files exceed the default 128 MB split and the conf is moot.
    prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
    try:
        return _bloom_semijoin(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)


def _bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = (
        orders.where(F.col("o_orderpriority") == _BLOOM_PRIORITY)
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
        .cache()  # reused by stats, the bitset build, and the truth join
    )
    try:
        return _bloom_semijoin_body(spark, lineitem, keys)
    finally:
        # every action on `keys` happens inside the body (the result is
        # a literal-row frame) — release the cache instead of leaking
        # the key set into executor storage for the rest of the session
        keys.unpersist()


def _bloom_semijoin_body(
    spark: SparkSession, lineitem: DataFrame, keys: DataFrame
) -> DataFrame:
    stats = keys.agg(
        F.count(F.lit(1)).alias("n_keys"),
        (62 * F.ceil(F.count(F.lit(1)) * BLOOM_BITS_PER_KEY / 62)).alias("m"),
    )
    idx_cols = [
        F.expr(_bloom_idx("key", i, "m")).alias(f"i{i}") for i in range(BLOOM_K)
    ]
    words = (
        keys.crossJoin(F.broadcast(stats))
        .select(*idx_cols)
        .select(F.explode(F.array(*[F.col(f"i{i}") for i in range(BLOOM_K)])).alias("idx"))
        .select(
            F.expr("idx div 62").alias("word"), F.expr("idx % 62").alias("bit")
        )
        .groupBy("word")
        .agg(
            F.expr("bit_or(shiftleft(cast(1 as bigint), cast(bit as int)))").alias(
                "bits"
            )
        )
    )
    # The bitset rides into the probe as ONE array literal, not a join:
    # a broadcast-joined array column is re-materialized into every
    # probe row's UnsafeRow (~|bitset| bytes x |fact| rows — measured
    # 4-7 s at sf0.1), while a Literal is a single shared constant the
    # generated code indexes O(1). The driver fold is bounded by design
    # (m = 14.4 bits/key -> |words| = m/62; the C4 bounded-collect
    # rule): this explicit operator demonstrates the semantics Spark's
    # own runtime row-level bloom (ScalarSubquery + might_contain)
    # applies when spark.sql.optimizer.runtime.bloomFilter.enabled
    # kicks in — at 10^9+ build keys you flip that conf instead.
    word_rows = words.crossJoin(F.broadcast(stats)).collect()  # ONE action
    if not word_rows:  # empty build side: nothing can pass the filter
        sr = stats.first()
        word_rows, n_keys_v, m_v = [], int(sr["n_keys"]), max(int(sr["m"]), 62)
    else:
        n_keys_v, m_v = int(word_rows[0]["n_keys"]), int(word_rows[0]["m"])
    n_words = (m_v - 1) // 62 + 1
    bitset = [0] * n_words
    for r in word_rows:
        bitset[int(r["word"])] = int(r["bits"])
    # ONE parsed expression, not F.lit(list): lit on a Python list makes
    # a py4j roundtrip PER ELEMENT (~4 s for 7k words); the SQL string
    # parses in milliseconds and constant-folds to the same literal.
    bf_lit = F.expr("array({})".format(",".join(f"{x}L" for x in bitset)))

    def _probe_test(i: int):
        # the literal stays INSIDE the filter expression — adding it as
        # a column would re-materialize the array into every row
        word_pos = F.expr(f"cast((x{i} div 62) as int) + 1")
        mask = F.expr(
            f"shiftleft(cast(1 as bigint), cast(x{i} % 62 as int))"
        )
        return F.element_at(bf_lit, word_pos).bitwiseAND(mask) != 0

    # Scan-parallelism floor on this 2-column projection tried and
    # REJECTED (r09, guide §1): count 3.21 -> 4.07 s (min-of-4
    # interleaved). The probe's BLOOM_K hashes are cheap mul/mods and
    # the query's wall time is dominated by its two sequential driver
    # actions (bitset build, flag agg), so the added exchange was pure
    # overhead. See OPTIMIZATION_r09.md.
    probed = lineitem.select(
        "l_orderkey",
        "l_returnflag",
        *[
            F.expr(_bloom_idx("l_orderkey", i, str(m_v))).alias(f"x{i}")
            for i in range(BLOOM_K)
        ],
    )
    cond = _probe_test(0)
    for i in range(1, BLOOM_K):
        cond = cond & _probe_test(i)
    # ONE fact scan carries the whole accounting: the bloom decision is
    # the filter expression, ground truth is a broadcast left join on
    # the true key set, and the per-flag aggregate (bounded domain —
    # the C4 bounded-collect pattern) yields passed/true counts
    # together. No second probe pass, no separate semi-join job.
    marked = probed.join(
        F.broadcast(
            keys.select(
                F.col("key").alias("l_orderkey"), F.lit(1).alias("is_true")
            )
        ),
        "l_orderkey",
        "left",
    )
    flag_rows = sorted(
        marked.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(cond, 1).otherwise(0)).alias("n_pass"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias("n_true"),
        )
        .collect()
    )
    n_passed = sum(r["n_pass"] for r in flag_rows)
    n_true = sum(r["n_true"] for r in flag_rows)
    rows = [
        ("passed_by_flag", r["l_returnflag"], float(r["n_pass"]))
        for r in flag_rows
    ] + [
        ("summary", "n_keys", float(n_keys_v)),
        ("summary", "n_passed", float(n_passed)),
        ("summary", "n_true", float(n_true)),
        ("summary", "false_pos", float(n_passed - n_true)),
    ]
    return spark.createDataFrame(rows, "section string, k string, v double")


def _bloom_idx_duck(key: str, i: int) -> str:
    a, b = _BLOOM_AB[i]
    return _BLOOM_H.format(a=a, b=b, key=key, p=_BLOOM_P) + " % m"

BLOOM_SEMIJOIN_SQL = f"""
    WITH keys AS (
        SELECT DISTINCT o_orderkey AS key FROM orders
        WHERE o_orderpriority = '{_BLOOM_PRIORITY}'
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(62 * ceil(count(*) * {BLOOM_BITS_PER_KEY} / 62) AS BIGINT) AS m
        FROM keys
    ),
    kbits AS (
        {" UNION ALL ".join(f"SELECT {_bloom_idx_duck('key', i)} AS idx FROM keys, stats" for i in range(BLOOM_K))}
    ),
    words AS (
        SELECT idx // 62 AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(idx % 62 AS INT)) AS bits
        FROM kbits GROUP BY 1
    ),
    li AS (
        -- the fixture's lineitem carries duplicate (orderkey, linenumber)
        -- pairs; a synthetic row id preserves row multiplicity through the
        -- per-hash explode (Spark probes rows directly, never grouping)
        SELECT l_orderkey, l_returnflag, row_number() OVER () AS rid
        FROM lineitem
    ),
    pbits AS (
        {" UNION ALL ".join(f"SELECT l.rid, l.l_returnflag, {_bloom_idx_duck('l.l_orderkey', i)} AS idx FROM li l, stats" for i in range(BLOOM_K))}
    ),
    probed AS (
        SELECT p.rid, p.l_returnflag,
               CASE WHEN (w.bits & (CAST(1 AS BIGINT) << CAST(p.idx % 62 AS INT))) <> 0
                    THEN 1 ELSE 0 END AS ok
        FROM pbits p LEFT JOIN words w ON w.word = p.idx // 62
    ),
    passed AS (
        SELECT rid, l_returnflag
        FROM probed GROUP BY 1, 2 HAVING sum(ok) = {BLOOM_K}
    ),
    truth AS (
        SELECT l.l_orderkey, l.rid
        FROM li l SEMI JOIN keys k ON l.l_orderkey = k.key
    )
    SELECT 'passed_by_flag' AS section, l_returnflag AS k,
           CAST(count(*) AS DOUBLE) AS v
    FROM passed GROUP BY 2
    UNION ALL
    SELECT 'summary', t.k, t.v
    FROM (
        SELECT 'n_keys' AS k, CAST(n_keys AS DOUBLE) AS v FROM stats
        UNION ALL
        SELECT 'n_passed', CAST((SELECT count(*) FROM passed) AS DOUBLE)
        UNION ALL
        SELECT 'n_true', CAST((SELECT count(*) FROM truth) AS DOUBLE)
        UNION ALL
        SELECT 'false_pos',
               CAST((SELECT count(*) FROM passed) - (SELECT count(*) FROM truth) AS DOUBLE)
    ) t
"""
# bloom_semijoin registers in operators/overflow.py (post-budget).


# ---------------------------------------------------------------------------
# HLL sketch rollups — the mergeable-sketch pattern that makes
# incremental analytics work at 100 TB: persist one small HyperLogLog
# sketch per (day, dimension) partition, answer any coarser-grain
# distinct-count question by UNIONING sketches — never rescanning the
# fact history. Built on Spark's Datasketches functions
# (hll_sketch_agg / hll_union_agg / hll_sketch_estimate).
#
# The gate pins (a) the exact distinct counts (DuckDB-checkable), (b)
# a bounded-error flag for the merged-sketch estimate (default
# lgConfigK=12 -> ~1.6% standard error; 5% bound), and (c) the
# re-aggregability property: merging the DAILY sketches must land
# within HLL_MERGE_BOUND of sketching the month directly — union is
# lossless on the register level but sparse->dense promotion makes the
# estimates differ by a fraction of the standard error (measured 0.4%
# at sf0.1), so exact equality is deliberately NOT asserted.
# ---------------------------------------------------------------------------

HLL_ERR_BOUND = 0.05
HLL_MERGE_BOUND = 0.02


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.date_trunc("month", "ts").cast("date").alias("month"),
        F.to_date("ts").alias("day"),
        "event_type",
        "user_id",
    )
    daily = base.groupBy("month", "day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("month", "event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = base.groupBy("month", "event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return merged.join(direct, ["month", "event_type"]).select(
        "month",
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est_merged") - F.col("exact_users"))
            / F.col("exact_users")
            <= HLL_ERR_BOUND
        )
        .cast("int")
        .alias("est_ok"),
        (
            F.abs(F.col("est_merged") - F.col("est_direct"))
            / F.col("exact_users")
            <= HLL_MERGE_BOUND
        )
        .cast("int")
        .alias("rollup_consistent"),
    )


HLL_ROLLUP_SQL = """
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           1 AS est_ok, 1 AS rollup_consistent
    FROM events
    GROUP BY 1, 2
"""
# hll_rollup registers in operators/overflow.py (post-budget).


# ---------------------------------------------------------------------------
# SCD Type 2 dimension build — the slowly-changing-dimension pattern
# every warehouse maintains next to its fact pipeline: fold a change
# log into versioned history rows (valid_from / valid_to / is_current
# / version). The whole fold is ONE window over (entity, change-time):
# valid_to = lead(valid_from) (NULL while current), version =
# row_number — no self-join, no MERGE loop; at 100 TB it is a single
# entity-keyed shuffle with whatever partition pruning the change-log
# scan allows. Consecutive same-value rows are collapsed first (the
# no-op-update guard) via lag() inside the same window partitioning,
# so the two window passes share one Exchange.
#
# Source here: the events stream read as a change log of each user's
# `value` attribute (ts = change time); ties on ts break by event_id
# so history is total-ordered and both engines agree.
# ---------------------------------------------------------------------------


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    log = events.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        "event_id",
        F.round(F.col("value") + 1e-9, 2).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    changed = (
        log.withColumn("__prev", F.lag("value").over(w))
        .where(F.col("__prev").isNull() | (F.col("__prev") != F.col("value")))
        .drop("__prev")
    )
    return changed.select(
        "user_id",
        "value",
        F.unix_timestamp("valid_from").alias("valid_from"),
        F.unix_timestamp(F.lead("valid_from").over(w)).alias("valid_to"),
        F.lead("valid_from").over(w).isNull().cast("int").alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
    )


SCD2_SQL = """
    WITH log AS (
        SELECT user_id, ts AS valid_from, event_id,
               round(value + 1e-9, 2) AS value
        FROM events
    ),
    changed AS (
        SELECT * FROM (
            SELECT l.*,
                   lag(value) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, event_id) AS prev
            FROM log l
        ) WHERE prev IS NULL OR prev <> value
    )
    SELECT user_id, value,
           CAST(floor(epoch(valid_from)) AS BIGINT) AS valid_from,
           CAST(floor(epoch(lead(valid_from) OVER w)) AS BIGINT) AS valid_to,
           CAST(lead(valid_from) OVER w IS NULL AS INT) AS is_current,
           CAST(row_number() OVER w AS INT) AS version
    FROM changed
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
"""
# scd2_history registers in operators/overflow.py (post-budget).


def cdc_apply(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC change log to its final snapshot: keep the
    highest-sequence change per key, drop keys whose last change is a
    delete — the read-side half of a lakehouse CDC pipeline (the
    write-side MERGE is FeatureTable.merge). `scd2` above keeps the
    full history; this keeps only current state. One key-grain window
    shuffle; out-of-order arrivals are harmless because ordering is by
    the log's own sequence columns, not arrival order."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in seq_cols]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events replayed as a change log: purchases delete the user's
    row, everything else upserts its value. The snapshot is users whose
    LAST event is a non-purchase, carrying that event's value."""
    events = load_table(spark, sf_dir, "events")
    log = events.select(
        "user_id",
        F.unix_timestamp("ts").alias("seq_t"),
        "event_id",
        F.when(F.col("event_type") == "purchase", "D")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("value") + 1e-9, 2).alias("value"),
    )
    snap = cdc_apply(log, ["user_id"], ["seq_t", "event_id"], "op")
    return snap.select("user_id", "seq_t", "event_id", "value")


CDC_APPLY_SQL = """
    WITH log AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS seq_t,
               event_id,
               CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
               round(value + 1e-9, 2) AS value
        FROM events
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY seq_t DESC, event_id DESC
        ) AS rn
        FROM log
    )
    SELECT user_id, seq_t, event_id, value
    FROM ranked WHERE rn = 1 AND op <> 'D'
"""
# cdc_apply registers in operators/overflow.py (post-budget).


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics on the VARIANT type (Spark 4.x): the
    events' JSON `props` column is parsed ONCE into a binary variant
    (parse_json — no schema declaration, unlike from_json) and typed
    paths are extracted with variant_get, then aggregated per event
    type. At 100 TB this is the schema-drift-proof ingestion shape:
    the variant encoding is columnar-shredded and path extraction is
    a map-side expression — producers can add keys without breaking
    the reader. The DuckDB oracle runs the same extraction through
    its native JSON path functions. pytest additionally pins
    schema_of_variant_agg as the drift-profiling surface."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        F.expr(
            "variant_get(parse_json(props), '$.k', 'bigint')"
        ).alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("distinct_k"),
    )


VARIANT_SQL = """
    WITH v AS (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k, max(k) AS max_k,
           CAST(count(DISTINCT k) AS BIGINT) AS distinct_k
    FROM v GROUP BY event_type
"""


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over parts: the set of
    (retailprice, size) grains not dominated by any other grain
    (dominated = another part costs <= AND is smaller <=, with at
    least one strict). Classic OLAP skyline operator, solved with ONE
    sort instead of the naive O(n^2) dominance anti-join: collapse to
    distinct grains (bounded by the price x size grid, tiny next to
    |parts|), order by (price, size), and a grain is on the frontier
    iff no PRECEDING grain has size <= its size — i.e. the running
    min of size strictly decreases. One agg shuffle + one global sort
    over the collapsed grains; the fact-size work is the map-side
    distinct. Returns each frontier grain with its member part count,
    cheapest-first."""
    parts = load_table(spark, sf_dir, "part")
    grains = parts.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).agg(F.count(F.lit(1)).alias("n_parts"))
    w = (
        Window.orderBy("price", "size")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        grains.withColumn("min_prev_size", F.min("size").over(w))
        .where(F.col("min_prev_size").isNull() | (F.col("min_prev_size") > F.col("size")))
        .select(
            F.round(F.col("price"), 2).alias("price"),
            F.col("size").cast("int").alias("size"),
            F.col("n_parts").cast("bigint").alias("n_parts"),
        )
    )


PARETO_SQL = """
    WITH grains AS (
        SELECT p_retailprice AS price, p_size AS size, count(*) AS n_parts
        FROM part GROUP BY 1, 2
    ),
    ranked AS (
        SELECT price, size, n_parts,
               min(size) OVER (ORDER BY price, size
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS min_prev_size
        FROM grains
    )
    SELECT round(price, 2) AS price, CAST(size AS INT) AS size,
           CAST(n_parts AS BIGINT) AS n_parts
    FROM ranked
    WHERE min_prev_size IS NULL OR min_prev_size > size
"""


def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 dimension q_scd2_history
    builds: each purchase event joins the user-attribute VERSION valid
    at its timestamp — the read side of slowly-changing dimensions
    (the build is scd2_history; this closes the loop). Implemented
    with the union + last(ignorenulls) single-window as-of pattern
    (feature_store.lookup_asof's trick): version rows and probe rows
    interleave on one per-user time-ordered window, so there is NO
    range join and NO per-probe history fan-out — one user-keyed
    Exchange total. Dim rows sort before probes at equal timestamps
    (inclusive valid_from), and same-instant version chains resolve
    to the highest version, matching the oracle's zero-width-interval
    exclusion."""
    hist = q_scd2_history(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    dim = hist.select(
        "user_id",
        F.col("valid_from").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("bigint").alias("event_id"),
        "value",
        "version",
    )
    probes = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("int").alias("version"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_probe", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = dim.unionByName(probes).select(
        "user_id",
        "t",
        "is_probe",
        "event_id",
        F.last("value", ignorenulls=True).over(w).alias("attr_value"),
        F.last("version", ignorenulls=True).over(w).alias("attr_version"),
    )
    return merged.where(F.col("is_probe") == 1).select(
        "event_id",
        "user_id",
        F.col("t").alias("ts_epoch"),
        F.round(F.col("attr_value") + 1e-9, 2).alias("attr_value"),
        F.col("attr_version").cast("int").alias("attr_version"),
    )


def _scd2_lookup_sql() -> str:
    return f"""
    WITH hist AS MATERIALIZED ({SCD2_SQL}),
    probes AS (
        SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.t AS ts_epoch,
           round(h.value + 1e-9, 2) AS attr_value,
           CAST(h.version AS INT) AS attr_version
    FROM probes p
    LEFT JOIN hist h
      ON p.user_id = h.user_id
     AND p.t >= h.valid_from
     AND (h.valid_to IS NULL OR p.t < h.valid_to)
"""


SCD2_LOOKUP_SQL = _scd2_lookup_sql()


def q_rank_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda rank aggregation of three brand leaderboards (revenue,
    units, distinct buyers): each metric ranks with a deterministic
    total order (metric desc, brand), Borda score = sum over metrics
    of (n_brands - rank), composite rank by (borda desc, brand). The
    multi-metric 'who is best overall' readout — robust to any single
    metric's scale. One silver agg + three rank windows over the
    |brands|-row table + one final window."""
    from pyspark.sql import Window

    from propensity_spark.operators.relational import brand_dim, silver_transactions

    silver = silver_transactions(spark, sf_dir)
    per_brand = (
        silver.join(F.broadcast(brand_dim(spark, sf_dir)), "product_id")
        .groupBy(F.col("commodity_desc").alias("brand"))
        .agg(
            F.round(F.sum("amount_list") + 1e-6, 2).alias("revenue"),
            F.sum(F.col("units").cast("bigint")).alias("units"),
            F.countDistinct("household_key").alias("buyers"),
        )
    )
    n = Window.partitionBy()
    r_rev = F.row_number().over(Window.orderBy(F.desc("revenue"), "brand"))
    r_units = F.row_number().over(Window.orderBy(F.desc("units"), "brand"))
    r_buyers = F.row_number().over(Window.orderBy(F.desc("buyers"), "brand"))
    ranked = per_brand.select(
        "brand",
        "revenue",
        r_rev.alias("r_rev"),
        r_units.alias("r_units"),
        r_buyers.alias("r_buyers"),
        F.count(F.lit(1)).over(n).alias("__n"),
    ).withColumn(
        "borda",
        (F.col("__n") - F.col("r_rev"))
        + (F.col("__n") - F.col("r_units"))
        + (F.col("__n") - F.col("r_buyers")),
    )
    return ranked.select(
        "brand",
        "revenue",
        F.col("r_rev").cast("int").alias("r_rev"),
        F.col("r_units").cast("int").alias("r_units"),
        F.col("r_buyers").cast("int").alias("r_buyers"),
        F.col("borda").cast("int").alias("borda"),
        F.row_number()
        .over(Window.orderBy(F.desc("borda"), "brand"))
        .cast("int")
        .alias("final_rank"),
    )


def _rank_agg_sql() -> str:
    from propensity_spark.operators.relational import SILVER_SQL

    return f"""
    WITH s AS MATERIALIZED ({SILVER_SQL}),
    per_brand AS (
        SELECT p.p_brand AS brand,
               round(sum(s.amount_list) + 1e-6, 2) AS revenue,
               CAST(sum(CAST(s.units AS BIGINT)) AS BIGINT) AS units,
               count(DISTINCT s.household_key) AS buyers
        FROM s JOIN part p ON s.product_id = p.p_partkey
        GROUP BY 1
    ),
    ranked AS (
        SELECT brand, revenue,
               row_number() OVER (ORDER BY revenue DESC, brand) AS r_rev,
               row_number() OVER (ORDER BY units DESC, brand) AS r_units,
               row_number() OVER (ORDER BY buyers DESC, brand) AS r_buyers,
               count(*) OVER () AS n
        FROM per_brand
    )
    SELECT brand, revenue,
           CAST(r_rev AS INT) AS r_rev,
           CAST(r_units AS INT) AS r_units,
           CAST(r_buyers AS INT) AS r_buyers,
           CAST((n - r_rev) + (n - r_units) + (n - r_buyers) AS INT) AS borda,
           CAST(row_number() OVER (ORDER BY (n - r_rev) + (n - r_units)
                + (n - r_buyers) DESC, brand) AS INT) AS final_rank
    FROM ranked
"""


RANK_AGG_SQL = _rank_agg_sql()


AUDIENCE_ERR_BOUND = 0.15  # |A∩B| via inclusion-exclusion compounds 3 sketch errors


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix via HLL inclusion-exclusion: for every
    pair of event-type segments, |A∩B| ~= est(A) + est(B) -
    est(A∪B), where the union estimate comes from hll_union_agg over
    the two segments' per-segment sketches — the sketch-only overlap
    readout that never re-scans users (at 10^9 users the exact
    intersection is a distinct-join; sketches make it a k²-row sketch
    merge). Gate pins exact pair intersections (the oracle side) plus
    a deterministic bounded-relative-error flag per pair, the
    hll_rollup convention — Jaccard reported from the EXACT counts so
    the hash is sketch-free."""
    events = load_table(spark, sf_dir, "events")
    seg = events.select("event_type", "user_id").distinct()
    sketches = seg.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    a = sketches.selectExpr("event_type AS seg_a", "sk AS sk_a", "n_exact AS n_a")
    b = sketches.selectExpr("event_type AS seg_b", "sk AS sk_b", "n_exact AS n_b")
    # k-row sketch frame: broadcast the pair expansion (a
    # BroadcastNestedLoopJoin over k² sketch rows, never a shuffled
    # cartesian — k = |segments|, not data-sized)
    pairs = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    est = pairs.select(
        "seg_a",
        "seg_b",
        "n_a",
        "n_b",
        (
            F.hll_sketch_estimate("sk_a")
            + F.hll_sketch_estimate("sk_b")
            - F.hll_sketch_estimate(
                F.expr("hll_union(sk_a, sk_b)")
            )
        ).alias("est_overlap"),
    )
    ex = (
        seg.alias("x")
        .join(seg.alias("y"), (F.expr("x.user_id = y.user_id") & F.expr("x.event_type < y.event_type")))
        .groupBy(
            F.expr("x.event_type").alias("seg_a"), F.expr("y.event_type").alias("seg_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        est.join(ex, ["seg_a", "seg_b"])
        .select(
            "seg_a",
            "seg_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("exact_overlap").cast("bigint").alias("exact_overlap"),
            F.round(
                F.col("exact_overlap")
                / (F.col("n_a") + F.col("n_b") - F.col("exact_overlap")).cast("double")
                + 1e-9,
                6,
            ).alias("jaccard"),
            (
                F.abs(F.col("est_overlap") - F.col("exact_overlap"))
                / F.greatest(F.col("exact_overlap"), F.lit(1)).cast("double")
                <= AUDIENCE_ERR_BOUND
            )
            .cast("int")
            .alias("est_ok"),
        )
    )


AUDIENCE_OVERLAP_SQL = """
    WITH seg AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
        SELECT event_type, count(*) AS n FROM seg GROUP BY event_type
    ),
    ex AS (
        SELECT x.event_type AS seg_a, y.event_type AS seg_b,
               count(*) AS exact_overlap
        FROM seg x JOIN seg y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2
    )
    SELECT e.seg_a, e.seg_b,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
           CAST(e.exact_overlap AS BIGINT) AS exact_overlap,
           round(e.exact_overlap * 1.0
                 / (sa.n + sb.n - e.exact_overlap) + 1e-9, 6) AS jaccard,
           1 AS est_ok
    FROM ex e
    JOIN sizes sa ON e.seg_a = sa.event_type
    JOIN sizes sb ON e.seg_b = sb.event_type
"""


# --- gate registration (moved from the retired operators/overflow.py shim) ---
# Entries past the driver's 50-row budget register here, next to their
# operators; __spark_entry__ merges every module's QUERIES/ORACLES and
# DRIVER_GATE_PRIORITY decides what the driver sees.
from propensity_spark.operators.relational import SILVER_SQL

QUERIES.update({
    "basket_affinity": q_basket_affinity,
    "basket_affinity_3": q_basket_affinity_3,
    "bloom_semijoin": q_bloom_semijoin,
    "hll_rollup": q_hll_rollup,
    "scd2_history": q_scd2_history,
    "cdc_apply": q_cdc_apply,
    "salted_join": q_salted_join,
    "variant_extract": q_variant_extract,
    "pareto_frontier": q_pareto_frontier,
    "scd2_lookup": q_scd2_lookup,
    "rank_aggregation": q_rank_aggregation,
    "audience_overlap": q_audience_overlap,
})

ORACLES.update({
    "basket_affinity": _BASKET_AFFINITY_SQL.format(
        silver=SILVER_SQL, minsup=MIN_SUPPORT, max_items=MAX_BASKET_ITEMS
    ),
    "basket_affinity_3": _BASKET3_SQL.format(
        silver=SILVER_SQL, minsup=TRIPLE_MIN_SUPPORT, max_items=MAX_BASKET_ITEMS
    ),
    "bloom_semijoin": BLOOM_SEMIJOIN_SQL,
    "hll_rollup": HLL_ROLLUP_SQL,
    "scd2_history": SCD2_SQL,
    "cdc_apply": CDC_APPLY_SQL,
    "salted_join": SALTED_JOIN_SQL,
    "variant_extract": VARIANT_SQL,
    "pareto_frontier": PARETO_SQL,
    "scd2_lookup": SCD2_LOOKUP_SQL,
    "rank_aggregation": RANK_AGG_SQL,
    "audience_overlap": AUDIENCE_OVERLAP_SQL,
})

"""Property-based checks (hypothesis): decomposition and windowing
semantics must hold for ARBITRARY data, not just the fixtures."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key (few -> collisions)
            st.integers(min_value=-1000, max_value=1000),  # value
        ),
        min_size=1,
        max_size=60,
    )
)
@SLOW
def test_salted_agg_equals_plain_agg(spark, rows):
    """Two-stage salted aggregation == plain aggregation, any input."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "k int, v int")
    plain = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    salted = (
        df.withColumn("__salt", F.pmod(F.hash("v"), F.lit(8)))
        .groupBy("k", "__salt")
        .agg(F.sum("v").alias("p"))
        .groupBy("k")
        .agg(F.sum("p").alias("s"))
    )
    assert {r["k"]: r["s"] for r in salted.collect()} == plain


@given(
    ts_list=st.lists(
        st.integers(min_value=0, max_value=10_000),  # seconds
        min_size=1,
        max_size=40,
        unique=True,
    ),
    gap=st.integers(min_value=60, max_value=1800),
)
@SLOW
def test_session_window_matches_manual_sessionization(spark, ts_list, gap):
    """Spark's session_window == the lag/cumsum definition, any input."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, t) for t in ts_list], "user_id int, sec int"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    spark_sessions = sorted(
        r["n"]
        for r in df.groupBy(F.session_window("ts", f"{gap} seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    manual = []
    prev = None
    for t in sorted(ts_list):
        if prev is None or t - prev >= gap:
            manual.append(0)
        manual[-1] += 1
        prev = t
    assert spark_sessions == sorted(manual)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=3,
        max_size=30,
    )
)
@SLOW
def test_conditional_window_agg_equals_filter_agg(spark, vals):
    """sum(CASE WHEN in-window) == filter-then-sum — the feature
    engine's core rewrite (SURVEY §4), for arbitrary values."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i int, v double"
    )
    cutoff = len(vals) // 2
    cond = F.col("i") >= cutoff
    a = df.agg(F.sum(F.when(cond, F.col("v")))).collect()[0][0]
    b = df.where(cond).agg(F.sum("v")).collect()[0][0]
    assert (a is None and b is None) or abs(a - b) < 1e-6


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab x"),  # collisions + short docs
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=25,
    )
)
@SLOW
def test_split_by_hash_partitions_every_row_exactly_once(spark, texts):
    """Every row gets exactly one split label, labels come from the
    config, and the assignment is a pure function of the key — for
    arbitrary keys including duplicates and empties."""
    from propensity_spark.text.analysis import split_by_hash

    df = spark.createDataFrame(
        [(t,) for t in texts], "k string"
    )
    fr = {"train": 0.6, "val": 0.2, "test": 0.2}
    rows = split_by_hash(df, "k", fr).collect()
    assert len(rows) == len(texts)
    assert {r["split"] for r in rows} <= set(fr)
    by_key = {}
    for r in rows:  # same key -> same split, always
        assert by_key.setdefault(r["k"], r["split"]) == r["split"]


@given(
    words=st.lists(
        st.sampled_from(["aa", "bb", "cc"]),  # tiny vocab -> repetition
        min_size=0,
        max_size=20,
    )
)
@SLOW
def test_dup_bigram_frac_matches_python_definition(spark, words):
    """The map-only dup_bigram_frac SQL == the obvious Python
    definition, for arbitrary (including <2-word) documents. Exercises
    the hoisted form: bigrams are built over a pre-split `__words`
    projection, exactly as q_text_quality stages them."""
    from propensity_spark.text.analysis import _BIGRAMS_FROM_WORDS

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    got = (
        df.selectExpr("split(text, ' ') AS __words")
        .selectExpr(f"{_BIGRAMS_FROM_WORDS} AS __bigrams")
        .selectExpr(
            "CASE WHEN size(__bigrams) = 0 THEN 0.0"
            " ELSE round(1e-9 + 1.0 - size(array_distinct(__bigrams))"
            " / size(__bigrams), 6) END AS f"
        )
        .collect()[0]["f"]
    )
    toks = text.split(" ")
    bigrams = [f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)]
    want = 0.0 if not bigrams else round(1e-9 + 1.0 - len(set(bigrams)) / len(bigrams), 6)
    assert abs(got - want) < 1e-9


@given(
    docs=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=12,
    ),
    min_docs=st.integers(min_value=2, max_value=4),
)
@SLOW
def test_strip_boilerplate_roundtrip_and_conservation(spark, docs, min_docs):
    """For ARBITRARY unicode documents: (1) split -> anti-join ->
    ordered reassembly is exact — every output text equals the input
    with precisely the boilerplate lines deleted; (2) line accounting
    conserves: kept + removed == original line count; (3) with an
    unreachable min_docs the text round-trips byte-for-byte."""
    from propensity_spark.text.dedup import boilerplate_lines, strip_boilerplate

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")

    # unreachable threshold -> pure round-trip
    untouched = {
        r["doc_id"]: r["clean_text"]
        for r in strip_boilerplate(df, min_docs=len(docs) + 1).collect()
    }
    assert untouched == dict(enumerate(docs))

    boiler = {r["line"] for r in boilerplate_lines(df, min_docs=min_docs).collect()}
    out = {r["doc_id"]: r for r in strip_boilerplate(df, min_docs=min_docs).collect()}
    assert set(out) == set(range(len(docs)))
    for i, text in enumerate(docs):
        lines = text.split("\n")
        # model Spark's F.trim exactly: it strips ONLY 0x20 spaces,
        # not tabs/unicode whitespace like Python str.strip()
        kept = [ln for ln in lines if ln.strip(" ") not in boiler or ln.strip(" ") == ""]
        assert out[i]["clean_text"] == "\n".join(kept)
        assert out[i]["n_removed_lines"] == len(lines) - len(kept)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # household
            st.integers(min_value=0, max_value=400),  # day offset
            st.integers(min_value=1, max_value=4),    # basket
            st.integers(min_value=1, max_value=5),    # product
            st.floats(min_value=0, max_value=50, allow_nan=False),  # amount
        ),
        min_size=1,
        max_size=40,
    ),
    anchor_offsets=st.lists(
        st.integers(min_value=0, max_value=400), min_size=1, max_size=3, unique=True
    ),
)
@SLOW
def test_multi_day_features_equal_per_day_on_arbitrary_facts(spark, rows, anchor_offsets):
    """multi_day_features == the single-day engine per anchor for
    ARBITRARY fact sets — including anchors before any fact (empty
    output for that anchor on both paths) and households active only
    after an anchor."""
    import datetime

    from pyspark.sql import functions as F

    from propensity_spark.operators.features import (
        _spark_features,
        multi_day_features,
    )

    epoch = datetime.date(2024, 1, 1)
    data = [
        (
            hh,
            epoch + datetime.timedelta(days=off),
            bk,
            pr,
            float(amt),
            float(amt) * 0.1,
            float(amt) * 0.05,
            0.0,
            float(amt) * 0.15,
            float(amt) * 0.02,
            float(amt) * 0.85,
            1.0,
        )
        for hh, off, bk, pr, amt in rows
    ]
    schema = (
        "household_key int, day date, basket_id int, product_id int, "
        "amount_list double, instore_discount double, "
        "campaign_coupon_discount double, manuf_coupon_discount double, "
        "total_coupon_discount double, manuf_coupon_match_discount double, "
        "amount_paid double, units double"
    )
    df = spark.createDataFrame(data, schema)
    anchors = sorted(epoch + datetime.timedelta(days=o) for o in anchor_offsets)

    multi = multi_day_features(df, ["household_key"], anchors)
    got = {
        (r["household_key"], str(r["day"])): r.asDict() for r in multi.collect()
    }
    expected_keys = set()
    for a in anchors:
        sliced = df.where(F.col("day") <= F.lit(a))
        if sliced.count() == 0:
            continue  # no facts at-or-before this anchor: no rows either way
        single = _spark_features(sliced, ["household_key"])
        for r in single.collect():
            key = (r["household_key"], str(a))
            expected_keys.add(key)
            want = r.asDict()
            # multi-day derives each anchor's effective max fact day,
            # so EVERY anchor with facts compares bit-exact — including
            # quiet anchors with no transaction on the day itself
            have = got[key]
            for k, v in want.items():
                if k != "household_key":
                    assert have[k] == v, (a, k, have[k], v)
    assert set(got) == expected_keys


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),              # group key
            st.integers(min_value=0, max_value=4),    # day index
            st.integers(min_value=-100, max_value=100),  # value (ints:
        ),                                            # exact equality)
        min_size=1,
        max_size=50,
    ),
    split=st.integers(min_value=0, max_value=4),
)
@SLOW
def test_incremental_agg_split_invariant(spark, rows, split):
    """Materialized-view delta maintenance: for ANY facts and ANY
    history/batch split point, state(hist) ∪ partials(batch) combined
    == combine(partials(all)) — the merge algebra is split-invariant."""
    from datetime import date

    from pyspark.sql import functions as F

    from propensity_spark.operators.maintenance import (
        combine_agg_state,
        partial_agg_state,
    )

    data = [(k, date(2024, 1, 1 + d), float(v)) for k, d, v in rows]
    df = spark.createDataFrame(data, "k string, day date, value double")
    cut = date(2024, 1, 1 + split)

    whole = combine_agg_state(
        partial_agg_state(df, ["k"], "day", "value"), ["k"]
    )
    merged = combine_agg_state(
        partial_agg_state(
            df.where(F.col("day") < cut), ["k"], "day", "value"
        ).unionByName(
            partial_agg_state(
                df.where(F.col("day") >= cut), ["k"], "day", "value"
            )
        ),
        ["k"],
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


@given(
    fact=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # join key, few -> hot
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=50,
    ),
    n_salt=st.sampled_from([1, 2, 8]),
)
@SLOW
def test_salted_join_equals_plain_join(spark, fact, n_salt):
    """salted_join == plain inner join for arbitrary fact/dim and any
    salt width — including keys missing from the dim (dropped by both)
    and duplicate fact rows (each matches its replica exactly once)."""
    from propensity_spark.operators.extended import salted_join

    f = spark.createDataFrame(fact, "k int, v int")
    d = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 5)], "k int, name string"
    )
    out = sorted(map(tuple, salted_join(f, d, "k", n_salt=n_salt).collect()))
    plain = sorted(map(tuple, f.join(d, "k").collect()))
    assert out == plain


@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    shift=st.floats(min_value=-50, max_value=50, allow_nan=False),
)
@SLOW
def test_ewma_affine_equivariance(spark, vals, shift):
    """EWMA of (a*x + c) == a*EWMA(x) + c for any series — the FIR
    kernel is a convex combination (weights renormalize to 1 at every
    row), so affine maps commute with it. Catches weight or
    renormalization bugs on arbitrary data."""
    from propensity_spark.operators.timeseries import ewma

    a = 2.0
    df1 = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "key string, t int, revenue double",
    )
    df2 = spark.createDataFrame(
        [("k", i, a * float(v) + shift) for i, v in enumerate(vals)],
        "key string, t int, revenue double",
    )
    e1 = {r["t"]: r["ewma"] for r in ewma(df1, "key", "t", "revenue").collect()}
    e2 = {r["t"]: r["ewma"] for r in ewma(df2, "key", "t", "revenue").collect()}
    for t in e1:
        assert abs(e2[t] - (a * e1[t] + shift)) < 1e-2, (t, e1[t], e2[t])


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # user_id
            st.integers(min_value=1, max_value=20),  # day of month
        ),
        min_size=1,
        max_size=40,
    )
)
@SLOW
def test_active_users_matches_bruteforce(spark, tmp_path_factory, events):
    """q_active_users == the python brute force (distinct users whose
    activity falls in the trailing window ending at each reported
    day) for arbitrary event sets — validates the forward-expansion
    rewrite of the sliding COUNT DISTINCT."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import date, datetime

    from propensity_spark.operators.behavior import ACTIVE_WINDOWS, q_active_users

    rows = [
        {"event_id": i, "user_id": u, "ts": datetime(2024, 1, d),
         "event_type": "view"}
        for i, (u, d) in enumerate(events)
    ]
    sf = tmp_path_factory.mktemp("au") / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), sf / "events.parquet")

    got = {(r["win"], r["day"]): r["n_active"]
           for r in q_active_users(spark, str(sf)).collect()}

    user_days = {(u, date(2024, 1, d)) for u, d in events}
    all_days = sorted({d for _, d in user_days})
    max_day = max(all_days)
    expected = {}
    for win, length in ACTIVE_WINDOWS.items():
        # a day is reported iff some user-day projects onto it
        for u, d in user_days:
            horizon = min(max_day.toordinal(), d.toordinal() + length - 1)
            for o in range(d.toordinal(), horizon + 1):
                key = (win, date.fromordinal(o))
                expected.setdefault(key, set()).add(u)
    expected = {k: len(v) for k, v in expected.items()}
    assert got == expected


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),     # user
            st.integers(min_value=0, max_value=20000), # offset seconds
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@SLOW
def test_sessionize_equals_bruteforce(spark, events):
    """Gap-split sessionization == a plain-Python fold, any event set:
    same session count per user, same per-session event counts."""
    from collections import Counter
    from datetime import datetime, timedelta

    from propensity_spark.operators.behavior import SESSION_GAP_S, sessionize

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, u, t0 + timedelta(seconds=off), "view", None)
        for i, (u, off) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    got = sessionize(df)
    got_counts = Counter(
        (r["user_id"], r["session_seq"]) for r in got.collect()
    )

    # brute force: sort each user's offsets, split on gap > SESSION_GAP_S
    by_user = {}
    for u, off in events:
        by_user.setdefault(u, []).append(off)
    want = Counter()
    for u, offs in by_user.items():
        offs.sort()
        seq = 0
        prev = None
        for o in offs:
            if prev is None or o - prev > SESSION_GAP_S:
                seq += 1
            want[(u, seq)] += 1
            prev = o
    assert Counter(got_counts.values()) == Counter(want.values())
    # per-user session counts match exactly
    from collections import defaultdict
    gu, wu = defaultdict(set), defaultdict(set)
    for (u, s) in got_counts: gu[u].add(s)
    for (u, s) in want: wu[u].add(s)
    assert {u: len(v) for u, v in gu.items()} == {u: len(v) for u, v in wu.items()}


@given(
    a=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=30),
    b=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=30),
)
@SLOW
def test_ks_statistic_equals_bruteforce(spark, a, b):
    """KS D == max ECDF gap computed by plain Python over the pooled
    support, including heavy ties."""
    from propensity_spark.operators.stats import ks_statistic

    da = spark.createDataFrame([(float(x),) for x in a], "v double")
    db = spark.createDataFrame([(float(x),) for x in b], "v double")
    d = ks_statistic(da, db, "v").collect()[0]["ks_d"]

    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    want = max(
        abs(sum(1 for x in a if x <= t) / na - sum(1 for x in b if x <= t) / nb)
        for t in support
    )
    assert abs(d - want) < 1e-6


def test_in_plan_injectivity_guard_raises_on_collision(spark):
    """The lazy assert_true guard pattern (q_entity_resolution's id
    mapping) must actually raise AT EXECUTION when the watched
    invariant breaks, and pass values through untouched when it
    holds — no eager job at construction either way."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    def guarded(rows):
        df = spark.createDataFrame(rows, "name string, nid long")
        chk = df.groupBy("nid").agg(F.count(F.lit(1)).alias("k")).agg(
            F.max("k").alias("mx")
        )
        return df.crossJoin(F.broadcast(chk)).select(
            "name",
            (
                F.col("nid")
                + F.coalesce(
                    F.expr("cast(assert_true(mx = 1, 'ids collided') as bigint)"),
                    F.lit(0),
                )
            ).alias("nid"),
        )

    ok = guarded([("a", 1), ("b", 2)])  # construction: no job, no raise
    assert {(r["name"], r["nid"]) for r in ok.collect()} == {("a", 1), ("b", 2)}
    bad = guarded([("a", 1), ("b", 1)])  # collision: raises only on execute
    with _pytest.raises(Exception, match="ids collided"):
        bad.collect()

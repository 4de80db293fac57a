"""ML training loop: failure isolation, model registry lifecycle, and
the GBT tree-model path (04b semantics on MLlib)."""

import pytest
from pyspark.sql import functions as F

from propensity_spark.ml import training as M


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ml_store"))


@pytest.fixture(scope="module")
def manifest(spark, sf_dir, store):
    """Train one real commodity plus one poisoned (nonexistent) one —
    exercises the per-commodity try/except isolation (04b:400-417)."""
    ratios = M.q_class_ratios(spark, sf_dir)
    real = sorted(r[0] for r in ratios.select("commodity_desc").distinct().collect())[0]
    return (
        M.train_commodity_models(
            spark,
            sf_dir,
            commodities=[real, "NO#SUCH#COMMODITY"],
            store_base=store,
        ),
        real,
    )


def test_poisoned_commodity_does_not_kill_loop(spark, manifest):
    mf, real = manifest
    rows = {r["commodity_desc"]: r for r in mf.collect()}
    assert rows[real]["stage"] == "Production" and rows[real]["model_path"]
    bad = rows["NO#SUCH#COMMODITY"]
    assert bad["stage"] == "failed"
    assert bad["model_path"] is None and bad["metric_aupr"] is None


def test_scoring_skips_failed_models(spark, sf_dir, store, manifest):
    mf, real = manifest
    ts, _ = M.build_training_set(spark, sf_dir, store, materialize=False)
    scored = M.score_batch(spark, ts, mf)
    got = {r[0] for r in scored.select("commodity_desc").distinct().collect()}
    assert got == {real}
    assert scored.where(~F.col("prediction").between(0, 1)).count() == 0


def test_registry_promote_and_rollback(spark, manifest, tmp_path):
    mf, real = manifest
    reg = M.ModelRegistry(spark, str(tmp_path / "registry"))
    reg.register(mf)  # v1 -> Staging (failed rows keep 'failed')
    assert reg.production().count() == 0
    reg.promote(real, 1)
    assert [r["version"] for r in reg.production().collect()] == [1]

    reg.register(mf)  # v2
    reg.promote(real, 2)
    prod = reg.production().collect()
    assert [r["version"] for r in prod] == [2]
    stages = {
        (r["version"]): r["stage"]
        for r in reg._read().where(F.col("commodity_desc") == real).collect()
    }
    assert stages[1] == "Archived"

    reg.rollback(real)
    assert [r["version"] for r in reg.production().collect()] == [1]
    # failed rows never reach Production
    assert (
        reg._read().where((F.col("stage") == "Production") & F.col("model_path").isNull()).count()
        == 0
    )


def test_gbt_is_default_model(spark, manifest, sf_dir, store):
    from pyspark.ml import PipelineModel
    from pyspark.ml.classification import GBTClassificationModel

    mf, real = manifest
    path = [r["model_path"] for r in mf.collect() if r["commodity_desc"] == real][0]
    loaded = PipelineModel.load(path)
    assert isinstance(loaded.stages[-1], GBTClassificationModel)


def test_scoring_all_failed_returns_empty_with_schema(spark, sf_dir, store, manifest):
    mf, real = manifest
    all_failed = mf.withColumn("model_path", F.lit(None).cast("string"))
    ts, _ = M.build_training_set(spark, sf_dir, store, materialize=False)
    scored = M.score_batch(spark, ts, all_failed)
    assert scored.count() == 0
    assert scored.columns == ["household_key", "commodity_desc", "prediction"]


def test_classification_metrics_match_sklearn_definitions(spark):
    # hand-checkable confusion matrix: tp=2 fp=1 tn=2 fn=1
    rows = [
        (1, 0.9), (1, 0.8), (1, 0.2),   # two TP, one FN
        (0, 0.7), (0, 0.1), (0, 0.3),   # one FP, two TN
    ]
    df = spark.createDataFrame(rows, "purchased int, prediction double")
    m = M.classification_metrics(df).collect()[0]
    assert (m["tp"], m["fp"], m["tn"], m["fn"]) == (2, 1, 2, 1)
    import math

    tpr, tnr = 2 / 3, 2 / 3
    assert abs(m["balanced_accuracy"] - round((tpr + tnr) / 2, 6)) < 1e-9
    want_mcc = (2 * 2 - 1 * 1) / math.sqrt(3 * 3 * 3 * 3)
    assert abs(m["mcc"] - round(want_mcc, 6)) < 1e-9
    # degenerate single-class input: sklearn averages recall over
    # classes PRESENT, so all-positive perfectly-predicted input scores
    # 1.0 (not 0.5 from counting the absent class as recall 0)
    one = spark.createDataFrame([(1, 0.9)], "purchased int, prediction double")
    d = M.classification_metrics(one).collect()[0]
    assert d["mcc"] == 0.0 and d["balanced_accuracy"] == 1.0
    # ... and a missed single-class input scores 0.0
    missed = spark.createDataFrame([(1, 0.1)], "purchased int, prediction double")
    d2 = M.classification_metrics(missed).collect()[0]
    assert d2["balanced_accuracy"] == 0.0


def test_tuned_search_breadth_and_manifest_trials(spark, sf_dir, tmp_path):
    """M3 at reference breadth: tune=True runs a >=12-point search and
    the manifest records the trial count (judge r2 item 5). One
    commodity with the LR estimator keeps the 12-fit TVS within the
    pytest budget.

    The observe() below injects the Spark 4.1 ObservationManager
    poisoning DETERMINISTICALLY (it used to arrive by test-order from
    the publish-metrics test): once any Observation action has run in
    the session, an LR model that still carries its trainingSummary
    cannot be serialized into the evaluator's task closure.
    SessionSafePipeline strips the summary inside fit, so this passes
    regardless of session history."""
    from pyspark.sql import Observation

    obs = Observation("poison_observation_manager")
    spark.range(5).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get == {"n": 5}

    ratios = M.q_class_ratios(spark, sf_dir)
    real = sorted(r[0] for r in ratios.select("commodity_desc").distinct().collect())[0]
    mf = M.train_commodity_models(
        spark,
        sf_dir,
        commodities=[real],
        tune=True,
        model_type="lr",
        store_base=str(tmp_path / "tuned"),
    ).collect()
    assert len(mf) == 1 and mf[0]["stage"] == "Production", mf[0]["error"]
    assert mf[0]["n_trials"] >= 12


def test_random_search_maps_are_seeded_and_sized(spark):
    """The random sampler yields n_trials distinct seeded draws over
    the hyperopt-shaped ranges; same seed -> same maps."""
    from pyspark.ml.classification import GBTClassifier

    clf = GBTClassifier()
    a = M._search_maps(clf, "gbt", "random", 20, seed=7)
    b = M._search_maps(clf, "gbt", "random", 20, seed=7)
    assert len(a) == 20
    assert [sorted(m.values()) for m in a] == [sorted(m.values()) for m in b]
    for m in a:
        depth = m[clf.maxDepth]
        step = m[clf.stepSize]
        assert 2 <= depth <= 8 and 0.02 <= step <= 0.3


def test_tvs_parallelism_tracks_cluster(spark):
    """TVS parallelism derives from sc.defaultParallelism (capped by
    grid size), not a hardcoded constant."""
    est = M.make_pipeline(["f1"], tune=True, model_type="lr")
    expected = max(2, min(est.n_search_trials, spark.sparkContext.defaultParallelism))
    assert est.getParallelism() == expected


def test_calibrate_scores_monotone_and_closer_to_truth(spark):
    """Isotonic calibration: with purchase rate = score^2 the raw score
    over-states probability everywhere; the calibrated output must (1)
    be monotone in the raw score (ranking preserved), (2) stay in
    [0, 1], and (3) cut the Brier score vs the raw predictions."""
    rows = []
    for i in range(1, 21):  # scores 0.05 .. 1.0, 40 rows each
        s = i / 20.0
        n_pos = round(40 * s * s)
        rows += [(s, 1.0)] * n_pos + [(s, 0.0)] * (40 - n_pos)
    df = spark.createDataFrame(rows, "prediction double, purchased double")
    calibrated, model = M.calibrate_scores(df, df)
    got = (
        calibrated.groupBy("prediction")
        .agg(F.first("calibrated").alias("c"))
        .orderBy("prediction")
        .collect()
    )
    cs = [r["c"] for r in got]
    assert all(0.0 <= c <= 1.0 for c in cs)
    assert all(a <= b + 1e-9 for a, b in zip(cs, cs[1:]))  # monotone
    brier = calibrated.agg(
        F.avg((F.col("calibrated") - F.col("purchased")) ** 2).alias("cal"),
        F.avg((F.col("prediction") - F.col("purchased")) ** 2).alias("raw"),
    ).collect()[0]
    assert brier["cal"] < brier["raw"]


def test_basket_affinity_matches_mllib_fpgrowth(spark, sf_dir):
    """The exact size-1/size-2 itemset supports in q_basket_affinity
    must equal MLlib FPGrowth's freqItemsets at the same minSupport —
    pinning that the SQL-expressible computation and the distributed
    FP-tree scale path (the one to use for itemsets of size >= 3)
    agree, and that confidence/lift satisfy their definitional algebra."""
    from pyspark.ml.fpm import FPGrowth

    from propensity_spark.operators.extended import MIN_SUPPORT, q_basket_affinity
    from propensity_spark.operators.relational import brand_dim, silver_transactions

    out = q_basket_affinity(spark, sf_dir).collect()
    got_items = {r["item_a"]: r["support_cnt"] for r in out if r["section"] == "item"}
    got_pairs = {
        (r["item_a"], r["item_b"]): r["support_cnt"]
        for r in out
        if r["section"] == "pair"
    }

    bi = (
        silver_transactions(spark, sf_dir)
        .join(F.broadcast(brand_dim(spark, sf_dir)), "product_id")
        .select("basket_id", F.col("commodity_desc").alias("item"))
        .dropDuplicates(["basket_id", "item"])
    )
    baskets = bi.groupBy("basket_id").agg(F.collect_set("item").alias("items"))
    model = FPGrowth(
        itemsCol="items", minSupport=MIN_SUPPORT, minConfidence=0.0
    ).fit(baskets)
    fp = {
        tuple(sorted(r["items"])): r["freq"]
        for r in model.freqItemsets.collect()
        if len(r["items"]) <= 2
    }
    assert got_items == {k[0]: v for k, v in fp.items() if len(k) == 1}
    assert got_pairs == {k: v for k, v in fp.items() if len(k) == 2}
    assert got_pairs  # non-degenerate: pairs actually clear the floor

    # definitional algebra on a sample pair
    n_baskets = baskets.count()
    r = next(r for r in out if r["section"] == "pair")
    assert abs(r["confidence"] - r["support_cnt"] / got_items[r["item_a"]]) < 1e-5
    assert (
        abs(
            r["lift"]
            - r["support_cnt"] * n_baskets / (got_items[r["item_a"]] * got_items[r["item_b"]])
        )
        < 1e-4
    )


def test_basket_affinity_3_matches_mllib_fpgrowth(spark, sf_dir):
    """The HOF combination-explode triple supports in q_basket_affinity_3 must
    equal MLlib FPGrowth's size-3 freqItemsets at TRIPLE_MIN_SUPPORT —
    pinning that the pair-pruning semi-join is lossless (downward
    closure) against the FP-tree reference."""
    from pyspark.ml.fpm import FPGrowth

    from propensity_spark.operators.extended import (
        TRIPLE_MIN_SUPPORT,
        q_basket_affinity_3,
    )
    from propensity_spark.operators.relational import brand_dim, silver_transactions

    got = {
        (r["item_a"], r["item_b"], r["item_c"]): r["support_cnt"]
        for r in q_basket_affinity_3(spark, sf_dir).collect()
    }
    assert got  # non-vacuous at the fixture SF

    bi = (
        silver_transactions(spark, sf_dir)
        .join(F.broadcast(brand_dim(spark, sf_dir)), "product_id")
        .select("basket_id", F.col("commodity_desc").alias("item"))
        .dropDuplicates(["basket_id", "item"])
    )
    baskets = bi.groupBy("basket_id").agg(F.collect_set("item").alias("items"))
    model = FPGrowth(
        itemsCol="items", minSupport=TRIPLE_MIN_SUPPORT, minConfidence=0.0
    ).fit(baskets)
    fp = {
        tuple(sorted(r["items"])): r["freq"]
        for r in model.freqItemsets.collect()
        if len(r["items"]) == 3
    }
    assert got == fp


def test_quality_classifier_learns_planted_signal_on_fixture_docs(spark, sf_dir):
    """Separable signal planted in the REAL documents fixture: half the
    docs (by doc_id parity) get a marker token appended; the hashed-TF
    LogisticRegression must recover the split on held-out docs — the
    end-to-end evidence that the learned filter can pick up a
    document-level signal from fixture text, not just the synthetic
    two-sentence corpus."""
    from propensity_spark.io import load_table
    from propensity_spark.ml.quality import (
        evaluate_quality_classifier,
        train_quality_classifier,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" refmarker"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        ((F.col("doc_id") % 2) == 0).cast("double").alias("label"),
    )
    train = docs.where("doc_id % 5 != 0")
    test = docs.where("doc_id % 5 = 0")
    model = train_quality_classifier(train)
    metrics = evaluate_quality_classifier(model, test)
    assert metrics["auc"] > 0.95, metrics


def test_quality_filter_gate_matches_float_solve(spark, sf_dir):
    """The exact-integer Cramer decision in q_quality_filter agrees
    with an independent float least-squares solve (numpy lstsq) on the
    same features — the integer path is the same model, just computed
    without rounding hazards."""
    import numpy as np

    from propensity_spark.ml.quality import q_quality_filter

    rows = q_quality_filter(spark, sf_dir).collect()
    X = np.array([[1.0, r["n_words"], r["n_long_words"]] for r in rows])
    y = np.array([float(r["label"]) for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    scores = X @ beta
    for r, s in zip(rows, scores):
        # stay clear of the decision boundary: float and exact-integer
        # paths may disagree only within solver tolerance of 0.5
        if abs(s - 0.5) > 1e-6:
            assert r["quality_keep"] == int(s > 0.5), (r, s)
    kept = sum(r["quality_keep"] for r in rows)
    assert 0 < kept < len(rows)  # the filter actually filters


def test_quality_classifier_separates_reference_from_noise(spark):
    """fastText-style quality filter on a separable corpus: train on
    weak labels (reference vocab vs noise vocab), verify held-out
    perfection on unseen doc_ids and that score_quality's keep flag
    agrees with the probabilities."""
    from propensity_spark.ml.quality import (
        evaluate_quality_classifier,
        score_quality,
        train_quality_classifier,
    )

    ref = "the model trains on curated encyclopedic prose with citations"
    noise = "zxq wvu qqq click here buy now free prize winner jackpot"
    rows = [(i, ref, 1.0) for i in range(30)] + [
        (i + 100, noise, 0.0) for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label double")
    train = docs.where("doc_id % 5 != 0")
    test = docs.where("doc_id % 5 = 0")

    model = train_quality_classifier(train)
    metrics = evaluate_quality_classifier(model, test)
    assert metrics["auc"] == 1.0 and metrics["accuracy"] == 1.0, metrics

    scored = {r["doc_id"]: r for r in score_quality(model, test).collect()}
    for d, r in scored.items():
        expected = 1 if d < 100 else 0
        assert r["quality_keep"] == expected, (d, r["quality_prob"])
        assert 0.0 <= r["quality_prob"] <= 1.0


def test_quality_classifier_non_default_text_col(spark):
    """The text_col contract must hold end to end: a model trained on
    `body` evaluates and scores `body`, never a hardcoded `text` —
    here a decoy `text` column carries the OPPOSITE content, so any
    hardcoding flips every prediction and fails loudly."""
    from propensity_spark.ml.quality import (
        evaluate_quality_classifier,
        score_quality,
        train_quality_classifier,
    )

    ref = "the model trains on curated encyclopedic prose with citations"
    noise = "zxq wvu qqq click here buy now free prize winner jackpot"
    rows = [(i, noise, ref, 1.0) for i in range(30)] + [
        (i + 100, ref, noise, 0.0) for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, body string, label double"
    )
    train = docs.where("doc_id % 5 != 0")
    test = docs.where("doc_id % 5 = 0")

    model = train_quality_classifier(train, text_col="body")
    metrics = evaluate_quality_classifier(model, test, text_col="body")
    assert metrics["auc"] == 1.0 and metrics["accuracy"] == 1.0, metrics
    scored = {
        r["doc_id"]: r["quality_keep"]
        for r in score_quality(model, test, text_col="body").collect()
    }
    assert all(v == (1 if d < 100 else 0) for d, v in scored.items())


def test_tpe_proposals_adapt_toward_good_region():
    """Driver-side TPE arithmetic (no Spark): on a known quadratic
    loss over the lr space, adaptive proposals achieve lower mean loss
    than seeded random sampling at the same budget, stay in bounds,
    and the proposal stream is deterministic for a fixed seed."""
    import math
    import random

    from propensity_spark.ml.tuning_tpe import SPACES, propose

    dims = SPACES["lr"]

    def loss(p):
        # optimum at regParam=0.01 (log space), elasticNetParam=0.3
        return (math.log(p["regParam"]) - math.log(0.01)) ** 2 + 4 * (
            p["elasticNetParam"] - 0.3
        ) ** 2

    def run(seed):
        rng = random.Random(seed)
        history = [
            (p, loss(p))
            for p in ({d.name: d.sample(rng) for d in dims} for _ in range(10))
        ]
        proposals = []
        for _ in range(20):
            p = propose(history, dims, rng)
            history.append((p, loss(p)))
            proposals.append(p)
        return proposals

    proposals = run(7)
    again = run(7)
    assert proposals == again  # deterministic

    rng = random.Random(99)
    random_pts = [{d.name: d.sample(rng) for d in dims} for _ in range(20)]
    mean_tpe = sum(loss(p) for p in proposals) / len(proposals)
    mean_rand = sum(loss(p) for p in random_pts) / len(random_pts)
    assert mean_tpe < mean_rand  # adaptivity: concentrates near optimum
    for p in proposals:
        assert 1e-4 <= p["regParam"] <= 1.0
        assert 0.0 <= p["elasticNetParam"] <= 1.0


def test_tpe_search_end_to_end_deterministic(spark):
    """TPESearch over MLlib LR on a separable frame: runs the full
    budget, exposes TrainValidationSplit-shaped results, repeats
    bit-identically under the same seed, and the refit best model
    scores the training frame."""
    import random

    from propensity_spark.ml.training import make_pipeline

    rnd = random.Random(3)
    rows = []
    for _ in range(300):
        y = rnd.random() < 0.5
        x1 = (1.0 if y else -1.0) + rnd.gauss(0, 0.6)
        rows.append((float(y), x1, rnd.gauss(0, 1.0), 1.0))
    df = spark.createDataFrame(
        rows, "purchased double, f1 double, f2 double, class_weight double"
    )

    def run():
        est = make_pipeline(
            ["f1", "f2"], tune=True, model_type="lr", search="tpe", n_trials=6
        )
        assert est.n_search_trials == 6
        return est.fit(df)

    m1, m2 = run(), run()
    assert [p for p, _ in m1.trials] == [p for p, _ in m2.trials]
    assert len(m1.validationMetrics) == 6
    assert max(m1.validationMetrics) > 0.8  # separable -> good AUPR
    assert m1.bestModel.transform(df).count() == 300
    # the winner's params are one of the evaluated trials
    assert m1.bestParams in [p for p, _ in m1.trials]


def test_cross_validate_group_aware_deterministic_and_separable(spark):
    """cross_validate: (1) folds partition rows and are group-aware
    (all rows of one key share a fold — fold_expr checked directly);
    (2) two runs are bit-identical (hash folds, seeded fits); (3) on
    linearly separable data every fold scores near-perfect AUPR."""
    import random

    rng = random.Random(7)
    rows = []
    for key in range(120):
        label = key % 2
        for _ in range(3):  # 3 correlated rows per household
            x = (2.0 if label else -2.0) + rng.gauss(0, 0.3)
            rows.append((key, float(x), rng.gauss(0, 1.0), label))
    df = spark.createDataFrame(
        rows, "household_key bigint, f1 double, f2 double, purchased int"
    )

    # group-awareness of the fold assignment itself
    withf = df.withColumn("fold", M.fold_expr("household_key", 4))
    assert (
        withf.select("household_key", "fold").distinct().count()
        == withf.select("household_key").distinct().count()
    )

    cv1 = M.cross_validate(df, ["f1", "f2"], k=4, model_type="lr").collect()
    cv2 = M.cross_validate(df, ["f1", "f2"], k=4, model_type="lr").collect()
    assert [tuple(r) for r in cv1] == [tuple(r) for r in cv2]
    assert len(cv1) == 4
    assert sum(r["n_test"] for r in cv1) == df.count()
    for r in cv1:
        assert r["n_train"] + r["n_test"] == df.count()
        assert r["aupr"] > 0.95, r
        assert r["balanced_accuracy"] > 0.9, r

    with pytest.raises(ValueError, match="k must be"):
        M.cross_validate(df, ["f1"], k=1)


def test_decile_lift_perfect_ranker(spark):
    """decile_lift on a perfectly ranked population: 100 positives in
    1000 rows, all scored at the top -> decile 1 has response rate 1.0
    and lift 10, cumulative gain hits 1.0 at decile 1 and stays there;
    a uniform scorer's lift is ~1 in every decile."""
    rows = [(i, 1.0 - i / 1000.0, 1 if i < 100 else 0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id int, prediction double, purchased int")
    out = {r["decile"]: r for r in M.decile_lift(df).collect()}
    assert len(out) == 10
    assert all(r["n"] == 100 for r in out.values())
    assert out[1]["positives"] == 100 and abs(out[1]["lift"] - 10.0) < 1e-3
    assert abs(out[1]["cum_gain"] - 1.0) < 1e-6
    assert out[2]["positives"] == 0 and abs(out[10]["cum_gain"] - 1.0) < 1e-6

    # uniform scorer: same score everywhere, deterministic tie-break by id
    flat = spark.createDataFrame(
        [(i, 0.5, 1 if i % 10 == 0 else 0) for i in range(1000)],
        "id int, prediction double, purchased int",
    )
    fout = M.decile_lift(flat).collect()
    assert sum(r["positives"] for r in fout) == 100
    for r in fout:
        assert abs(r["lift"] - 1.0) < 0.35  # ~1 with id-order binning


def test_reliability_table_calibrated_vs_miscalibrated(spark):
    """reliability_table: a perfectly calibrated scorer (observed rate
    == predicted in every bin) has ~zero gap and ECE; an overconfident
    scorer shows the systematic negative gap; bin edges are value
    bins (score 1.0 folds into the last bin)."""
    import random

    rng = random.Random(11)
    cal = [(p, 1 if rng.random() < p else 0)
           for p in [i / 1000 for i in range(1000)]]
    df = spark.createDataFrame(cal, "prediction double, purchased int")
    out = M.reliability_table(df).collect()
    assert len(out) == 10
    assert sum(r["n"] for r in out) == 1000
    ece = sum(r["ece"] for r in out)
    assert ece < 0.08, ece  # statistically near-calibrated
    for r in out:
        assert abs(r["gap"]) < 0.2

    # overconfident: predicts 0.9 but true rate is 0.5
    over = spark.createDataFrame(
        [(0.9, 1 if i % 2 == 0 else 0) for i in range(400)],
        "prediction double, purchased int",
    )
    o = M.reliability_table(over).collect()
    assert len(o) == 1 and o[0]["bin"] == 9
    assert abs(o[0]["gap"] + 0.4) < 1e-3  # 0.5 observed - 0.9 predicted
    assert abs(o[0]["ece"] - 0.4) < 1e-3

    # score exactly 1.0 folds into bin 9, not a phantom bin 10
    edge = M.reliability_table(
        spark.createDataFrame([(1.0, 1)], "prediction double, purchased int")
    ).collect()
    assert edge[0]["bin"] == 9


def test_train_commodity_models_empty_commodities(spark, sf_dir, tmp_path):
    """r07 review: an empty commodity list returns an empty manifest
    with the stable schema instead of ZeroDivisionError in the
    partition sizing — one bad day must not kill the weekly job."""
    manifest = M.train_commodity_models(
        spark, sf_dir, commodities=[], store_base=str(tmp_path / "store")
    )
    assert manifest.count() == 0
    assert manifest.columns == [
        "commodity_desc", "commodity_clean", "model_path",
        "metric_aupr", "stage", "n_trials", "error",
    ]


def test_train_commodity_models_eval_tables(spark, sf_dir, tmp_path):
    """eval_tables=True writes lift + reliability parquet next to each
    shipped model; the tables are well-formed (bins partition the test
    rows; cum_gain ends at 1.0 when positives exist)."""
    manifest = M.train_commodity_models(
        spark,
        sf_dir,
        commodities=1,
        store_base=str(tmp_path / "store"),
        model_type="lr",
        eval_tables=True,
    )
    row = manifest.collect()[0]
    assert row["stage"] == "Production", row
    lift = spark.read.parquet(row["model_path"] + "__eval/lift").collect()
    rel = spark.read.parquet(row["model_path"] + "__eval/reliability").collect()
    assert 1 <= len(lift) <= 10 and 1 <= len(rel) <= 10
    total_pos = sum(r["positives"] for r in lift)
    if total_pos:
        assert abs(max(r["cum_gain"] for r in lift) - 1.0) < 1e-6
    assert sum(r["n"] for r in lift) == sum(r["n"] for r in rel)


def test_concurrent_training_matches_sequential(spark, sf_dir, tmp_path, monkeypatch):
    """r09 guide-§2.6 overlap: per-commodity fits run 2-3 jobs in flight
    when the session has the headroom. Concurrency must not change the
    models — fits are per-commodity independent and seeded — so the
    manifest (order, stages, AUPR values) from a forced-concurrent run
    is identical to the forced-sequential run on the same commodities,
    with one training set built once and reused (materialize=False on
    the second run reads the first run's store)."""
    store = str(tmp_path / "store")
    monkeypatch.setenv("SPARK_GRAFT_TRAIN_JOBS", "1")
    seq = M.train_commodity_models(
        spark, sf_dir, commodities=2, store_base=store, model_type="lr"
    ).collect()
    monkeypatch.setenv("SPARK_GRAFT_TRAIN_JOBS", "2")
    conc = M.train_commodity_models(
        spark, sf_dir, commodities=2, store_base=store,
        materialize_features=False, model_type="lr",
    ).collect()
    assert [r["commodity_desc"] for r in seq] == sorted(
        r["commodity_desc"] for r in seq
    )
    assert len(seq) == len(conc) == 2
    for a, b in zip(seq, conc):
        assert a["commodity_desc"] == b["commodity_desc"]
        assert a["stage"] == b["stage"] == "Production"
        assert a["metric_aupr"] == pytest.approx(b["metric_aupr"], abs=0.0)

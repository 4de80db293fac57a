"""Adaptive hyperparameter search: Tree-structured Parzen Estimator
(Bergstra, Bardenet, Bengio & Kégl, "Algorithms for Hyper-Parameter
Optimization", NeurIPS 2011) — the published algorithm behind
hyperopt's `tpe.suggest`, which is what the reference tunes with
(04b_Task__Model_Training.py:383-395, `fmin(..., algo=tpe.suggest)`).
The seeded random search (ml/training._search_maps) already matches
hyperopt's trial BREADTH; this module adds its ADAPTIVITY: after a
random warm-up, each proposal is drawn where previously-good trials
concentrate, so equal budgets land more trials near the optimum.

Spark-first shape: TPE itself is driver-side arithmetic over the
(tiny) trial history — a few dozen floats; every actual model fit and
validation evaluation is a fully distributed MLlib job, exactly like
hyperopt-with-SparkTrials on the reference platform. Nothing here
touches executors except through `Pipeline.fit` / evaluator jobs.

Determinism: proposals come from a seeded `random.Random`; MLlib fits
are seeded; the train/validation split is a seeded `randomSplit`. Two
runs with the same seed produce identical trial sequences (pinned by
pytest), so tuned models stay reproducible — the same property the
seeded random-search path guarantees.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass


@dataclass(frozen=True)
class Dim:
    """One search dimension. kind: 'uniform' | 'log' | 'int'.
    lo/hi are inclusive natural-scale bounds ('log' dims must be
    positive)."""

    name: str
    kind: str
    lo: float
    hi: float

    def warp(self, v: float) -> float:
        return math.log(v) if self.kind == "log" else float(v)

    def unwarp(self, w: float) -> float:
        v = math.exp(w) if self.kind == "log" else w
        v = min(max(v, self.lo), self.hi)
        return float(round(v)) if self.kind == "int" else float(v)

    @property
    def wlo(self) -> float:
        return self.warp(self.lo)

    @property
    def whi(self) -> float:
        return self.warp(self.hi)

    def sample(self, rng: random.Random) -> float:
        return self.unwarp(rng.uniform(self.wlo, self.whi))


# The same ranges the seeded random search draws from
# (ml/training._search_maps), so random vs tpe is a fair
# same-space comparison.
SPACES: dict[str, list[Dim]] = {
    "gbt": [
        Dim("maxDepth", "int", 2, 8),
        Dim("stepSize", "log", 0.02, 0.3),
        Dim("subsamplingRate", "uniform", 0.5, 1.0),
    ],
    "lr": [
        Dim("regParam", "log", 1e-4, 1.0),
        Dim("elasticNetParam", "uniform", 0.0, 1.0),
    ],
}

N_CANDIDATES = 24  # EI candidates scored per proposal (hyperopt: 24)
GAMMA = 0.25  # top fraction of trials modelled as "good"


def _bandwidth(points: list[float], dim: Dim) -> float:
    """Silverman-style KDE bandwidth in warped space, floored at 5% of
    the dimension's warped range so a cluster of identical points
    still explores (hyperopt floors bandwidths the same way)."""
    span = dim.whi - dim.wlo
    floor = 0.05 * span if span > 0 else 1e-3
    n = len(points)
    if n < 2:
        return max(floor, 0.5 * span)
    mean = sum(points) / n
    var = sum((p - mean) ** 2 for p in points) / (n - 1)
    return max(floor, 1.06 * math.sqrt(var) * n ** (-0.2))


def _log_density(x: float, points: list[float], bw: float, dim: Dim) -> float:
    """log of a Gaussian-mixture KDE over `points`; empty mixtures fall
    back to the uniform density on the warped range."""
    span = max(dim.whi - dim.wlo, 1e-12)
    if not points:
        return -math.log(span)
    inv = 1.0 / (bw * math.sqrt(2.0 * math.pi))
    s = sum(inv * math.exp(-0.5 * ((x - p) / bw) ** 2) for p in points)
    return math.log(max(s / len(points), 1e-300))


def propose(
    observed: list[tuple[dict[str, float], float]],
    dims: list[Dim],
    rng: random.Random,
    n_candidates: int = N_CANDIDATES,
    gamma: float = GAMMA,
) -> dict[str, float]:
    """One TPE proposal from the trial history `[(params, loss)]`
    (loss = lower-is-better; pass -metric for maximization). Trials
    split into good/bad at the `gamma` quantile; candidates are drawn
    from the good-trial KDE per dimension and the one maximizing
    Σ log l(x) − log g(x) (the TPE expected-improvement surrogate,
    factorized across dimensions) wins."""
    n_good = max(1, math.ceil(gamma * len(observed)))
    ranked = sorted(observed, key=lambda t: t[1])
    good = [[d.warp(t[0][d.name]) for d in dims] for t in ranked[:n_good]]
    bad = [[d.warp(t[0][d.name]) for d in dims] for t in ranked[n_good:]]
    bw_good = [_bandwidth([g[j] for g in good], d) for j, d in enumerate(dims)]
    bw_bad = [_bandwidth([b[j] for b in bad], d) for j, d in enumerate(dims)]
    best, best_score = None, -math.inf
    for _ in range(n_candidates):
        cand_w = []
        for j, d in enumerate(dims):
            mu = good[rng.randrange(len(good))][j]
            w = min(max(rng.gauss(mu, bw_good[j]), d.wlo), d.whi)
            cand_w.append(w)
        score = sum(
            _log_density(cand_w[j], [g[j] for g in good], bw_good[j], d)
            - _log_density(cand_w[j], [b[j] for b in bad], bw_bad[j], d)
            for j, d in enumerate(dims)
        )
        if score > best_score:
            best, best_score = cand_w, score
    return {d.name: d.unwarp(best[j]) for j, d in enumerate(dims)}


class TPESearchModel:
    """Result of TPESearch.fit — duck-typed to the slice of the
    TrainValidationSplitModel surface train_commodity_models reads."""

    def __init__(self, best_model, best_params, trials):
        self.bestModel = best_model
        self.bestParams = best_params
        # (params, validation AUPR) per trial, in proposal order
        self.trials = trials
        self.validationMetrics = [m for _, m in trials]


class TPESearch:
    """Sequential-adaptive tuner with the estimator surface
    make_pipeline's callers expect (`fit`, `n_search_trials`).

    fit(dataset): seeded 70/30 split, `n_startup` random warm-up
    trials, then TPE proposals; every trial is one distributed
    Pipeline fit + one distributed AUPR evaluation on the held-out
    30%. The winner is refit on the FULL dataset (same final-refit
    contract as TrainValidationSplit)."""

    def __init__(
        self,
        assembler,
        clf,
        model_type: str,
        n_trials: int,
        seed: int,
        n_startup: int | None = None,
        make_estimator=None,
    ):
        self.assembler = assembler
        self.clf = clf
        self.dims = SPACES[model_type]
        self.n_trials = n_trials
        self.n_search_trials = n_trials
        self.seed = seed
        self.n_startup = n_startup or max(5, n_trials // 5)
        self._make_estimator = make_estimator

    def _param_map(self, params: dict[str, float]) -> dict:
        out = {}
        for d in self.dims:
            v = params[d.name]
            out[getattr(self.clf, d.name)] = int(v) if d.kind == "int" else v
        return out

    def _estimator(self):
        if self._make_estimator is not None:
            return self._make_estimator()
        from propensity_spark.ml.training import SessionSafePipeline

        return SessionSafePipeline(stages=[self.assembler, self.clf])

    def fit(self, dataset) -> TPESearchModel:
        from pyspark.ml.evaluation import BinaryClassificationEvaluator

        rng = random.Random(self.seed)
        train, val = dataset.randomSplit([0.7, 0.3], seed=self.seed)
        evaluator = BinaryClassificationEvaluator(
            labelCol="purchased", metricName="areaUnderPR"
        )
        history: list[tuple[dict[str, float], float]] = []  # loss = -aupr
        trials: list[tuple[dict[str, float], float]] = []
        for i in range(self.n_trials):
            if i < self.n_startup:
                params = {d.name: d.sample(rng) for d in self.dims}
            else:
                params = propose(history, self.dims, rng)
            model = self._estimator().fit(train, params=self._param_map(params))
            aupr = float(evaluator.evaluate(model.transform(val)))
            history.append((params, -aupr))
            trials.append((params, aupr))
        best_params = min(history, key=lambda t: t[1])[0]
        best_model = self._estimator().fit(
            dataset, params=self._param_map(best_params)
        )
        return TPESearchModel(best_model, best_params, trials)

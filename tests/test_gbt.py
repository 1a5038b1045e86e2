"""Numpy GBT classifier unit tests (the T5 model-zoo analog)."""

import numpy as np
import pytest

from pubmed_and_method_ray.functions.gbt import GBTClassifier
from pubmed_and_method_ray.functions.metrics import calc_metrics, cluster_pairwise_metrics


def _toy(n=400, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 4))
    y = ((X[:, 0] + 0.5 * X[:, 1] - X[:, 2] * X[:, 3]) > 0).astype(np.float64)
    return X, y


class TestGBT:
    def test_separates_toy_data(self):
        X, y = _toy()
        m = GBTClassifier(n_estimators=100, max_depth=3).fit(X, y)
        acc = ((m.predict_proba(X) > 0.5) == y).mean()
        assert acc >= 0.99

    def test_deterministic(self):
        X, y = _toy()
        p1 = GBTClassifier(n_estimators=10).fit(X, y).predict_proba(X)
        p2 = GBTClassifier(n_estimators=10).fit(X, y).predict_proba(X)
        assert np.array_equal(p1, p2)

    def test_json_roundtrip(self):
        X, y = _toy(100)
        m = GBTClassifier(n_estimators=8).fit(X, y)
        m2 = GBTClassifier.from_json(m.to_json())
        assert np.allclose(m.predict_proba(X), m2.predict_proba(X))

    def test_constant_labels(self):
        X, _ = _toy(50)
        m = GBTClassifier(n_estimators=3).fit(X, np.ones(50))
        assert (m.predict_proba(X) > 0.5).all()


class TestMetrics:
    def test_perfect(self):
        m = calc_metrics([0, 1, 1, 0], [0.1, 0.9, 0.8, 0.2])
        assert m["f1"] == 1.0 and m["acc"] == 1.0

    def test_known_confusion(self):
        # tp=1 fp=1 fn=1 tn=1 -> p=r=f1=0.5
        m = calc_metrics([1, 0, 1, 0], [0.9, 0.9, 0.1, 0.1])
        assert m["p"] == 0.5 and m["r"] == 0.5 and m["f1"] == 0.5
        assert m["acc"] == 0.5 and m["micro_f1"] == 0.5

    def test_cluster_pairwise(self):
        clusters = {"a": "c1", "b": "c1", "c": "c2"}
        gold = [("a", "b", 1), ("a", "c", 0), ("b", "c", 0)]
        m = cluster_pairwise_metrics(gold, clusters)
        assert m["f1"] == 1.0

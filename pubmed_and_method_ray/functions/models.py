"""Model zoo — the reference dispatches over 9 sklearn/xgboost models
behind one switch (/root/reference/src/model/classification.py:18-128,
enum at src/model/available_model.py:4-24). No sklearn in this sandbox,
so the zoo is numpy-native: the GBT (functions/gbt.py), an L2 logistic
regression, and a decision-stump committee. One registry + one
``use_classifier``-shaped entry point; every model exposes
``fit(X, y)`` / ``predict_proba(X)`` and is deterministic.
"""

from __future__ import annotations

import numpy as np

from .gbt import GBTClassifier


class LogisticRegressionGD:
    """L2-regularized logistic regression via full-batch gradient descent
    (deterministic: fixed iterations, no RNG)."""

    def __init__(self, lr: float = 0.5, n_iter: int = 300, l2: float = 1e-3):
        self.lr = lr
        self.n_iter = n_iter
        self.l2 = l2
        self.w = None
        self.b = 0.0
        self.mean_ = None
        self.scale_ = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticRegressionGD":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.mean_ = X.mean(axis=0)
        scale = X.std(axis=0)
        scale[scale == 0] = 1.0
        self.scale_ = scale
        Z = (X - self.mean_) / self.scale_
        n, d = Z.shape
        self.w = np.zeros(d)
        self.b = 0.0
        for _ in range(self.n_iter):
            p = 1.0 / (1.0 + np.exp(-(Z @ self.w + self.b)))
            g = Z.T @ (p - y) / n + self.l2 * self.w
            gb = float((p - y).mean())
            self.w -= self.lr * g
            self.b -= self.lr * gb
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Z = (np.asarray(X, dtype=np.float64) - self.mean_) / self.scale_
        return 1.0 / (1.0 + np.exp(-(Z @ self.w + self.b)))


class StumpCommittee:
    """A committee of one depth-1 decision stump per feature, vote-averaged
    by training accuracy — a transparent weak baseline (the reference's
    simpler zoo members' role)."""

    def __init__(self, n_thresholds: int = 64):
        self.n_thresholds = n_thresholds
        self.stumps: list[tuple[int, float, int]] = []  # (feature, thr, polarity)
        self.weights: list[float] = []

    def fit(self, X: np.ndarray, y: np.ndarray) -> "StumpCommittee":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        self.stumps, self.weights = [], []
        for f in range(X.shape[1]):
            col = X[:, f]
            cand = np.unique(
                np.quantile(col, np.linspace(0, 1, self.n_thresholds + 2)[1:-1])
            )
            best_acc, best = 0.0, None
            for thr in cand:
                for pol in (1, -1):
                    pred = ((col > thr) if pol == 1 else (col <= thr)).astype(np.int64)
                    acc = float((pred == y).mean())
                    if acc > best_acc:
                        best_acc, best = acc, (f, float(thr), pol)
            if best is not None and best_acc > 0.5:
                self.stumps.append(best)
                self.weights.append(best_acc)
        if not self.stumps:  # degenerate: constant majority vote
            maj = int(round(float(y.mean())))
            self.stumps = [(-1, 0.0, maj)]
            self.weights = [1.0]
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        votes = np.zeros(len(X))
        total = sum(self.weights)
        for (f, thr, pol), w in zip(self.stumps, self.weights):
            if f < 0:
                votes += w * pol
                continue
            pred = (X[:, f] > thr) if pol == 1 else (X[:, f] <= thr)
            votes += w * pred
        return votes / total


MODEL_REGISTRY = {
    "gbt": lambda: GBTClassifier(n_estimators=60, learning_rate=0.2, max_depth=3),
    "logreg": lambda: LogisticRegressionGD(),
    "stumps": lambda: StumpCommittee(),
}


def available_models() -> list[str]:
    """Active model list — the ModelName.available_modes() analog
    (src/model/available_model.py:15-18)."""
    return sorted(MODEL_REGISTRY)


def use_classifier(name: str, X: np.ndarray, y: np.ndarray, X_test: np.ndarray):
    """Fit + predict in one dispatch — the use_classifier switch analog
    (src/model/classification.py:18-40). Returns (model, probabilities)."""
    try:
        model = MODEL_REGISTRY[name]()
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {available_models()}"
        ) from None
    model.fit(X, y)
    return model, model.predict_proba(X_test)

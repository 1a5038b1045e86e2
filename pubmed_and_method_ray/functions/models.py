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


class DecisionTreeC45:
    """C4.5-style decision tree: continuous-threshold splits chosen by
    GAIN RATIO (information gain / split info — Quinlan 1993), the
    from-scratch analog of the reference's custom C4.5
    (/root/reference/src/model/c45.py:10-84). Deterministic (threshold
    candidates from quantiles, ties broken by feature index); leaves
    hold class probabilities."""

    def __init__(self, max_depth: int = 8, min_samples: int = 4,
                 n_thresholds: int = 32, feature_idx: np.ndarray | None = None):
        self.max_depth = max_depth
        self.min_samples = min_samples
        self.n_thresholds = n_thresholds
        self.feature_idx = feature_idx  # optional feature subset (for RF)
        self.tree_: dict | None = None

    @staticmethod
    def _entropy(y: np.ndarray) -> float:
        if len(y) == 0:
            return 0.0
        p = y.mean()
        out = 0.0
        for q in (p, 1.0 - p):
            if q > 0:
                out -= q * np.log2(q)
        return out

    def _best_split(self, X: np.ndarray, y: np.ndarray):
        n = len(y)
        parent = self._entropy(y)
        best = None  # (gain_ratio, feature, thr)
        feats = (
            self.feature_idx
            if self.feature_idx is not None
            else np.arange(X.shape[1])
        )
        for f in feats:
            col = X[:, f]
            cand = np.unique(
                np.quantile(col, np.linspace(0, 1, self.n_thresholds + 2)[1:-1])
            )
            for thr in cand:
                left = col <= thr
                nl = int(left.sum())
                if nl == 0 or nl == n:
                    continue
                nr = n - nl
                gain = parent - (
                    nl / n * self._entropy(y[left])
                    + nr / n * self._entropy(y[~left])
                )
                split_info = -(
                    nl / n * np.log2(nl / n) + nr / n * np.log2(nr / n)
                )
                ratio = gain / split_info if split_info > 0 else 0.0
                if best is None or ratio > best[0] + 1e-12:
                    best = (ratio, int(f), float(thr))
        return best

    def _build(self, X: np.ndarray, y: np.ndarray, depth: int) -> dict:
        if (
            depth >= self.max_depth
            or len(y) < self.min_samples
            or y.min() == y.max()
        ):
            return {"leaf": float(y.mean()) if len(y) else 0.5}
        best = self._best_split(X, y)
        if best is None or best[0] <= 0.0:
            return {"leaf": float(y.mean())}
        _, f, thr = best
        left = X[:, f] <= thr
        return {
            "f": f,
            "thr": thr,
            "l": self._build(X[left], y[left], depth + 1),
            "r": self._build(X[~left], y[~left], depth + 1),
        }

    def fit(self, X: np.ndarray, y: np.ndarray) -> "DecisionTreeC45":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.tree_ = self._build(X, y, 0)
        return self

    def _predict_one(self, node: dict, x: np.ndarray) -> float:
        while "leaf" not in node:
            node = node["l"] if x[node["f"]] <= node["thr"] else node["r"]
        return node["leaf"]

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return np.array([self._predict_one(self.tree_, x) for x in X])


class RandomForest:
    """Bagged C4.5-style trees with per-tree feature subsampling —
    from-scratch analog of the reference's RF (its best model,
    src/comparison/result.txt:31-34). Deterministic: seeded bootstrap
    and feature draws."""

    def __init__(self, n_trees: int = 20, max_depth: int = 8, seed: int = 13):
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.seed = seed
        self.trees: list[DecisionTreeC45] = []

    def fit(self, X: np.ndarray, y: np.ndarray) -> "RandomForest":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n, d = X.shape
        k = max(1, int(np.sqrt(d)))
        rng = np.random.default_rng(self.seed)
        self.trees = []
        for _ in range(self.n_trees):
            rows = rng.integers(0, n, size=n)
            feats = rng.choice(d, size=k, replace=False)
            t = DecisionTreeC45(
                max_depth=self.max_depth, feature_idx=np.sort(feats)
            )
            t.fit(X[rows], y[rows])
            self.trees.append(t)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return np.mean([t.predict_proba(X) for t in self.trees], axis=0)


class GaussianNB:
    """Gaussian naive Bayes (per-class feature means/variances) — the
    reference zoo's NB member, numpy-native and deterministic."""

    def __init__(self, var_smoothing: float = 1e-9):
        self.var_smoothing = var_smoothing

    def fit(self, X: np.ndarray, y: np.ndarray) -> "GaussianNB":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        eps = self.var_smoothing * float(X.var(axis=0).max() or 1.0)
        self.stats_ = {}
        for c in (0, 1):
            Z = X[y == c]
            if len(Z) == 0:
                Z = X
            self.stats_[c] = (
                np.log(max(float((y == c).mean()), 1e-12)),
                Z.mean(axis=0),
                Z.var(axis=0) + eps,
            )
        return self

    def _joint(self, X: np.ndarray, c: int) -> np.ndarray:
        prior, mu, var = self.stats_[c]
        return prior + (
            -0.5 * (np.log(2.0 * np.pi * var) + (X - mu) ** 2 / var)
        ).sum(axis=1)

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        l0, l1 = self._joint(X, 0), self._joint(X, 1)
        m = np.maximum(l0, l1)
        e0, e1 = np.exp(l0 - m), np.exp(l1 - m)
        return e1 / (e0 + e1)


class KNNClassifier:
    """k-nearest-neighbours on z-scored features (brute-force, exact) —
    the reference zoo's KNN member; vote share as probability."""

    def __init__(self, k: int = 7):
        self.k = k

    def fit(self, X: np.ndarray, y: np.ndarray) -> "KNNClassifier":
        X = np.asarray(X, dtype=np.float64)
        self.mean_ = X.mean(axis=0)
        scale = X.std(axis=0)
        scale[scale == 0] = 1.0
        self.scale_ = scale
        self.Z_ = (X - self.mean_) / self.scale_
        self.y_ = np.asarray(y, dtype=np.float64)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Z = (np.asarray(X, dtype=np.float64) - self.mean_) / self.scale_
        out = np.empty(len(Z))
        k = min(self.k, len(self.y_))
        for i in range(0, len(Z), 1024):  # chunked distance matrix
            d = ((Z[i : i + 1024, None, :] - self.Z_[None, :, :]) ** 2).sum(-1)
            nn = np.argpartition(d, k - 1, axis=1)[:, :k]
            out[i : i + 1024] = self.y_[nn].mean(axis=1)
        return out


class LinearSVM:
    """Linear SVM via deterministic Pegasos (SGD on the L2-regularized
    hinge loss, Shalev-Shwartz et al. 2007) — the from-scratch analog of
    the reference's SVC dispatch (src/model/classification.py:78-83).
    Probabilities come from a Platt-style sigmoid fit on the training
    margins (two-parameter logistic, full-batch GD, fixed iterations) so
    ``predict_proba`` composes with the zoo's >0.5 decision rule."""

    def __init__(self, lam: float = 1e-3, n_epochs: int = 40, seed: int = 13):
        self.lam = lam
        self.n_epochs = n_epochs
        self.seed = seed
        self.w = None
        self.b = 0.0
        self.mean_ = None
        self.scale_ = None
        self._platt = (1.0, 0.0)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LinearSVM":
        X = np.asarray(X, dtype=np.float64)
        yy = np.where(np.asarray(y, dtype=np.float64) > 0.5, 1.0, -1.0)
        self.mean_ = X.mean(axis=0)
        scale = X.std(axis=0)
        scale[scale == 0] = 1.0
        self.scale_ = scale
        Z = (X - self.mean_) / self.scale_
        n, d = Z.shape
        rng = np.random.default_rng(self.seed)
        w = np.zeros(d)
        b = 0.0
        t = 0
        for _ in range(self.n_epochs):
            for i in rng.permutation(n):
                t += 1
                eta = 1.0 / (self.lam * t)
                m = yy[i] * (Z[i] @ w + b)
                w *= 1.0 - eta * self.lam
                if m < 1.0:
                    w += eta * yy[i] * Z[i]
                    b += eta * yy[i] * 0.1
        self.w, self.b = w, b
        # Platt scaling on training margins
        margins = Z @ w + b
        y01 = (yy > 0).astype(np.float64)
        a, c = 1.0, 0.0
        for _ in range(200):
            p = 1.0 / (1.0 + np.exp(-(a * margins + c)))
            ga = float(((p - y01) * margins).mean())
            gc = float((p - y01).mean())
            a -= 0.5 * ga
            c -= 0.5 * gc
        self._platt = (a, c)
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Z = (np.asarray(X, dtype=np.float64) - self.mean_) / self.scale_
        a, c = self._platt
        return 1.0 / (1.0 + np.exp(-(a * (Z @ self.w + self.b) + c)))


class MLPClassifier:
    """One-hidden-layer MLP (tanh, sigmoid output) trained by full-batch
    backprop with a fixed seed — the from-scratch analog of the
    reference's MLP dispatch (src/model/classification.py:96-104).
    Full-batch + fixed init keeps it bit-deterministic across runs."""

    def __init__(
        self,
        hidden: int = 16,
        lr: float = 0.5,
        n_iter: int = 400,
        l2: float = 1e-4,
        seed: int = 29,
    ):
        self.hidden = hidden
        self.lr = lr
        self.n_iter = n_iter
        self.l2 = l2
        self.seed = seed
        self.mean_ = None
        self.scale_ = None

    def fit(self, X: np.ndarray, y: np.ndarray) -> "MLPClassifier":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self.mean_ = X.mean(axis=0)
        scale = X.std(axis=0)
        scale[scale == 0] = 1.0
        self.scale_ = scale
        Z = (X - self.mean_) / self.scale_
        n, d = Z.shape
        rng = np.random.default_rng(self.seed)
        h = self.hidden
        W1 = rng.normal(scale=1.0 / np.sqrt(d), size=(d, h))
        b1 = np.zeros(h)
        W2 = rng.normal(scale=1.0 / np.sqrt(h), size=h)
        b2 = 0.0
        for _ in range(self.n_iter):
            A = np.tanh(Z @ W1 + b1)
            p = 1.0 / (1.0 + np.exp(-(A @ W2 + b2)))
            dz2 = (p - y) / n
            gW2 = A.T @ dz2 + self.l2 * W2
            gb2 = float(dz2.sum())
            dA = np.outer(dz2, W2) * (1.0 - A * A)
            gW1 = Z.T @ dA + self.l2 * W1
            gb1 = dA.sum(axis=0)
            W2 -= self.lr * gW2
            b2 -= self.lr * gb2
            W1 -= self.lr * gW1
            b1 -= self.lr * gb1
        self.W1, self.b1, self.W2, self.b2 = W1, b1, W2, b2
        return self

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        Z = (np.asarray(X, dtype=np.float64) - self.mean_) / self.scale_
        A = np.tanh(Z @ self.W1 + self.b1)
        return 1.0 / (1.0 + np.exp(-(A @ self.W2 + self.b2)))


MODEL_REGISTRY = {
    "gbt": lambda: GBTClassifier(n_estimators=60, learning_rate=0.2, max_depth=3),
    "logreg": lambda: LogisticRegressionGD(),
    "stumps": lambda: StumpCommittee(),
    "c45": lambda: DecisionTreeC45(),
    "rf": lambda: RandomForest(),
    "nb": lambda: GaussianNB(),
    "knn": lambda: KNNClassifier(),
    "svm": lambda: LinearSVM(),
    "mlp": lambda: MLPClassifier(),
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

"""Minimal numpy gradient-boosted trees (binary logistic).

The reference dispatches to 9 sklearn/xgboost models
(/root/reference/src/model/classification.py:18-128); this sandbox has no
sklearn/xgboost, so the "pretrained gradient-boosted pairwise classifier"
(BASELINE.json north_star) is a from-scratch histogram GBT on public
algorithm definitions (Friedman 2001; XGBoost-style second-order gain).
Training is driver-side on the small labeled set (SURVEY.md §2.3 T5);
prediction is fully vectorized for the scorer actor pool.

Determinism: no RNG anywhere — greedy exact splits over quantile bins.
"""

from __future__ import annotations

import json

import numpy as np


class _Node:
    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self, value=0.0, feature=-1, threshold=0.0, left=-1, right=-1):
        self.feature = feature
        self.threshold = threshold
        self.left = left
        self.right = right
        self.value = value


class GBTClassifier:
    """Binary logistic gradient boosting with depth-limited regression trees."""

    def __init__(
        self,
        n_estimators: int = 60,
        learning_rate: float = 0.2,
        max_depth: int = 3,
        min_child_weight: float = 1.0,
        reg_lambda: float = 1.0,
        n_bins: int = 64,
    ):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.min_child_weight = min_child_weight
        self.reg_lambda = reg_lambda
        self.n_bins = n_bins
        self.base_score = 0.0
        # trees serialized as flat arrays: feature, threshold, left, right, value
        self.trees: list[dict[str, np.ndarray]] = []
        # total split gain per feature (xgboost-style 'gain' importance,
        # the feature_importances_ the reference prints from its models at
        # src/model/classification.py:33-39)
        self.feature_importances_: np.ndarray | None = None

    # -- training ---------------------------------------------------------
    def fit(self, X: np.ndarray, y: np.ndarray) -> "GBTClassifier":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        pos = y.mean()
        pos = min(max(pos, 1e-6), 1 - 1e-6)
        self.base_score = float(np.log(pos / (1 - pos)))
        pred = np.full(len(y), self.base_score)
        self.trees = []
        self.feature_importances_ = np.zeros(X.shape[1])
        for _ in range(self.n_estimators):
            p = 1.0 / (1.0 + np.exp(-pred))
            grad = p - y
            hess = p * (1.0 - p)
            nodes = self._build_tree(X, grad, hess)
            self.trees.append(nodes)
            pred += self.learning_rate * self._predict_tree(nodes, X)
        return self

    def _build_tree(self, X, grad, hess):
        feats, thrs, lefts, rights, values = [], [], [], [], []

        def leaf_value(g, h):
            return -g.sum() / (h.sum() + self.reg_lambda)

        def build(idx, depth):
            node_id = len(feats)
            feats.append(-1)
            thrs.append(0.0)
            lefts.append(-1)
            rights.append(-1)
            values.append(leaf_value(grad[idx], hess[idx]))
            if depth >= self.max_depth or len(idx) < 2:
                return node_id
            best = self._best_split(X[idx], grad[idx], hess[idx])
            if best is None:
                return node_id
            f, thr, gain = best
            self.feature_importances_[f] += gain
            mask = X[idx, f] <= thr
            li, ri = idx[mask], idx[~mask]
            if len(li) == 0 or len(ri) == 0:
                return node_id
            feats[node_id] = f
            thrs[node_id] = thr
            lefts[node_id] = build(li, depth + 1)
            rights[node_id] = build(ri, depth + 1)
            return node_id

        build(np.arange(len(grad)), 0)
        return {
            "feature": np.array(feats, dtype=np.int32),
            "threshold": np.array(thrs, dtype=np.float64),
            "left": np.array(lefts, dtype=np.int32),
            "right": np.array(rights, dtype=np.int32),
            "value": np.array(values, dtype=np.float64),
        }

    def _best_split(self, X, g, h):
        G, H = g.sum(), h.sum()
        lam = self.reg_lambda
        parent = G * G / (H + lam)
        best = None
        best_gain = 1e-9
        for f in range(X.shape[1]):
            col = X[:, f]
            # quantile-binned candidate thresholds (deterministic)
            uniq = np.unique(col)
            if len(uniq) < 2:
                continue
            if len(uniq) > self.n_bins:
                qs = np.quantile(col, np.linspace(0, 1, self.n_bins + 1)[1:-1])
                cand = np.unique(qs)
            else:
                cand = (uniq[:-1] + uniq[1:]) / 2.0
            order = np.argsort(col, kind="stable")
            cs_g = np.cumsum(g[order])
            cs_h = np.cumsum(h[order])
            sorted_col = col[order]
            # position of last element <= threshold
            pos = np.searchsorted(sorted_col, cand, side="right") - 1
            valid = (pos >= 0) & (pos < len(col) - 1)
            if not valid.any():
                continue
            pos = pos[valid]
            cand = cand[valid]
            GL, HL = cs_g[pos], cs_h[pos]
            GR, HR = G - GL, H - HL
            ok = (HL >= self.min_child_weight) & (HR >= self.min_child_weight)
            if not ok.any():
                continue
            gain = GL**2 / (HL + lam) + GR**2 / (HR + lam) - parent
            gain[~ok] = -np.inf
            k = int(np.argmax(gain))
            if gain[k] > best_gain:
                best_gain = float(gain[k])
                best = (f, float(cand[k]), best_gain)
        return best

    # -- prediction -------------------------------------------------------
    @staticmethod
    def _predict_tree(nodes, X):
        n = len(X)
        cur = np.zeros(n, dtype=np.int32)
        feature = nodes["feature"]
        threshold = nodes["threshold"]
        left = nodes["left"]
        right = nodes["right"]
        value = nodes["value"]
        active = feature[cur] >= 0
        while active.any():
            idx = np.nonzero(active)[0]
            node = cur[idx]
            goes_left = X[idx, feature[node]] <= threshold[node]
            cur[idx] = np.where(goes_left, left[node], right[node])
            active[idx] = feature[cur[idx]] >= 0
        return value[cur]

    def predict_margin(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        out = np.full(len(X), self.base_score)
        for nodes in self.trees:
            out += self.learning_rate * self._predict_tree(nodes, X)
        return out

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.predict_margin(X)))

    # -- persistence ------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "base_score": self.base_score,
                "learning_rate": self.learning_rate,
                "trees": [
                    {k: v.tolist() for k, v in t.items()} for t in self.trees
                ],
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "GBTClassifier":
        d = json.loads(s)
        m = cls(learning_rate=d["learning_rate"])
        m.base_score = d["base_score"]
        m.trees = [
            {
                "feature": np.array(t["feature"], dtype=np.int32),
                "threshold": np.array(t["threshold"], dtype=np.float64),
                "left": np.array(t["left"], dtype=np.int32),
                "right": np.array(t["right"], dtype=np.int32),
                "value": np.array(t["value"], dtype=np.float64),
            }
            for t in d["trees"]
        ]
        return m

"""Pairwise classification metrics.

Same semantics as the reference's metric module
(/root/reference/src/metric/metric.py:6-20): threshold 0.5, accuracy,
precision, recall, binary/macro/micro F1 — implemented in numpy (no
sklearn in this sandbox).
"""

from __future__ import annotations

import numpy as np


def _prf(y_true: np.ndarray, y_pred: np.ndarray, positive: int):
    tp = int(((y_pred == positive) & (y_true == positive)).sum())
    fp = int(((y_pred == positive) & (y_true != positive)).sum())
    fn = int(((y_pred != positive) & (y_true == positive)).sum())
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def calc_metrics(test_y, pred_y, prob: float = 0.5) -> dict:
    """Reference metric dict: acc/p/r/f1/macro_f1/micro_f1/decision_value."""
    y = np.asarray(test_y, dtype=np.int64)
    yhat = (np.asarray(pred_y, dtype=np.float64) > prob).astype(np.int64)
    acc = float((y == yhat).mean()) if len(y) else 0.0
    p1, r1, f1_pos = _prf(y, yhat, 1)
    _, _, f1_neg = _prf(y, yhat, 0)
    macro_f1 = (f1_pos + f1_neg) / 2.0
    micro_f1 = acc  # binary single-label micro-F1 == accuracy
    return {
        "acc": acc,
        "p": p1,
        "r": r1,
        "f1": f1_pos,
        "macro_f1": macro_f1,
        "micro_f1": micro_f1,
        "decision_value": prob,
    }


def cluster_full_gold_metrics(entity_of: dict, cluster_of: dict) -> dict:
    """Pairwise P/R/F1 of predicted clusters against the FULL gold
    partition — every gold co-entity pair counts, whether or not
    blocking ever produced it as a candidate (the reference's full
    pair-universe semantics, database/and_datasets.sql:44-79, vs the
    candidate-conditional variant below). Counts are set-algebraic —
    no pair enumeration:

        gold  = Σ_entity C(n,2);  pred = Σ_cluster C(n,2)
        TP    = Σ_(entity ∩ cluster cell) C(n,2)
    """
    from collections import Counter

    def pair_sum(counter) -> int:
        return sum(n * (n - 1) // 2 for n in counter.values())

    ents = Counter(entity_of.values())
    clus = Counter(cluster_of[u] for u in entity_of)
    cells = Counter((e, cluster_of[u]) for u, e in entity_of.items())
    gold = pair_sum(ents)
    pred = pair_sum(clus)
    tp = pair_sum(cells)
    p = tp / pred if pred else 0.0
    r = tp / gold if gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "p": p,
        "r": r,
        "f1": f1,
        "gold_pairs": gold,
        "pred_pairs": pred,
        "tp_pairs": tp,
    }


def cluster_pairwise_metrics(gold_pairs, cluster_of: dict) -> dict:
    """Pairwise P/R/F1 of predicted clusters against labeled pairs:
    predict 1 iff the two ids share a predicted cluster (SURVEY.md §2.12).

    ``gold_pairs`` is an iterable of (id1, id2, label)."""
    y, yhat = [], []
    for id1, id2, label in gold_pairs:
        y.append(int(label))
        c1, c2 = cluster_of.get(id1), cluster_of.get(id2)
        yhat.append(1 if (c1 is not None and c1 == c2) else 0)
    return calc_metrics(np.array(y), np.array(yhat, dtype=np.float64))

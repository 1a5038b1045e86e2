"""Experiment & error-analysis surface.

Recasts the reference's experiment matrix runner and error analysis
(/root/reference/src/main_app.py:4-67,
src/comparison/inner_outer_feature_method.py:33-65,
src/error_analysis.py:19-69): grouped cross-validated evaluation over
named feature sets and the model zoo, plus worst-error inspection with
feature importances.
"""

from __future__ import annotations

import numpy as np

from ..functions.feature_groups import get_feature_set
from ..functions.metrics import calc_metrics
from ..functions.models import use_classifier
from ..functions.scaling import MinMaxStandardScaler
from ..functions.splits import assert_no_leakage, grouped_folds, split_group_column


def run_experiment(
    features_df,
    feature_set: str = "all_features",
    model: str = "gbt",
    n_splits: int = 5,
):
    """The ``run(method=…, dataset=…)`` step (SURVEY.md §3.1): project a
    named feature set, leakage-free grouped CV by host hash, scale, fit,
    score, average fold metrics. ``features_df`` is the (small) labeled
    feature table collected to the driver — the reference's scale contract.
    Returns {metric: mean over folds}."""
    cols = get_feature_set(feature_set)
    X = features_df[cols].to_numpy(dtype=np.float64)
    y = features_df["label"].to_numpy(dtype=np.int64)
    hosts = [u.split("/")[2] for u in features_df["url_1"]]
    groups = split_group_column(hosts)

    fold_metrics = []
    for train, test in grouped_folds(groups, n_splits=n_splits):
        if test.sum() == 0 or train.sum() == 0:
            continue
        assert_no_leakage(groups[train], groups[test])
        scaler = MinMaxStandardScaler().fit(X[train])
        _, proba = use_classifier(
            model, scaler.transform(X[train]), y[train], scaler.transform(X[test])
        )
        fold_metrics.append(calc_metrics(y[test], proba))
    keys = fold_metrics[0].keys()
    return {k: float(np.mean([m[k] for m in fold_metrics])) for k in keys}


def error_analysis(scored_df, feature_names: list[str], model=None, top_n: int = 20):
    """Worst-error inspection (src/error_analysis.py:19-69 analog):
    labeled scored pairs -> top |score - label| rows + (if a fitted GBT is
    given) gain-based feature importances."""
    df = scored_df.copy()
    df["error"] = (df["score"] - df["label"]).abs()
    worst = df.sort_values("error", ascending=False).head(top_n)
    out = {"worst": worst, "n_errors_at_0.5": int((df["error"] > 0.5).sum())}
    if model is not None and getattr(model, "feature_importances_", None) is not None:
        imp = model.feature_importances_
        total = imp.sum() or 1.0
        out["feature_importances"] = dict(
            sorted(
                zip(feature_names, (imp / total).tolist()),
                key=lambda kv: -kv[1],
            )
        )
    return out

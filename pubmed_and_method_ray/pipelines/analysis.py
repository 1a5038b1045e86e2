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


def external_id_baseline(sf_dir: str, expand_k: int = 3):
    """E5 — the external-ID trivial baseline
    (/root/reference/src/comparison/author_id_baseline.py:19-35): predict
    same_entity := same registry id, DROP pairs where either side's id is
    unknown (the reference's −1 filter), and score the prediction against
    gold over the labeled pair universe (all within-host page pairs — the
    blocking universe, positives + hard negatives).

    The synthetic registry is a pure function of the page url (md5 hex:
    pages with first hex digit > 'b' are unregistered ≈ 25%; registered
    ids are the true entity except when the second hex digit is 'f',
    which corrupts the id to a neighboring entity ≈ 6%), so the whole
    baseline — including its imperfection — is SQL-checkable.

    Distributed shape: registry lookup + unknown-filter per batch BEFORE
    the one hash exchange on host; per-host confusion counts are computed
    with chunked vectorized equality (bounded memory on mega-hosts) and
    pre-aggregated to ONE row per host, so the final global sum is tiny.
    Returns a one-row frame: counts + accuracy/precision/recall/f1.
    """
    import hashlib
    import re

    import pandas as pd
    import pyarrow as pa

    from ..rayutil import shuffle_partitions
    from ..sources.pages import build_pages_dataset

    url_re = re.compile(r"site(\d+)\.example\.org/e(\d+)/")

    def registry(t: pa.Table) -> pa.Table:
        host, ent, rid = [], [], []
        for u in t["url"].to_pylist():
            h = hashlib.md5(u.encode()).hexdigest()
            if h[0] > "b":  # unregistered — reference's id == −1 filter
                continue
            m = url_re.search(u)
            e = int(m.group(2))
            host.append(int(m.group(1)))
            ent.append(e)
            rid.append(e + 1 if h[1] == "f" else e)
        return pa.table(
            {
                "host_id": pa.array(host, pa.int64()),
                "ent": pa.array(ent, pa.int64()),
                "rid": pa.array(rid, pa.int64()),
            }
        )

    def confusion(g: pa.Table) -> pa.Table:
        ents = g["ent"].to_numpy(zero_copy_only=False)
        rids = g["rid"].to_numpy(zero_copy_only=False)
        n = len(ents)
        tp = fp = fn = tn = 0
        jj = np.arange(n)[None, :]
        for i0 in range(0, n, 2048):  # bound n×chunk bool matrices
            i1 = min(n, i0 + 2048)
            upper = jj > np.arange(i0, i1)[:, None]  # canonical i < j
            gold = (ents[i0:i1, None] == ents[None, :]) & upper
            pred = (rids[i0:i1, None] == rids[None, :]) & upper
            tp += int(np.sum(gold & pred))
            fp += int(np.sum(~gold & pred & upper))
            fn += int(np.sum(gold & ~pred))
            tn += int(np.sum(~gold & ~pred & upper))
        return pa.table(
            {
                "tp": pa.array([tp], pa.int64()),
                "fp": pa.array([fp], pa.int64()),
                "fn": pa.array([fn], pa.int64()),
                "tn": pa.array([tn], pa.int64()),
            }
        )

    per_host = (
        build_pages_dataset(sf_dir, expand_k=expand_k)
        .select_columns(["url"])
        .map_batches(registry, batch_format="pyarrow")
        .groupby("host_id", num_partitions=shuffle_partitions())
        .map_groups(confusion, batch_format="pyarrow")
    )
    sums = per_host.sum(["tp", "fp", "fn", "tn"])
    tp, fp = sums["sum(tp)"], sums["sum(fp)"]
    fn, tn = sums["sum(fn)"], sums["sum(tn)"]
    n = tp + fp + fn + tn
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return pd.DataFrame(
        {
            "n_pairs": [int(n)],
            "tp": [int(tp)],
            "fp": [int(fp)],
            "fn": [int(fn)],
            "tn": [int(tn)],
            "accuracy": [float((tp + tn) / n) if n else 0.0],
            "precision": [float(prec)],
            "recall": [float(rec)],
            # single int->double division: bit-identical to the SQL oracle
            "f1": [
                float(2 * tp / (2 * tp + fp + fn)) if 2 * tp + fp + fn else 0.0
            ],
        }
    )

"""Feature scaling — the reference's MinMax-then-Standard scaler
(/root/reference/src/eutilities/preprocessor.py:25-30), in two shapes:

- driver-side fit/transform on numpy (the reference's scale: <60k rows);
- distributed two-pass: per-batch (count, sum, sumsq, min, max) partials
  -> driver merge -> broadcast transform (SURVEY.md E1 scale path).
"""

from __future__ import annotations

import numpy as np


class MinMaxStandardScaler:
    """x -> standardize(minmax(x)): the reference's exact composition."""

    def __init__(self):
        self.min_ = None
        self.range_ = None
        self.mean_ = None
        self.std_ = None

    def fit(self, X: np.ndarray) -> "MinMaxStandardScaler":
        X = np.asarray(X, dtype=np.float64)
        self.min_ = X.min(axis=0)
        rng = X.max(axis=0) - self.min_
        rng[rng == 0] = 1.0
        self.range_ = rng
        M = (X - self.min_) / self.range_
        self.mean_ = M.mean(axis=0)
        std = M.std(axis=0)
        std[std == 0] = 1.0
        self.std_ = std
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        M = (np.asarray(X, dtype=np.float64) - self.min_) / self.range_
        return (M - self.mean_) / self.std_

    def fit_transform(self, X: np.ndarray) -> np.ndarray:
        return self.fit(X).transform(X)


def fit_scaler_distributed(features_ds, columns: list[str]) -> MinMaxStandardScaler:
    """Two-pass distributed fit: mergeable per-batch moments/extrema."""
    import pyarrow as pa

    k = len(columns)

    def partial(t: pa.Table) -> pa.Table:
        X = np.column_stack(
            [t[c].to_numpy(zero_copy_only=False) for c in columns]
        ).astype(np.float64)
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(X)], pa.int64()),
                "sum": pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64(), k)),
                "sumsq": pa.array(
                    [(X * X).sum(axis=0).tolist()], pa.list_(pa.float64(), k)
                ),
                "min": pa.array([X.min(axis=0).tolist()], pa.list_(pa.float64(), k)),
                "max": pa.array([X.max(axis=0).tolist()], pa.list_(pa.float64(), k)),
            }
        )

    n = 0
    s = np.zeros(k)
    ss = np.zeros(k)
    mn = np.full(k, np.inf)
    mx = np.full(k, -np.inf)
    for b in features_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1024
    ):
        n += int(np.asarray(b["n"]).sum())
        s += np.asarray(b["sum"].to_pylist(), dtype=np.float64).sum(axis=0)
        ss += np.asarray(b["sumsq"].to_pylist(), dtype=np.float64).sum(axis=0)
        mn = np.minimum(mn, np.asarray(b["min"].to_pylist()).min(axis=0))
        mx = np.maximum(mx, np.asarray(b["max"].to_pylist()).max(axis=0))

    sc = MinMaxStandardScaler()
    sc.min_ = mn
    rng = mx - mn
    rng[rng == 0] = 1.0
    sc.range_ = rng
    # moments of the minmax-scaled variable derived from raw moments
    mean_raw = s / max(n, 1)
    var_raw = ss / max(n, 1) - mean_raw**2
    sc.mean_ = (mean_raw - mn) / rng
    std = np.sqrt(np.maximum(var_raw, 0.0)) / rng
    std[std == 0] = 1.0
    sc.std_ = std
    return sc


def transform_features(features_ds, scaler: MinMaxStandardScaler, columns: list[str]):
    """Broadcast-scaler vectorized transform stage."""
    import pyarrow as pa
    import ray

    ref = ray.put((scaler.min_, scaler.range_, scaler.mean_, scaler.std_))

    def f(t: pa.Table) -> pa.Table:
        from ..stages.mention_prep import get_broadcast

        mn, rng, mean, std = get_broadcast(ref)
        for i, c in enumerate(columns):
            x = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            z = ((x - mn[i]) / rng[i] - mean[i]) / std[i]
            t = t.set_column(
                t.schema.get_field_index(c), c, pa.array(z, pa.float64())
            )
        return t

    return features_ds.map_batches(f, batch_format="pyarrow")

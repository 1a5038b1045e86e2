"""Leakage-free grouped splits.

Analog of the reference's GroupShuffleSplit-by-lastname-hash
(/root/reference/src/comparison/inner_outer_feature_method.py:53-54,
partition column built at
database/pubmed_inner_outer_feature.sql:679-681) with the leakage assert
of src/help/dataset_split.py:3-11 — made deterministic: groups are
assigned to folds by stable hash, never by RNG.
"""

from __future__ import annotations

import numpy as np

from .hashing import crc32_mod


def split_group_column(keys) -> np.ndarray:
    """crc32(key) % 100 — the lastname_hash_partition_for_split analog."""
    return np.array([crc32_mod(k, 100) for k in keys], dtype=np.int32)


def grouped_folds(group_ids: np.ndarray, n_splits: int = 10):
    """Yield (train_mask, test_mask) per fold; every group lands in
    exactly one test fold (group_id % n_splits)."""
    g = np.asarray(group_ids)
    for fold in range(n_splits):
        test = (g % n_splits) == fold
        yield ~test, test


def assert_no_leakage(train_groups, test_groups) -> None:
    """Reference semantics (src/help/dataset_split.py:3-11)."""
    inter = set(train_groups) & set(test_groups)
    assert len(inter) == 0, f"group leakage across split: {sorted(inter)[:5]}"

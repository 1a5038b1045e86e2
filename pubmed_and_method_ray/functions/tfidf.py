"""Hashed char-ngram TF-IDF vectorizer.

North-star feature "char-ngram TF-IDF cosine" (BASELINE.json). Design for
scale: ngrams are feature-hashed into a fixed 2**16-dim space so the
document-frequency table is a bounded dense vector — per-batch partial DF
vectors are summed (a mergeable sketch, SURVEY.md §4), never a
vocabulary shuffle. The fitted IDF vector is broadcast via ``ray.put``
and applied vectorized inside the feature actor.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

N_FEATURES = 1 << 16


def ngram_indices(text: str, n: int = 3) -> np.ndarray:
    """Hashed char-ngram feature indices (with multiplicity) for a string.

    Fully vectorized: the utf-8 byte stream is polynomial-combined over a
    sliding window and avalanched with splitmix64 — no per-gram Python
    hashing (this runs once per mention in the hot normalize stage)."""
    b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) == 0:
        return np.empty(0, dtype=np.int64)
    if len(b) < n:
        h = np.uint64(0xF1)
        for v in b:
            h = splitmix64(h ^ v)
        return np.array([int(h) % N_FEATURES], dtype=np.int64)
    m = len(b) - n + 1
    h = splitmix64(b[:m] ^ np.uint64(0xF1))
    for j in range(1, n):
        h = splitmix64(h ^ b[j : m + j])
    return (h % np.uint64(N_FEATURES)).astype(np.int64)


def partial_df(texts, n: int = 3) -> np.ndarray:
    """Document-frequency partial for a batch -> int64[N_FEATURES]."""
    df = np.zeros(N_FEATURES, dtype=np.int64)
    for t in texts:
        idx = np.unique(ngram_indices(t, n))
        df[idx] += 1
    return df


def idf_from_df(df: np.ndarray, n_docs: int) -> np.ndarray:
    """Smoothed idf = ln((1+N)/(1+df)) + 1 (standard tf-idf definition)."""
    return (np.log((1.0 + n_docs) / (1.0 + df.astype(np.float64))) + 1.0).astype(
        np.float32
    )


def tfidf_vector(text: str, idf: np.ndarray, n: int = 3):
    """Sparse (indices, l2-normalized weights) tf-idf for one string."""
    idx = ngram_indices(text, n)
    if len(idx) == 0:
        return idx, np.empty(0, dtype=np.float32)
    uniq, counts = np.unique(idx, return_counts=True)
    w = counts.astype(np.float32) * idf[uniq]
    norm = np.sqrt((w * w).sum())
    if norm > 0:
        w = w / norm
    return uniq, w


def cosine_sparse(idx1, w1, idx2, w2) -> float:
    """Cosine of two sparse l2-normalized vectors (sorted unique indices)."""
    if len(idx1) == 0 or len(idx2) == 0:
        return 0.0
    common, i1, i2 = np.intersect1d(idx1, idx2, assume_unique=True, return_indices=True)
    if len(common) == 0:
        return 0.0
    return float(np.dot(w1[i1], w2[i2]))

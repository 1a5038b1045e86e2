"""Deterministic hashing primitives.

Replaces the reference's non-reproducible sampling/partition hashes
(``xxHash32(lastname) % 100`` at
/root/reference/database/pubmed_inner_outer_feature.sql:679-681 and the
``xxHash64(concat(pm_ao, now64()))`` shuffles at :441,448) with fully
keyed, seed-stable hashes. Never uses Python's builtin ``hash()``
(PYTHONHASHSEED-dependent).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

MASK64 = (1 << 64) - 1
# splitmix64 constants (public domain, Steele et al. 2014)
_SM_GAMMA = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB


def crc32_mod(s: str, mod: int = 100) -> int:
    """Deterministic split-group partitioner: ``crc32(s) % mod``
    (analog of ``xxHash32(lastname) % 100``)."""
    return zlib.crc32(s.encode("utf-8")) % mod


def stable_hash64(s: str, seed: int = 0) -> int:
    """64-bit stable string hash via blake2b (keyed by seed)."""
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, key=seed.to_bytes(8, "little")
    )
    return int.from_bytes(h.digest(), "little")


def md5_u64(s: str) -> int:
    """First 8 md5 digest bytes as little-endian uint64 — the ONE hash
    with an exact DuckDB equivalent (``md5_number_upper(s)``), used
    wherever a derived value must be reproducible inside a SQL oracle
    (page-corpus structure, simhash token hashes, rolling fingerprints)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def md5_u64_array(strings) -> np.ndarray:
    """Vectorized-ish md5_u64 over an iterable of strings -> uint64[n]."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[:8], "little"
        )
    return out


_U = np.uint64


def splitmix64(x: np.ndarray | int):
    """Vectorized splitmix64 finalizer — cheap avalanche for integer keys.
    uint64 multiplication wraps mod 2^64 by design. Inputs always go
    through ARRAY ops (scalars promoted to 1-element arrays): numpy only
    emits overflow warnings for scalar uint ops, so no errstate context
    is needed — a per-call context manager costs more than the hash
    itself on small arrays."""
    arr = np.asarray(x, dtype=np.uint64)
    scalar = arr.ndim == 0
    if scalar:
        arr = arr.reshape(1)
    arr = (arr + _U(_SM_GAMMA)) & _U(MASK64)
    arr = ((arr ^ (arr >> _U(30))) * _U(_SM_M1)) & _U(MASK64)
    arr = ((arr ^ (arr >> _U(27))) * _U(_SM_M2)) & _U(MASK64)
    arr = arr ^ (arr >> _U(31))
    return arr[0] if scalar else arr


def hash64_array(strings, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hashes for an iterable of strings -> uint64 ndarray."""
    key = seed.to_bytes(8, "little")
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, key=key)
        out[i] = int.from_bytes(h.digest(), "little")
    return out

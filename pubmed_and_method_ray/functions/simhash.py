"""SimHash / MinHash sketches (vectorized, deterministic).

The reference blocks on the exact ``lastname_firstinitial`` key
(/root/reference/database/pubmed_inner_outer_feature.sql:121); the web
graft's analog blocking key is ``(normalized_host, simhash_band)``
(BASELINE.json north_star), with MinHash-LSH as the near-dup variant
(SURVEY.md §2.7 D5). Algorithms follow the public definitions
(Charikar 2002 SimHash; Broder 1997 MinHash; Leskovec et al., MMDS ch.3).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64_array, splitmix64

SIMHASH_BITS = 64
# Blocking bands: 8 bands x 8 bits. At near-dup Hamming distance d≈10 the
# expected number of clean bands is 8·(7/8)^d ≈ 2.1 (high recall); for
# unrelated text (d≈30) a chance band collision is ~(1/2)^8 per band —
# cheap false candidates the scorer rejects.
DEFAULT_BANDS = 8


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset (weight 1 per occurrence)."""
    if not tokens:
        return 0
    hashes = hash64_array(tokens, seed=0x51)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    votes = bits.sum(axis=0) * 2 - len(tokens)  # (+1 / -1) vote sums per bit
    return int(np.packbits(votes > 0, bitorder="little").view(np.uint64)[0])


def simhash_bands(h: int, n_bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into ``n_bands`` equal-width band values."""
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    return [(h >> (i * width)) & mask for i in range(n_bands)]


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def hamming64_arrays(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor for uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(
        np.uint8
    )
    return np.unpackbits(x.reshape(len(a), 8), axis=1).sum(axis=1).astype(np.int64)


def minhash_signature(tokens: list[str], num_perm: int = 64, seed: int = 7) -> np.ndarray:
    """MinHash signature via k independent splitmix64 re-hashes of one
    base blake2b hash per distinct token -> uint64[num_perm]."""
    toks = sorted(set(tokens))
    if not toks:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = hash64_array(toks, seed=seed)  # (n,)
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(seed + 1))
    # re-key: h_k(t) = splitmix64(base(t) ^ seed_k); min over tokens
    rehash = splitmix64(base[:, None] ^ seeds[None, :])  # (n, num_perm)
    return rehash.min(axis=0)


def minhash_band_keys(sig: np.ndarray, n_bands: int = 16) -> list[str]:
    """LSH band keys 'b{i}:{hash of the band rows}' for a signature."""
    rows = len(sig) // n_bands
    keys = []
    for b in range(n_bands):
        band = sig[b * rows : (b + 1) * rows]
        folded = np.uint64(0)
        for v in band:
            folded = splitmix64(folded ^ v)
        keys.append(f"b{b}:{int(folded):016x}")
    return keys

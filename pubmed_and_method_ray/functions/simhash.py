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
# Blocking bands: 6 bands (4x11 + 2x10 bits). Guarantees any pair at
# Hamming distance <= 5 shares a band (pigeonhole); at near-dup d≈6-8
# recall stays high, while unrelated same-host text (d≈25+) collides on
# a band only a few % of the time — the false candidates are cheap and
# rejected by the scorer. Tune DEFAULT_BANDS up for recall, down for
# selectivity.
DEFAULT_BANDS = 6
_BAND_WIDTHS = {4: [16, 16, 16, 16], 6: [11, 11, 11, 11, 10, 10], 8: [8] * 8}


def simhash_from_hashes(hashes: np.ndarray) -> int:
    """SimHash from precomputed per-token 64-bit hashes (multiset,
    weight 1 per occurrence) — lets callers reuse token hashes."""
    if len(hashes) == 0:
        return 0
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    votes = bits.sum(axis=0) * 2 - len(hashes)  # (+1 / -1) vote sums per bit
    return int(np.packbits(votes > 0, bitorder="little").view(np.uint64)[0])


def simhash_from_hashes_segmented(
    flat_hashes: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Per-row SimHash over a flattened token-hash array: row i owns
    ``flat_hashes[offsets[i]:offsets[i+1]]``. One (N, 64) bit unpack +
    one reduceat instead of a per-row Python call; empty rows hash to 0.
    Bit-identical to ``simhash_from_hashes`` row by row.

    Per-byte histogram counting: for each of the 8 little-endian byte
    positions, ONE bincount over (doc_id*256 + byte_value) keys gives a
    (rows, 256) histogram, and that byte's 8 per-bit sums are the
    histogram times a constant (256, 8) bit table — 8 scatter-adds over
    the token stream instead of 64, and no (tokens, 64) bit matrix is
    ever materialized (the previous unpackbits variant allocated
    tokens x 64 bytes, 64x the hash payload, and was this kernel's
    wall-clock at bench batch sizes; measured 4-5x faster). All counts
    are exact: bincount is integer, and the float64 matmul is exact for
    counts < 2^53. Bit-identical to ``simhash_from_hashes`` row by row
    (tests/test_kernels.py asserts)."""
    rows = len(offsets) - 1
    if rows <= 0:
        return np.zeros(0, dtype=np.uint64)
    n = np.diff(offsets)
    total = len(flat_hashes)
    if total == 0:
        return np.zeros(rows, dtype=np.uint64)
    by = (
        np.ascontiguousarray(flat_hashes, dtype="<u8")
        .view(np.uint8)
        .reshape(-1, 8)
    )
    doc_of = np.repeat(np.arange(rows, dtype=np.int64), n)
    sums = np.empty((rows, 64), dtype=np.int64)
    bit_table = (
        (np.arange(256)[:, None] >> np.arange(8)[None, :]) & 1
    ).astype(np.float64)
    for p in range(8):
        hist = np.bincount(
            (doc_of << 8) + by[:, p], minlength=rows * 256
        ).reshape(rows, 256)
        # (rows, 256) @ (256, 8) in float64 (BLAS; exact for counts
        # < 2^53) -> per-bit sums for bits p*8 .. p*8+7
        sums[:, p * 8 : (p + 1) * 8] = (
            hist.astype(np.float64) @ bit_table
        ).astype(np.int64)
    votes = sums * 2 - n[:, None]
    return np.packbits(votes > 0, axis=1, bitorder="little").view(np.uint64)[:, 0]


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset (weight 1 per occurrence)."""
    if not tokens:
        return 0
    return simhash_from_hashes(hash64_array(tokens, seed=0x51))


def simhash_bands(h: int, n_bands: int = 4) -> list[int]:
    """Split a 64-bit simhash into ``n_bands`` band values (widths from
    _BAND_WIDTHS; equal split if n_bands not in the table)."""
    widths = _BAND_WIDTHS.get(n_bands, [SIMHASH_BITS // n_bands] * n_bands)
    out = []
    off = 0
    for w in widths:
        out.append((h >> off) & ((1 << w) - 1))
        off += w
    return out


def shingle_hashes_from_token_hashes(th: np.ndarray, k: int = 3) -> np.ndarray:
    """Order-sensitive k-shingle hashes from the (unsorted) token-hash
    sequence — vectorized mixing instead of string-joined shingles."""
    n = len(th)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        h = np.uint64(0x53)
        for v in th:
            h = splitmix64(h ^ v)
        return np.array([h], dtype=np.uint64)
    h = splitmix64(th[: n - k + 1] ^ np.uint64(0x53))
    for j in range(1, k):
        h = splitmix64(h ^ th[j : n - k + 1 + j])
    return h


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def hamming64_arrays(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor for uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(
        np.uint8
    )
    return np.unpackbits(x.reshape(len(a), 8), axis=1).sum(axis=1).astype(np.int64)


def minhash_from_hashes(base: np.ndarray, num_perm: int = 64, seed: int = 7) -> np.ndarray:
    """MinHash signature from precomputed element hashes (uint64[n])."""
    if len(base) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(seed + 1))
    # re-key: h_k(t) = splitmix64(base(t) ^ seed_k); min over elements
    rehash = splitmix64(np.asarray(base, dtype=np.uint64)[:, None] ^ seeds[None, :])
    return rehash.min(axis=0)


def minhash_signature(tokens: list[str], num_perm: int = 64, seed: int = 7) -> np.ndarray:
    """MinHash signature via k independent splitmix64 re-hashes of one
    base blake2b hash per distinct token -> uint64[num_perm]."""
    toks = sorted(set(tokens))
    if not toks:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    return minhash_from_hashes(hash64_array(toks, seed=seed), num_perm, seed)


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

"""Blocking, mega-block salting, and within-block pair generation.

The reference blocks mentions by the exact ``lastname_firstinitial`` key
and emits all C(n,2) pairs per block via a grouped self-cross
(/root/reference/database/and_datasets.sql:44-79, Python oracle at
resources/gold_standard_dataset/song/author_pair_transformation.py:21-35).
The web graft's key is ``(normalized_host, simhash_band)`` with N_BANDS
band keys per mention (LSH-style multi-probe: a near-dup pair is blocked
together if ANY band agrees), and explicit salting of skewed mega-blocks
(north_rule; skew acknowledged in reference README.md:3).

Design notes (scale):
- ONE all-to-all shuffle, partitioned by HOST, one row per mention: all
  band keys of a mention share its host, so banding runs LOCALLY inside
  each exchanged partition instead of replicating every mention's
  payload once per band (6x less exchange volume than band-keyed
  shuffling — the exchange, not the pair kernels, is the wall-clock
  bound at bench scale).
- Mega-HOST salting with EXACT coverage: a host with n > n_max mentions
  is split into S = ceil(n/n_max) salt groups by a stable url hash;
  each mention is re-emitted to every group pair (i,j) containing its
  salt — the classic triangle-join replication. Group (i,i) emits
  within-pairs, (i,j) cross-pairs only, so every band-agreeing pair is
  generated exactly once.
- Within a segment, candidates come from per-band local value grouping
  (argsort + run boundaries, cached triu for within, vectorized
  range-repeat for cross-side matches). Cross-band dedup: a pair is
  emitted only at the SMALLEST band index on which the two mentions
  agree (both band vectors are local). Canonical (url1 < url2) ordering
  mirrors the reference's ``arraySort([id1,id2])`` rule
  (database/and_datasets.sql:62-68).
- The ambiguity feature uses the HOST block size (the commonness analog
  of database/pubmed_inner_outer_feature.sql:201-203 — host commonness
  == the reference's ns commonness), carried as ``n_true`` for salted
  hosts and the local segment size otherwise — no extra join.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv64_arrow, splitmix64, stable_hash64
from ..rayutil import shuffle_partitions
from ..functions.simhash import DEFAULT_BANDS as N_BANDS



def _host_hashes(batch: pa.Table) -> np.ndarray:
    """uint64 host hash per row — host strings are dictionary-encoded so
    the hash runs once per DISTINCT host per batch (vectorized
    FNV+splitmix over the dictionary buffer, functions/hashing
    fnv64_arrow — internal key, nothing external pins the values).
    64-bit collisions across hosts are ~2^-64 per pair — a collision
    merges two candidate hosts (extra pairs the scorer rejects); it
    cannot drop pairs."""
    hcol = batch["host"]
    hcol = hcol.combine_chunks() if isinstance(hcol, pa.ChunkedArray) else hcol
    henc = hcol.dictionary_encode()
    if isinstance(henc, pa.ChunkedArray):
        henc = henc.combine_chunks()
    dict_hashes = fnv64_arrow(henc.dictionary, seed=0x42)
    return dict_hashes[np.asarray(henc.indices)].astype(np.uint64)


def _bands_matrix(group: pa.Table) -> np.ndarray:
    """(R, NB) uint64 band-value matrix, recomputed from the 8-byte
    ``simhash`` column (vectorized shift+mask per band). Bands are a
    pure function of the simhash, so shipping them through the pair
    exchange would be redundant payload — the bucket task re-derives
    them locally instead."""
    from ..functions.simhash import _BAND_WIDTHS, SIMHASH_BITS

    sh = np.asarray(group["simhash"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    widths = _BAND_WIDTHS.get(N_BANDS, [SIMHASH_BITS // N_BANDS] * N_BANDS)
    out = np.empty((len(sh), len(widths)), dtype=np.uint64)
    off = 0
    for b_i, w in enumerate(widths):
        out[:, b_i] = (sh >> np.uint64(off)) & np.uint64((1 << w) - 1)
        off += w
    return out

# memory bound per pair-gen hash partition: a bucket task holds its
# whole partition block (mention payloads) plus the pair expansion, so
# blocks are sized to ~128 MiB of exchanged payload regardless of input
# scale — the count GROWS with data volume instead of capping at a
# constant (a 64-way cap would mean ~1.6 TB/partition at 100 TB).
PAIR_BUCKET_BYTES = 128 << 20

# rows-aware refinement between the [cpus, 2*cpus] clamp: interleaved
# paired rounds measured 64 buckets best at ~400k mentions and 32 best
# at ~200k on 32 cpus — finer buckets pack the skewed score wave
# better, but only once each bucket carries enough work to amortize its
# fixed banding/dedup cost. ~6k mentions/bucket splits those measured
# operating points.
PAIR_ROWS_PER_BUCKET = 6_000


def n_pair_buckets(
    n_rows: int | None = None,
    n_bytes: int | None = None,
    cpus: int | None = None,
) -> int:
    """Hash-exchange partition count for pair generation: TWO per CPU,
    grown past that when the (known) input volume would otherwise
    overfill a partition block.

    Tuning history matters here — this constant has flipped twice, each
    time because a FIXED overhead proportional to partition count was
    masking the packing benefit of finer buckets: (1) with Ray's default
    aggregator reservation (0.25 logical CPU x partitions held for the
    exchange lifetime) two-per-CPU looked best; (2) with the engine's
    0.05-per-partition override, one-per-CPU measured best (32 parts
    20.8s vs 64 at 29.2s at 32 cpus) — but that run predated the
    read-block-floor fix, so push overhead (input blocks x partitions
    actor round-trips) still grew linearly with partition count; (3)
    with 2-per-CPU input blocks, interleaved paired rounds on the same
    399,714-page input measure 64 partitions at-or-faster than 32 in
    every round at 32 cpus (paired walls 16.0/20.4, 14.2/15.3,
    20.0/19.6, 12.1/17.6, 12.9/18.8 — median 1.27x) and 16 at-or-faster
    than 8 at 8 cpus: finer buckets pack the score wave's skewed tasks
    better, and the per-partition cost is now small enough to pay.
    At HALF that input (199,826 pages) the same interleaved A/B flips
    (0.88x — each bucket no longer carries enough work to amortize its
    fixed banding/dedup cost), so when the row count is knowable the
    count interpolates at ~PAIR_ROWS_PER_BUCKET mentions/bucket inside
    the [cpus, 2*cpus] clamp; unknown (lazy) inputs default to the
    fine-grained end, which is also the memory-safer choice at scale."""
    from ..rayutil import tune_data_context, cluster_cpus

    cpus = cluster_cpus() if cpus is None else cpus
    tune_data_context(cpus)
    n = max(4, 2 * cpus)
    if n_rows is not None:
        n = min(n, max(4, cpus, math.ceil(n_rows / PAIR_ROWS_PER_BUCKET)))
    if n_bytes is not None:
        n = max(n, math.ceil(n_bytes / PAIR_BUCKET_BYTES))
    elif n_rows is not None:
        # fallback when only rows are known: ~1 KiB/mention payload
        n = max(n, math.ceil(n_rows / (PAIR_BUCKET_BYTES // 1024)))
    return n

PAYLOAD_COLS = [
    "url",
    "title",
    "path",
    "lang",
    "ts_us",
    "simhash",
    "tok_hashes",
    "sh_hashes",
    "tfidf_pk",
    "tfidf_norm",
]


def _base_keys(host: str, bands) -> list[str]:
    return [f"{host}|{b}|{int(v):x}" for b, v in enumerate(bands)]


def emit_block_keys(batch: pa.Table) -> pa.Table:
    """Mention -> one (block_key) row per band, for the census groupby."""
    hosts = batch["host"].to_pylist()
    bands = batch["bands"].to_pylist()
    keys = [k for h, bs in zip(hosts, bands) for k in _base_keys(h, bs)]
    return pa.Table.from_pydict({"block_key": pa.array(keys, pa.string())})


def block_census(mentions_ds):
    """groupby(block_key).count() — the commonness census (SURVEY.md A1).
    Exact shuffle version over the (host|band|value) STRING keys; this is
    the query/test-facing census (``block_census_docs``). It is NOT the
    input to pair-gen salting — ``emit_pair_keys`` consumes the numeric
    host-hash skew arrays from ``skew_table_fast`` instead."""
    return (
        mentions_ds.map_batches(emit_block_keys, batch_format="pyarrow")
        .groupby("block_key", num_partitions=shuffle_partitions())
        .count()
    )


def _census_partials(batch: pa.Table, sample_mod: int = 1) -> pa.Table:
    """Per-batch partial HOST counts (pre-aggregation, SURVEY.md §4),
    fully vectorized. ``sample_mod`` > 1 counts a deterministic 1/mod
    mention sample."""
    hh = _host_hashes(batch)
    if sample_mod > 1:
        urls = batch["url"].to_pylist()
        keep = np.fromiter(
            (stable_hash64(u, seed=0xCE) % sample_mod == 0 for u in urls),
            dtype=bool,
            count=len(urls),
        )
        hh = hh[keep]
    keys, counts = np.unique(hh, return_counts=True)
    return pa.Table.from_pydict(
        {
            "block_key": pa.array(keys, pa.uint64()),
            "n": pa.array(counts, pa.int64()),
        }
    )


# driver-merge budget for the skew census: above this many SAMPLED
# mentions the partial-count concat moves off the driver into a tiny
# keyed exchange that filters to the heavy tail distributedly
_CENSUS_DRIVER_BUDGET = 5_000_000


def skew_table_fast(
    mentions_ds,
    n_max: int,
    sample_mod: int = 8,
    distributed: bool | None = None,
    n_rows_hint: int | None = None,
):
    """HOST skew census on a deterministic 1/sample_mod mention sample,
    scaled back up. SAFE approximation: salting is a load-balancing
    device — pair coverage is exact with or without it — and a host big
    enough to need salting (n > n_max >= 128) puts ~n/mod >= 16 mentions
    in the sample, so the heavy tail is detected reliably.

    Two merge paths, budget-guarded like the engine's other driver-sized
    gathers: when the (known) sampled volume fits the driver budget, a
    vectorized driver merge (measured 8x faster than a hash-shuffle
    groupby at bench-scale key cardinality); otherwise a tiny keyed
    exchange of (host_h, partial count) rows sums counts distributedly
    and only OVER-THRESHOLD hosts ever reach the driver — at 10^8 hosts
    the driver holds just the heavy tail, not ~1.6 GB of sampled
    distincts. Returns (sorted uint64 host hashes, int64 counts) for
    vectorized searchsorted lookup in the emit stage."""
    from ..rayutil import known_size, shuffle_partitions

    parts = mentions_ds.map_batches(
        _census_partials, fn_kwargs={"sample_mod": sample_mod}, batch_format="pyarrow"
    )
    if distributed is None:
        n_rows, _ = known_size(mentions_ds)
        if n_rows is None:
            n_rows = n_rows_hint  # lazy input: caller-supplied row hint
        distributed = n_rows is None or (n_rows // sample_mod) > _CENSUS_DRIVER_BUDGET
        if n_rows is None:
            # no-silent-path convention: a lazy (non-materialized) input
            # with no hint silently takes the distributed merge —
            # measured ~8x slower than the driver merge at bench scale.
            # Callers with a known size should materialize upstream or
            # pass n_rows_hint.
            import logging

            logging.getLogger(__name__).info(
                "skew census: input size unknown (lazy dataset, no "
                "n_rows_hint) — taking the distributed merge path"
            )

    if distributed:
        import pyarrow.compute as pc

        def key_as_i64(t: pa.Table) -> pa.Table:
            # Ray's aggregate path chokes on uint64 keys > 2^63 —
            # reinterpret the hash bits as int64 for the exchange
            k = np.asarray(
                t["block_key"].to_numpy(zero_copy_only=False), dtype=np.uint64
            ).view(np.int64)
            return t.set_column(
                t.schema.get_field_index("block_key"),
                "block_key",
                pa.array(k, pa.int64()),
            )

        def keep_heavy(t: pa.Table) -> pa.Table:
            n = pc.multiply(t["sum(n)"], pa.scalar(sample_mod, pa.int64()))
            t = t.set_column(
                t.schema.get_field_index("sum(n)"), "n", pc.cast(n, pa.int64())
            )
            return t.filter(pc.greater(t["n"], pa.scalar(n_max, pa.int64())))

        heavy = (
            parts.map_batches(key_as_i64, batch_format="pyarrow")
            .groupby("block_key", num_partitions=shuffle_partitions())
            .sum("n")
            .map_batches(keep_heavy, batch_format="pyarrow")
        )
        ks, ns = [], []
        for b in heavy.iter_batches(batch_format="pyarrow", batch_size=262144):
            ks.append(b["block_key"].to_numpy(zero_copy_only=False))
            ns.append(b["n"].to_numpy(zero_copy_only=False))
        if not ks:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
        keys = np.concatenate(ks).astype(np.int64).view(np.uint64)
        counts = np.concatenate(ns).astype(np.int64)
        order = np.argsort(keys)
        return keys[order], counts[order]

    all_k, all_n = [], []
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=262144):
        all_k.append(b["block_key"].to_numpy(zero_copy_only=False))
        all_n.append(b["n"].to_numpy(zero_copy_only=False))
    if not all_k:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    # vectorized merge (this loop is DRIVER-side serial time — it was a
    # per-key Python dict fold, a measurable Amdahl term at high cpu
    # counts): unique-sort the sampled host hashes once, segment-sum
    keys_all = np.concatenate(all_k).astype(np.uint64)
    ns_all = np.concatenate(all_n).astype(np.int64)
    keys, inv = np.unique(keys_all, return_inverse=True)
    counts = np.bincount(inv, weights=ns_all).astype(np.int64) * sample_mod
    big = counts > n_max
    return keys[big], counts[big]


def _pair_bucket(gk: np.ndarray, sa: np.ndarray, sb: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic exchange bucket per pair-group row — a pure function
    of the group identity so every row of a group lands together."""
    mix = gk ^ (
        sa.astype(np.uint64) * np.uint64(0x1F1F1F1F) + sb.astype(np.uint64)
    )
    return (splitmix64(mix) % np.uint64(n_buckets)).astype(np.int32)


def pack_heavy_hosts(
    keys: np.ndarray, counts: np.ndarray, n_buckets: int
) -> np.ndarray:
    """Greedy work-balanced bucket assignment for heavy (but unsalted)
    hosts: pair work per host scales as count^2, and Zipf host sizes
    make hash-assigned buckets wildly uneven (measured 1ms-18.9s task
    skew across one wave — the high-width straggler). Sort by work
    descending, assign each host to the currently-lightest bucket
    (classic LPT packing, O(H log B) via a heap). Ties break on the
    lowest bucket index, matching the argmin formulation this replaces.
    Light hosts stay hash-assigned."""
    import heapq

    w = counts.astype(np.float64) ** 2
    order = np.argsort(w)[::-1]
    heap = [(0.0, b) for b in range(n_buckets)]
    out = np.empty(len(keys), dtype=np.int32)
    for i in order:
        load, b = heap[0]
        out[i] = b
        heapq.heapreplace(heap, (load + w[i], b))
    return out


def emit_pair_keys(
    batch: pa.Table, skew_ref, n_max: int, keep_gold: bool, n_buckets: int
) -> pa.Table:
    """ONE exchange row per mention (host-partitioned banding): numeric
    host key, skew membership via searchsorted against the broadcast
    host-skew arrays; only rare mega-HOST rows go through a Python
    triangle-replication loop. Emits (host_h, n_true, salt, sa, sb,
    bucket) — banding happens locally in the bucket task. The broadcast
    carries (salt keys, salt counts, packed-host keys, packed buckets):
    heavy-but-unsalted hosts take their pre-packed work-balanced bucket,
    everything else hashes."""
    from .mention_prep import get_broadcast

    bc = get_broadcast(skew_ref)
    skew_keys, skew_counts = bc[0], bc[1]
    pack_keys, pack_buckets = (
        (bc[2], bc[3]) if len(bc) > 2 else
        (np.empty(0, np.uint64), np.empty(0, np.int32))
    )
    n = batch.num_rows
    hh = _host_hashes(batch)

    if len(skew_keys):
        pos = np.searchsorted(skew_keys, hh)
        pos_c = np.minimum(pos, len(skew_keys) - 1)
        hit = skew_keys[pos_c] == hh
    else:
        hit = np.zeros(n, dtype=bool)

    ns = ~hit
    out_row = [np.nonzero(ns)[0].astype(np.int64)]
    out_hh = [hh[ns]]
    k = int(ns.sum())
    out_n = [np.zeros(k, dtype=np.int64)]
    out_salt = [np.zeros(k, dtype=np.int32)]
    out_sa = [np.zeros(k, dtype=np.int32)]
    out_sb = [np.zeros(k, dtype=np.int32)]

    # mega-host rows: Python replication loop (rare by construction)
    if hit.any():
        urls = batch["url"].to_pylist()
        r_, h_, n_, s0, a_, b_ = [], [], [], [], [], []
        for row in np.nonzero(hit)[0]:
            ntrue = int(skew_counts[pos_c[row]])
            S = math.ceil(ntrue / n_max)
            s = stable_hash64(urls[row], seed=0x5A) % S
            for i in range(S):
                a, b = (i, s) if i < s else (s, i)
                r_.append(row)
                h_.append(hh[row])
                n_.append(ntrue)
                s0.append(s)
                a_.append(a)
                b_.append(b)
        out_row.append(np.array(r_, dtype=np.int64))
        out_hh.append(np.array(h_, dtype=np.uint64))
        out_n.append(np.array(n_, dtype=np.int64))
        out_salt.append(np.array(s0, dtype=np.int32))
        out_sa.append(np.array(a_, dtype=np.int32))
        out_sb.append(np.array(b_, dtype=np.int32))

    rows = np.concatenate(out_row)
    hhs = np.concatenate(out_hh)
    ntrues = np.concatenate(out_n)
    salts = np.concatenate(out_salt)
    sas = np.concatenate(out_sa)
    sbs = np.concatenate(out_sb)

    cols = [c for c in PAYLOAD_COLS if c in batch.column_names]
    if keep_gold and "entity_id" in batch.column_names:
        cols.append("entity_id")
    out = batch.select(cols).take(pa.array(rows, pa.int64()))
    out = out.append_column("host_h", pa.array(hhs, pa.uint64()))
    out = out.append_column("n_true", pa.array(ntrues, pa.int64()))
    out = out.append_column("salt", pa.array(salts, pa.int32()))
    out = out.append_column("sa", pa.array(sas, pa.int32()))
    out = out.append_column("sb", pa.array(sbs, pa.int32()))
    # group-bucketing: the pair-gen exchange shuffles on this small int
    # key and each downstream task then processes MANY hosts in one
    # Python call (per-group map_groups overhead dominates otherwise).
    # Heavy unsalted hosts take their LPT-packed bucket (work balance);
    # the light tail and salted segments hash.
    buckets = _pair_bucket(hhs, sas, sbs, n_buckets)
    if len(pack_keys):
        ppos = np.searchsorted(pack_keys, hhs)
        ppos_c = np.minimum(ppos, len(pack_keys) - 1)
        packed = pack_keys[ppos_c] == hhs
        if packed.any():
            buckets = np.where(packed, pack_buckets[ppos_c], buckets)
    # remap logical bucket ids to hash-bijective representatives so the
    # keyed repartition lands exactly one work-packed bucket per output
    # block (rayutil.partition_reps — the raw 0..n-1 ids collide mod n
    # inside Ray's hash partitioner, idling CPUs through the score wave)
    from ..rayutil import partition_reps

    reps = np.asarray(partition_reps(n_buckets), dtype=np.int64)
    buckets = reps[buckets]
    return out.append_column("bucket", pa.array(buckets, pa.int32()))


_TRIU_CACHE: dict = {}


def _triu_cached(rows: int):
    """np.triu_indices is surprisingly expensive for the many tiny
    value-groups a segment holds — cache per group size."""
    hit = _TRIU_CACHE.get(rows)
    if hit is None:
        if len(_TRIU_CACHE) > 4096:
            _TRIU_CACHE.clear()
        hit = _TRIU_CACHE[rows] = np.triu_indices(rows, k=1)
    return hit


def _dedup_earlier_bands(x: np.ndarray, y: np.ndarray, bands: np.ndarray, b_i: int):
    """Keep only pairs whose FIRST agreeing band is b_i (cross-band
    dedup without a second shuffle)."""
    if b_i == 0 or not len(x):
        return x, y
    keep = ~(bands[x, :b_i] == bands[y, :b_i]).any(axis=1)
    return x[keep], y[keep]


def _within_band_pairs(rows: np.ndarray, bands: np.ndarray):
    """All band-agreeing pairs among ``rows`` (global indices), each pair
    exactly once (first agreeing band): per band, argsort values, run
    boundaries, cached-triu within each value group."""
    nb = bands.shape[1]
    lefts, rights = [], []
    for b_i in range(nb):
        v = bands[rows, b_i]
        o = np.argsort(v, kind="stable")
        sv = v[o]
        ch = np.nonzero(sv[1:] != sv[:-1])[0] + 1
        starts = np.concatenate([[0], ch])
        ends = np.concatenate([ch, [len(sv)]])
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            ai, bi = _triu_cached(int(g))
            x = rows[o[s + ai]]
            y = rows[o[s + bi]]
            x, y = _dedup_earlier_bands(x, y, bands, b_i)
            if len(x):
                lefts.append(x)
                rights.append(y)
    return lefts, rights


def _cross_band_pairs(A: np.ndarray, B: np.ndarray, bands: np.ndarray):
    """All band-agreeing (a in A) x (b in B) pairs, each exactly once:
    per band, match B rows into A's sorted value runs and expand with a
    vectorized range-repeat."""
    nb = bands.shape[1]
    lefts, rights = [], []
    for b_i in range(nb):
        va = bands[A, b_i]
        oa = np.argsort(va, kind="stable")
        sva = va[oa]
        ch = np.nonzero(sva[1:] != sva[:-1])[0] + 1
        starts = np.concatenate([[0], ch])
        counts = np.diff(np.concatenate([starts, [len(sva)]]))
        uvals = sva[starts]
        vb = bands[B, b_i]
        pos = np.searchsorted(uvals, vb)
        pos_c = np.minimum(pos, max(len(uvals) - 1, 0))
        hit = (uvals[pos_c] == vb) if len(uvals) else np.zeros(len(vb), bool)
        reps = np.where(hit, counts[pos_c], 0)
        total = int(reps.sum())
        if total == 0:
            continue
        b_rep = np.repeat(B, reps)
        cum = np.cumsum(reps) - reps
        offs = np.arange(total) - np.repeat(cum, reps)
        a_pos = np.repeat(starts[pos_c], reps) + offs
        x = A[oa[a_pos]]
        y = b_rep
        x, y = _dedup_earlier_bands(x, y, bands, b_i)
        if len(x):
            lefts.append(x)
            rights.append(y)
    return lefts, rights


def _bucket_pair_indices(group: pa.Table, n_max: int):
    """(left_idx, right_idx, block_sizes) for ALL host/salt segments in
    one bucket table (already combined into contiguous chunks). Segments
    are found by a numeric lexsort over (host_h, sa, sb); banding runs
    locally per segment. block_size = HOST size (the commonness/
    ambiguity analog)."""
    host_h = np.asarray(group["host_h"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    sa = np.asarray(group["sa"].to_numpy(zero_copy_only=False))
    sb = np.asarray(group["sb"].to_numpy(zero_copy_only=False))
    salt = np.asarray(group["salt"].to_numpy(zero_copy_only=False))
    n_true = np.asarray(group["n_true"].to_numpy(zero_copy_only=False))
    urls = np.asarray(group["url"].to_pylist(), dtype=object)
    bands = _bands_matrix(group)

    order = np.lexsort((sb, sa, host_h))
    h_s, a_s, b_s = host_h[order], sa[order], sb[order]
    change = np.nonzero(
        (h_s[1:] != h_s[:-1]) | (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    )[0] + 1
    bounds = np.concatenate([[0], change, [len(order)]])

    lefts, rights, sizes = [], [], []
    for s0, s1 in zip(bounds[:-1], bounds[1:]):
        seg = order[s0:s1]
        first = seg[0]
        a_id, b_id = int(sa[first]), int(sb[first])
        bsize = int(n_true[first]) if n_true[first] > 0 else len(seg)
        if a_id == b_id:
            ls, rs = _within_band_pairs(seg, bands)
        else:
            sides = salt[seg]
            ls, rs = _cross_band_pairs(
                seg[sides == a_id], seg[sides == b_id], bands
            )
        for x, y in zip(ls, rs):
            lefts.append(x)
            rights.append(y)
            sizes.append(np.full(len(x), bsize, dtype=np.int64))
    if not lefts:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    li = np.concatenate(lefts)
    ri = np.concatenate(rights)
    # canonical (url1 < url2) ordering
    flip = urls[li] > urls[ri]
    return (
        np.where(flip, ri, li),
        np.where(flip, li, ri),
        np.concatenate(sizes),
    )


def make_pairs_bucket(group: pa.Table, n_max: int = 512, keep_gold: bool = True) -> pa.Table:
    """Wide-pair variant: one row per pair with both sides' payloads.
    Used by tests and the unfused path; the production pipeline fuses
    featurization instead (make_features_bucket) so these wide rows never
    materialize at scale."""
    # hash-shuffled blocks arrive as many tiny chunks; contiguous memory
    # first, or every take() below pays per-chunk overhead
    group = group.combine_chunks()
    left_idx, right_idx, sizes = _bucket_pair_indices(group, n_max)

    with_label = keep_gold and "entity_id" in group.column_names
    if not len(left_idx):
        return _empty_pairs(with_label, group)
    li = pa.array(left_idx, pa.int64())
    ri = pa.array(right_idx, pa.int64())
    cols: dict[str, pa.Array] = {}
    present = [c for c in PAYLOAD_COLS if c != "bands" and c in group.column_names]
    for side, idx in (("1", li), ("2", ri)):
        for c in present:
            cols[f"{c}_{side}"] = group[c].take(idx)
    cols["block_size"] = pa.array(sizes, pa.int64())
    if with_label:
        ents = np.asarray(group["entity_id"].to_pylist(), dtype=object)
        cols["label"] = pa.array(
            (ents[left_idx] == ents[right_idx]).astype(np.int8), pa.int8()
        )
    return pa.Table.from_pydict(cols)


def make_features_bucket(
    group: pa.Table,
    n_max: int = 512,
    keep_gold: bool = True,
    model_ref=None,
    prune_hamming: int | None = None,
    idf_ref=None,
) -> pa.Table:
    """Fused pair-gen + featurization (+ optional scoring): emits
    (url_1, url_2, label?, feature columns[, score]) directly from the
    bucket's mention rows — the 16KB-per-pair payload rows of the unfused
    path never exist (SURVEY.md §7.4 'wide pair rows'). With a broadcast
    ``model_ref`` the GBT scores in the same task (production path: one
    exchange, one pass, pairs -> scored edges).

    ``prune_hamming``: the classic ER cascade's cheap filter — candidate
    pairs whose full-64-bit simhash Hamming distance exceeds it are
    dropped BEFORE the expensive string/set kernels (one vectorized
    popcount pass). Near-dup positives sit at d<=12 on the synthetic
    corpus while band-collision negatives centre at d~19, so 16 trades
    ~70% of junk featurization for zero positive loss THERE — but the
    zero-loss claim is corpus-tuned, so the generic API defaults to
    None (no silent recall loss); the ER entrypoint opts in
    (run_er_pipeline(prune_hamming=16))."""
    from ..functions.simhash import hamming64_arrays
    from .features import append_scores, empty_features, features_from_indices, model_from_ref

    group = group.combine_chunks()
    left_idx, right_idx, sizes = _bucket_pair_indices(group, n_max)
    if prune_hamming is not None and len(left_idx):
        sh = np.asarray(
            group["simhash"].to_numpy(zero_copy_only=False), dtype=np.uint64
        )
        keep = hamming64_arrays(sh[left_idx], sh[right_idx]) <= prune_hamming
        left_idx, right_idx, sizes = left_idx[keep], right_idx[keep], sizes[keep]
    with_label = keep_gold and "entity_id" in group.column_names
    if not len(left_idx):
        out = empty_features(with_label)
    else:
        labels = None
        if with_label:
            ents = np.asarray(group["entity_id"].to_pylist(), dtype=object)
            labels = (ents[left_idx] == ents[right_idx]).astype(np.int8)
        idf = None
        if idf_ref is not None and "tfidf_pk" in group.column_names:
            from .mention_prep import get_broadcast

            idf = get_broadcast(idf_ref)  # ndarray passes through
        out = features_from_indices(
            group, left_idx, right_idx, sizes, labels, idf=idf
        )
    if model_ref is not None:
        out = append_scores(out, model_from_ref(model_ref))
    return out


def _empty_pairs(with_label: bool, group: pa.Table) -> pa.Table:
    fields = []
    present = [c for c in PAYLOAD_COLS if c != "bands" and c in group.column_names]
    for side in ("1", "2"):
        for c in present:
            fields.append(pa.field(f"{c}_{side}", group.schema.field(c).type))
    fields.append(pa.field("block_size", pa.int64()))
    if with_label:
        fields.append(pa.field("label", pa.int8()))
    return pa.Table.from_pydict({f.name: pa.array([], f.type) for f in fields})


_TESTED_RAY_MINOR = ("2.49",)
_version_warned = False


def _check_block_integrity_assumption() -> None:
    """Pair generation requires each hash partition to arrive as ONE
    map_batches batch (batch_size=None + one block per partition — true
    in Ray 2.49's hash-shuffle finalize). Ray's source carries a TODO to
    split oversized partition blocks, which would silently break
    pair_key groups, so fail LOUDLY on an untested Ray minor."""
    global _version_warned
    import ray

    if _version_warned:
        return
    _version_warned = True
    if not any(ray.__version__.startswith(v) for v in _TESTED_RAY_MINOR):
        import warnings

        warnings.warn(
            f"ray {ray.__version__} not validated for one-block-per-"
            "hash-partition pair generation; re-verify with "
            "tests/test_pairs.py brute-force oracles before trusting "
            "pair counts",
            RuntimeWarning,
        )


def _keyed_buckets(mentions_ds, n_max: int, keep_gold: bool):
    """mentions -> salted/banded pair_key rows, hash-exchanged on the
    bucket key so WHOLE blocks hold complete pair_key groups (a plain
    map_batches over full blocks replaces groupby().map_groups and its
    per-group call overhead)."""
    import ray

    from ..rayutil import known_size

    _check_block_integrity_assumption()

    n_rows, n_bytes = known_size(mentions_ds)
    n_buckets = n_pair_buckets(n_rows=n_rows, n_bytes=n_bytes)

    # ONE census pass at the balance threshold serves two consumers:
    # hosts > n_max get triangle-salted (memory/coverage), hosts in
    # (balance_min, n_max] get LPT work-packing across buckets (their
    # count^2 pair work is what skews a hash assignment)
    balance_min = min(n_max, max(64, n_max // 8))  # never above n_max:
    # the census must still surface every host that needs salting
    keys, counts = skew_table_fast(mentions_ds, balance_min)
    salt = counts > n_max
    pack_keys, pack_counts = keys[~salt], counts[~salt]
    skew = (
        keys[salt],
        counts[salt],
        pack_keys,
        pack_heavy_hosts(pack_keys, pack_counts, n_buckets),
    )
    skew_ref = ray.put(skew)
    keyed = mentions_ds.map_batches(
        emit_pair_keys,
        fn_kwargs={
            "skew_ref": skew_ref,
            "n_max": n_max,
            "keep_gold": keep_gold,
            "n_buckets": n_buckets,
        },
        batch_format="pyarrow",
    )
    return keyed.repartition(num_blocks=n_buckets, keys=["bucket"])


def generate_pairs(mentions_ds, n_max: int = 512, keep_gold: bool = True):
    """mentions -> canonical labeled candidate pairs WITH payloads (one
    hash-shuffle). Use generate_pair_features for the fused scale path."""
    return _keyed_buckets(mentions_ds, n_max, keep_gold).map_batches(
        lambda g: make_pairs_bucket(g, n_max=n_max, keep_gold=keep_gold),
        batch_format="pyarrow",
        batch_size=None,  # one batch == one whole hash partition block
    )


def generate_pair_features(
    mentions_ds,
    n_max: int = 512,
    keep_gold: bool = True,
    model_ref=None,
    prune_hamming: int | None = None,
    idf_ref=None,
):
    """mentions -> per-pair FEATURE rows directly (fused pair-gen +
    featurize; wide pair payloads never materialize). With ``model_ref``
    the rows come back scored too. ``prune_hamming``: see
    make_features_bucket (cheap cascade filter; default off — opt in
    from corpus-tuned entrypoints)."""
    return _keyed_buckets(mentions_ds, n_max, keep_gold).map_batches(
        lambda g: make_features_bucket(
            g,
            n_max=n_max,
            keep_gold=keep_gold,
            model_ref=model_ref,
            prune_hamming=prune_hamming,
            idf_ref=idf_ref,
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

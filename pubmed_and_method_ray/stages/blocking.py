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
- ONE all-to-all shuffle: ``groupby(pair_key)``. The census groupby runs
  on (host, band, value) strings only — tiny rows.
- Mega-block salting with EXACT C(n,2) coverage: a block of size n >
  n_max is split into S = ceil(n/n_max) salt groups by a stable hash of
  the url; each mention is re-emitted to every group pair (i,j) with
  i <= j that contains its salt — the classic triangle-join replication
  (S rows per mention). Group (i,i) emits within-pairs, (i,j) emits
  cross-pairs only, so the union is exactly C(n,2), no duplicates.
- Cross-band dedup WITHOUT a second shuffle: a pair that agrees on
  several bands would be emitted once per band; instead each group
  emits the pair only when its band index equals the SMALLEST band index
  on which the two mentions agree (both sides' band vectors are in the
  group). Canonical (url1 < url2) ordering mirrors the reference's
  ``arraySort([id1,id2])`` rule (database/and_datasets.sql:62-68).
- The true (un-salted) block size rides inside the key string, so the
  ambiguity feature (analog of the commonness join at
  database/pubmed_inner_outer_feature.sql:201-203) needs no extra join.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64
from ..rayutil import shuffle_partitions
from ..functions.simhash import DEFAULT_BANDS as N_BANDS

def n_pair_buckets() -> int:
    """Hash-exchange partition count for pair generation: one per CPU —
    full downstream task parallelism; more than that only adds hash
    aggregator-actor churn on a single node (measured: 32 partitions
    4.6s vs 64 partitions 7.8s on the same exchange)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(64, cpus))

PAYLOAD_COLS = [
    "url",
    "title",
    "path",
    "lang",
    "ts_us",
    "simhash",
    "bands",
    "tok_hashes",
    "sh_hashes",
    "tfidf_idx",
    "tfidf_w",
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
    Exact shuffle version (the 10^12-key scale path)."""
    return (
        mentions_ds.map_batches(emit_block_keys, batch_format="pyarrow")
        .groupby("block_key", num_partitions=shuffle_partitions())
        .count()
    )


def _census_partials(batch: pa.Table, sample_mod: int = 1) -> pa.Table:
    """Per-batch partial key counts (pre-aggregation, SURVEY.md §4).
    ``sample_mod`` > 1 counts a deterministic 1/mod mention sample."""
    from collections import Counter

    hosts = batch["host"].to_pylist()
    bands = batch["bands"].to_pylist()
    if sample_mod > 1:
        urls = batch["url"].to_pylist()
        keep = [stable_hash64(u, seed=0xCE) % sample_mod == 0 for u in urls]
        hosts = [h for h, k in zip(hosts, keep) if k]
        bands = [b for b, k in zip(bands, keep) if k]
    c = Counter(k for h, bs in zip(hosts, bands) for k in _base_keys(h, bs))
    return pa.Table.from_pydict(
        {
            "block_key": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def skew_table_fast(mentions_ds, n_max: int, sample_mod: int = 8) -> dict:
    """Skew census on a deterministic 1/sample_mod mention sample, scaled
    back up. SAFE approximation: salting is a load-balancing device —
    pair coverage is exact with or without it — and a block big enough to
    need salting (n > n_max >= 128) puts ~n/mod >= 16 mentions in the
    sample, so the heavy tail is detected reliably. Driver merge is 8x
    faster than a hash-shuffle groupby at this key cardinality; beyond
    ~10^8 distinct sampled keys use skew_table(block_census(ds), n_max)."""
    totals: dict[str, int] = {}
    parts = mentions_ds.map_batches(
        _census_partials, fn_kwargs={"sample_mod": sample_mod}, batch_format="pyarrow"
    )
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=262144):
        for k, n in zip(b["block_key"].to_pylist(), b["n"].to_pylist()):
            totals[k] = totals.get(k, 0) + n
    return {
        k: n * sample_mod for k, n in totals.items() if n * sample_mod > n_max
    }


def skew_table(census_ds, n_max: int) -> dict:
    """Collect ONLY the skewed tail (blocks with n > n_max) to the driver —
    small by construction; broadcast via ray.put by the caller."""
    import pyarrow.compute as pc

    skew = {}
    for b in census_ds.iter_batches(batch_format="pyarrow", batch_size=65536):
        mask = pc.greater(b["count()"], n_max)
        t = b.filter(mask)
        for k, n in zip(t["block_key"].to_pylist(), t["count()"].to_pylist()):
            skew[k] = int(n)
    return skew


def emit_pair_keys(
    batch: pa.Table, skew_ref, n_max: int, keep_gold: bool, n_buckets: int
) -> pa.Table:
    """Replicate each mention to its (possibly salted) pair-generation
    groups: ``pair_key = base#n#i_j``. Task-based: the broadcast skew
    dict is fetched once per worker (get_broadcast cache)."""
    from .mention_prep import get_broadcast

    skew = get_broadcast(skew_ref) or {}
    hosts = batch["host"].to_pylist()
    bands = batch["bands"].to_pylist()
    urls = batch["url"].to_pylist()
    keys: list[str] = []
    take_idx: list[int] = []
    for row, (h, bs, u) in enumerate(zip(hosts, bands, urls)):
        for base in _base_keys(h, bs):
            n = skew.get(base)
            if n is None:
                keys.append(f"{base}#0#0_0")
                take_idx.append(row)
            else:
                S = math.ceil(n / n_max)
                s = stable_hash64(u, seed=0x5A) % S
                for i in range(S):
                    a, b = (i, s) if i < s else (s, i)
                    keys.append(f"{base}#{n}#{a}_{b}")
                    take_idx.append(row)
    cols = [c for c in PAYLOAD_COLS if c in batch.column_names]
    if keep_gold and "entity_id" in batch.column_names:
        cols.append("entity_id")
    out = batch.select(cols).take(pa.array(take_idx, pa.int64()))
    out = out.append_column("pair_key", pa.array(keys, pa.string()))
    # group-bucketing: the pair-gen exchange shuffles on this small int
    # key and each downstream task then processes MANY blocks in one
    # Python call (per-group map_groups overhead dominates otherwise)
    import zlib

    buckets = pa.array(
        [zlib.crc32(k.encode()) % n_buckets for k in keys], pa.int32()
    )
    return out.append_column("bucket", buckets)


def _segment_pairs(key: str, seg: np.ndarray, urls: np.ndarray, bands: np.ndarray,
                   n_max: int):
    """Pair indices for ONE pair-key segment (global row indices in the
    bucket table). Returns (left_idx, right_idx, block_size)."""
    base, n_enc, ij = key.rsplit("#", 2)
    band_idx = int(base.rsplit("|", 2)[1])
    n_true = int(n_enc)
    i_salt, j_salt = (int(x) for x in ij.split("_"))
    rows = len(seg)
    seg_urls = urls[seg]

    if n_true > 0:
        S = math.ceil(n_true / n_max)
        salts = np.fromiter(
            (stable_hash64(u, seed=0x5A) % S for u in seg_urls),
            dtype=np.int64,
            count=rows,
        )
        block_size = n_true
    else:
        salts = np.zeros(rows, dtype=np.int64)
        i_salt = j_salt = 0
        block_size = rows

    ai, bi = np.triu_indices(rows, k=1)
    sa, sb = salts[ai], salts[bi]
    if i_salt == j_salt:
        keep = (sa == i_salt) & (sb == i_salt)
    else:
        keep = ((sa == i_salt) & (sb == j_salt)) | ((sa == j_salt) & (sb == i_salt))
    ai, bi = ai[keep], bi[keep]
    if len(ai):
        # cross-band dedup: emit only in the first agreeing band
        eq = bands[seg[ai]] == bands[seg[bi]]  # (P, NB)
        first_band = np.argmax(eq, axis=1)
        keep2 = eq.any(axis=1) & (first_band == band_idx)
        ai, bi = ai[keep2], bi[keep2]
    if not len(ai):
        z = np.empty(0, dtype=np.int64)
        return z, z, block_size
    ga, gb = seg[ai], seg[bi]
    flip = urls[ga] > urls[gb]
    return np.where(flip, gb, ga), np.where(flip, ga, gb), block_size


def _split_bucket_blocks(part: pa.Table, n_splits: int):
    """Slice one exchanged partition into ~n_splits blocks WITHOUT
    breaking pair_key groups (sorted by key, cut at group boundaries).
    Emitted as a generator so Ray Data treats each slice as its own block
    and downstream feature tasks fan out across all CPUs."""
    part = part.combine_chunks()
    if n_splits <= 1 or part.num_rows == 0:
        yield part
        return
    keys = np.asarray(part["pair_key"].to_pylist(), dtype=object)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    # group boundary positions in the sorted view
    change = np.nonzero(sorted_keys[1:] != sorted_keys[:-1])[0] + 1
    bounds = np.concatenate([[0], change, [len(sorted_keys)]])
    targets = np.linspace(0, len(sorted_keys), n_splits + 1)[1:-1]
    cut_idx = np.unique(bounds[np.searchsorted(bounds, targets)])
    cuts = [0, *[int(c) for c in cut_idx], len(sorted_keys)]
    for a, b in zip(cuts[:-1], cuts[1:]):
        if b > a:
            yield part.take(pa.array(order[a:b], pa.int64()))


def _bucket_pair_indices(group: pa.Table, n_max: int):
    """(left_idx, right_idx, block_sizes) for ALL pair-key segments in one
    bucket table (already combined into contiguous chunks)."""
    keys = np.asarray(group["pair_key"].to_pylist(), dtype=object)
    urls = np.asarray(group["url"].to_pylist(), dtype=object)
    bands = np.asarray(group["bands"].to_pylist(), dtype=np.uint64)

    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    uniq, starts = np.unique(sorted_keys, return_index=True)
    bounds = list(starts) + [len(sorted_keys)]

    lefts, rights, sizes = [], [], []
    for si, key in enumerate(uniq):
        seg = order[bounds[si] : bounds[si + 1]]
        li, ri, bsize = _segment_pairs(key, seg, urls, bands, n_max)
        if len(li):
            lefts.append(li)
            rights.append(ri)
            sizes.append(np.full(len(li), bsize, dtype=np.int64))
    if not lefts:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    return (
        np.concatenate(lefts),
        np.concatenate(rights),
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
) -> pa.Table:
    """Fused pair-gen + featurization (+ optional scoring): emits
    (url_1, url_2, label?, feature columns[, score]) directly from the
    bucket's mention rows — the 16KB-per-pair payload rows of the unfused
    path never exist (SURVEY.md §7.4 'wide pair rows'). With a broadcast
    ``model_ref`` the GBT scores in the same task (production path: one
    exchange, one pass, pairs -> scored edges)."""
    from .features import append_scores, empty_features, features_from_indices, model_from_ref

    group = group.combine_chunks()
    left_idx, right_idx, sizes = _bucket_pair_indices(group, n_max)
    with_label = keep_gold and "entity_id" in group.column_names
    if not len(left_idx):
        out = empty_features(with_label)
    else:
        labels = None
        if with_label:
            ents = np.asarray(group["entity_id"].to_pylist(), dtype=object)
            labels = (ents[left_idx] == ents[right_idx]).astype(np.int8)
        out = features_from_indices(group, left_idx, right_idx, sizes, labels)
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

    _check_block_integrity_assumption()

    skew = skew_table_fast(mentions_ds, n_max)
    skew_ref = ray.put(skew)
    n_buckets = n_pair_buckets()
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
    mentions_ds, n_max: int = 512, keep_gold: bool = True, model_ref=None
):
    """mentions -> per-pair FEATURE rows directly (fused pair-gen +
    featurize; wide pair payloads never materialize). With ``model_ref``
    the rows come back scored too."""
    return _keyed_buckets(mentions_ds, n_max, keep_gold).map_batches(
        lambda g: make_features_bucket(
            g, n_max=n_max, keep_gold=keep_gold, model_ref=model_ref
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

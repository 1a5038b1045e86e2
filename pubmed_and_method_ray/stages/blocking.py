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
    """Hash-exchange partition count for pair generation: ~2 per CPU
    (hash-shuffle aggregators are actors; far more partitions than CPUs
    starves the pool on small clusters, far fewer underuses big ones)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(256, 2 * cpus))

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
    """groupby(block_key).count() — the commonness census (SURVEY.md A1)."""
    return (
        mentions_ds.map_batches(emit_block_keys, batch_format="pyarrow")
        .groupby("block_key", num_partitions=shuffle_partitions())
        .count()
    )


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


class EmitPairKeys:
    """Replicate each mention to its (possibly salted) pair-generation
    groups: ``pair_key = base#n#i_j``. Stateless per row but holds the
    broadcast skew dict, hence an actor-pool stage."""

    def __init__(self, skew_ref, n_max: int, keep_gold: bool, n_buckets: int):
        import ray

        self.skew = ray.get(skew_ref) if skew_ref is not None else {}
        self.n_max = n_max
        self.keep_gold = keep_gold
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_pylist()
        bands = batch["bands"].to_pylist()
        urls = batch["url"].to_pylist()
        keys: list[str] = []
        take_idx: list[int] = []
        for row, (h, bs, u) in enumerate(zip(hosts, bands, urls)):
            for base in _base_keys(h, bs):
                n = self.skew.get(base)
                if n is None:
                    keys.append(f"{base}#0#0_0")
                    take_idx.append(row)
                else:
                    S = math.ceil(n / self.n_max)
                    s = stable_hash64(u, seed=0x5A) % S
                    for i in range(S):
                        a, b = (i, s) if i < s else (s, i)
                        keys.append(f"{base}#{n}#{a}_{b}")
                        take_idx.append(row)
        cols = [c for c in PAYLOAD_COLS if c in batch.column_names]
        if self.keep_gold and "entity_id" in batch.column_names:
            cols.append("entity_id")
        out = batch.select(cols).take(pa.array(take_idx, pa.int64()))
        out = out.append_column("pair_key", pa.array(keys, pa.string()))
        # group-bucketing: the pair-gen groupby shuffles on this small int
        # key and each task then processes MANY blocks in one Python call
        # (per-group map_groups overhead dominates otherwise)
        import zlib

        buckets = pa.array(
            [zlib.crc32(k.encode()) % self.n_buckets for k in keys], pa.int32()
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


def make_features_bucket(group: pa.Table, n_max: int = 512, keep_gold: bool = True) -> pa.Table:
    """Fused pair-gen + featurization: emits (url_1, url_2, label?,
    feature columns) directly from the bucket's mention rows — the
    16KB-per-pair payload rows of the unfused path never exist
    (SURVEY.md §7.4 'wide pair rows')."""
    from .features import empty_features, features_from_indices

    group = group.combine_chunks()
    left_idx, right_idx, sizes = _bucket_pair_indices(group, n_max)
    with_label = keep_gold and "entity_id" in group.column_names
    if not len(left_idx):
        return empty_features(with_label)
    labels = None
    if with_label:
        ents = np.asarray(group["entity_id"].to_pylist(), dtype=object)
        labels = (ents[left_idx] == ents[right_idx]).astype(np.int8)
    return features_from_indices(group, left_idx, right_idx, sizes, labels)


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


def _keyed_buckets(mentions_ds, n_max: int, keep_gold: bool):
    """mentions -> salted/banded pair_key rows, hash-exchanged on the
    bucket key so WHOLE blocks hold complete pair_key groups (a plain
    map_batches over full blocks replaces groupby().map_groups and its
    per-group call overhead)."""
    import ray

    census = block_census(mentions_ds)
    skew = skew_table(census, n_max)
    skew_ref = ray.put(skew)
    n_buckets = n_pair_buckets()
    keyed = mentions_ds.map_batches(
        EmitPairKeys,
        fn_constructor_kwargs={
            "skew_ref": skew_ref,
            "n_max": n_max,
            "keep_gold": keep_gold,
            "n_buckets": n_buckets,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
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


def generate_pair_features(mentions_ds, n_max: int = 512, keep_gold: bool = True):
    """mentions -> per-pair FEATURE rows directly (fused pair-gen +
    featurize; wide pair payloads never materialize)."""
    return _keyed_buckets(mentions_ds, n_max, keep_gold).map_batches(
        lambda g: make_features_bucket(g, n_max=n_max, keep_gold=keep_gold),
        batch_format="pyarrow",
        batch_size=None,
    )

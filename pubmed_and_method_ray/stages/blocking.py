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
from ..functions.simhash import DEFAULT_BANDS as N_BANDS

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
        .groupby("block_key")
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

    def __init__(self, skew_ref, n_max: int, keep_gold: bool):
        import ray

        self.skew = ray.get(skew_ref) if skew_ref is not None else {}
        self.n_max = n_max
        self.keep_gold = keep_gold

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
        return out.append_column("pair_key", pa.array(keys, pa.string()))


def make_pairs_group(group: pa.Table, n_max: int = 512, keep_gold: bool = True) -> pa.Table:
    """All C(n,2) pairs of one pair-key group, canonical url1<url2, with
    cross-band and cross-salt exact dedup (see module docstring)."""
    key = group["pair_key"][0].as_py()
    base, n_enc, ij = key.rsplit("#", 2)
    band_idx = int(base.rsplit("|", 2)[1])
    n_true = int(n_enc)
    i_salt, j_salt = (int(x) for x in ij.split("_"))
    rows = group.num_rows

    urls = group["url"].to_pylist()
    bands = group["bands"].to_pylist()

    if n_true > 0:
        S = math.ceil(n_true / n_max)
        salts = [stable_hash64(u, seed=0x5A) % S for u in urls]
        block_size = n_true
    else:
        salts = [0] * rows
        i_salt = j_salt = 0
        block_size = rows

    left_idx, right_idx = [], []
    for a in range(rows - 1):
        for b in range(a + 1, rows):
            sa, sb = salts[a], salts[b]
            if i_salt == j_salt:
                if not (sa == i_salt and sb == i_salt):
                    continue
            else:
                if not ((sa == i_salt and sb == j_salt) or (sa == j_salt and sb == i_salt)):
                    continue
            # cross-band dedup: emit only in the first agreeing band
            ba, bb = bands[a], bands[b]
            first_band = next((k for k in range(N_BANDS) if ba[k] == bb[k]), None)
            if first_band != band_idx:
                continue
            if urls[a] < urls[b]:
                left_idx.append(a)
                right_idx.append(b)
            else:
                left_idx.append(b)
                right_idx.append(a)

    cols: dict[str, pa.Array] = {}
    li = pa.array(left_idx, pa.int64())
    ri = pa.array(right_idx, pa.int64())
    present = [c for c in PAYLOAD_COLS if c != "bands" and c in group.column_names]
    for side, idx in (("1", li), ("2", ri)):
        for c in present:
            cols[f"{c}_{side}"] = group[c].take(idx)
    n_pairs = len(left_idx)
    cols["block_size"] = pa.array([block_size] * n_pairs, pa.int64())
    if keep_gold and "entity_id" in group.column_names:
        e1 = group["entity_id"].take(li).to_pylist()
        e2 = group["entity_id"].take(ri).to_pylist()
        cols["label"] = pa.array(
            [1 if x == y else 0 for x, y in zip(e1, e2)], pa.int8()
        )
    return pa.Table.from_pydict(cols) if n_pairs else _empty_pairs(keep_gold and "entity_id" in group.column_names, group)


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


def generate_pairs(mentions_ds, n_max: int = 512, keep_gold: bool = True):
    """mentions -> canonical labeled candidate pairs (the one big shuffle)."""
    import ray

    census = block_census(mentions_ds)
    skew = skew_table(census, n_max)
    skew_ref = ray.put(skew)
    keyed = mentions_ds.map_batches(
        EmitPairKeys,
        fn_constructor_kwargs={
            "skew_ref": skew_ref,
            "n_max": n_max,
            "keep_gold": keep_gold,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    return keyed.groupby("pair_key").map_groups(
        lambda g: make_pairs_group(g, n_max=n_max, keep_gold=keep_gold),
        batch_format="pyarrow",
    )

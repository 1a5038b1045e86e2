"""Deduplication operators over the ``documents`` table.

The reference's dedup surface is exact-key only (SURVEY.md §2.7 D1-D4:
``arrayDistinct`` / ``groupUniqArray`` / canonical-pair dedup at
/root/reference/database/and_datasets.sql:62-68); the near-dup family
(MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine) is the
training-data-pipeline extension this engine adds as first-class
operators.

Token semantics for the SQL-oracle-checked ops are deliberately simple
and *identical* on both sides: ``distinct(split(lower(text), ' '))`` —
jaccard is then a ratio of integer counts, so the float is bit-identical
between Ray and DuckDB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.simhash import minhash_signature, simhash64
from ..rayutil import shuffle_partitions


def _read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _token_set(text: str) -> set[str]:
    return set((text or "").lower().split(" "))


# -- exact dedup (D2/D4 analog): hash-partition + per-group min ------------

def dedup_exact(sf_dir: str):
    """One surviving doc_id (the min) per distinct text.
    Ray shape: vectorized content-hash map_batches -> groupby(hash) ->
    per-group min. Oracle: GROUP BY md5(text)."""
    import pyarrow.compute as pc

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((x or "").encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"text_hash": pa.array(hashes, pa.string()), "doc_id": t["doc_id"]}
        )

    from ray.data.aggregate import Min

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_hash", num_partitions=shuffle_partitions())
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


# -- within-block pair jaccard (the oracle-checked near-dup kernel) --------

def _pairs_with_jaccard(group, threshold: float | None):
    ids = group["doc_id"].to_pylist()
    toks = [_token_set(x) for x in group["text"].to_pylist()]
    lang = group["lang"][0].as_py()
    source = group["source"][0].as_py()
    id1, id2, jac = [], [], []
    order = np.argsort(np.asarray(ids, dtype=np.int64))
    for ai in range(len(order) - 1):
        a = order[ai]
        for bi in range(ai + 1, len(order)):
            b = order[bi]
            inter = len(toks[a] & toks[b])
            union = len(toks[a] | toks[b])
            j = inter / union if union else 0.0
            if threshold is None or j >= threshold:
                id1.append(ids[a])
                id2.append(ids[b])
                jac.append(j)
    return pa.Table.from_pydict(
        {
            "doc_id1": pa.array(id1, pa.int64()),
            "doc_id2": pa.array(id2, pa.int64()),
            "lang": pa.array([lang] * len(id1), pa.string()),
            "source": pa.array([source] * len(id1), pa.string()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


def pair_jaccard_docs(sf_dir: str, threshold: float | None = None):
    """All C(n,2) doc pairs within (lang, source) blocks with token-set
    jaccard — the reference's block pair-gen (and_datasets.sql:44-79)
    fused with its jaccard kernel (string_utils.py:99-109)."""
    ds = _read_documents(sf_dir, columns=["doc_id", "text", "lang", "source"])
    return ds.groupby(["lang", "source"], num_partitions=shuffle_partitions()).map_groups(
        lambda g: _pairs_with_jaccard(g, threshold), batch_format="pyarrow"
    )


def dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.6):
    """Near-dup pairs: jaccard >= threshold within (lang, source) blocks."""
    return pair_jaccard_docs(sf_dir, threshold=threshold)


# -- MinHash + LSH near-dup (banding -> bucket groupby -> verify) ----------

class _MinhashEmitter:
    """Actor: token 3-shingles -> minhash -> (band_key, doc payload) rows.

    Shingles, not unigram tokens: corpora with a shared small vocabulary
    make every doc-pair's TOKEN jaccard high (bucket explosion), while
    shingle sets are order-sensitive and distinctive — the standard
    MMDS ch.3 construction."""

    def __init__(self, num_perm: int = 64, n_bands: int = 16, shingle_k: int = 3):
        self.num_perm = num_perm
        self.n_bands = n_bands
        self.shingle_k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64_array
        from ..functions.simhash import minhash_from_hashes
        from ..functions.textkernels import token_shingles

        rows = self.num_perm // self.n_bands
        keys, ids, shs = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            tokens = (text or "").lower().split(" ")
            grams = token_shingles(tokens, self.shingle_k)
            # md5-based gram hashes (== DuckDB md5_number_upper) + literal
            # signature-value band keys: the whole LSH construction is
            # reproducible by the splitmix64-in-SQL oracle
            sh = (
                np.unique(md5_u64_array(grams))
                if grams
                else np.empty(0, np.uint64)
            )
            sig = minhash_from_hashes(sh, self.num_perm)
            for b in range(self.n_bands):
                band = sig[b * rows : (b + 1) * rows]
                keys.append(f"b{b}:" + ",".join(str(int(v)) for v in band))
                ids.append(doc_id)
                shs.append(sh.tolist())
        return pa.Table.from_pydict(
            {
                "band_key": pa.array(keys, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "sh": pa.array(shs, pa.list_(pa.uint64())),
            }
        )


def _bucket_pairs(group: pa.Table) -> pa.Table:
    group = group.combine_chunks()
    ids = group["doc_id"].to_pylist()
    arr = group["sh"].combine_chunks() if isinstance(group["sh"], pa.ChunkedArray) else group["sh"]
    off = np.asarray(arr.offsets)
    vals = arr.values.to_numpy(zero_copy_only=False)
    order = np.argsort(np.asarray(ids, dtype=np.int64))
    id1, id2, jac = [], [], []
    seen = set()
    for ai in range(len(order) - 1):
        a = order[ai]
        sa = vals[off[a] : off[a + 1]]
        for bi in range(ai + 1, len(order)):
            b = order[bi]
            key = (ids[a], ids[b])
            if key in seen or ids[a] == ids[b]:
                continue
            seen.add(key)
            sb = vals[off[b] : off[b + 1]]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            id1.append(key[0])
            id2.append(key[1])
            jac.append(j)
    return pa.Table.from_pydict(
        {
            "doc_id1": pa.array(id1, pa.int64()),
            "doc_id2": pa.array(id2, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


def dedup_minhash_lsh(sf_dir: str, threshold: float = 0.8, num_perm: int = 64, n_bands: int = 16):
    """MinHash-LSH near-dup over token 3-shingles: shingle -> minhash ->
    band bucket groupby -> candidate pairs -> exact shingle-jaccard verify
    -> canonical dedup. (The scale path: candidates ≪ C(n,2); only band
    buckets shuffle.)"""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    cands = (
        ds.map_batches(
            _MinhashEmitter,
            fn_constructor_kwargs={"num_perm": num_perm, "n_bands": n_bands},
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("band_key", num_partitions=shuffle_partitions())
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    verified = cands.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], threshold)),
        batch_format="pyarrow",
    )

    # canonical dedup across buckets: one row per pair
    def pair_key(t: pa.Table) -> pa.Table:
        k = [f"{a}:{b}" for a, b in zip(t["doc_id1"].to_pylist(), t["doc_id2"].to_pylist())]
        return t.append_column("pk", pa.array(k, pa.string()))

    return (
        verified.map_batches(pair_key, batch_format="pyarrow")
        .groupby("pk", num_partitions=shuffle_partitions())
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .drop_columns(["pk"])
    )


# -- SimHash near-dup ------------------------------------------------------

def dedup_simhash(sf_dir: str):
    """Exact-simhash duplicate groups: docs whose token simhash collides.
    Output: (simhash_hex, n_docs, doc_ids csv sorted). Token hashes are
    md5_u64 (== DuckDB md5_number_upper) so the SQL oracle recomputes the
    same 64-bit sketch bit-for-bit."""
    from ..functions.hashing import md5_u64_array
    from ..functions.simhash import simhash_from_hashes

    def add_simhash(t: pa.Table) -> pa.Table:
        hs = [
            f"{simhash_from_hashes(md5_u64_array((x or '').lower().split(' '))):016x}"
            for x in t["text"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {"simhash": pa.array(hs, pa.string()), "doc_id": t["doc_id"]}
        )

    def collect(g: pa.Table) -> pa.Table:
        ids = sorted(g["doc_id"].to_pylist())
        return pa.Table.from_pydict(
            {
                "simhash": pa.array([g["simhash"][0].as_py()], pa.string()),
                "n_docs": pa.array([len(ids)], pa.int64()),
                "doc_ids": pa.array([",".join(map(str, ids))], pa.string()),
            }
        )

    ds = _read_documents(sf_dir, columns=["doc_id", "text"])
    return (
        ds.map_batches(add_simhash, batch_format="pyarrow")
        .groupby("simhash", num_partitions=shuffle_partitions())
        .map_groups(collect, batch_format="pyarrow")
    )


# -- embedding cosine near-dup --------------------------------------------

def dedup_embedding_cosine(sf_dir: str, threshold: float = 0.3):
    """Pairs of embeddings with cosine >= threshold. Ray shape: broadcast
    the (small-side) full matrix once via ray.put, per-batch numpy matmul
    (the 100-TB path replaces the broadcast with IVF/LSH bucketing —
    see similarity.ann_topk_lsh)."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    tbl = emb.to_pandas()
    ids_all = tbl["vec_id"].to_numpy(dtype=np.int64)
    M = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids_all, M))

    class CosPairs:
        def __init__(self):
            self.ids_all, self.M = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            V = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = V @ self.M.T  # (batch, all)
            out1, out2, cs = [], [], []
            for r in range(len(ids)):
                mask = (sims[r] >= threshold) & (self.ids_all > ids[r])
                for j in np.nonzero(mask)[0]:
                    out1.append(int(ids[r]))
                    out2.append(int(self.ids_all[j]))
                    cs.append(round(float(sims[r, j]), 9))
            return pa.Table.from_pydict(
                {
                    "vec_id1": pa.array(out1, pa.int64()),
                    "vec_id2": pa.array(out2, pa.int64()),
                    "cos_sim": pa.array(cs, pa.float64()),
                }
            )

    return emb.map_batches(CosPairs, batch_format="pyarrow", batch_size=256, concurrency=(1, 4))

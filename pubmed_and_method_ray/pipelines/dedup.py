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

def pair_jaccard_docs(sf_dir: str, threshold: float | None = None, n_max: int = 1024):
    """All C(n,2) doc pairs within (lang, source) blocks with token-set
    jaccard — the reference's block pair-gen (and_datasets.sql:44-79)
    fused with its jaccard kernel (string_utils.py:99-109).

    Scale shape: token sets hash ONCE per doc (sorted-unique uint64
    arrays), pair intersections run on the searchsorted kernels from
    stages/features.py (no Python sets in the pair loop), and blocks
    larger than ``n_max`` are salted with the exact triangle-join
    replication from stages/blocking.py so one mega (lang, source)
    block fans out across the cluster instead of pinning one task."""
    import math

    import ray

    from ray.data.aggregate import Count

    from ..functions.hashing import hash64_array

    ds = _read_documents(sf_dir, columns=["doc_id", "text", "lang", "source"])

    # block census: (lang, source) cardinality is bounded (langs x
    # sources), so the skew table is constant-sized driver state
    census = (
        _read_documents(sf_dir, columns=["lang", "source"])
        .groupby(["lang", "source"], num_partitions=shuffle_partitions())
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    sizes = {
        (r.lang, r.source): int(r.n) for r in census.itertuples(index=False)
    }
    sizes_ref = ray.put(sizes)

    def replicate(t: pa.Table) -> pa.Table:
        """Vectorized triangle-join salt replication: each doc goes to
        every salt-group pair containing its salt. Block identity rides
        as SEPARATE (lang, source, sa, sb) exchange-key columns — no
        delimiter-joined group string, so values containing '|' cannot
        collide distinct blocks."""
        from ..stages.features import gather_list_rows
        from ..stages.mention_prep import get_broadcast

        sz = get_broadcast(sizes_ref)
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        langs = t["lang"].to_pylist()
        srcs = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        n = len(ids)
        toks = [
            np.unique(hash64_array((x or "").lower().split(" "), seed=0x7A))
            for x in texts
        ]
        S = np.fromiter(
            (max(1, math.ceil(sz[(l, s)] / n_max)) for l, s in zip(langs, srcs)),
            dtype=np.int64,
            count=n,
        )
        p = ids % S
        total = int(S.sum())
        out_idx = np.repeat(np.arange(n, dtype=np.int64), S)
        q = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(S) - S, S)
        pe = p[out_idx]
        lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=n)
        base_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        flat = np.concatenate(toks) if n else np.empty(0, np.uint64)
        rep_flat, rep_lens = gather_list_rows(base_off, flat, out_idx)
        offsets = np.concatenate([[0], np.cumsum(rep_lens)]).astype(np.int64)
        tl = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(rep_flat, pa.uint64())
        ).cast(pa.list_(pa.uint64()))
        take = pa.array(out_idx, pa.int64())
        return pa.Table.from_pydict(
            {
                "sa": pa.array(np.minimum(pe, q).astype(np.int32), pa.int32()),
                "sb": pa.array(np.maximum(pe, q).astype(np.int32), pa.int32()),
                "part": pa.array(pe.astype(np.int32), pa.int32()),
                "doc_id": t["doc_id"].take(take),
                "lang": t["lang"].take(take),
                "source": t["source"].take(take),
                "th": tl,
            }
        )

    def group_pairs(t: pa.Table) -> pa.Table:
        """Segment by (lang-code, source-code, sa, sb) via lexsort, build
        ALL pair index arrays (triu within / repeat-tile cross), then one
        vectorized multi-pair jaccard — no per-pair Python."""
        from ..stages.features import pairwise_jaccard

        empty = pa.Table.from_pydict(
            {
                "doc_id1": pa.array([], pa.int64()),
                "doc_id2": pa.array([], pa.int64()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        lenc = t["lang"].combine_chunks().dictionary_encode()
        senc = t["source"].combine_chunks().dictionary_encode()
        cl = np.asarray(lenc.indices, dtype=np.int64)
        cs = np.asarray(senc.indices, dtype=np.int64)
        block_code = cl * (int(cs.max()) + 1 if len(cs) else 1) + cs
        sa = np.asarray(t["sa"].to_numpy(zero_copy_only=False))
        sb = np.asarray(t["sb"].to_numpy(zero_copy_only=False))
        part = np.asarray(t["part"].to_numpy(zero_copy_only=False))
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        arr = t["th"].combine_chunks() if isinstance(t["th"], pa.ChunkedArray) else t["th"]
        off = np.asarray(arr.offsets)
        vals = arr.values.to_numpy(zero_copy_only=False)

        order = np.lexsort((sb, sa, block_code))
        bc_s, a_s, b_s = block_code[order], sa[order], sb[order]
        change = np.nonzero(
            (bc_s[1:] != bc_s[:-1]) | (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        )[0] + 1
        bounds = np.concatenate([[0], change, [len(order)]])

        gis, gjs = [], []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            seg = order[s0:s1]
            a_id, b_id = int(a_s[s0]), int(b_s[s0])
            if a_id == b_id:
                rows = seg[part[seg] == a_id]
                rows = rows[np.argsort(ids[rows], kind="stable")]
                if len(rows) > 1:
                    iu, ju = np.triu_indices(len(rows), k=1)
                    gis.append(rows[iu])
                    gjs.append(rows[ju])
            else:
                ra = seg[part[seg] == a_id]
                rb = seg[part[seg] == b_id]
                if len(ra) and len(rb):
                    gis.append(np.repeat(ra, len(rb)))
                    gjs.append(np.tile(rb, len(ra)))
        if not gis:
            return empty
        gi = np.concatenate(gis)
        gj = np.concatenate(gjs)
        jac = pairwise_jaccard(off, vals, gi, off, vals, gj)
        if threshold is not None:
            keep = jac >= threshold
            gi, gj, jac = gi[keep], gj[keep], jac[keep]
        if not len(gi):
            return empty
        lo = np.minimum(ids[gi], ids[gj])
        hi = np.maximum(ids[gi], ids[gj])
        take = pa.array(gi, pa.int64())
        return pa.Table.from_pydict(
            {
                "doc_id1": pa.array(lo, pa.int64()),
                "doc_id2": pa.array(hi, pa.int64()),
                "lang": t["lang"].take(take),
                "source": t["source"].take(take),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return (
        ds.map_batches(replicate, batch_format="pyarrow")
        .repartition(
            num_blocks=shuffle_partitions(), keys=["lang", "source", "sa", "sb"]
        )
        .map_batches(group_pairs, batch_format="pyarrow", batch_size=None)
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
        # md5-based gram hashes (== DuckDB md5_number_upper) computed once
        # per DISTINCT gram in the batch (near-dup docs share most
        # shingles); band keys are literal signature values so the whole
        # LSH construction is reproducible by the splitmix64-in-SQL oracle
        doc_grams = [
            token_shingles((x or "").lower().split(" "), self.shingle_k)
            for x in t["text"].to_pylist()
        ]
        uniq, inv = np.unique(
            np.asarray(
                [g for gs in doc_grams for g in gs], dtype=object
            ),
            return_inverse=True,
        ) if any(doc_grams) else (np.empty(0, object), np.empty(0, np.int64))
        uniq_h = md5_u64_array(list(uniq)) if len(uniq) else np.empty(0, np.uint64)
        offs = np.concatenate([[0], np.cumsum([len(g) for g in doc_grams])]).astype(
            np.int64
        )

        keys, ids, shs = [], [], []
        for i, doc_id in enumerate(t["doc_id"].to_pylist()):
            gh = uniq_h[inv[offs[i] : offs[i + 1]]]
            sh = np.unique(gh) if len(gh) else np.empty(0, np.uint64)
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


def dedup_canonical_docs(sf_dir: str, threshold: float = 0.8):
    """The dedup family's END PRODUCT: one canonical doc per near-dup
    cluster. MinHash-LSH verified pairs (jaccard >= threshold) form
    edges; connected components pick min doc_id per cluster as the
    canonical survivor; every doc maps to its canonical
    (doc_id, canonical_id, is_canonical). Match edges are tiny relative
    to the corpus, so the vectorized driver union-find applies (the
    distributed label-propagation in stages/cluster.py is the >memory
    path); the per-doc mapping assignment is a broadcast hash lookup."""
    import ray

    import pyarrow.compute as pc

    from ..stages.cluster import _union_find_arrays

    pairs = dedup_minhash_lsh(sf_dir, threshold=threshold).to_pandas()
    u1 = pairs["doc_id1"].to_numpy()
    u2 = pairs["doc_id2"].to_numpy()
    nodes, labels = (
        _union_find_arrays(u1.astype(object), u2.astype(object))
        if len(u1)
        else (np.empty(0, object), np.empty(0, object))
    )
    ref = ray.put(
        (
            np.asarray(nodes, dtype=np.int64),
            np.asarray(labels, dtype=np.int64),
        )
    )

    def assign(t: pa.Table) -> pa.Table:
        from ..stages.mention_prep import get_broadcast

        nodes_, labels_ = get_broadcast(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(nodes_):
            pos = np.searchsorted(nodes_, ids)
            pos_c = np.minimum(pos, len(nodes_) - 1)
            hit = nodes_[pos_c] == ids
            canon = np.where(hit, labels_[pos_c], ids)
        else:
            canon = ids
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "canonical_id": pa.array(canon, pa.int64()),
                "is_canonical": pa.array(
                    (canon == ids).astype(np.int8), pa.int8()
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pyarrow"
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

def dedup_embedding_cosine(sf_dir: str, threshold: float = 0.3, n_parts: int = 8):
    """EXACT all-pairs cosine >= threshold, fully distributed: the
    triangle-join replication (same construction as the mega-block
    salting in stages/blocking.py) — each vector lands in partition
    p = vec_id % P and is replicated to every partition-pair group
    (min(p,q), max(p,q)); each group holds two partitions and runs ONE
    vectorized matmul between them. No driver materialization, no full
    broadcast; shuffle volume is P x input, work is the inherent O(n^2)
    of the exact operator (use dedup_minhash_lsh / ann_topk_lsh for the
    approximate web-scale path)."""
    import ray.data as rd

    dsz = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def replicate(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        eoff = np.asarray(emb.offsets)
        evals = emb.values.to_numpy(zero_copy_only=False)
        edim = int(eoff[1] - eoff[0]) if len(eoff) > 1 else 0
        # rows are fixed-width and contiguous; slice from the FIRST row's
        # offset (a sliced chunk has eoff[0] != 0)
        V = evals[eoff[0] : eoff[-1]].reshape(len(ids), edim).astype(np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        p = (ids % n_parts).astype(np.int64)
        out_ids, out_part, out_grp, out_vecs = [], [], [], []
        for q in range(n_parts):
            a = np.minimum(p, q)
            b = np.maximum(p, q)
            out_ids.append(ids)
            out_part.append(p)
            out_grp.append(a * n_parts + b)
            out_vecs.append(V)
        V2 = np.concatenate(out_vecs, axis=0)
        n, dim = V2.shape
        vlist = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
            pa.array(V2.ravel(), pa.float64()),
        )
        return pa.Table.from_pydict(
            {
                "grp": pa.array(np.concatenate(out_grp), pa.int32()),
                "part": pa.array(np.concatenate(out_part), pa.int32()),
                "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "v": vlist,
            }
        )

    def group_pairs(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_pydict(
            {
                "vec_id1": pa.array([], pa.int64()),
                "vec_id2": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        if t.num_rows == 0:
            return empty
        t = t.combine_chunks()
        grp = np.asarray(t["grp"].to_numpy(zero_copy_only=False))
        part = np.asarray(t["part"].to_numpy(zero_copy_only=False))
        ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        arr = t["v"].combine_chunks() if isinstance(t["v"], pa.ChunkedArray) else t["v"]
        off = np.asarray(arr.offsets)
        dim = off[1] - off[0] if len(off) > 1 else 0
        # slice from off[0] (not 0): a sliced chunk's values buffer keeps
        # the full child, so reshaping from 0 would misalign every vector
        V = arr.values.to_numpy(zero_copy_only=False)[off[0] : off[-1]].reshape(
            len(ids), dim
        )
        o1, o2, cs = [], [], []
        for g in np.unique(grp):
            m = grp == g
            a_id, b_id = int(g) // n_parts, int(g) % n_parts
            # dedup within the group: a vector assigned to partition p
            # appears in group (p,q) once per distinct q — same (grp,
            # part) slice dedups by vec_id
            if a_id == b_id:
                sel = m & (part == a_id)
                sids, su = np.unique(ids[sel], return_index=True)
                SV = V[np.nonzero(sel)[0][su]]
                sims = SV @ SV.T
                iu, ju = np.triu_indices(len(sids), k=1)
                keep = sims[iu, ju] >= threshold
                o1.append(sids[iu[keep]])
                o2.append(sids[ju[keep]])
                cs.append(np.round(sims[iu[keep], ju[keep]], 9))
            else:
                sa = m & (part == a_id)
                sb = m & (part == b_id)
                aids, au = np.unique(ids[sa], return_index=True)
                bids, bu = np.unique(ids[sb], return_index=True)
                if not len(aids) or not len(bids):
                    continue
                A = V[np.nonzero(sa)[0][au]]
                B = V[np.nonzero(sb)[0][bu]]
                sims = A @ B.T
                ii, jj = np.nonzero(sims >= threshold)
                lo = np.minimum(aids[ii], bids[jj])
                hi = np.maximum(aids[ii], bids[jj])
                o1.append(lo)
                o2.append(hi)
                cs.append(np.round(sims[ii, jj], 9))
        if not o1:
            return empty
        return pa.Table.from_pydict(
            {
                "vec_id1": pa.array(np.concatenate(o1), pa.int64()),
                "vec_id2": pa.array(np.concatenate(o2), pa.int64()),
                "cos_sim": pa.array(np.concatenate(cs), pa.float64()),
            }
        )

    return (
        dsz.map_batches(replicate, batch_format="pyarrow")
        .repartition(num_blocks=shuffle_partitions(), keys=["grp"])
        .map_batches(group_pairs, batch_format="pyarrow", batch_size=None)
    )

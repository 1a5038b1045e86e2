"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline (per-batch numpy matmul
against a broadcast query matrix) and a random-hyperplane-LSH bucketed
variant as the 100-TB scale path (candidates only from matching buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _load_query_vec(sf_dir: str, query_vec_id: int) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = pc.index(t["vec_id"], pa.scalar(query_vec_id, pa.int64())).as_py()
    if idx < 0:
        raise KeyError(f"vec_id {query_vec_id} not found")
    q = np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)
    return q / np.linalg.norm(q)


def ann_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10):
    """Exact top-k by cosine vs one query vector. Ray shape: broadcast the
    (tiny) query, per-batch vectorized scores, per-batch local top-k
    pre-reduction, then a global sort+limit over ≤ k rows per batch —
    never a full materialization."""
    import ray
    import ray.data as rd

    q = _load_query_vec(sf_dir, query_vec_id)
    qref = ray.put(q)

    class Score:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            V = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            cos = V @ self.q
            keep = ids != query_vec_id
            ids, cos = ids[keep], cos[keep]
            # local pre-top-k: only k rows per batch survive to the sort
            if len(ids) > k:
                part = np.argpartition(-cos, k)[:k]
                ids, cos = ids[part], cos[part]
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "cos_sim": pa.array(np.round(cos, 9), pa.float64()),
                }
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(Score, batch_format="pyarrow", batch_size=512, concurrency=(1, 4))
        .sort("cos_sim", descending=True)
        .limit(k)
    )


def ann_topk_lsh(sf_dir: str, query_vec_id: int = 0, k: int = 10, n_planes: int = 8):
    """LSH-bucketed ANN: sign(random-hyperplane projections) buckets;
    search only buckets within Hamming distance <= 1 of the query bucket
    (multi-probe). Approximate — returns ≥0 and ≤k rows; no SQL oracle."""
    import ray
    import ray.data as rd

    q = _load_query_vec(sf_dir, query_vec_id)
    dim = len(q)
    rng = np.random.default_rng(42)  # fixed planes, deterministic
    planes = rng.normal(size=(n_planes, dim))
    qsig = int(np.packbits(planes @ q > 0, bitorder="little")[0])
    probe = {qsig} | {qsig ^ (1 << i) for i in range(n_planes)}
    bref = ray.put((planes, q, probe))

    class BucketScore:
        def __init__(self):
            self.planes, self.q, self.probe = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            V = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
            sigs = np.packbits((V @ self.planes.T) > 0, axis=1, bitorder="little")[:, 0]
            keep = np.array([s in self.probe for s in sigs]) & (ids != query_vec_id)
            ids, V = ids[keep], V[keep]
            if len(ids) == 0:
                return pa.Table.from_pydict(
                    {"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())}
                )
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            cos = V @ self.q
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "cos_sim": pa.array(np.round(cos, 9), pa.float64()),
                }
            )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(BucketScore, batch_format="pyarrow", batch_size=512, concurrency=(1, 4))
        .sort("cos_sim", descending=True)
        .limit(k)
    )


def ann_topk_ivf(
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
):
    """IVF-style ANN (the 100-TB scale path alongside LSH): deterministic
    centroid seeds (hash-picked vectors, one refinement sweep), every
    vector assigned to its nearest list, search only the ``n_probe``
    lists nearest to the query. Approximate — no SQL oracle."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    # fit centroids driver-side on the (small) vector sample — at real
    # scale this is a sampled k-means; assignment + search stay distributed
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    M = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    from ..functions.hashing import splitmix64

    seed_idx = np.unique(splitmix64(np.arange(n_lists, dtype=np.uint64) * np.uint64(97)) % len(ids))
    C = Mn[seed_idx.astype(np.int64)]
    # one Lloyd sweep for stability (deterministic)
    assign = np.argmax(Mn @ C.T, axis=1)
    for j in range(len(C)):
        members = Mn[assign == j]
        if len(members):
            c = members.mean(axis=0)
            n = np.linalg.norm(c)
            if n > 0:
                C[j] = c / n

    qpos = int(np.nonzero(ids == query_vec_id)[0][0])
    q = Mn[qpos]
    probe_lists = set(np.argsort(-(C @ q))[:n_probe].tolist())
    ref = ray.put((C, q, probe_lists))

    def score(t: pa.Table) -> pa.Table:
        from ..stages.mention_prep import get_broadcast

        C_, q_, probe_ = get_broadcast(ref)
        vid = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        V = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        lists = np.argmax(V @ C_.T, axis=1)
        keep = np.array([l in probe_ for l in lists]) & (vid != query_vec_id)
        vid, V = vid[keep], V[keep]
        if len(vid) == 0:
            return pa.Table.from_pydict(
                {"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())}
            )
        cos = V @ q_
        if len(vid) > k:
            part = np.argpartition(-cos, k)[:k]
            vid, cos = vid[part], cos[part]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(vid, pa.int64()),
                "cos_sim": pa.array(np.round(cos, 9), pa.float64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return (
        ds.map_batches(score, batch_format="pyarrow", batch_size=512)
        .sort("cos_sim", descending=True)
        .limit(k)
    )


def embedding_norms(sf_dir: str):
    """Per-vector l2 norm (double-cast, round 9 — parity with the SQL
    oracle's sqrt(list_inner_product(v, v)))."""
    import ray.data as rd

    def norms(t: pa.Table) -> pa.Table:
        V = [np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()]
        n = [round(float(np.sqrt(np.dot(v, v))), 9) for v in V]
        return pa.Table.from_pydict(
            {"vec_id": t["vec_id"], "l2_norm": pa.array(n, pa.float64())}
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(norms, batch_format="pyarrow")

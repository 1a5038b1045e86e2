"""Mention preparation stages: HTML extraction + normalization.

Maps of SURVEY.md §2.2 (M1-M11) onto the web-page mention model: the
deterministic extractor (S6 analog), host/url normalization (M7 analog),
tokenization (M1), shingling and the SimHash blocking signature (D5).

Stages are plain map_batches FUNCTIONS (tasks reuse Ray's prestarted
worker pool — no actor-pool spin-up latency); the "stateful" part (the
fitted IDF vector, the reference's load-once tagger analog at
/root/reference/src/eutilities/string_utils.py:119-121) is a broadcast
``ray.put`` ref fetched zero-copy from plasma and cached per worker
process.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import extract_text, extract_title, normalize_host, url_path
from ..functions.simhash import DEFAULT_BANDS as N_BANDS
from ..functions.simhash import (
    shingle_hashes_from_token_hashes,
    simhash_bands,
    simhash_from_hashes,
)
from ..functions.textkernels import tokenize
from ..functions.tfidf import ngram_indices
from ..functions.hashing import hash64_array


def extract_stage(batch: pa.Table) -> pa.Table:
    """html(binary) -> text_extracted/title/host/path columns.

    The byte-identical invariant stage (input_hint): pure function of the
    html bytes, verified against the frozen oracle text per url.
    """
    htmls = batch["html"].to_pylist()
    urls = batch["url"].to_pylist()
    texts = [extract_text(h) for h in htmls]
    titles = [extract_title(h) for h in htmls]
    hosts = [normalize_host(u) for u in urls]
    paths = [url_path(u) for u in urls]
    return (
        batch.drop_columns(["html"])
        .append_column("text_extracted", pa.array(texts, pa.large_string()))
        .append_column("title", pa.array(titles, pa.string()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("path", pa.array(paths, pa.string()))
    )


_REF_CACHE: dict = {}


def get_broadcast(ref):
    """Fetch a ray.put broadcast once per worker process (numpy payloads
    come back zero-copy from plasma; the cache skips repeat deserializes
    for dict payloads)."""
    if ref is None:
        return None
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key not in _REF_CACHE:
        import ray

        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]


def _list_array(arrs: list[np.ndarray], pa_type) -> pa.ListArray:
    """Build a ListArray from per-row numpy arrays without tolist()."""
    lengths = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    offsets = np.zeros(len(arrs) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    if offsets[-1] > 0:
        values = np.concatenate(arrs)
        va = pa.array(values, pa_type)
    else:
        va = pa.array([], pa_type)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), va)


TFIDF_TOP_K = 128  # keep the K heaviest tf-idf components per mention


def normalize_batch(batch: pa.Table, idf_ref=None) -> pa.Table:
    """Emit per-mention similarity payloads: token hashes, 3-shingle
    hashes, simhash + band values, sparse tf-idf vector, µs timestamp.

    Payload budget matters — every byte here is replicated N_BANDS times
    through the pair-generation exchange: token/shingle sets are 32-bit
    hashes (per-doc collision odds ~n²/2³², immaterial for jaccard), the
    tf-idf vector keeps its top-K components (l2-renormalized), and the
    raw text/timestamp columns are dropped."""
    idf = get_broadcast(idf_ref)
    texts = batch["text_extracted"].to_pylist()
    # hash each DISTINCT token once per batch (dictionary encoding):
    # pages of one entity are near-duplicates, so the distinct token set
    # is ~an order of magnitude smaller than the token stream and the
    # blake2b loop drops accordingly
    doc_toks = [tokenize(t) for t in texts]
    flat = pa.array(
        [w for toks in doc_toks for w in toks], pa.string()
    ).dictionary_encode()
    dict_hashes = (
        hash64_array(flat.dictionary.to_pylist(), seed=0x70)
        if len(flat)
        else np.empty(0, np.uint64)
    )
    flat_th = (
        dict_hashes[np.asarray(flat.indices)]
        if len(flat)
        else np.empty(0, np.uint64)
    )
    doc_off = np.concatenate(
        [[0], np.cumsum([len(t) for t in doc_toks])]
    ).astype(np.int64)

    tok_hashes, sh_hashes, simhashes, bands = [], [], [], []
    tfidf_idx, tfidf_w = [], []
    for i, t in enumerate(texts):
        th = flat_th[doc_off[i] : doc_off[i + 1]]
        tok_hashes.append(np.unique((th >> np.uint64(32)).astype(np.uint32)))
        sh_hashes.append(
            np.unique(
                (shingle_hashes_from_token_hashes(th, 3) >> np.uint64(32)).astype(
                    np.uint32
                )
            )
        )
        s = simhash_from_hashes(th)
        simhashes.append(s)
        bands.append(simhash_bands(s, N_BANDS))
        if idf is not None:
            idx = ngram_indices(t)
            if len(idx):
                uniq, counts = np.unique(idx, return_counts=True)
                w = counts.astype(np.float32) * idf[uniq]
                if len(uniq) > TFIDF_TOP_K:
                    keep = np.argpartition(-w, TFIDF_TOP_K)[:TFIDF_TOP_K]
                    keep.sort()  # back to ascending index order
                    uniq, w = uniq[keep], w[keep]
                norm = float(np.sqrt((w * w).sum()))
                if norm > 0:
                    w /= norm
                tfidf_idx.append(uniq.astype(np.uint32))
                tfidf_w.append(w)
            else:
                tfidf_idx.append(np.empty(0, np.uint32))
                tfidf_w.append(np.empty(0, np.float32))

    ts = batch["warc_ts"].cast(pa.int64())
    drop = [
        c for c in ("text_extracted", "text", "warc_ts") if c in batch.column_names
    ]
    out = (
        batch.drop_columns(drop)
        .append_column("ts_us", ts)
        .append_column("tok_hashes", _list_array(tok_hashes, pa.uint32()))
        .append_column("sh_hashes", _list_array(sh_hashes, pa.uint32()))
        .append_column("simhash", pa.array(simhashes, pa.uint64()))
        .append_column("bands", pa.array(bands, pa.list_(pa.uint64(), N_BANDS)))
    )
    if idf is not None:
        out = out.append_column(
            "tfidf_idx", _list_array(tfidf_idx, pa.uint32())
        ).append_column("tfidf_w", _list_array(tfidf_w, pa.float32()))
    return out


class NormalizeMentions:
    """Actor-style wrapper kept for API parity (tests); delegates to
    normalize_batch."""

    def __init__(self, idf_ref=None):
        self.idf_ref = idf_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        return normalize_batch(batch, self.idf_ref)


def fit_idf(ds, sample_mod: int = 1):
    """Fit the hashed-ngram IDF table: per-batch partial DF vectors (a
    mergeable sketch — SURVEY.md §4 pre-aggregation rule), summed on the
    driver. ``sample_mod`` > 1 fits on a deterministic hash-sample of the
    corpus (the 100-TB path: idf from a 1/mod sample is statistically
    identical and keeps the reduce tiny).
    Returns (idf float32[N_FEATURES], n_docs_sampled)."""
    from ..functions.tfidf import N_FEATURES, idf_from_df, partial_df
    from ..functions.hashing import stable_hash64

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text_extracted"].to_pylist()
        if sample_mod > 1:
            urls = batch["url"].to_pylist()
            texts = [
                t
                for t, u in zip(texts, urls)
                if stable_hash64(u, seed=0xDF) % sample_mod == 0
            ]
        df = partial_df(texts)
        return pa.Table.from_pydict(
            {
                "df": pa.array([df.astype(np.int64).tolist()], pa.list_(pa.int64(), N_FEATURES)),
                "n": pa.array([len(texts)], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=1024)
    total_df = np.zeros(N_FEATURES, dtype=np.int64)
    n_docs = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=64):
        arr = np.asarray(b["df"].to_pylist(), dtype=np.int64)
        total_df += arr.sum(axis=0)
        n_docs += int(np.asarray(b["n"]).sum())
    return idf_from_df(total_df, max(n_docs, 1)), n_docs

"""Pairwise feature extraction (actor pool) + GBT scoring (actor pool).

The web-graft analog of the reference's per-pair feature library
(/root/reference/src/pubmed_inner_feature_extract.py:213-341, kernels at
src/eutilities/string_utils.py:59-109): Jaro-Winkler / Levenshtein on
titles and url paths, Jaccard over token and shingle sets, char-ngram
TF-IDF cosine, timestamp proximity, SimHash Hamming distance, ambiguity
(block-size) score — per BASELINE.json north_star. The reference computes
features row-at-a-time in a pandas iterrows loop; here the heavy parts
(set intersections, tf-idf dot products, hamming) run on numpy arrays per
Arrow batch inside a reusable actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.simhash import hamming64_arrays
from ..functions.textkernels import jaro_winkler_similarity, levenshtein

FEATURE_NAMES = [
    "jw_title",
    "jw_path",
    "lev_path_sim",
    "jaccard_tokens",
    "jaccard_shingles",
    "tfidf_cosine",
    "ts_proximity",
    "simhash_sim",
    "ambiguity",
    "title_len_ratio",
    "same_lang",
]

ID_COLS = ["url_1", "url_2"]


def _jaccard_u64(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted-unique uint64 arrays (set semantics of
    string_utils.py:99-109, over hashes)."""
    if len(a) == 0 and len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def _sparse_cos(i1, w1, i2, w2) -> float:
    if len(i1) == 0 or len(i2) == 0:
        return 0.0
    common, a, b = np.intersect1d(i1, i2, assume_unique=True, return_indices=True)
    if len(common) == 0:
        return 0.0
    return float(np.dot(w1[a], w2[b]))


class PairFeatures:
    """Actor-pool stage: pairs-with-payloads -> numeric feature vector."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t1 = batch["title_1"].to_pylist()
        t2 = batch["title_2"].to_pylist()
        p1 = batch["path_1"].to_pylist()
        p2 = batch["path_2"].to_pylist()

        jw_title = np.array([jaro_winkler_similarity(a, b) for a, b in zip(t1, t2)])
        jw_path = np.array([jaro_winkler_similarity(a, b) for a, b in zip(p1, p2)])
        lev_path = np.array(
            [
                1.0 - levenshtein(a, b) / max(len(a), len(b), 1)
                for a, b in zip(p1, p2)
            ]
        )

        tok1 = [np.asarray(x, dtype=np.uint64) for x in batch["tok_hashes_1"].to_pylist()]
        tok2 = [np.asarray(x, dtype=np.uint64) for x in batch["tok_hashes_2"].to_pylist()]
        sh1 = [np.asarray(x, dtype=np.uint64) for x in batch["sh_hashes_1"].to_pylist()]
        sh2 = [np.asarray(x, dtype=np.uint64) for x in batch["sh_hashes_2"].to_pylist()]
        jac_tok = np.array([_jaccard_u64(a, b) for a, b in zip(tok1, tok2)])
        jac_sh = np.array([_jaccard_u64(a, b) for a, b in zip(sh1, sh2)])

        if "tfidf_idx_1" in batch.column_names:
            i1 = [np.asarray(x, dtype=np.uint32) for x in batch["tfidf_idx_1"].to_pylist()]
            w1 = [np.asarray(x, dtype=np.float32) for x in batch["tfidf_w_1"].to_pylist()]
            i2 = [np.asarray(x, dtype=np.uint32) for x in batch["tfidf_idx_2"].to_pylist()]
            w2 = [np.asarray(x, dtype=np.float32) for x in batch["tfidf_w_2"].to_pylist()]
            cos = np.array([_sparse_cos(a, b, c, d) for a, b, c, d in zip(i1, w1, i2, w2)])
        else:
            cos = np.zeros(n)

        ts1 = np.asarray(batch["ts_us_1"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ts2 = np.asarray(batch["ts_us_2"].to_numpy(zero_copy_only=False), dtype=np.int64)
        days = np.abs(ts1 - ts2) / 86_400_000_000.0
        ts_prox = 1.0 / (1.0 + days)

        s1 = np.asarray(batch["simhash_1"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        s2 = np.asarray(batch["simhash_2"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        sim_sim = 1.0 - hamming64_arrays(s1, s2) / 64.0 if n else np.zeros(0)

        block = np.asarray(batch["block_size"].to_numpy(zero_copy_only=False), dtype=np.float64)
        ambiguity = np.log1p(block)

        l1 = np.array([len(x) for x in t1], dtype=np.float64)
        l2 = np.array([len(x) for x in t2], dtype=np.float64)
        len_ratio = np.minimum(l1, l2) / np.maximum(np.maximum(l1, l2), 1.0)

        lang1 = batch["lang_1"].to_pylist()
        lang2 = batch["lang_2"].to_pylist()
        same_lang = np.array([1.0 if a == b else 0.0 for a, b in zip(lang1, lang2)])

        feats = [
            jw_title,
            jw_path,
            lev_path,
            jac_tok,
            jac_sh,
            cos,
            ts_prox,
            sim_sim,
            ambiguity,
            len_ratio,
            same_lang,
        ]
        cols = {c: batch[c] for c in ID_COLS}
        if "label" in batch.column_names:
            cols["label"] = batch["label"]
        for name, arr in zip(FEATURE_NAMES, feats):
            cols[name] = pa.array(np.asarray(arr, dtype=np.float64), pa.float64())
        return pa.Table.from_pydict(cols)


class GBTScorer:
    """Actor-pool scorer: feature vector -> p(match). Model weights are
    broadcast once (ray.put on the driver, ray.get per actor __init__) —
    the T5 production-scoring analog (SURVEY.md §2.3)."""

    def __init__(self, model_ref):
        import ray

        from ..functions.gbt import GBTClassifier

        blob = ray.get(model_ref)
        self.model = GBTClassifier.from_json(blob)

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in FEATURE_NAMES]
        )
        p = self.model.predict_proba(X)
        cols = {c: batch[c] for c in ID_COLS}
        if "label" in batch.column_names:
            cols["label"] = batch["label"]
        cols["score"] = pa.array(p, pa.float64())
        return pa.Table.from_pydict(cols)


def featurize_pairs(pairs_ds, concurrency=(1, 8), batch_size: int = 2048):
    return pairs_ds.map_batches(
        PairFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def score_pairs(features_ds, model_json: str, threshold: float = 0.5,
                concurrency=(1, 8), batch_size: int = 8192):
    """features -> scored pairs; caller filters score > threshold into edges."""
    import ray
    import pyarrow.compute as pc

    model_ref = ray.put(model_json)
    scored = features_ds.map_batches(
        GBTScorer,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return scored


def edges_from_scores(scored_ds, threshold: float = 0.5):
    import pyarrow.compute as pc

    def thresh(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["score"], threshold)).select(["url_1", "url_2"])

    return scored_ds.map_batches(thresh, batch_format="pyarrow")

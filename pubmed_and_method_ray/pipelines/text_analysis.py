"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Analogs of the reference's per-doc text cleaners/extractors (SURVEY.md
M1-M3, M9-M11) generalized to a training-data pipeline. Oracle-checked
ops share exact token semantics with the SQL (space-split of lowered
text); heuristics (lang-ID) are rows-only checks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# fixed stopword list mirrored verbatim in the SQL oracle
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# marker tokens per language for the n-gram/keyword lang-ID heuristic
LANG_MARKERS = {
    "en": {"the", "and", "of", "is", "with", "for"},
    "es": {"el", "la", "de", "que", "y", "los"},
    "de": {"der", "die", "das", "und", "ist", "mit"},
    "fr": {"le", "la", "les", "et", "est", "des"},
    "zh": {"的", "是", "了", "在", "和", "有"},
}


def _read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_count(sf_dir: str):
    """(doc_id, n_tokens): space-split token count (oracle: len(str_split))."""

    def f(t: pa.Table) -> pa.Table:
        n = [len((x or "").split(" ")) for x in t["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "n_tokens": pa.array(n, pa.int64())}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def quality_score(sf_dir: str):
    """(doc_id, n_tokens, stopword_count, stop_ratio): the reference's
    ratio-style quality flags (SURVEY.md M15 analog) as one vectorizable
    pass; stop_ratio is an int/int division -> bit-identical to SQL."""
    sw = set(QUALITY_STOPWORDS)

    def f(t: pa.Table) -> pa.Table:
        n_toks, n_stop, ratio = [], [], []
        for x in t["text"].to_pylist():
            toks = (x or "").lower().split(" ")
            s = sum(1 for w in toks if w in sw)
            n_toks.append(len(toks))
            n_stop.append(s)
            ratio.append(s / len(toks) if toks else 0.0)
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_toks, pa.int64()),
                "stopword_count": pa.array(n_stop, pa.int64()),
                "stop_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


class LangId:
    """Stateful lang-ID actor: marker sets built once per actor (the T1/T2
    load-once pattern). Scores each language by marker-token hits; ties
    break deterministically by language code."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in LANG_MARKERS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        preds, confs = [], []
        for x in t["text"].to_pylist():
            toks = (x or "").lower().split(" ")
            best_lang, best = "und", 0
            for lang in sorted(self.markers):
                hits = sum(1 for w in toks if w in self.markers[lang])
                if hits > best:
                    best, best_lang = hits, lang
            preds.append(best_lang)
            confs.append(best / len(toks) if toks else 0.0)
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
                "confidence": pa.array(confs, pa.float64()),
            }
        )


def lang_id(sf_dir: str):
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )


def doc_fingerprint(sf_dir: str):
    """(doc_id, fp): md5 of lowered text — exact content fingerprint
    (oracle: md5(lower(text)))."""

    def f(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((x or "").lower().encode("utf-8")).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "fp": pa.array(fps, pa.string())}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def clean_text_docs(sf_dir: str):
    """(doc_id, clean): the reference's clean_abstract normalization
    (database/pubmed_inner_outer_feature.sql:9-21) as a vectorizable op."""
    from ..functions.textkernels import clean_text

    def f(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "clean": pa.array(
                    [clean_text(x) for x in t["text"].to_pylist()], pa.string()
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# dictionary gazetteer for the entity-tagger actor (T1 NER / T2 geo-cache
# analog: /root/reference/src/eutilities/string_utils.py:118-161)
ENTITY_GAZETTEER = ("spark", "table", "query", "window", "vector", "stream")


class EntityTagger:
    """Stateful tagger actor: gazetteer frozen + per-actor memo cache in
    __init__ (the load-once NER / memoized geo pattern); emits matched
    entities per doc as a sorted csv (oracle-friendly scalar)."""

    def __init__(self):
        self.gazetteer = frozenset(ENTITY_GAZETTEER)
        self.memo: dict[str, str] = {}

    def _tag(self, text: str) -> str:
        hit = self.memo.get(text)
        if hit is None:
            toks = set((text or "").lower().split(" "))
            hit = self.memo[text] = ",".join(sorted(toks & self.gazetteer))
        return hit

    def __call__(self, t: pa.Table) -> pa.Table:
        ents = [self._tag(x) for x in t["text"].to_pylist()]
        n = [0 if e == "" else e.count(",") + 1 for e in ents]
        return pa.Table.from_pydict(
            {
                "doc_id": t["doc_id"],
                "entities": pa.array(ents, pa.string()),
                "n_entities": pa.array(n, pa.int64()),
            }
        )


def tag_entities(sf_dir: str):
    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        EntityTagger, batch_format="pyarrow", concurrency=(1, 4)
    )


def doc_keywords(sf_dir: str, top_k: int = 5):
    """Per-doc top-k keywords by tf-idf (the MAUI keyword-extractor analog
    T3, /root/reference/Dependency-Feature/.../MauiExtractedKeywords.java:7-36):
    token-level document frequencies reduce via per-batch Counters, the
    idf dict broadcasts once, and a stateful actor scores each doc.
    Output: (doc_id, keywords csv) — deterministic tie-break by token."""
    import math

    import ray
    import ray.data as rd

    ds = _read_documents(sf_dir, ["doc_id", "text"])

    # pass 1: document frequencies (mergeable per-batch partials)
    def df_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        n = 0
        for x in t["text"].to_pylist():
            n += 1
            c.update(set((x or "").lower().split(" ")))
        return pa.Table.from_pydict(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "df": pa.array(list(c.values()), pa.int64()),
                "n_docs": pa.array([n] * len(c), pa.int64()),
            }
        )

    totals: dict[str, int] = {}
    for b in ds.map_batches(df_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        toks = b["token"].to_pylist()
        dfs = b["df"].to_pylist()
        for tkn, d in zip(toks, dfs):
            totals[tkn] = totals.get(tkn, 0) + d
    n_docs = _read_documents(sf_dir, ["doc_id"]).count()
    idf = {
        t: math.log((1 + n_docs) / (1 + d)) + 1.0 for t, d in totals.items()
    }
    idf_ref = ray.put(idf)

    class Keywords:
        def __init__(self):
            from ..stages.mention_prep import get_broadcast

            self.idf = get_broadcast(idf_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            from collections import Counter

            out = []
            for x in t["text"].to_pylist():
                tf = Counter((x or "").lower().split(" "))
                scored = sorted(
                    ((c * self.idf.get(w, 0.0), w) for w, c in tf.items()),
                    key=lambda p: (-p[0], p[1]),
                )
                out.append(",".join(w for _, w in scored[:top_k]))
            return pa.Table.from_pydict(
                {"doc_id": t["doc_id"], "keywords": pa.array(out, pa.string())}
            )

    return ds.map_batches(Keywords, batch_format="pyarrow", concurrency=(1, 4))


def doc_rolling_fingerprint(sf_dir: str, window: int = 8):
    """Winnowing-style fingerprint: min rolling hash over token windows
    (Schleimer et al. 2003) — the near-dup fingerprint (rows-only check)."""
    from ..functions.hashing import hash64_array

    def f(t: pa.Table) -> pa.Table:
        out = []
        for x in t["text"].to_pylist():
            toks = (x or "").lower().split(" ")
            if len(toks) < window:
                grams = [" ".join(toks)] if toks else []
            else:
                grams = [
                    " ".join(toks[i : i + window])
                    for i in range(len(toks) - window + 1)
                ]
            if grams:
                out.append(f"{int(hash64_array(grams, seed=0x33).min()):016x}")
            else:
                out.append("0" * 16)
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "rolling_fp": pa.array(out, pa.string())}
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )

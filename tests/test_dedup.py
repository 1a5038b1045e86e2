"""Brute-force parity for the near-dup dedup family on synthetic
corpora, including the adversarial shapes the oracles can't force:
mega (lang, source) blocks that trigger salting, '|' characters inside
block-key values, and degenerate LSH buckets."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pubmed_and_method_ray.pipelines import dedup


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _brute_pairs(rows, threshold=None):
    """All within-(lang, source) pairs with token-set jaccard."""
    out = set()
    res = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if (a["lang"], a["source"]) != (b["lang"], b["source"]):
                continue
            sa = set((a["text"] or "").lower().split(" "))
            sb = set((b["text"] or "").lower().split(" "))
            inter = len(sa & sb)
            union = len(sa | sb)
            jac = inter / union if union else 0.0
            if threshold is not None and jac < threshold:
                continue
            lo, hi = sorted((a["doc_id"], b["doc_id"]))
            key = (lo, hi)
            assert key not in out
            out.add(key)
            res.append((lo, hi, round(jac, 9)))
    return sorted(res)


def _got_pairs(ds):
    df = ds.to_pandas()
    got = sorted(
        (int(r.doc_id1), int(r.doc_id2), round(float(r.jaccard), 9))
        for r in df.itertuples(index=False)
    )
    # exactly-once emission
    assert len({(a, b) for a, b, _ in got}) == len(got)
    return got


def _mk_rows(rng, n, langs, sources, vocab=30):
    rows = []
    for i in range(n):
        toks = [f"w{rng.integers(0, vocab)}" for _ in range(rng.integers(1, 12))]
        rows.append(
            {
                "doc_id": int(i + 1),
                "text": " ".join(toks),
                "lang": langs[rng.integers(0, len(langs))],
                "source": sources[rng.integers(0, len(sources))],
            }
        )
    return rows


class TestPairJaccardDocs:
    def test_matches_brute_force_unsalted(self, ray_session, tmp_path):
        rng = np.random.default_rng(7)
        rows = _mk_rows(rng, 40, ["en", "de"], ["a", "b"])
        sf = _write_docs(tmp_path, rows)
        got = _got_pairs(dedup.pair_jaccard_docs(sf))
        assert got == _brute_pairs(rows)

    def test_matches_brute_force_salted(self, ray_session, tmp_path):
        """n_max=4 forces S>1 triangle replication on every block; pair
        coverage must stay exact and exactly-once."""
        rng = np.random.default_rng(11)
        rows = _mk_rows(rng, 50, ["en"], ["a", "b"])
        sf = _write_docs(tmp_path, rows)
        got = _got_pairs(dedup.pair_jaccard_docs(sf, n_max=4))
        assert got == _brute_pairs(rows)

    def test_thresholded_salted(self, ray_session, tmp_path):
        rng = np.random.default_rng(13)
        rows = _mk_rows(rng, 30, ["en"], ["a"], vocab=8)
        sf = _write_docs(tmp_path, rows)
        got = _got_pairs(dedup.pair_jaccard_docs(sf, threshold=0.5, n_max=4))
        assert got == _brute_pairs(rows, threshold=0.5)

    def test_pipe_in_block_values_does_not_collide(self, ray_session, tmp_path):
        """lang='a|b', source='c' must NOT pair with lang='a',
        source='b|c' (the round-2 delimiter-ambiguity advisory)."""
        rows = [
            {"doc_id": 1, "text": "x y z", "lang": "a|b", "source": "c"},
            {"doc_id": 2, "text": "x y z", "lang": "a", "source": "b|c"},
            {"doc_id": 3, "text": "x y w", "lang": "a|b", "source": "c"},
        ]
        sf = _write_docs(tmp_path, rows)
        got = _got_pairs(dedup.pair_jaccard_docs(sf))
        assert [(a, b) for a, b, _ in got] == [(1, 3)]

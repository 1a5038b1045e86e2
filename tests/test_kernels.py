"""Kernel unit tests with hand-computed vectors (FIXTURES.md F4; mirrors
the reference's kernel checks in /root/reference/test/eutilities/)."""

import numpy as np
import pytest

from pubmed_and_method_ray.functions import textkernels as tk
from pubmed_and_method_ray.functions.hashing import crc32_mod, hash64_array, stable_hash64
from pubmed_and_method_ray.functions.simhash import (
    hamming64,
    hamming64_arrays,
    minhash_band_keys,
    minhash_signature,
    simhash64,
    simhash_bands,
)
from pubmed_and_method_ray.functions.tfidf import (
    cosine_sparse,
    idf_from_df,
    ngram_indices,
    partial_df,
    tfidf_vector,
)


class TestJaccard:
    def test_basic(self):
        assert tk.jaccard_similarity(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)

    def test_none_and_empty(self):
        assert tk.jaccard_similarity(None, ["a"]) == 0.0
        assert tk.jaccard_similarity([], []) == 0.0

    def test_stopword_removal(self):
        # 'the' removed from both sides (string_utils.py:99-109 semantics)
        assert tk.jaccard_similarity(["the", "x"], ["the", "y"], True) == 0.0
        assert tk.jaccard_similarity(["the", "x"], ["the", "x"], True) == 1.0

    def test_multiset_collapses(self):
        assert tk.jaccard_similarity(["a", "a", "b"], ["a", "b"]) == 1.0


class TestIntersection:
    def test_basic(self):
        assert tk.intersection(["a", "b", "c"], ["b", "c", "d"]) == 2
        assert tk.intersection(None, ["a"]) == 0
        assert tk.intersection(["the", "a", "z"], ["the", "z"], True) == 1


class TestJaroWinkler:
    def test_identity_and_empty(self):
        assert tk.jaro_winkler_similarity("abc", "abc") == 1.0
        assert tk.jaro_winkler_similarity("", "abc") == 0.0
        assert tk.jaro_winkler_similarity(None, "abc") == 0.0

    def test_known_values(self):
        # classic published examples (Winkler 1990)
        assert tk.jaro_winkler_similarity("MARTHA", "MARHTA") == pytest.approx(
            0.9611, abs=1e-4
        )
        assert tk.jaro_winkler_similarity("DWAYNE", "DUANE") == pytest.approx(
            0.8400, abs=1e-4
        )
        assert tk.jaro_winkler_similarity("DIXON", "DICKSONX") == pytest.approx(
            0.8133, abs=1e-4
        )

    def test_symmetry(self):
        a, b = "deceukelaire", "de ceukelairef"
        assert tk.jaro_winkler_similarity(a, b) == pytest.approx(
            tk.jaro_winkler_similarity(b, a)
        )


class TestLevenshtein:
    def test_distance(self):
        assert tk.levenshtein("kitten", "sitting") == 3
        assert tk.levenshtein("", "abc") == 3
        assert tk.levenshtein("abc", "abc") == 0

    def test_edit_diff_chars_reference_example(self):
        # the reference's own manual test pair
        # (/root/reference/test/eutilities/string_utils_test.py:5-24)
        diff = tk.edit_diff_chars("deceukelaire", "de ceukelairef")
        # one optimal script: insert ' ' and insert 'f' -> 2 touched chars
        assert len(diff) == tk.levenshtein("deceukelaire", "de ceukelairef") == 2
        assert set(diff) == {" ", "f"}

    def test_edit_diff_chars_length_matches_distance(self):
        for a, b in [("abc", "axc"), ("abcd", "ab"), ("flaw", "lawn")]:
            assert len(tk.edit_diff_chars(a, b)) == tk.levenshtein(a, b)


class TestTokenizers:
    def test_tokenize(self):
        assert tk.tokenize("Hello, World! 42") == ["hello", "world", "42"]
        assert tk.tokenize(None) == []

    def test_extract_inner_words(self):
        assert tk.extract_inner_words("the cat-dog ran9fast") == [
            "the",
            "cat",
            "dog",
            "ran",
            "fast",
        ]
        assert tk.extract_inner_words("a2b") == []

    def test_extract_email(self):
        assert tk.extract_email("mail me at a.b-c@lab.edu. thanks") == "a.b-c@lab.edu"
        assert tk.extract_email("no email here") is None

    def test_shingles(self):
        assert tk.token_shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
        assert tk.token_shingles(["a"], 3) == ["a"]
        assert tk.char_shingles("ab c", 3) == ["ab ", "b c"]


class TestHashing:
    def test_stability(self):
        assert stable_hash64("x") == stable_hash64("x")
        assert stable_hash64("x", 1) != stable_hash64("x", 2)
        assert crc32_mod("foo") == crc32_mod("foo")
        assert 0 <= crc32_mod("bar", 100) < 100

    def test_array_matches_scalar(self):
        arr = hash64_array(["a", "b"], seed=5)
        assert arr[0] == stable_hash64("a", 5)
        assert arr[1] == stable_hash64("b", 5)


class TestSimhash:
    def test_identical_text_identical_hash(self):
        t = ["the", "quick", "brown", "fox"]
        assert simhash64(t) == simhash64(list(t))

    def test_near_dup_small_hamming(self):
        t1 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5).split()
        t2 = list(t1)
        t2[3] = "changed"
        assert hamming64(simhash64(t1), simhash64(t2)) <= 12

    def test_unrelated_large_hamming(self):
        t1 = [f"w{i}" for i in range(50)]
        t2 = [f"z{i}" for i in range(50)]
        assert hamming64(simhash64(t1), simhash64(t2)) >= 15

    def test_bands_reassemble(self):
        h = simhash64(["a", "b", "c"])
        bands = simhash_bands(h, 4)
        assert len(bands) == 4
        reassembled = sum(b << (16 * i) for i, b in enumerate(bands))
        assert reassembled == h

    def test_segmented_matches_scalar(self):
        from pubmed_and_method_ray.functions.simhash import (
            simhash_from_hashes,
            simhash_from_hashes_segmented,
        )

        rng = np.random.default_rng(7)
        lens = rng.integers(0, 9, size=20)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        flat = rng.integers(0, 2**63, size=int(offs[-1])).astype(np.uint64)
        got = simhash_from_hashes_segmented(flat, offs)
        for i in range(20):
            assert got[i] == simhash_from_hashes(flat[offs[i] : offs[i + 1]])
        assert len(simhash_from_hashes_segmented(flat[:0], offs[:1])) == 0

    def test_hamming_vectorized_matches_scalar(self):
        a = np.array([simhash64(["a", "b"]), simhash64(["c"])], dtype=np.uint64)
        b = np.array([simhash64(["a", "x"]), simhash64(["c"])], dtype=np.uint64)
        vec = hamming64_arrays(a, b)
        assert vec[0] == hamming64(int(a[0]), int(b[0]))
        assert vec[1] == 0


class TestMinhash:
    def test_signature_deterministic(self):
        s1 = minhash_signature(["a", "b", "c"])
        s2 = minhash_signature(["c", "b", "a", "a"])  # set semantics
        assert (s1 == s2).all()

    def test_similar_sets_share_bands(self):
        base = [f"tok{i}" for i in range(100)]
        near = base[:-2] + ["x1", "x2"]
        k1 = set(minhash_band_keys(minhash_signature(base)))
        k2 = set(minhash_band_keys(minhash_signature(near)))
        assert k1 & k2  # high-jaccard pair collides in >=1 band

    def test_disjoint_sets_no_bands(self):
        k1 = set(minhash_band_keys(minhash_signature([f"a{i}" for i in range(50)])))
        k2 = set(minhash_band_keys(minhash_signature([f"b{i}" for i in range(50)])))
        assert not (k1 & k2)


class TestTfidf:
    def test_cosine_self_is_one(self):
        df = partial_df(["abcdef", "xyzxyz"])
        idf = idf_from_df(df, 2)
        i1, w1 = tfidf_vector("abcdef", idf)
        assert cosine_sparse(i1, w1, i1, w1) == pytest.approx(1.0, abs=1e-6)

    def test_cosine_disjoint_is_zero(self):
        idf = idf_from_df(partial_df(["abc", "xyz"]), 2)
        i1, w1 = tfidf_vector("abc", idf)
        i2, w2 = tfidf_vector("xyz", idf)
        assert cosine_sparse(i1, w1, i2, w2) == 0.0

    def test_empty(self):
        idf = idf_from_df(partial_df(["abc"]), 1)
        i, w = tfidf_vector("", idf)
        assert len(i) == 0
        assert ngram_indices("").size == 0

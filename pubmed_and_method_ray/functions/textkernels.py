"""String-similarity kernels.

Semantics mirror the reference's kernel library
(/root/reference/src/eutilities/string_utils.py:14-109) — same null
handling (None -> 0.0 / 0), same set-based jaccard/intersection, same
Jaro-Winkler contract — implemented from scratch on public algorithm
definitions (Jaro 1989, Winkler 1990, Wagner-Fischer edit distance).
No external deps; everything is deterministic.
"""

from __future__ import annotations

import re

import numpy as np

# Compact English stopword set (analog of nltk stopwords used at
# string_utils.py:86; frozen here so results are reproducible without nltk).
EN_STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by can did do does doing down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more most
    my myself no nor not now of off on once only or other our ours ourselves
    out over own s same she should so some such t than that the their theirs
    them themselves then there these they this those through to too under until
    up very was we were what when where which while who whom why will with you
    your yours yourself yourselves""".split()
)

_WORD_RE = re.compile(r"\w+")
_NON_LOWER_RE = re.compile(r"[^a-z]")
_EMAIL_RE = re.compile(r"[\w\.-]+@[\w\.-]+")
_WS_RE = re.compile(r"\s+")


def tokenize(text: str | None) -> list[str]:
    """``\\w+`` tokens, lowercased (reference ``clean_title``,
    database/pubmed_inner_outer_feature.sql:6-8)."""
    if not text:
        return []
    return _WORD_RE.findall(text.lower())


def extract_inner_words(string: str | None) -> list[str]:
    """Strip non-[a-z] to spaces, keep tokens with len > 2
    (string_utils.py:25-28)."""
    if string is None:
        return []
    return [s for s in _NON_LOWER_RE.sub(" ", string).split(" ") if len(s) > 2]


def extract_email(text: str | None) -> str | None:
    """First email-ish match, trailing dot trimmed (string_utils.py:14-22)."""
    if text is None:
        return None
    m = _EMAIL_RE.search(text)
    if m is None:
        return None
    result = m.group(0)
    return result[:-1] if result.endswith(".") else result


def intersection(a, b, remove_stop_word: bool = False) -> int:
    """|set(a) & set(b)|; None -> 0 (string_utils.py:89-96)."""
    if a is None or b is None:
        return 0
    if remove_stop_word:
        a = [n for n in a if n not in EN_STOPWORDS]
        b = [n for n in b if n not in EN_STOPWORDS]
    return len(set(a) & set(b))


def jaccard_similarity(a, b, remove_stop_word: bool = False) -> float:
    """|A∩B| / |A∪B|; None or empty union -> 0.0 (string_utils.py:99-109)."""
    if a is None or b is None:
        return 0.0
    if remove_stop_word:
        a = [n for n in a if n not in EN_STOPWORDS]
        b = [n for n in b if n not in EN_STOPWORDS]
    sa, sb = set(a), set(b)
    unions = len(sa | sb)
    if unions == 0:
        return 0.0
    return len(sa & sb) / unions


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity (public definition; the primitive under
    string_utils.py:80-83's jaro_winkler_similarity)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    m = matches
    return (m / len1 + m / len2 + (m - transpositions) / m) / 3.0


def jaro_winkler_similarity(s1: str | None, s2: str | None, p: float = 0.1) -> float:
    """Jaro-Winkler; None -> 0.0 (contract of string_utils.py:80-83)."""
    if s1 is None or s2 is None:
        return 0.0
    jaro = jaro_similarity(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1, s2):
        if c1 != c2 or prefix == 4:
            break
        prefix += 1
    return jaro + prefix * p * (1.0 - jaro)


def _encode_padded(strs, pad_val: int):
    """Codepoint matrix (n, maxlen) int32 padded with ``pad_val`` +
    int64 lengths — shared encoding for the batch string kernels.
    ONE join + ONE utf-32 encode + a flat scatter (utf-32-le is
    context-free per codepoint, so the joined encode is byte-identical
    to per-string encodes); no per-string Python in the hot path."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    width = max(maxlen, 1)
    M = np.full((n, width), pad_val, dtype=np.int32)
    total = int(lens.sum())
    if total:
        flat = np.frombuffer(
            "".join(strs).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int32)
        starts = np.cumsum(lens) - lens
        dest = (
            np.repeat(np.arange(n, dtype=np.int64) * width - starts, lens)
            + np.arange(total, dtype=np.int64)
        )
        M.ravel()[dest] = flat
    return M, lens


def levenshtein_batch(a: list, b: list) -> np.ndarray:
    """Vectorized Wagner-Fischer over pair lists: one DP row per
    iteration across ALL pairs at once; the in-row deletion chain is the
    classic prefix-min trick (cummin of base - j, then + j). Bit-exact
    equal to ``levenshtein`` (tests/test_kernels.py asserts)."""
    P = len(a)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    A, la = _encode_padded(a, -1)
    B, lb = _encode_padded(b, -2)
    L1, L2 = A.shape[1], B.shape[1]
    j_idx = np.arange(L2 + 1, dtype=np.int64)
    prev = np.broadcast_to(j_idx, (P, L2 + 1)).copy()
    out = lb.copy()  # pairs with len(a)==0
    done = la == 0
    for i in range(1, L1 + 1):
        neq = (A[:, i - 1 : i] != B).astype(np.int64)  # (P, L2)
        base = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + neq)
        full = np.concatenate(
            [np.full((P, 1), i, dtype=np.int64), base], axis=1
        )
        cur = np.minimum.accumulate(full - j_idx, axis=1) + j_idx
        hit = (la == i) & ~done
        if hit.any():
            out[hit] = cur[hit, lb[hit]]
            done |= hit
        prev = cur
    return out


def jaro_winkler_batch(a: list, b: list, p: float = 0.1) -> np.ndarray:
    """Vectorized Jaro-Winkler over pair lists — greedy window matching
    runs one s1-position per iteration across all pairs; transposition
    counting aligns the ragged matched sequences via row-major nonzero.
    Bit-exact equal to ``jaro_winkler_similarity`` (tests assert)."""
    P = len(a)
    if P == 0:
        return np.zeros(0, dtype=np.float64)
    A, la = _encode_padded(a, -1)
    B, lb = _encode_padded(b, -2)
    L1, L2 = A.shape[1], B.shape[1]
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    jcols = np.arange(L2, dtype=np.int64)
    flags2 = np.zeros((P, L2), dtype=bool)
    matched_j = np.full((P, L1), -1, dtype=np.int64)
    for i in range(L1):
        active = i < la
        cand = (
            (B == A[:, i : i + 1])
            & ~flags2
            & (jcols[None, :] >= (i - w)[:, None])
            & (jcols[None, :] < np.minimum(lb, i + w + 1)[:, None])
            & active[:, None]
        )
        has = cand.any(axis=1)
        js = np.argmax(cand, axis=1)
        flags2[np.nonzero(has)[0], js[has]] = True
        matched_j[has, i] = js[has]
    m = (matched_j >= 0).sum(axis=1).astype(np.int64)
    # transpositions: k-th matched char of s1 (i order) vs k-th matched
    # char of s2 (j order) — row-major nonzero aligns the ragged rows
    p1, i1 = np.nonzero(matched_j >= 0)
    p2, j2 = np.nonzero(flags2)
    neq = (A[p1, i1] != B[p2, j2]).astype(np.int64)
    trans = np.bincount(p1, weights=neq, minlength=P).astype(np.int64) // 2
    mf = m.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        jaro = (mf / la + mf / lb + (mf - trans) / mf) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    jaro = np.where((la == 0) & (lb == 0), 1.0, jaro)  # '' == '' -> 1.0
    # winkler prefix boost: common prefix capped at 4
    k = min(4, L1, L2)
    if k > 0:
        pos = np.arange(k)
        eq = (
            (A[:, :k] == B[:, :k])
            & (pos[None, :] < la[:, None])
            & (pos[None, :] < lb[:, None])
        )
        prefix = np.minimum(
            np.cumprod(eq, axis=1).sum(axis=1), 4
        ).astype(np.float64)
    else:
        prefix = np.zeros(P)
    return jaro + prefix * p * (1.0 - jaro)


def levenshtein(s1: str, s2: str) -> int:
    """Wagner-Fischer edit distance (two-row DP) with common prefix/suffix
    stripping — near-identical strings (the common case for within-block
    url paths) cost O(diff²) instead of O(n²)."""
    if s1 == s2:
        return 0
    # strip common prefix
    p = 0
    lim = min(len(s1), len(s2))
    while p < lim and s1[p] == s2[p]:
        p += 1
    # strip common suffix
    q = 0
    while q < lim - p and s1[len(s1) - 1 - q] == s2[len(s2) - 1 - q]:
        q += 1
    s1 = s1[p : len(s1) - q]
    s2 = s2[p : len(s2) - q]
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def edit_diff_chars(str1: str, str2: str) -> list[str]:
    """Characters touched by an optimal edit script, longer string first —
    same contract as the reference's editops walk
    (string_utils.py:59-77): deleted/replaced chars come from the longer
    string, inserted chars from the shorter one.
    """
    if len(str1) < len(str2):
        str1, str2 = str2, str1
    n1, n2 = len(str1), len(str2)
    # full DP matrix + backtrace (strings here are short: names/urls)
    dp = [[0] * (n2 + 1) for _ in range(n1 + 1)]
    for i in range(n1 + 1):
        dp[i][0] = i
    for j in range(n2 + 1):
        dp[0][j] = j
    for i in range(1, n1 + 1):
        row, prow = dp[i], dp[i - 1]
        c1 = str1[i - 1]
        for j in range(1, n2 + 1):
            row[j] = min(prow[j] + 1, row[j - 1] + 1, prow[j - 1] + (c1 != str2[j - 1]))
    diff: list[str] = []
    i, j = n1, n2
    while i > 0 or j > 0:
        if i > 0 and j > 0 and str1[i - 1] == str2[j - 1] and dp[i][j] == dp[i - 1][j - 1]:
            i -= 1
            j -= 1
        elif i > 0 and j > 0 and dp[i][j] == dp[i - 1][j - 1] + 1:
            diff.append(str1[i - 1])  # replace
            i -= 1
            j -= 1
        elif i > 0 and dp[i][j] == dp[i - 1][j] + 1:
            diff.append(str1[i - 1])  # delete from longer
            i -= 1
        else:
            diff.append(str2[j - 1])  # insert from shorter
            j -= 1
    diff.reverse()
    return diff


def ascii_fold(text: str | None) -> str:
    """Lowercase, NFD-decompose, strip combining marks — the reference's
    Unicode name normalizer (src/help/specifal_name_transformer.py:17-22)."""
    if not text:
        return ""
    import unicodedata

    return "".join(
        ch
        for ch in unicodedata.normalize("NFD", text.lower())
        if unicodedata.category(ch) != "Mn"
    )


def clean_text(text: str | None) -> str:
    """The reference's clean_abstract semantics
    (database/pubmed_inner_outer_feature.sql:9-21): lowercase, strip
    non-[a-z] to spaces, collapse whitespace."""
    if not text:
        return ""
    return _WS_RE.sub(" ", _NON_LOWER_RE.sub(" ", text.lower())).strip()


def normalize_ws(text: str) -> str:
    """Collapse all whitespace runs to single spaces and strip."""
    return _WS_RE.sub(" ", text).strip()


def char_shingles(text: str, k: int = 3) -> list[str]:
    """Overlapping character k-grams of the whitespace-normalized text."""
    t = normalize_ws(text)
    if len(t) < k:
        return [t] if t else []
    return [t[i : i + k] for i in range(len(t) - k + 1)]


def token_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Overlapping token k-grams joined by a space."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]

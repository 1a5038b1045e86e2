"""Deterministic HTML -> text extraction.

Analog of the reference's deterministic XML document parser
(/root/reference/Dependency-Feature/src/main/java/CasedAffiliation.java:23-56):
a pure function over the raw document bytes whose output must be
byte-identical per url (BASELINE.json input_hint invariant, enforced by
tests/test_extract.py). Pure stdlib regex + html.unescape; no parser
libraries exist in this sandbox.

Pipeline (order matters, all case-insensitive):
1. decode utf-8 (errors="replace")
2. drop <!-- comments -->, <script>...</script>, <style>...</style>
3. replace every remaining tag with a single space
4. unescape HTML entities
5. collapse all whitespace runs to single spaces; strip
"""

from __future__ import annotations

import html as _html
import re

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes | str) -> str:
    """Extract visible text from HTML bytes — deterministic, stdlib-only."""
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        s = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        s = html_bytes
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.S | re.I)


def extract_title(html_bytes: bytes | str) -> str:
    """First <title> contents, entity-unescaped and whitespace-collapsed."""
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        s = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        s = html_bytes
    m = _TITLE_RE.search(s)
    if m is None:
        return ""
    return _WS_RE.sub(" ", _html.unescape(m.group(1))).strip()


_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", re.I)


def normalize_host(url: str) -> str:
    """Normalized host: lowercase, strip port, userinfo and leading 'www.'
    (the reference's Unicode name normalizer analog,
    /root/reference/src/help/specifal_name_transformer.py:17-22)."""
    m = _HOST_RE.match(url)
    host = (m.group(1) if m else url).lower()
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    host = host.split(":", 1)[0]
    if host.startswith("www."):
        host = host[4:]
    return host


def url_path(url: str) -> str:
    """Path + query portion of a url (after scheme+host), for similarity."""
    m = _HOST_RE.match(url)
    if not m:
        return url
    return url[m.end() :]


# ---- vectorized batch extraction ------------------------------------------
#
# Arrow/RE2 fast path for the dominant web case: pure-ASCII documents with
# no HTML entities. On such rows every step of extract_text/extract_title
# has an exact RE2 equivalent (non-greedy quantifiers, (?is) flags and \b
# agree between Python re and RE2 on ASCII; html.unescape is the identity
# when no '&' is present; Python's \s on ASCII text is exactly
# [ \t\n\r\f\v\x1c-\x1f], spelled explicitly below because RE2's \s is the
# narrower [\t\n\f\r ]). Any row that is non-ASCII, contains '&', or is
# not valid UTF-8 falls back to the scalar Python functions — so the
# output is byte-identical BY CONSTRUCTION on every input
# (tests/test_extract.py asserts on adversarial rows and the frozen
# oracle).

_WS_ASCII = "[ \\t\\n\\r\\f\\v\\x1c-\\x1f]"
_RE2_COMMENT = "(?s)<!--.*?-->"
_RE2_SCRIPT = f"(?si)<script\\b.*?</script{_WS_ASCII}*>"
_RE2_STYLE = f"(?si)<style\\b.*?</style{_WS_ASCII}*>"
_RE2_TAG = "<[^>]*>"
_RE2_WS_RUN = f"{_WS_ASCII}+"
_RE2_TITLE = f"(?si)<title[^>]*>(?P<t>.*?)</title{_WS_ASCII}*>"


def extract_batch(htmls) -> "tuple[list[str], list[str]]":
    """(texts, titles) for a pyarrow binary/string array of HTML payloads
    — RE2 kernels for ASCII entity-free rows, scalar Python fallback for
    the rest. Byte-identical to [extract_text(h)], [extract_title(h)]."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = htmls.combine_chunks() if isinstance(htmls, pa.ChunkedArray) else htmls
    n = len(arr)
    if n == 0:
        return [], []
    is_str = pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
    try:
        s = arr if is_str else arr.cast(pa.large_string())
    except pa.ArrowInvalid:
        # invalid UTF-8 somewhere in the batch: scalar path for all rows
        raw = arr.to_pylist()
        return [extract_text(h) for h in raw], [extract_title(h) for h in raw]
    s = pc.fill_null(s, "")
    fast_mask = np.asarray(
        pc.and_(pc.string_is_ascii(s), pc.invert(pc.match_substring(s, "&")))
    )
    texts: list = [None] * n
    titles: list = [None] * n
    if fast_mask.any():
        idx = np.flatnonzero(fast_mask)
        sub = s.take(pa.array(idx, pa.int64()))
        x = pc.replace_substring_regex(sub, _RE2_COMMENT, " ")
        x = pc.replace_substring_regex(x, _RE2_SCRIPT, " ")
        x = pc.replace_substring_regex(x, _RE2_STYLE, " ")
        x = pc.replace_substring_regex(x, _RE2_TAG, " ")
        x = pc.replace_substring_regex(x, _RE2_WS_RUN, " ")
        x = pc.utf8_trim(x, " ")
        tt = pc.extract_regex(sub, _RE2_TITLE)
        tt = pc.struct_field(tt, "t")
        tt = pc.fill_null(tt, "")
        tt = pc.utf8_trim(pc.replace_substring_regex(tt, _RE2_WS_RUN, " "), " ")
        for i, tx, ti in zip(
            idx.tolist(), x.to_pylist(), tt.to_pylist()
        ):
            texts[i] = tx
            titles[i] = ti
    if not fast_mask.all():
        raw = arr.to_pylist()
        for i in np.flatnonzero(~fast_mask).tolist():
            texts[i] = extract_text(raw[i])
            titles[i] = extract_title(raw[i])
    return texts, titles

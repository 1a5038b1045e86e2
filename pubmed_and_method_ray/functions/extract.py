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

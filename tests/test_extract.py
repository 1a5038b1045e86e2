"""Byte-identical extraction invariant (BASELINE.json input_hint; the
reference's deterministic document parser analog, SURVEY.md S6)."""

import pyarrow as pa

from pubmed_and_method_ray.functions.extract import (
    extract_text,
    extract_title,
    normalize_host,
    url_path,
)
from pubmed_and_method_ray.sources.pages import (
    oracle_text,
    pages_from_documents_batch,
    render_html,
)
from pubmed_and_method_ray.stages.mention_prep import extract_stage


class TestExtractText:
    def test_fixed_snippets(self):
        cases = [
            (b"<html><body><p>Hello   world</p></body></html>", "Hello world"),
            (b"<p>a&amp;b &lt;c&gt;</p>", "a&b <c>"),
            (b"<script>var x = '<p>no</p>';</script><b>keep</b>", "keep"),
            (b"<style>.a{}</style>text", "text"),
            (b"<!-- note\nmultiline --><i>x</i>", "x"),
            (b"", ""),
            ("déjà vu".encode(), "déjà vu"),
        ]
        for html, want in cases:
            assert extract_text(html) == want

    def test_title(self):
        assert extract_title(b"<title> A &amp;\n B </title><body>x</body>") == "A & B"
        assert extract_title(b"<body>x</body>") == ""

    def test_deterministic(self):
        h = b"<html><body><p>abc def</p></body></html>"
        assert extract_text(h) == extract_text(h)


class TestHostNormalization:
    def test_normalize_host(self):
        assert normalize_host("https://WWW.Example.COM:8080/a/b") == "example.com"
        assert normalize_host("http://user:pw@www.x.org/p") == "x.org"
        assert normalize_host("https://sub.site.net/q?x=1") == "sub.site.net"

    def test_url_path(self):
        assert url_path("https://x.org/a/b?c=1") == "/a/b?c=1"


class TestByteIdenticalInvariant:
    """extract_text(render_html(...)) must equal the frozen oracle text,
    byte for byte, for every generated page."""

    def test_roundtrip_direct(self):
        for i in range(50):
            url = f"https://www.site{i % 7}.example.org/e{i}/page0"
            title = f"title words {i}"
            body = " ".join(f"tok{j}v{i}" for j in range(40))
            html = render_html(url, title, body)
            assert extract_text(html) == oracle_text(title, body)

    def test_generated_corpus_invariant(self):
        batch = pa.Table.from_pydict(
            {
                "doc_id": list(range(30)),
                "text": [" ".join(f"w{i}x{j}" for j in range(60)) for i in range(30)],
                "lang": ["en"] * 30,
            }
        )
        pages = pages_from_documents_batch(batch, expand_k=4)
        out = extract_stage(pages)
        stored = pages["text"].to_pylist()
        extracted = out["text_extracted"].to_pylist()
        assert stored == extracted  # byte-identical per url
        assert out["host"].to_pylist()[0].startswith("site")

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


class TestExtractBatchParity:
    """The RE2 batch kernel must be byte-identical to the scalar Python
    extractor on EVERY input — fast-path rows (ASCII, no entities) and
    every fallback trigger (entities, unicode, invalid utf-8)."""

    ADVERSARIAL = [
        b"<html><body><p>Hello   world</p></body></html>",
        b"<p>a&amp;b &lt;c&gt;</p>",                      # entities -> fallback
        b"<script>var x = '<p>no</p>';</script><b>keep</b>",
        b"<SCRIPT>s</SCRIPT  >tail",                       # ws before '>'
        b"<style>.a{}</style>text",
        b"<!-- note\nmultiline --><i>x</i>",
        b"",
        b"   \t\n\x1c\x1d\x1e\x1f\x0b mixed \x1fws\t",     # python-\\s chars
        b"<title> T1 </title><title>T2</title>body",       # first title wins
        b"<title attr='x'>with\nnewline</title >x",
        b"no tags at all",
        b"<p>unclosed",
        b"a<b>c" * 500,
        "déjà vu <p>unicode</p>".encode(),                 # non-ascii -> fallback
        "<title>café</title>body".encode(),
        b"\xff\xfeinvalid utf8 <p>x</p>",                  # invalid -> batch fallback
        b"&#65;&#x42; entities",
        b"<scriptx>not a script</scriptx><script>real</script>after",
    ]

    def test_adversarial_parity(self):
        from pubmed_and_method_ray.functions.extract import extract_batch

        arr = pa.array(self.ADVERSARIAL, pa.binary())
        texts, titles = extract_batch(arr)
        for h, tx, ti in zip(self.ADVERSARIAL, texts, titles):
            assert tx == extract_text(h), h
            assert ti == extract_title(h), h

    def test_mixed_batch_parity(self):
        # fast and fallback rows interleaved in one batch keep row order
        from pubmed_and_method_ray.functions.extract import extract_batch

        rows = [
            b"<p>plain ascii</p>",
            "unicode   row".encode(),
            b"<p>a&amp;b</p>",
            b"<title>ok</title>rest",
        ] * 5
        arr = pa.array(rows, pa.binary())
        texts, titles = extract_batch(arr)
        assert texts == [extract_text(h) for h in rows]
        assert titles == [extract_title(h) for h in rows]

    def test_fuzz_parity(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pubmed_and_method_ray.functions.extract import extract_batch

        alphabet = st.sampled_from(
            list("<>&/! -=ab\t\n\r\x0b\x1c\x1f")
            + ["script", "style", "title", "--", "déjà", "&amp;"]
        )

        @given(
            st.lists(
                st.lists(alphabet, max_size=30).map("".join),
                min_size=1,
                max_size=12,
            )
        )
        @settings(max_examples=120, deadline=None)
        def check(rows):
            raw = [r.encode("utf-8") for r in rows]
            texts, titles = extract_batch(pa.array(raw, pa.binary()))
            assert texts == [extract_text(h) for h in raw]
            assert titles == [extract_title(h) for h in raw]

        check()


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

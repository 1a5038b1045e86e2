"""Deterministic synthetic web-page corpus (the ER pipeline's input).

Input shape is exactly BASELINE.json's ``input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:large_string,
lang:string`` — the analog of the reference's gold corpora
(/root/reference/resources/gold_standard_dataset/song/and_corpus.txt, and
the exploded mention view at
/root/reference/database/pubmed_inner_outer_feature.sql:111-172).

Entities are planted like SONG clusters: each entity owns k pages on the
SAME normalized host with near-duplicate text (high shingle overlap), so
gold co-cluster pairs share the (host, simhash-band) blocking key by
construction; other entities on the same host are hard negatives
(FIXTURES.md F1). Hosts follow a Zipf-ish distribution so some hosts are
mega-blocks (skew analog of README.md:3 "~10k blocks >1000").

Everything is keyed off ``seed`` + stable hashes — no wall clock, no
unseeded RNG. Page generation is a pure per-batch function so the corpus
can be materialized *inside* ``map_batches`` and therefore scales with
the cluster instead of the driver.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_u64, stable_hash64


def host_cum_weights(n_hosts: int) -> np.ndarray:
    """Normalized cumulative Zipf-ish host weights (1/sqrt(rank)).
    Exposed so the DuckDB oracle for the ER queries can embed the same
    float64 literals (__ray_entry__.oracle_sql)."""
    ranks = np.arange(n_hosts, dtype=np.float64) + 1.0
    cum = np.cumsum(1.0 / np.sqrt(ranks))
    cum /= cum[-1]
    return cum

# ---------------------------------------------------------------------------
# HTML templating (inverse of functions.extract.extract_text by construction)
# ---------------------------------------------------------------------------

_BOILER_SCRIPTS = [
    "<script>var t = Date.now(); track(t);</script>",
    "<script type='text/javascript'>/* analytics <b>noise</b> */ load();</script>",
    "",
]
_BOILER_STYLES = [
    "<style>body { margin: 0; } .x > .y { color: #fff; }</style>",
    "",
]
_COMMENTS = [
    "<!-- generated page -->",
    "<!-- cache: miss\n     ttl: 300 -->",
    "",
]


def render_html(url: str, title: str, text: str) -> bytes:
    """Wrap `text` in templated HTML with boilerplate/entity/whitespace noise.

    Invariant: extract_text(render_html(url, title, text)) == normalize_ws of
    the rendered visible content — tests freeze the oracle text instead.
    """
    h = stable_hash64(url, seed=0xE5)
    script = _BOILER_SCRIPTS[h % 3]
    style = _BOILER_STYLES[(h >> 2) % 2]
    comment = _COMMENTS[(h >> 4) % 3]
    nl = "\n" * (1 + (h >> 6) % 3)
    indent = " " * ((h >> 8) % 4)
    words = text.split(" ")
    mid = len(words) // 2
    p1 = _html.escape(" ".join(words[:mid]))
    p2 = _html.escape(" ".join(words[mid:]))
    doc = (
        f"<!DOCTYPE html>{nl}<html>{nl}<head>{comment}{nl}{indent}"
        f"<title>{_html.escape(title)}</title>{nl}{style}{script}</head>{nl}"
        f"<body>{nl}{indent}<h1>{_html.escape(title)}</h1>{nl}"
        f"{indent}<p>{p1}</p>{nl}{indent}<p>{nl}{p2}{nl}</p>{nl}"
        f"</body>{nl}</html>{nl}"
    )
    return doc.encode("utf-8")


def oracle_text(title: str, text: str) -> str:
    """The byte-exact text extract_text must recover from render_html."""
    words = text.split(" ")
    mid = len(words) // 2
    parts = [title, title, " ".join(words[:mid]), " ".join(words[mid:])]
    return " ".join(p for p in parts if p)


# ---------------------------------------------------------------------------
# Deterministic entity / page synthesis
# ---------------------------------------------------------------------------

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
        pa.field("entity_id", pa.string()),  # gold label (dropped for unlabeled runs)
    ]
)

_EPOCH_BASE_US = 1_577_836_800_000_000  # 2020-01-01 UTC, fixed


def _perturb_tokens(tokens: list[str], rng: np.random.Generator, rate: float) -> list[str]:
    """Seeded token-level edits keeping high shingle overlap (near-dup)."""
    out = list(tokens)
    n_edit = max(1, int(len(out) * rate)) if out else 0
    for _ in range(n_edit):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, max(1, len(out))))
        if op == 0 and len(out) > 4:
            del out[pos % len(out)]
        elif op == 1:
            out.insert(pos % (len(out) + 1), f"v{int(rng.integers(0, 999))}")
        elif out:
            p = pos % len(out)
            out[p] = out[p] + "x"
    return out


def pages_from_documents_batch(
    batch: pa.Table,
    expand_k: int = 4,
    n_hosts: int = 50,
    seed: int = 42,
    keep_gold: bool = True,
) -> pa.Table:
    """Pure per-batch generator: each `documents` row becomes one entity
    with k near-duplicate pages on one Zipf-assigned host.

    Usable directly in ``ds.map_batches(..., batch_format="pyarrow")`` so
    corpus materialization is distributed, not a driver loop.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()

    # Zipf-ish host weights ~ 1/sqrt(h+1): the head host holds ~8% of
    # entities — a genuine mega-block (salting exercised) without making
    # the whole corpus one block
    cum = host_cum_weights(n_hosts)

    urls, tss, htmls, otexts, olangs, ents = [], [], [], [], [], []
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        ent = f"e{doc_id}"
        # md5-keyed so the DuckDB oracle for er_clusters/er_match_edges
        # can re-derive (host_id, k) per entity from the documents table
        h64 = md5_u64(ent)
        host_draw = (h64 % 10_000_019) / 10_000_019.0
        host_id = int(np.searchsorted(cum, host_draw))
        host = f"site{host_id}.example.org"
        rng = np.random.default_rng(h64 & 0xFFFFFFFF)
        k = 1 + int(h64 % expand_k)  # k ∈ [1, expand_k], SQL: 1 + h64 % e
        # entity-salted vocabulary: the shared documents vocab is tiny, so
        # cross-entity text would otherwise be near-dup by accident; real
        # pages differ in content. ~1 salt token per shared token keeps
        # cross-entity jaccard low while same-entity pages stay near-dup.
        shared = (text or "").split(" ")
        base_tokens = list(shared)
        for i, w in enumerate(shared):
            base_tokens.append(f"s{doc_id}w{(h64 >> (i % 32)) & 0xFF}n{i}")
        base_ts = _EPOCH_BASE_US + (h64 % 10_000_000) * 1_000_000
        for j in range(k):
            toks = (
                base_tokens
                if j == 0
                else _perturb_tokens(base_tokens, rng, rate=0.03)
            )
            body = " ".join(toks)
            title = " ".join(base_tokens[:6]) or ent
            url = f"https://www.{host}/{ent}/page{j}"
            urls.append(url)
            tss.append(base_ts + j * 3_600_000_000 + int(rng.integers(0, 60_000_000)))
            htmls.append(render_html(url, title, body))
            otexts.append(oracle_text(title, body))
            olangs.append(lang or "en")
            ents.append(ent)

    cols = [
        pa.array(urls, pa.string()),
        pa.array(tss, pa.timestamp("us")),
        pa.array(htmls, pa.binary()),
        pa.array(otexts, pa.large_string()),
        pa.array(olangs, pa.string()),
        pa.array(ents, pa.string()),
    ]
    t = pa.Table.from_arrays(cols, schema=PAGES_SCHEMA)
    if not keep_gold:
        t = t.drop_columns(["entity_id"])
    return t


def build_pages_dataset(
    sf_dir: str,
    expand_k: int = 4,
    n_hosts: int | None = None,
    seed: int = 42,
    repeat: int = 1,
):
    """Distributed corpus build: documents.parquet -> pages Dataset.

    ``repeat`` > 1 replicates the documents table with distinct entity
    namespaces to scale the bench corpus without new inputs. The host
    universe grows with ``repeat`` (real corpus growth adds hosts, it
    doesn't quadruple every host), keeping the block-size distribution
    stable while the head host still grows into a salted mega-block.
    """
    if n_hosts is None:
        n_hosts = 50 * repeat
    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    if repeat > 1:

        def replicate(t: pa.Table, r=repeat) -> pa.Table:
            parts = []
            for i in range(r):
                ids = pa.compute.add(t["doc_id"], i * 10_000_000)
                parts.append(t.set_column(0, "doc_id", ids))
            return pa.concat_tables(parts)

        ds = ds.map_batches(replicate, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: pages_from_documents_batch(b, expand_k, n_hosts, seed),
        batch_format="pyarrow",
    )

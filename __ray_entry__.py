"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship ER pipeline on sf0.001-derived pages with
the pretrained GBT; ``queries()`` exposes every implemented operator from
SURVEY.md §2 (plus the training-data extensions: dedup family, similarity
search, text analysis, multimodal plumbing); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query, with identical
column names and float-parity conventions (int/int divisions are
bit-identical; additive double aggregates are ROUND()ed on both sides).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUALITY_SW_SQL = "('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with')"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages derived from the
    documents table -> blocking -> pair features -> pretrained GBT ->
    connected components -> (url, cluster_id)."""
    from pubmed_and_method_ray.pipelines.er import run_er_pipeline
    from pubmed_and_method_ray.sources.pages import build_pages_dataset
    from pubmed_and_method_ray.state import (
        load_pretrained_idf,
        load_pretrained_model_json,
    )

    pages = build_pages_dataset("/root/testdata/sf0.001", expand_k=4)
    out = run_er_pipeline(
        pages,
        model_json=load_pretrained_model_json(),
        idf=load_pretrained_idf(),
        n_max=512,
        evaluate=False,
    )
    return out["clusters"]


def _er_clusters(sf_dir: str):
    from pubmed_and_method_ray.pipelines.er import run_er_pipeline
    from pubmed_and_method_ray.sources.pages import build_pages_dataset
    from pubmed_and_method_ray.state import (
        load_pretrained_idf,
        load_pretrained_model_json,
    )

    pages = build_pages_dataset(sf_dir, expand_k=3)
    out = run_er_pipeline(
        pages,
        model_json=load_pretrained_model_json(),
        idf=load_pretrained_idf(),
        n_max=512,
        evaluate=False,
    )
    return out["clusters"]


def _er_match_edges(sf_dir: str):
    """Pairwise co-membership view of the predicted clustering (the
    reference's cluster-pairwise metric semantics, src/metric/metric.py):
    all canonical (url_1 < url_2) pairs within each predicted cluster.
    Raw scorer edges are blocking-dependent (a same-entity pair can reach
    the same cluster via transitivity without a direct candidate edge),
    so the *resolved* pair set is the deterministic, oracle-checkable
    output."""
    from pubmed_and_method_ray.pipelines.er import run_er_pipeline
    from pubmed_and_method_ray.sources.pages import build_pages_dataset
    from pubmed_and_method_ray.state import (
        load_pretrained_idf,
        load_pretrained_model_json,
    )
    from pubmed_and_method_ray.stages.cluster import cluster_pairs

    pages = build_pages_dataset(sf_dir, expand_k=3)
    out = run_er_pipeline(
        pages,
        model_json=load_pretrained_model_json(),
        idf=load_pretrained_idf(),
        n_max=512,
        evaluate=False,
    )
    return cluster_pairs(out["clusters"])


def queries() -> dict[str, Callable[[str], Any]]:
    from pubmed_and_method_ray.pipelines import (
        analysis,
        dedup,
        multimodal,
        relational,
        similarity,
        text_analysis,
    )

    # Exactly the 50 driver-snapshot slots — nothing past the cutoff.
    # Every near-duplicate operator variant that previously sat past the
    # 50-entry snapshot is now CERTIFIED INSIDE a sibling query instead
    # of holding its own slot (its kernel rides as extra columns, so the
    # driver's value-hash covers it):
    #   token_count       -> token_count_bpe.n_tokens_ws
    #   doc_fingerprint   -> doc_rolling_fingerprint.fp
    #   payload_meta      -> multimodal_decode.{payload_bytes,payload_md5}
    #   embedding_norms   -> ann_topk.l2_norm
    # and the literal aliases lost their slots outright (functions remain,
    # pytest-tested): dedup_ngram_jaccard == pair_jaccard_docs filtered;
    # ann_topk_lsh/ann_topk_ivf produce the same rows as their _indexed
    # twins (asserted in tests/test_extensions.py).
    # tests/test_certified.py pins CERTIFIED_QUERIES to this dict's order,
    # so any reordering is a visible diff.
    return {
        # -- flagship ER (model-driven; rows-only checks) ------------------
        "er_clusters": _er_clusters,
        "er_match_edges": _er_match_edges,
        # -- S9 crawler analog (rate-limited, retrying, resumable fetch) ---
        "crawl_corpus": _crawl_corpus,
        # -- E5 external-ID trivial baseline over the blocking universe ----
        "external_id_baseline": analysis.external_id_baseline,
        # -- dedup family --------------------------------------------------
        "dedup_exact": dedup.dedup_exact,
        "pair_jaccard_docs": dedup.pair_jaccard_docs,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_canonical_docs": dedup.dedup_canonical_docs,
        "dedup_embedding_cosine": dedup.dedup_embedding_cosine,
        # -- similarity search --------------------------------------------
        "ann_topk": similarity.ann_topk,
        "ann_topk_lsh_indexed": similarity.ann_topk_lsh_indexed,
        "ann_topk_ivf_indexed": similarity.ann_topk_ivf_indexed,
        # -- text analysis ------------------------------------------------
        "token_count_bpe": text_analysis.token_count_bpe,
        "quality_score": text_analysis.quality_score,
        "lang_id": text_analysis.lang_id,
        "doc_rolling_fingerprint": text_analysis.doc_rolling_fingerprint,
        "redact_pii": text_analysis.redact_pii,
        "approx_distinct_tokens": text_analysis.approx_distinct_tokens,
        "heavy_hitters_cms": text_analysis.heavy_hitters_cms,
        "clean_text_docs": text_analysis.clean_text_docs,
        "tag_entities": text_analysis.tag_entities,
        "doc_keywords": text_analysis.doc_keywords,
        # -- multimodal plumbing ------------------------------------------
        "multimodal_decode": multimodal.decode_features,
        "multimodal_resize": multimodal.resize_features,
        "multimodal_frames": multimodal.frame_samples,
        # -- relational coverage (joins/aggs/sort/window/union) -----------
        "pricing_summary": relational.pricing_summary,
        "revenue_by_nation": relational.revenue_by_nation,
        "top_parts": relational.top_parts,
        "filter_project_lineitem": relational.filter_project_lineitem,
        "events_hour_window": relational.events_hour_window,
        "events_hopping_window": relational.events_hopping_window,
        "block_census_docs": relational.block_census_docs,
        "doc_commonness": relational.doc_commonness,
        "pair_gen_docs": relational.pair_gen_docs,
        "union_distinct_keys": relational.union_distinct_keys,
        "semi_join_orders": relational.semi_join_orders,
        "join_order_priority_revenue": relational.join_order_priority_revenue,
        "top_docs_per_block": relational.top_docs_per_block,
        "events_lag_delta": relational.events_lag_delta,
        "event_value_median": relational.event_value_median,
        "title_repair": relational.title_repair,
        "registry_enrich": relational.registry_enrich,
        "user_activity": relational.user_activity,
        "events_sessions": relational.events_sessions,
        "deterministic_sample": relational.deterministic_sample,
        "rank_docs": relational.rank_docs,
        "events_asof_prev_click": relational.events_asof_prev_click,
        "events_range_pairs_1h": relational.events_range_pairs_1h,
        "bloom_semi_join": relational.bloom_semi_join,
    }


# The driver-certified query list, pinned: the CORRECTNESS snapshot
# records the first 50 queries() entries in insertion order, so this
# constant (asserted against queries() in tests/test_certified.py) makes
# any accidental reordering or displacement a visible, reviewable diff.
CERTIFIED_QUERIES = (
    "er_clusters",
    "er_match_edges",
    "crawl_corpus",
    "external_id_baseline",
    "dedup_exact",
    "pair_jaccard_docs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_canonical_docs",
    "dedup_embedding_cosine",
    "ann_topk",
    "ann_topk_lsh_indexed",
    "ann_topk_ivf_indexed",
    "token_count_bpe",
    "quality_score",
    "lang_id",
    "doc_rolling_fingerprint",
    "redact_pii",
    "approx_distinct_tokens",
    "heavy_hitters_cms",
    "clean_text_docs",
    "tag_entities",
    "doc_keywords",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_frames",
    "pricing_summary",
    "revenue_by_nation",
    "top_parts",
    "filter_project_lineitem",
    "events_hour_window",
    "events_hopping_window",
    "block_census_docs",
    "doc_commonness",
    "pair_gen_docs",
    "union_distinct_keys",
    "semi_join_orders",
    "join_order_priority_revenue",
    "top_docs_per_block",
    "events_lag_delta",
    "event_value_median",
    "title_repair",
    "registry_enrich",
    "user_activity",
    "events_sessions",
    "deterministic_sample",
    "rank_docs",
    "events_asof_prev_click",
    "events_range_pairs_1h",
    "bloom_semi_join",
)


def _crawl_corpus(sf_dir: str):
    """S9 crawler analog: fetch every distinct documents.doc_id through
    the retrying, rate-limited, shard-resumable fetch stage
    (sources/crawler.py) with the deterministic sandbox fetcher, then
    read the fetched shards back. Payload bytes and the retry count are
    pure functions of the id, so the whole operator is SQL-checkable."""
    import os
    import shutil

    from pubmed_and_method_ray.sources.crawler import fetch_corpus, read_corpus
    from pubmed_and_method_ray.sources.io import read_parquet_clean

    out_dir = f"/tmp/crawl_corpus_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)  # fresh fetch per driver run
    ids = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    fetch_corpus(ids, out_dir, n_shards=8)
    return read_corpus(out_dir).select_columns(
        ["doc_id", "n_bytes", "attempts", "status"]
    )


def _er_pages_cte(expand_k: int = 3, n_hosts: int = 50) -> str:
    """CTE reconstructing the synthetic page corpus *structure* (url,
    entity grouping) in pure SQL: sources/pages.py derives (host_id, k)
    per entity from md5_u64('e'||doc_id) == DuckDB md5_number_upper, and
    the Zipf host-weight cumulative table is embedded as float64 literals
    from the same generator function."""
    from pubmed_and_method_ray.sources.pages import host_cum_weights

    cum = "[" + ", ".join(repr(float(c)) for c in host_cum_weights(n_hosts)) + "]"
    return (
        "WITH h AS (SELECT doc_id, "
        "md5_number_upper('e' || CAST(doc_id AS VARCHAR)) AS h64 FROM documents), "
        f"p AS (SELECT doc_id, CAST(1 + (h64 % {expand_k}) AS INT) AS k, "
        f"len(list_filter({cum}, c -> c < (h64 % 10000019) / 10000019.0)) AS host_id "
        "FROM h), "
        "pg AS (SELECT doc_id, host_id, "
        "unnest(generate_series(0, k - 1)) AS j FROM p), "
        "pgu AS (SELECT doc_id, j, host_id, "
        "'https://www.site' || CAST(host_id AS VARCHAR) "
        "|| '.example.org/e' || CAST(doc_id AS VARCHAR) || '/page' "
        "|| CAST(j AS VARCHAR) AS url, "
        "'https://www.site' || CAST(host_id AS VARCHAR) || '.example.org/e' "
        "|| CAST(doc_id AS VARCHAR) || '/page0' AS page0 FROM pg)"
    )


def _hll_sql() -> str:
    """HLL oracle over the documents token stream: md5 bucket/rank, a
    generated CASE chain for the leading-zero rank (libm log2 is not
    correctly rounded at power-of-two boundaries, so the chain compares
    against exact integer thresholds), integer-scaled harmonic sum, and
    the raw estimate with the exact operation order of
    pipelines/text_analysis.hll_estimate."""
    from pubmed_and_method_ray.pipelines.text_analysis import (
        HLL_ALPHA,
        HLL_M,
        HLL_P,
        HLL_REG_CAP,
    )

    rank_case = (
        "CASE "
        + " ".join(
            f"WHEN w >= {1 << (64 - HLL_P - rank)} THEN {rank}"
            for rank in range(1, 64 - HLL_P + 1)
        )
        + f" ELSE {64 - HLL_P + 1} END"
    )
    scale = 1 << HLL_REG_CAP
    return (
        "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token "
        "FROM documents), "
        "v AS (SELECT md5_number_upper(token) AS v FROM tok), "
        f"br AS (SELECT CAST(v % {HLL_M} AS BIGINT) AS bucket, "
        f"(v >> {HLL_P}) AS w FROM v), "
        f"r AS (SELECT bucket, LEAST({rank_case}, {HLL_REG_CAP}) AS reg FROM br), "
        "regs AS (SELECT bucket, MAX(reg) AS reg FROM r GROUP BY bucket), "
        "s AS (SELECT COUNT(*) AS n_used, "
        f"CAST(SUM(CAST(1 AS BIGINT) << ({HLL_REG_CAP} - reg)) AS BIGINT) "
        "AS s_used FROM regs) "
        f"SELECT CAST({HLL_M} AS BIGINT) AS m, "
        f"CAST({HLL_M} - n_used AS BIGINT) AS n_zero, "
        f"CAST({HLL_M} - n_used AS BIGINT) * {scale} + s_used "
        "AS harmonic_scaled, "
        f"((CAST({HLL_ALPHA!r} AS DOUBLE) * CAST({HLL_M} AS DOUBLE) "
        f"* CAST({HLL_M} AS DOUBLE)) * CAST({scale} AS DOUBLE)) / "
        f"CAST(CAST({HLL_M} - n_used AS BIGINT) * {scale} + s_used AS DOUBLE) "
        "AS estimate FROM s"
    )


def _sm64_sql(prefix: str, x: str) -> str:
    """Chained-CTE splitmix64 over a UBIGINT column expression ``x``:
    returns SQL fragment 'cte1, cte2, ...' ending in a CTE named
    ``{prefix}_out`` with column ``hv``. The two 64x64->64 multiplies are
    decomposed into 32-bit partial products so HUGEINT never overflows;
    constants are functions.hashing's public-domain splitmix64 ones."""
    G = 0x9E3779B97F4A7C15
    M1 = 0xBF58476D1CE4E5B9
    M2 = 0x94D049BB133111EB
    T = 1 << 64
    B32 = 1 << 32

    def mulmod(col: str, m: int) -> str:
        return (
            f"CAST((({col} % {B32})::HUGEINT * {m} + "
            f"((({col} >> 32)::HUGEINT * {m}) % {B32}) * {B32}) % {T} AS UBIGINT)"
        )

    p = prefix
    return (
        f"{p}_1 AS (SELECT *, CAST(({x}::HUGEINT + {G}) % {T} AS UBIGINT) AS sm_a "
        f"FROM {p}_in), "
        f"{p}_2 AS (SELECT *, xor(sm_a, sm_a >> 30) AS sm_b FROM {p}_1), "
        f"{p}_3 AS (SELECT *, {mulmod('sm_b', M1)} AS sm_c FROM {p}_2), "
        f"{p}_4 AS (SELECT *, xor(sm_c, sm_c >> 27) AS sm_d FROM {p}_3), "
        f"{p}_5 AS (SELECT *, {mulmod('sm_d', M2)} AS sm_e FROM {p}_4), "
        f"{p}_out AS (SELECT *, xor(sm_e, sm_e >> 31) AS hv FROM {p}_5)"
    )


def _minhash_lsh_oracle(
    num_perm: int = 64, n_bands: int = 16, threshold: float = 0.8
) -> str:
    """MinHash-LSH oracle mirroring _SketchBander's vectorized
    construction exactly: md5_number_upper TOKEN hashes, shingle hash =
    splitmix64 fold over the shingle's 3 token hashes (h0 = 83;
    h_j = sm64(h ^ th_j); docs with < 3 tokens fold all their tokens
    into ONE gram), distinct gram hashes per doc, signatures re-keyed by
    the 64 splitmix64 seed literals (same values as
    functions.simhash.minhash_from_hashes), min per permutation, literal
    signature-value band keys, band-join candidates, exact gram-hash-set
    jaccard verify at the threshold."""
    import numpy as np

    from pubmed_and_method_ray.functions.hashing import splitmix64

    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(8))
    seed_rows = ", ".join(
        f"({i}, {int(s)}::UBIGINT)" for i, s in enumerate(seeds)
    )
    rows = num_perm // n_bands
    return (
        "WITH t AS (SELECT doc_id, str_split(lower(text), ' ') AS toks "
        "FROM documents), "
        "nt AS (SELECT doc_id, len(toks) AS n, toks FROM t), "
        "tok AS (SELECT doc_id, unnest(generate_series(1, n)) AS j, "
        "unnest(toks) AS token FROM nt), "
        "th AS (SELECT doc_id, j, md5_number_upper(token) AS th FROM tok), "
        "gp AS (SELECT doc_id, unnest(generate_series(1, greatest(1, n - 2))) "
        "AS g FROM nt), "
        "g0 AS (SELECT gp.doc_id AS doc_id, gp.g AS g, "
        "a.th AS th1, b.th AS th2, c.th AS th3 FROM gp "
        "JOIN th a ON a.doc_id = gp.doc_id AND a.j = gp.g "
        "LEFT JOIN th b ON b.doc_id = gp.doc_id AND b.j = gp.g + 1 "
        "LEFT JOIN th c ON c.doc_id = gp.doc_id AND c.j = gp.g + 2), "
        # fold step 1: h1 = sm64(83 ^ th1)
        "f1_in AS (SELECT doc_id, g, th2, th3, xor(th1, 83::UBIGINT) AS x "
        "FROM g0), "
        + _sm64_sql("f1", "x")
        # fold step 2: h2 = th2 null ? h1 : sm64(h1 ^ th2)
        + ", f2_in AS (SELECT doc_id, g, th2, th3, hv AS h1, "
        "xor(hv, COALESCE(th2, 0::UBIGINT)) AS x FROM f1_out), "
        + _sm64_sql("f2", "x")
        # fold step 3: h3 = th3 null ? h2 : sm64(h2 ^ th3)
        + ", f3_in AS (SELECT doc_id, g, th3, "
        "CASE WHEN th2 IS NULL THEN h1 ELSE hv END AS h2, "
        "xor(CASE WHEN th2 IS NULL THEN h1 ELSE hv END, "
        "COALESCE(th3, 0::UBIGINT)) AS x FROM f2_out), "
        + _sm64_sql("f3", "x")
        + ", gh AS (SELECT DISTINCT doc_id, "
        "CASE WHEN th3 IS NULL THEN h2 ELSE hv END AS gh FROM f3_out), "
        f"seeds AS (SELECT * FROM (VALUES {seed_rows}) AS s(perm, seed)), "
        "sm_in AS (SELECT doc_id, perm, xor(gh, seed) AS x0 "
        "FROM gh CROSS JOIN seeds), "
        + _sm64_sql("sm", "x0")
        + ", sig AS (SELECT doc_id, perm, MIN(hv) AS s FROM sm_out "
        "GROUP BY doc_id, perm), "
        f"band AS (SELECT doc_id, 'b' || CAST(perm // {rows} AS VARCHAR) || ':' || "
        "string_agg(CAST(s AS VARCHAR), ',' ORDER BY perm) AS band_key "
        f"FROM sig GROUP BY doc_id, perm // {rows}), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_id1, b.doc_id AS doc_id2 "
        "FROM band a JOIN band b ON a.band_key = b.band_key "
        "AND a.doc_id < b.doc_id), "
        "gd AS (SELECT doc_id, list(gh) AS grams FROM gh GROUP BY doc_id) "
        "SELECT doc_id1, doc_id2, jaccard FROM ("
        "SELECT c.doc_id1, c.doc_id2, "
        "len(list_intersect(x.grams, y.grams)) / "
        "len(list_distinct(list_concat(x.grams, y.grams))) AS jaccard "
        "FROM cand c JOIN gd x ON c.doc_id1 = x.doc_id "
        "JOIN gd y ON c.doc_id2 = y.doc_id) "
        f"WHERE jaccard >= {threshold}"
    )


def _ann_lsh_oracle(n_planes: int = 8, dim: int = 64, k: int = 10) -> str:
    """LSH ANN oracle: the fixed seeded hyperplanes are embedded as
    float64 literals from the same generator (similarity.lsh_planes);
    bucket signature = sign bits of raw-vector dots, candidates within
    Hamming distance 1 of the query bucket, exact cosine top-k."""
    from pubmed_and_method_ray.pipelines.similarity import lsh_planes

    planes = lsh_planes(n_planes, dim)
    sig_terms = " + ".join(
        f"(CASE WHEN list_inner_product(v, ["
        + ", ".join(repr(float(x)) for x in planes[p])
        + f"]) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    cos = (
        "list_inner_product(a.v, b.v) / "
        "(sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))"
    )
    return (
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
        f"sg AS (SELECT vec_id, v, {sig_terms} AS sig FROM e) "
        "SELECT b.vec_id AS vec_id, "
        f"ROUND({cos}, 9) AS cos_sim "
        "FROM sg a JOIN sg b ON a.vec_id = 0 AND b.vec_id <> 0 "
        "AND bit_count(xor(a.sig::BIGINT, b.sig::BIGINT)) <= 1 "
        f"ORDER BY cos_sim DESC LIMIT {k}"
    )


def oracle_sql() -> dict[str, str]:
    jac = (
        "len(list_intersect(a.t, b.t)) / "
        "len(list_distinct(list_concat(a.t, b.t)))"
    )
    toks_cte = (
        "WITH toks AS (SELECT doc_id, lang, source, "
        "list_distinct(str_split(lower(text), ' ')) AS t FROM documents)"
    )
    emb_cte = (
        "WITH e AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    )
    cos = (
        "list_inner_product(a.v, b.v) / "
        "(sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))"
    )
    d = {
        # flagship ER: the fixture plants perfectly separable clusters
        # (pytest-enforced F1 == 1.0), so the predicted partition equals
        # the gold partition and the oracle is the page-corpus structure
        # re-derived in SQL (reference cross-check pattern:
        # database/and_datasets.sql:87-105 — SQL pair-gen vs external
        # script). cluster_id = lexicographic-min url of the entity.
        "er_clusters": (
            f"{_er_pages_cte()} "
            "SELECT url, page0 AS cluster_id FROM pgu"
        ),
        "er_match_edges": (
            f"{_er_pages_cte()} "
            "SELECT a.url AS url_1, b.url AS url_2 "
            "FROM pgu a JOIN pgu b ON a.doc_id = b.doc_id AND a.j < b.j"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS doc_id "
            "FROM documents GROUP BY md5(text)"
        ),
        "pair_jaccard_docs": (
            f"{toks_cte} "
            "SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, "
            "a.lang AS lang, a.source AS source, "
            f"{jac} AS jaccard "
            "FROM toks a JOIN toks b ON a.lang = b.lang AND a.source = b.source "
            "AND a.doc_id < b.doc_id"
        ),
        "dedup_embedding_cosine": (
            f"{emb_cte} "
            "SELECT vec_id1, vec_id2, ROUND(raw, 9) AS cos_sim FROM ("
            "SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2, "
            f"{cos} AS raw "
            "FROM e a JOIN e b ON a.vec_id < b.vec_id) "
            "WHERE raw >= 0.3"
        ),
        "dedup_minhash_lsh": _minhash_lsh_oracle(),
        # transitive closure of the verified minhash pairs via recursive
        # CTE; canonical = min doc_id reachable in the match graph
        "dedup_canonical_docs": (
            "WITH RECURSIVE mp AS ("
            + _minhash_lsh_oracle()
            + "), e AS (SELECT doc_id1 AS a, doc_id2 AS b FROM mp "
            "UNION SELECT doc_id2, doc_id1 FROM mp), "
            "reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM e) "
            "UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a), "
            "lab AS (SELECT a AS doc_id, MIN(b) AS canonical_id "
            "FROM reach GROUP BY a) "
            "SELECT d.doc_id AS doc_id, "
            "COALESCE(lab.canonical_id, d.doc_id) AS canonical_id, "
            "CAST(CASE WHEN COALESCE(lab.canonical_id, d.doc_id) = d.doc_id "
            "THEN 1 ELSE 0 END AS TINYINT) AS is_canonical "
            "FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id"
        ),
        # 64-bit SimHash recomputed in SQL: per-token md5_number_upper
        # (== functions.hashing.md5_u64), ±1 votes per bit over the token
        # multiset, bit set iff vote sum > 0.
        "dedup_simhash": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(str_split(lower(text), ' ')) AS tok FROM documents), "
            "th AS (SELECT doc_id, md5_number_upper(tok) AS hv FROM tok), "
            "bits AS (SELECT doc_id, b, "
            "CASE WHEN SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
            "THEN 1 ELSE 0 END AS bit "
            "FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) g "
            "GROUP BY doc_id, b), "
            "sh AS (SELECT doc_id, lower(lpad(to_hex(CAST("
            "SUM(CASE WHEN bit = 1 THEN (1::HUGEINT << b) ELSE 0 END) "
            "AS UBIGINT)), 16, '0')) AS simhash FROM bits GROUP BY doc_id) "
            "SELECT simhash, COUNT(*) AS n_docs, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids "
            "FROM sh GROUP BY simhash"
        ),
        # l2_norm = the embedding_norms kernel, certified on each hit
        "ann_topk": (
            f"{emb_cte} "
            "SELECT b.vec_id AS vec_id, "
            f"ROUND({cos}, 9) AS cos_sim, "
            "ROUND(sqrt(list_inner_product(b.v, b.v)), 9) AS l2_norm "
            "FROM e a JOIN e b ON a.vec_id = 0 AND b.vec_id <> 0 "
            "ORDER BY cos_sim DESC LIMIT 10"
        ),
        # identical result set to the full-scan LSH variant: the index
        # changes the PHYSICAL read (probed lsh_bucket= partitions only),
        # not the semantics
        "ann_topk_lsh_indexed": _ann_lsh_oracle(),
        "ann_topk_ivf_indexed": (
            f"{emb_cte}, "
            "fx AS (SELECT vec_id, "
            "CAST(md5_number_upper(CAST(vec_id AS VARCHAR)) % 16 AS BIGINT) AS bkt, "
            "list_transform(v, x -> CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS fv, "
            "v FROM e), "
            "dims AS (SELECT unnest(generate_series(1, 64)) AS d), "
            "cent AS (SELECT bkt, d, SUM(fv[d]) / (1000000.0 * COUNT(*)) AS c "
            "FROM fx CROSS JOIN dims GROUP BY bkt, d), "
            "centl AS (SELECT bkt, list(c ORDER BY d) AS cv FROM cent GROUP BY bkt), "
            "vn AS (SELECT vec_id, "
            "list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS nv "
            "FROM fx), "
            "ad AS (SELECT vn.vec_id AS vec_id, vn.nv AS nv, centl.bkt AS bkt, "
            "ROUND(list_inner_product(vn.nv, centl.cv), 9) AS dt "
            "FROM vn CROSS JOIN centl), "
            "asg AS (SELECT vec_id, nv, bkt FROM (SELECT *, ROW_NUMBER() OVER ("
            "PARTITION BY vec_id ORDER BY dt DESC, bkt ASC) AS r FROM ad) WHERE r = 1), "
            "qn AS (SELECT nv FROM vn WHERE vec_id = 0), "
            "probe AS (SELECT centl.bkt FROM centl, qn "
            "ORDER BY ROUND(list_inner_product(qn.nv, centl.cv), 9) DESC, "
            "centl.bkt ASC LIMIT 4) "
            "SELECT a.vec_id AS vec_id, "
            "ROUND(list_inner_product(a.nv, qn.nv), 9) AS cos_sim "
            "FROM asg a, qn WHERE a.vec_id <> 0 "
            "AND a.bkt IN (SELECT bkt FROM probe) "
            "ORDER BY cos_sim DESC LIMIT 10"
        ),
        # n_tokens_ws = the whitespace token_count kernel, certified here
        "token_count_bpe": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+')) "
            "AS n_tokens, "
            "len(regexp_extract_all(text, '[A-Za-z]+')) AS n_word, "
            "len(regexp_extract_all(text, '[0-9]+')) AS n_num, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+')) "
            "- len(regexp_extract_all(text, '[A-Za-z]+')) "
            "- len(regexp_extract_all(text, '[0-9]+')) AS n_punct, "
            "len(str_split(text, ' ')) AS n_tokens_ws "
            "FROM documents"
        ),
        "quality_score": (
            "SELECT b.doc_id, len(b.toks) AS n_tokens, "
            "len(list_filter(b.toks, x -> x IN "
            f"{QUALITY_SW_SQL})) AS stopword_count, "
            "len(list_filter(b.toks, x -> x IN "
            f"{QUALITY_SW_SQL})) / len(b.toks) AS stop_ratio, "
            "len(b.lns) AS n_lines, "
            "(len(b.lns) - len(list_distinct(b.lns))) / len(b.lns) "
            "AS dup_line_frac, "
            "(len(b.toks) - len(list_distinct(b.toks))) / len(b.toks) "
            "AS dup_token_frac, "
            "tc.top_cnt / len(b.toks) AS top_token_frac "
            "FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks, "
            "str_split(text, chr(10)) AS lns FROM documents) b "
            "JOIN (SELECT doc_id, max(c) AS top_cnt FROM ("
            "SELECT doc_id, tok, count(*) AS c FROM ("
            "SELECT doc_id, unnest(str_split(lower(text), ' ')) AS tok "
            "FROM documents) GROUP BY doc_id, tok) GROUP BY doc_id) tc "
            "USING (doc_id)"
        ),
        # lang-ID heuristic: marker-token hit counts per language over the
        # token multiset; argmax with tie-break by language code; 'und'
        # when no marker hits. Mirrors pipelines.text_analysis.LANG_MARKERS.
        "lang_id": (
            "WITH t AS (SELECT doc_id, str_split(lower(text), ' ') AS toks "
            "FROM documents), "
            "s AS (SELECT doc_id, len(toks) AS n, "
            "len(list_filter(toks, x -> x IN ('der','die','das','und','ist','mit'))) AS h_de, "
            "len(list_filter(toks, x -> x IN ('the','and','of','is','with','for'))) AS h_en, "
            "len(list_filter(toks, x -> x IN ('el','la','de','que','y','los'))) AS h_es, "
            "len(list_filter(toks, x -> x IN ('le','la','les','et','est','des'))) AS h_fr, "
            "len(list_filter(toks, x -> x IN ('的','是','了','在','和','有'))) AS h_zh "
            "FROM t), "
            "m AS (SELECT doc_id, n, h_de, h_en, h_es, h_fr, h_zh, "
            "greatest(h_de, h_en, h_es, h_fr, h_zh) AS mx FROM s) "
            "SELECT doc_id, "
            "CASE WHEN mx = 0 THEN 'und' WHEN h_de = mx THEN 'de' "
            "WHEN h_en = mx THEN 'en' WHEN h_es = mx THEN 'es' "
            "WHEN h_fr = mx THEN 'fr' ELSE 'zh' END AS pred_lang, "
            "mx / n AS confidence FROM m"
        ),
        # winnowing-style rolling fingerprint: min md5_number_upper over
        # 8-token windows of the lowered text (single window if < 8 toks);
        # fp = the exact md5(lower(text)) doc_fingerprint kernel
        "doc_rolling_fingerprint": (
            "WITH t AS (SELECT doc_id, lower(text) AS lt, "
            "str_split(lower(text), ' ') AS toks FROM documents), "
            "g AS (SELECT doc_id, lt, CASE WHEN len(toks) < 8 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(generate_series(1, len(toks) - 7), "
            "i -> array_to_string(toks[i:i+7], ' ')) END AS grams FROM t) "
            "SELECT doc_id, lower(lpad(to_hex(list_min("
            "list_transform(grams, x -> md5_number_upper(x)))), 16, '0')) "
            "AS rolling_fp, md5(lt) AS fp FROM g"
        ),
        "doc_keywords": (
            "WITH tok AS (SELECT doc_id, "
            "unnest(str_split(lower(text), ' ')) AS token FROM documents), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok "
            "GROUP BY doc_id, token), "
            "df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token), "
            "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
            "sc AS (SELECT tf.doc_id AS doc_id, tf.token AS token, "
            "tf.tf * (ln((1 + n_docs) / (1 + df.df)) + 1.0) AS score "
            "FROM tf JOIN df ON tf.token = df.token CROSS JOIN n), "
            "rk AS (SELECT doc_id, token, ROW_NUMBER() OVER ("
            "PARTITION BY doc_id ORDER BY score DESC, token ASC) AS r FROM sc) "
            "SELECT doc_id, string_agg(token, ',' ORDER BY r) AS keywords "
            "FROM rk WHERE r <= 5 GROUP BY doc_id"
        ),
        # multimodal fake-decode: md5(payload) bytes drive (width, height,
        # f0..f7) — byte i of the digest = hex pair 2i+1..2i+2 — plus the
        # payload_meta kernel (octet_length + md5) certified alongside
        "multimodal_decode": (
            "WITH d AS (SELECT doc_id, md5(text) AS h, "
            "octet_length(encode(text)) AS payload_bytes FROM documents), "
            "b AS (SELECT doc_id, h, payload_bytes, "
            + ", ".join(
                f"CAST(concat('0x', substr(h, {2 * j + 1}, 2)) AS INTEGER) AS b{j}"
                for j in range(8)
            )
            + " FROM d) "
            "SELECT doc_id, 64 + b0 % 192 AS width, 64 + b1 % 192 AS height, "
            + ", ".join(f"b{j} / 255.0 AS f{j}" for j in range(8))
            + ", payload_bytes, h AS payload_md5 FROM b"
        ),
        "multimodal_resize": (
            "SELECT doc_id, 224 AS width, 224 AS height, "
            "substr(md5(text || ':224x224'), 1, 16) AS resized_checksum "
            "FROM documents"
        ),
        # fake frame sampler: 4 evenly spaced 16-char windows of the
        # payload text; checksum = first 8 hex chars of window md5.
        "multimodal_frames": (
            "WITH f AS (SELECT doc_id, text, "
            "greatest(length(text), 1) AS span, "
            "unnest(generate_series(0, 3)) AS frame_idx FROM documents) "
            "SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, "
            "(frame_idx * span) // 4 AS byte_offset, "
            "substr(md5(substring(text, (frame_idx * span) // 4 + 1, 16)), 1, 8) "
            "AS frame_checksum FROM f"
        ),
        # money/value sums are fixed-point (floor(x*scale+0.5) int64 sums):
        # exact and order-independent, so they hash-match the Ray side
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty, "
            "SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 "
            "AS sum_base_price, "
            "SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) "
            "/ 100.0 AS sum_disc_price, "
            "(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0) / COUNT(*) "
            "AS avg_qty, "
            "COUNT(*) AS n_rows "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "revenue_by_nation": (
            "SELECT n_name, "
            "SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) "
            "/ 100.0 AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name"
        ),
        "top_parts": (
            "SELECT p_partkey, p_name, p_retailprice FROM part "
            "ORDER BY p_retailprice DESC LIMIT 20"
        ),
        "filter_project_lineitem": (
            "SELECT l_orderkey, l_linenumber, "
            "l_extendedprice * (1 - l_discount) AS revenue "
            "FROM lineitem WHERE l_discount >= 0.05 AND l_discount <= 0.07 "
            "AND l_quantity < 24"
        ),
        "events_hour_window": (
            "SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket, "
            "COUNT(*) AS n_events, "
            "SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS sum_value "
            "FROM events GROUP BY user_id, epoch_us(ts) // 3600000000"
        ),
        # hopping window: event at t lands in windows w*hop for
        # w in [t//hop - 1, t//hop] (size=2*hop)
        "events_hopping_window": (
            "WITH x AS (SELECT user_id, epoch_us(ts) AS us, "
            "CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS value_c, "
            "unnest(generate_series(0, 1)) AS j FROM events), "
            "w AS (SELECT user_id, (us // 1800000000 - j) * 1800000000 "
            "AS window_start, value_c FROM x) "
            "SELECT user_id, window_start, COUNT(*) AS n_events, "
            "SUM(value_c) / 1000000.0 AS sum_value "
            "FROM w WHERE window_start >= 0 GROUP BY user_id, window_start"
        ),
        "block_census_docs": (
            "SELECT lang, source, COUNT(*) AS n_docs FROM documents "
            "GROUP BY lang, source"
        ),
        "doc_commonness": (
            "SELECT doc_id, "
            "COUNT(*) OVER (PARTITION BY lang, source) AS commonness, "
            "ROUND(COUNT(*) OVER (PARTITION BY lang, source) / "
            "(SELECT COUNT(*) FROM documents), 9) AS ambiguity "
            "FROM documents"
        ),
        "pair_gen_docs": (
            "SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, "
            "a.lang AS lang, a.source AS source "
            "FROM documents a JOIN documents b "
            "ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id"
        ),
        "union_distinct_keys": (
            "SELECT DISTINCT n_name AS name, 'nation' AS kind FROM nation "
            "UNION ALL "
            "SELECT DISTINCT r_name AS name, 'region' AS kind FROM region"
        ),
        "semi_join_orders": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "WHERE o_custkey IN (SELECT c_custkey FROM customer "
            "WHERE c_mktsegment = 'BUILDING')"
        ),
        "join_order_priority_revenue": (
            "SELECT o_orderpriority, "
            "SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) "
            "/ 100.0 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "top_docs_per_block": (
            "SELECT lang, source, doc_id, n_chars, rank FROM ("
            "SELECT lang, source, doc_id, n_chars, ROW_NUMBER() OVER ("
            "PARTITION BY lang, source ORDER BY n_chars DESC, doc_id ASC) "
            "AS rank FROM documents) WHERE rank <= 3"
        ),
        # per-user LAG: fixed-point delta vs previous event by ts
        "events_lag_delta": (
            "SELECT user_id, ts_us, delta_value FROM ("
            "SELECT user_id, epoch_us(ts) AS ts_us, "
            "(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) - "
            "lag(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts)) / 1000000.0 AS delta_value "
            "FROM events) WHERE delta_value IS NOT NULL"
        ),
        # exact discrete median over fixed-point values (lower median)
        "event_value_median": (
            "SELECT event_type, "
            "quantile_disc(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT), 0.5) "
            "/ 1000000.0 AS median_value "
            "FROM events GROUP BY event_type"
        ),
        # M8 analog: adopt the LONGEST variant per repair key (first
        # token); tie-break lowest doc_id — name-enhancement pattern.
        "title_repair": (
            "WITH t AS (SELECT doc_id, n_chars, "
            "str_split(lower(text), ' ')[1] AS repair_key FROM documents), "
            "b AS (SELECT repair_key, doc_id AS best_id, n_chars AS best_len, "
            "ROW_NUMBER() OVER (PARTITION BY repair_key "
            "ORDER BY n_chars DESC, doc_id ASC) AS r FROM t) "
            "SELECT t.doc_id AS doc_id, t.repair_key AS repair_key, "
            "CASE WHEN b.best_len > t.n_chars THEN b.best_id ELSE t.doc_id END "
            "AS enhanced_from, "
            "CASE WHEN b.best_len > t.n_chars THEN b.best_len ELSE t.n_chars END "
            "AS enhanced_len "
            "FROM t JOIN b ON t.repair_key = b.repair_key AND b.r = 1"
        ),
        # J6 analog: chained registry joins (supplier -> nation -> region)
        "registry_enrich": (
            "SELECT s_suppkey, s_name, n_name, r_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey"
        ),
        "user_activity": (
            "SELECT user_id, COUNT(*) AS n_events, "
            "COUNT(DISTINCT event_type) AS n_event_types, "
            "MIN(epoch_us(ts)) AS first_ts, MAX(epoch_us(ts)) AS last_ts, "
            "SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0 "
            "AS sum_value "
            "FROM events GROUP BY user_id"
        ),
        "events_sessions": (
            "SELECT user_id, "
            "CAST(1 + SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_sessions "
            "FROM (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts) AS gap FROM events) "
            "GROUP BY user_id"
        ),
        "deterministic_sample": (
            "SELECT doc_id FROM documents WHERE substring(md5(text), 1, 2) <= '4c'"
        ),
        # Bloom semi-join pre-filter: the oracle reconstructs the exact
        # bitmap (distinct md5-derived positions over the build side) and
        # passes a probe key iff EVERY hash function's bit is set — so
        # the deterministic false positives match too
        "bloom_semi_join": (
            "WITH i AS (SELECT unnest([0, 1, 2]) AS i), "
            "urgent AS (SELECT DISTINCT o_orderkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT'), "
            "bits AS (SELECT DISTINCT CAST(md5_number_upper("
            "CAST(o_orderkey AS VARCHAR) || '#' || CAST(i AS VARCHAR)) "
            "% 65536 AS BIGINT) AS pos FROM urgent CROSS JOIN i), "
            "probe AS (SELECT l_orderkey, i, "
            "CAST(md5_number_upper(CAST(l_orderkey AS VARCHAR) || '#' "
            "|| CAST(i AS VARCHAR)) % 65536 AS BIGINT) AS pos "
            "FROM (SELECT DISTINCT l_orderkey FROM lineitem) CROSS JOIN i), "
            "pass_keys AS (SELECT l_orderkey FROM probe JOIN bits USING (pos) "
            "GROUP BY l_orderkey HAVING COUNT(DISTINCT i) = 3) "
            "SELECT l.l_orderkey, l.l_linenumber "
            "FROM lineitem l JOIN pass_keys USING (l_orderkey)"
        ),
        # HLL approximate distinct tokens: md5 bucket/rank sketch with
        # integer-exact harmonic sum (see _hll_sql)
        "approx_distinct_tokens": _hll_sql(),
        # Count-Min heavy hitters: the sketch is all integer counts, so
        # the oracle rebuilds the same d x w counters and reproduces the
        # top-k INCLUDING collision overestimates; ties at the cut break
        # by token asc on both sides
        "heavy_hitters_cms": (
            "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token "
            "FROM documents), "
            "i AS (SELECT unnest([0, 1, 2, 3]) AS i), "
            "counters AS (SELECT i, CAST(md5_number_upper(token || '#' || "
            "CAST(i AS VARCHAR)) % 8192 AS BIGINT) AS pos, "
            "COUNT(*) AS cnt FROM tok CROSS JOIN i GROUP BY i, pos), "
            "cand AS (SELECT DISTINCT token FROM tok), "
            "probe AS (SELECT c.token, i.i, CAST(md5_number_upper(c.token "
            "|| '#' || CAST(i.i AS VARCHAR)) % 8192 AS BIGINT) AS pos "
            "FROM cand c CROSS JOIN i) "
            "SELECT token, CAST(MIN(cnt) AS BIGINT) AS est_count "
            "FROM probe JOIN counters USING (i, pos) GROUP BY token "
            "ORDER BY est_count DESC, token ASC LIMIT 20"
        ),
        # PII redaction: plant snippets (md5-parity selection, id-derived
        # digits) then RE2 count+mask — pyarrow and DuckDB both run RE2,
        # so counts and redacted text match exactly
        "redact_pii": (
            "WITH planted AS (SELECT doc_id, text || "
            "CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 2 = 0 "
            "THEN repeat(' contact user' || CAST(doc_id AS VARCHAR) "
            "|| '@mail.example.com or 555-' "
            "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
            "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), "
            "CAST(1 + doc_id % 2 AS INT)) ELSE '' END AS text "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_emails, "
            "CAST(len(regexp_extract_all(text, '555-[0-9]{3}-[0-9]{4}')) "
            "AS BIGINT) AS n_phones, "
            "regexp_replace(regexp_replace(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'), "
            "'555-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS text "
            "FROM planted"
        ),
        # E5 external-ID baseline: registry known-ness/corruption are pure
        # functions of md5(url); pair universe = within-host pairs; the
        # confusion counts and metrics mirror functions/metrics semantics
        "external_id_baseline": (
            f"{_er_pages_cte()}, reg AS ("
            "SELECT url, doc_id, host_id, "
            "CASE WHEN substring(md5(url), 2, 1) = 'f' THEN doc_id + 1 "
            "ELSE doc_id END AS rid "
            "FROM pgu WHERE substring(md5(url), 1, 1) <= 'b'), "
            "c AS (SELECT "
            "CAST(SUM(CASE WHEN a.doc_id = b.doc_id AND a.rid = b.rid "
            "THEN 1 ELSE 0 END) AS BIGINT) AS tp, "
            "CAST(SUM(CASE WHEN a.doc_id <> b.doc_id AND a.rid = b.rid "
            "THEN 1 ELSE 0 END) AS BIGINT) AS fp, "
            "CAST(SUM(CASE WHEN a.doc_id = b.doc_id AND a.rid <> b.rid "
            "THEN 1 ELSE 0 END) AS BIGINT) AS fn, "
            "CAST(SUM(CASE WHEN a.doc_id <> b.doc_id AND a.rid <> b.rid "
            "THEN 1 ELSE 0 END) AS BIGINT) AS tn "
            "FROM reg a JOIN reg b ON a.host_id = b.host_id AND a.url < b.url) "
            "SELECT tp + fp + fn + tn AS n_pairs, tp, fp, fn, tn, "
            "CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy, "
            "CASE WHEN tp + fp = 0 THEN 0.0 "
            "ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS \"precision\", "
            "CASE WHEN tp + fn = 0 THEN 0.0 "
            "ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall, "
            "CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0 "
            "ELSE CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END AS f1 "
            "FROM c"
        ),
        # S9 crawler analog: payload/attempts are pure functions of the
        # id (md5 hex repeated 1 + id % 7 times; first attempt fails when
        # the hex starts with '0'), so the fetch pipeline is SQL-checkable
        "crawl_corpus": (
            "SELECT doc_id, "
            "32 * (1 + doc_id % 7) AS n_bytes, "
            "CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' "
            "THEN 2 ELSE 1 END AS attempts, "
            "'ok' AS status "
            "FROM (SELECT DISTINCT doc_id FROM documents)"
        ),
        # range join: all ordered within-user event pairs <= 1 hour apart
        "events_range_pairs_1h": (
            "SELECT a.user_id AS user_id, "
            "a.event_id AS event_id_a, b.event_id AS event_id_b, "
            "epoch_us(b.ts) - epoch_us(a.ts) AS gap_us "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR"
        ),
        # temporal as-of join: each purchase picks the user's most recent
        # click STRICTLY before it (DuckDB native ASOF JOIN; the engine's
        # stages/asof.py single-exchange construction). (user_id, ts) is
        # duplicate-free in the generator, so the match is deterministic.
        "events_asof_prev_click": (
            "SELECT p.event_id AS event_id, p.user_id AS user_id, "
            "epoch_us(p.ts) AS ts_us, "
            "c.event_id AS event_id_prev, epoch_us(c.ts) AS ts_us_prev, "
            "epoch_us(p.ts) - epoch_us(c.ts) AS gap_us "
            "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
            "ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c "
            "ON p.user_id = c.user_id AND c.ts < p.ts"
        ),
        "rank_docs": (
            "SELECT doc_id, n_chars, "
            "ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rank "
            "FROM documents"
        ),
        "clean_text_docs": (
            "SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), "
            "'[^a-z]', ' ', 'g'), '\\s+', ' ', 'g')) AS clean FROM documents"
        ),
        "tag_entities": (
            "SELECT doc_id, "
            "COALESCE(array_to_string(list_sort(list_distinct(list_filter("
            "str_split(lower(text), ' '), x -> x IN "
            "('spark', 'table', 'query', 'window', 'vector', 'stream')))), ','), '') "
            "AS entities, "
            "len(list_distinct(list_filter(str_split(lower(text), ' '), x -> x IN "
            "('spark', 'table', 'query', 'window', 'vector', 'stream')))) "
            "AS n_entities "
            "FROM documents"
        ),
    }
    return d

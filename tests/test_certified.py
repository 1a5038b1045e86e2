"""The driver CORRECTNESS snapshot records exactly the first 50
``queries()`` entries in insertion order. This module (a) pins that
order to the explicit ``CERTIFIED_QUERIES`` constant so any reordering
or displacement is a visible diff (ADVICE r4), and (b) keeps full
oracle-parity coverage for the standalone operator variants that no
longer hold their own query slot (their kernels are certified inside
sibling queries as extra columns; the standalone functions remain part
of the API surface)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


class TestCertifiedList:
    def test_queries_match_certified_order(self):
        assert list(entrymod.queries().keys()) == list(
            entrymod.CERTIFIED_QUERIES
        )

    def test_exactly_fifty_slots(self):
        assert len(entrymod.CERTIFIED_QUERIES) == 50
        assert len(set(entrymod.CERTIFIED_QUERIES)) == 50

    def test_every_oracle_has_a_query(self):
        assert set(entrymod.oracle_sql()) <= set(entrymod.CERTIFIED_QUERIES)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(ray_ds, con, sql):
    got = _canon(ray_ds.to_pandas())
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating):
            assert np.allclose(
                got[c].astype(float), want[c].astype(float), atol=1e-12, rtol=0
            ), c
        else:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


class TestStandaloneVariantOracles:
    """Oracle parity for the slotless variant functions (these SQL
    strings are the former oracle_sql() entries, kept verbatim)."""

    def test_token_count(self, con):
        from pubmed_and_method_ray.pipelines.text_analysis import token_count

        _check(
            token_count(SF),
            con,
            "SELECT doc_id, len(str_split(text, ' ')) AS n_tokens FROM documents",
        )

    def test_doc_fingerprint(self, con):
        from pubmed_and_method_ray.pipelines.text_analysis import doc_fingerprint

        _check(
            doc_fingerprint(SF),
            con,
            "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
        )

    def test_payload_meta(self, con):
        from pubmed_and_method_ray.pipelines.multimodal import payload_meta

        _check(
            payload_meta(SF),
            con,
            "SELECT doc_id, octet_length(encode(text)) AS payload_bytes, "
            "md5(text) AS payload_md5 FROM documents",
        )

    def test_embedding_norms(self, con):
        from pubmed_and_method_ray.pipelines.similarity import embedding_norms

        _check(
            embedding_norms(SF),
            con,
            "SELECT vec_id, ROUND(sqrt(list_inner_product(v, v)), 9) AS l2_norm "
            "FROM (SELECT vec_id, "
            "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
            "FROM embeddings)",
        )

    def test_dedup_ngram_jaccard(self, con):
        from pubmed_and_method_ray.pipelines.dedup import dedup_ngram_jaccard

        jac = (
            "len(list_intersect(a.t, b.t)) / "
            "len(list_distinct(list_concat(a.t, b.t)))"
        )
        _check(
            dedup_ngram_jaccard(SF),
            con,
            "WITH toks AS (SELECT doc_id, lang, source, "
            "list_distinct(str_split(lower(text), ' ')) AS t FROM documents) "
            "SELECT * FROM ("
            "SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, "
            "a.lang AS lang, a.source AS source, "
            f"{jac} AS jaccard "
            "FROM toks a JOIN toks b ON a.lang = b.lang "
            "AND a.source = b.source AND a.doc_id < b.doc_id) "
            "WHERE jaccard >= 0.6",
        )

    def test_dedup_shared_window(self, con):
        """Lee-et-al exact shared-window pairs vs a DuckDB construction
        of the SAME gram contract (md5_number_upper over 8-token
        windows, the doc_rolling_fingerprint convention)."""
        from pubmed_and_method_ray.pipelines.dedup import dedup_shared_window

        _check(
            dedup_shared_window(SF),
            con,
            "WITH t AS (SELECT doc_id, str_split(lower(text), ' ') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(toks) < 8 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(generate_series(1, len(toks) - 7), "
            "i -> array_to_string(toks[i:i+7], ' ')) END AS grams FROM t), "
            "h AS (SELECT DISTINCT doc_id, md5_number_upper(gram) AS gh "
            "FROM (SELECT doc_id, unnest(grams) AS gram FROM g)), "
            "ok AS (SELECT gh FROM h GROUP BY gh "
            "HAVING count(*) BETWEEN 2 AND 1000) "
            "SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2, "
            "count(*) AS shared_windows "
            "FROM h a JOIN h b USING (gh) JOIN ok USING (gh) "
            "WHERE a.doc_id < b.doc_id GROUP BY 1, 2",
        )


class TestSharedWindowCap:
    def test_stop_phrase_group_dropped(self, ray_session=None):
        """A window shared by more docs than n_max is a stop phrase and
        must produce NO pairs from that gram; rarer shared windows still
        pair, and the pair count reflects only surviving grams."""
        import pyarrow as pa
        import ray.data as rd

        from pubmed_and_method_ray.pipelines import dedup as dd

        span = "one two three four five six seven eight"
        rare = "alpha beta gamma delta epsilon zeta eta theta"
        texts = [f"{span} filler{i}" for i in range(4)]  # 4 docs share `span`
        texts[0] = f"{span} {rare}"
        texts[1] = f"{rare} tail {span}"
        tbl = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        orig = dd._read_documents
        try:
            dd._read_documents = lambda sf, cols=None: rd.from_arrow(tbl)
            # n_max=2: the 4-doc `span` gram group is dropped; doc 0 and
            # doc 1 still pair through the 2-doc `rare`-window grams
            out = (
                dd.dedup_shared_window("unused", n_max=2)
                .to_pandas()
                .sort_values(["doc_id1", "doc_id2"])
                .reset_index(drop=True)
            )
        finally:
            dd._read_documents = orig
        assert list(zip(out["doc_id1"], out["doc_id2"])) == [(0, 1)]
        # shared grams between 0 and 1: windows fully inside `rare`
        # (doc 0 suffix vs doc 1 prefix) that no third doc contains
        assert (out["shared_windows"] >= 1).all()


class TestDecontaminate:
    def test_oracle_parity_with_planted_benchmark(self, con):
        """Benchmark built from real corpus spans (so hits exist) plus a
        non-matching probe; parity vs DuckDB list_intersect on the SAME
        gram construction."""
        import duckdb as _dd

        from pubmed_and_method_ray.pipelines.dedup import decontaminate

        texts = con.execute(
            "SELECT text FROM documents ORDER BY doc_id LIMIT 3"
        ).fetchall()
        # two real spans (guaranteed window hits) + one miss
        bench = [texts[0][0], texts[1][0][:200], "zz yy xx ww vv uu tt ss"]
        bench_grams = sorted(
            {
                g
                for t in bench
                for g in (
                    [
                        " ".join(t.lower().split(" ")[j : j + 8])
                        for j in range(len(t.lower().split(" ")) - 7)
                    ]
                    if len(t.lower().split(" ")) >= 8
                    else [" ".join(t.lower().split(" "))]
                )
            }
        )
        lit = "[" + ", ".join("'" + g.replace("'", "''") + "'" for g in bench_grams) + "]"
        _check(
            decontaminate(SF, bench),
            con,
            "WITH t AS (SELECT doc_id, str_split(lower(text), ' ') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(toks) < 8 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(generate_series(1, len(toks) - 7), "
            "i -> array_to_string(toks[i:i+7], ' ')) END AS grams FROM t) "
            "SELECT doc_id, "
            f"len(list_intersect(list_distinct(grams), {lit})) AS n_hits, "
            f"len(list_intersect(list_distinct(grams), {lit})) > 0 "
            "AS contaminated FROM g",
        )
        # sanity: the planted spans actually contaminate something
        got = decontaminate(SF, bench).to_pandas()
        assert got["contaminated"].any()
        assert (got["n_hits"] >= 0).all()

"""Driver-contract correctness: every oracle-backed ``queries()`` entry
must match its ``oracle_sql()`` on row count, column names and
order-insensitive values (the CORRECTNESS_r{N}.json gate, run here at
sf0.001 for speed; the driver reruns at sf0.01)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


ORACLES = sorted(entrymod.oracle_sql().keys())
ALL_QUERIES = sorted(entrymod.queries().keys())
ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ORACLES))


class TestOracleParity:
    @pytest.mark.parametrize("name", ORACLES)
    def test_query_matches_oracle(self, name, con):
        q = entrymod.queries()[name]
        got = _canon(_to_pandas(q(SF)))
        want = _canon(con.execute(entrymod.oracle_sql()[name]).df())
        assert list(got.columns) == list(want.columns), (
            f"{name}: columns {list(got.columns)} != {list(want.columns)}"
        )
        assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
        for c in got.columns:
            if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(
                want[c].dtype, np.floating
            ):
                assert np.allclose(
                    got[c].astype(float), want[c].astype(float), atol=1e-12, rtol=0
                ), f"{name}.{c} float mismatch"
            else:
                assert (
                    got[c].to_numpy() == want[c].to_numpy()
                ).all(), f"{name}.{c} value mismatch"


class TestRowsOnlyQueries:
    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_runs_and_returns_rows(self, name):
        q = entrymod.queries()[name]
        df = _to_pandas(q(SF))
        assert df is not None
        assert len(df.columns) > 0
        # deterministic across two invocations
        df2 = _to_pandas(q(SF))
        assert len(df) == len(df2)


class TestEntry:
    def test_entry_runs(self):
        df = _to_pandas(entrymod.entry())
        assert len(df) > 0
        assert set(df.columns) == {"url", "cluster_id"}


class TestBroadcastSizeGuards:
    """The customer-scale broadcasts fall back to hash joins past
    broadcast_max_rows; both paths must agree exactly (the guard is an
    execution strategy, not a semantic switch)."""

    def test_revenue_by_nation_join_path(self):
        from pubmed_and_method_ray.pipelines import relational

        bc = _canon(_to_pandas(relational.revenue_by_nation(SF)))
        jn = _canon(
            _to_pandas(relational.revenue_by_nation(SF, broadcast_max_rows=0))
        )
        pd.testing.assert_frame_equal(bc, jn)

    def test_semi_join_orders_join_path(self):
        from pubmed_and_method_ray.pipelines import relational

        bc = _canon(_to_pandas(relational.semi_join_orders(SF)))
        jn = _canon(
            _to_pandas(relational.semi_join_orders(SF, broadcast_max_rows=0))
        )
        pd.testing.assert_frame_equal(bc, jn)

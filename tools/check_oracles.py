"""Local emulation of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` DuckDB equivalent
side-by-side on an sf dir, compare rows / schema / values after sorting
columns by name and rows by value.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("uint64")
        elif df[c].dtype.kind == "i":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> list[str]:
    errs = []
    if len(ray_df) != len(ora_df):
        errs.append(f"rows {len(ray_df)} vs {len(ora_df)}")
    a, b = canon(ray_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        errs.append(f"schema {list(a.columns)} vs {list(b.columns)}")
        return errs
    if errs:
        return errs
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind == "f":
            bad = ~(np.isclose(av, bv, rtol=0, atol=0) | (pd.isna(av) & pd.isna(bv)))
        else:
            bad = av != bv
        if bad.any():
            i = int(np.nonzero(bad)[0][0])
            errs.append(f"col {c}: {int(bad.sum())} mismatches, first at {i}: {av[i]!r} vs {bv[i]!r}")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_noora = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"noora {name}: {len(ray_df)} rows ({time.time()-t0:.1f}s)")
            n_noora += 1
            continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        errs = compare(name, ray_df, ora_df)
        if errs:
            print(f"FAIL  {name}: {'; '.join(errs)}")
            n_fail += 1
        else:
            print(f"pass  {name}: {len(ray_df)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} no-oracle")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Bench-scale soak of the distributed fallback paths (VERDICT r4 #4).

The budget-guarded operators (driver CC, driver LSH verify) take their
DISTRIBUTED fallbacks only past driver budgets, so until now those paths
ran only in sf0.001 unit tests. This soak exercises them at bench scale
and asserts they agree with the driver paths on the same input:

1. flagship ER at ~2M pages (GRAFT_SOAK_REPEAT=160 x sf0.1 docs) with
   cc_method='distributed' FORCED — counters (rows, distinct clusters)
   must match the auto/driver-path run on the identical corpus;
2. MinHash-LSH with driver_max_pairs=0 (forces the distributed
   groupby-dedup + two-hash-join verify) — row-identical to the
   driver-verify run;
3. canonical-docs with driver_max_edges=0 (forces distributed min-label
   CC) — row-identical to the driver union-find run.

Usage: python tools/soak_scale.py  (env: GRAFT_SF_DIR, RAY_GRAFT_CPUS,
GRAFT_SOAK_REPEAT). Prints one JSON line; record in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_SOAK_REPEAT", "160"))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pubmed_and_method_ray.pipelines import dedup
    from pubmed_and_method_ray.pipelines.er import run_er_pipeline
    from pubmed_and_method_ray.sources.io import read_parquet_clean
    from pubmed_and_method_ray.sources.pages import build_pages_dataset
    from pubmed_and_method_ray.state import (
        load_pretrained_idf,
        load_pretrained_model_json,
    )

    out: dict = {"sf": SF_DIR, "num_cpus": NUM_CPUS, "repeat": REPEAT}

    pages_dir = f"/tmp/soak_pages_{os.path.basename(SF_DIR)}_{REPEAT}"
    if not os.path.exists(os.path.join(pages_dir, "_done")):
        import shutil

        shutil.rmtree(pages_dir, ignore_errors=True)
        build_pages_dataset(SF_DIR, expand_k=4, repeat=REPEAT).write_parquet(
            pages_dir
        )
        open(os.path.join(pages_dir, "_done"), "w").close()
    n_pages = read_parquet_clean(pages_dir, file_extensions=["parquet"]).count()
    out["pages"] = int(n_pages)

    model = load_pretrained_model_json()
    idf = load_pretrained_idf()

    def er_run(cc_method: str) -> tuple[float, int, int]:
        pages = read_parquet_clean(pages_dir, file_extensions=["parquet"])
        t0 = time.perf_counter()
        res = run_er_pipeline(
            pages, model_json=model, idf=idf, n_max=512,
            evaluate=False, keep_gold=True, cc_method=cc_method,
        )
        clusters = res["clusters"]
        n_rows = clusters.count()
        from pubmed_and_method_ray.rayutil import shuffle_partitions

        n_clusters = (
            clusters.select_columns(["cluster_id"])
            .groupby("cluster_id", num_partitions=shuffle_partitions())
            .count()
            .count()
        )
        return time.perf_counter() - t0, int(n_rows), int(n_clusters)

    sec_d, rows_d, k_d = er_run("distributed")
    sec_a, rows_a, k_a = er_run("auto")
    out["er_distributed"] = {
        "sec": round(sec_d, 2), "rows": rows_d, "clusters": k_d,
        "pages_per_sec": round(n_pages / sec_d, 1),
    }
    out["er_auto"] = {
        "sec": round(sec_a, 2), "rows": rows_a, "clusters": k_a,
        "pages_per_sec": round(n_pages / sec_a, 1),
    }
    assert rows_d == rows_a == n_pages, (rows_d, rows_a, n_pages)
    assert k_d == k_a, (k_d, k_a)

    def canon(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    t0 = time.perf_counter()
    lsh_dist = canon(dedup.dedup_minhash_lsh(SF_DIR, driver_max_pairs=0).to_pandas())
    out["lsh_distributed_verify_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    lsh_drv = canon(dedup.dedup_minhash_lsh(SF_DIR).to_pandas())
    out["lsh_driver_verify_sec"] = round(time.perf_counter() - t0, 2)
    assert lsh_dist.equals(lsh_drv), "LSH verify paths disagree"
    out["lsh_pairs"] = int(len(lsh_drv))

    t0 = time.perf_counter()
    can_dist = canon(dedup.dedup_canonical_docs(SF_DIR, driver_max_edges=0).to_pandas())
    out["canonical_distributed_cc_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    can_drv = canon(dedup.dedup_canonical_docs(SF_DIR).to_pandas())
    out["canonical_driver_cc_sec"] = round(time.perf_counter() - t0, 2)
    assert can_dist.equals(can_drv), "canonical CC paths disagree"
    out["canonical_rows"] = int(len(can_drv))

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

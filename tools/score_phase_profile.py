"""Break the fused score phase into census / exchange+score so the
8 vs 32 CPU comparison shows which sub-step holds the scaling back.

Usage: RAY_GRAFT_CPUS=32 python tools/score_phase_profile.py [repeat]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def main() -> None:
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS,
        include_dashboard=False, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pubmed_and_method_ray.pipelines.er import prepare_mentions
    from pubmed_and_method_ray.sources.io import read_parquet_clean
    from pubmed_and_method_ray.sources.pages import build_pages_dataset
    from pubmed_and_method_ray.stages import blocking
    from pubmed_and_method_ray.rayutil import known_size
    from pubmed_and_method_ray.state import (
        load_pretrained_idf,
        load_pretrained_model_json,
    )

    pages_dir = "/tmp/phaseprof_pages"
    if not os.path.exists(os.path.join(pages_dir, "_done")):
        import shutil

        shutil.rmtree(pages_dir, ignore_errors=True)
        build_pages_dataset(SF_DIR, expand_k=4, repeat=32).write_parquet(pages_dir)
        open(os.path.join(pages_dir, "_done"), "w").close()

    model_ref = ray.put(load_pretrained_model_json())
    idf = load_pretrained_idf()
    idf_ref = ray.put(idf)
    pages = read_parquet_clean(pages_dir, file_extensions=["parquet"])
    mentions = prepare_mentions(pages, idf=idf).materialize()

    n_max, keep_gold = 512, True
    for trial in range(REPEAT):
        out = {"num_cpus": NUM_CPUS, "trial": trial}

        t0 = time.perf_counter()
        n_rows, n_bytes = known_size(mentions)
        n_buckets = blocking.n_pair_buckets(n_rows=n_rows, n_bytes=n_bytes)
        balance_min = min(n_max, max(64, n_max // 8))
        keys, counts = blocking.skew_table_fast(mentions, balance_min)
        out["census_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        salt = counts > n_max
        skew = (
            keys[salt], counts[salt], keys[~salt],
            blocking.pack_heavy_hosts(keys[~salt], counts[~salt], n_buckets),
        )
        skew_ref = ray.put(skew)
        keyed = mentions.map_batches(
            blocking.emit_pair_keys,
            fn_kwargs={
                "skew_ref": skew_ref, "n_max": n_max,
                "keep_gold": keep_gold, "n_buckets": n_buckets,
            },
            batch_format="pyarrow",
        ).repartition(num_blocks=n_buckets, keys=["bucket"])
        exchanged = keyed.materialize()
        out["exchange_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        scored = exchanged.map_batches(
            lambda g: blocking.make_features_bucket(
                g, n_max=n_max, keep_gold=keep_gold,
                model_ref=model_ref, prune_hamming=16, idf_ref=idf_ref,
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).materialize()
        out["scorewave_sec"] = round(time.perf_counter() - t0, 3)
        out["pairs"] = scored.count()
        out["n_buckets"] = n_buckets
        print(json.dumps(out), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()

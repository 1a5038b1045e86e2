"""Per-phase wall-clock profile of the headline ER pipeline at one
parallelism level — run at 8 and 32 CPUs (fresh processes) to locate
the non-scaling (serial / sync-tail) seconds behind the 8→32 scaling
gap. Phases mirror run_er_pipeline's production path but are driven
eagerly so each barrier is timed on its own.

Usage: RAY_GRAFT_CPUS=32 python tools/phase_profile.py [repeat]
Prints one JSON line per trial.
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

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pubmed_and_method_ray.pipelines.er import prepare_mentions
    from pubmed_and_method_ray.stages.blocking import generate_pair_features
    from pubmed_and_method_ray.stages.cluster import assign_clusters
    from pubmed_and_method_ray.stages.features import edges_from_scores
    from pubmed_and_method_ray.sources.pages import build_pages_dataset
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

    model = load_pretrained_model_json()
    idf = load_pretrained_idf()
    idf_ref = ray.put(idf)
    model_ref = ray.put(model)

    for trial in range(REPEAT):
        from pubmed_and_method_ray.sources.io import read_parquet_clean

        out = {"num_cpus": NUM_CPUS, "trial": trial}
        t0 = time.perf_counter()
        pages = read_parquet_clean(pages_dir, file_extensions=["parquet"])
        mentions = prepare_mentions(pages, idf=idf).materialize()
        out["mentions_sec"] = round(time.perf_counter() - t0, 3)
        out["mentions"] = mentions.count()

        t0 = time.perf_counter()
        scored = generate_pair_features(
            mentions, n_max=512, keep_gold=True,
            model_ref=model_ref, prune_hamming=16, idf_ref=idf_ref,
        ).materialize()
        out["score_sec"] = round(time.perf_counter() - t0, 3)
        out["pairs"] = scored.count()

        t0 = time.perf_counter()
        edges = edges_from_scores(scored, threshold=0.5)
        clusters = assign_clusters(mentions, edges, method="auto")
        out["clusters_rows"] = clusters.count()
        out["cc_sec"] = round(time.perf_counter() - t0, 3)
        out["total_sec"] = round(
            out["mentions_sec"] + out["score_sec"] + out["cc_sec"], 3
        )
        print(json.dumps(out), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()

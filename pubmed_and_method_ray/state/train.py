"""Train the pretrained pairwise GBT on the deterministic sf0.001-derived
labeled fixture and save it to state/pairwise_gbt.json.

Run: python -m pubmed_and_method_ray.state.train
"""

from __future__ import annotations


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ..pipelines.er import run_er_pipeline
    from ..sources.pages import build_pages_dataset
    from ..stages.mention_prep import extract_stage, fit_idf
    from . import save_idf, save_model_json

    pages = build_pages_dataset(sf_dir, expand_k=4)
    # the idf table ships with the model (fitted-vectorizer contract)
    idf, n_docs = fit_idf(pages.map_batches(extract_stage, batch_format="pyarrow"))
    save_idf(idf)
    out = run_er_pipeline(pages, n_max=512, idf=idf)
    save_model_json(out["model_json"])
    print(
        f"idf fitted on {n_docs} pages;",
        "pair F1:", out["pair_metrics"]["f1"],
        "cluster F1:", out["cluster_metrics"]["f1"],
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Flagship entity-resolution pipeline (BASELINE.json north_star):

    pages -> extract_text -> normalize(+tfidf) -> blocking(+salting)
          -> pair-gen -> pair features (actor pool) -> GBT scoring
          -> match edges -> connected components -> clusters -> eval

Mirrors the reference lifecycle (SURVEY.md §3.3): ClickHouse MV
checkpoints become per-stage Parquet checkpoints with lineage manifests;
the iterrows feature extractor becomes a vectorized actor pool; the
sklearn model zoo becomes a driver-trained numpy GBT scored in an actor
pool; gold-IDX label equality becomes explicit connected components.
"""

from __future__ import annotations

import os

import numpy as np

from ..functions.gbt import GBTClassifier
from ..functions.metrics import (
    calc_metrics,
    cluster_full_gold_metrics,
    cluster_pairwise_metrics,
)
from ..sources import checkpoint as ckpt
from ..stages.blocking import generate_pair_features
from ..stages.cluster import assign_clusters
from ..stages.features import FEATURE_NAMES, edges_from_scores, score_pairs
from ..stages.mention_prep import extract_stage, fit_idf, normalize_batch

PIPELINE_VERSION = "r2.0"  # r2.0: packed tfidf transport (tfidf_pk+norm)


def prepare_mentions(pages_ds, use_tfidf: bool = True, idf_sample_mod: int = 1,
                     idf=None, return_idf: bool = False):
    """pages -> normalized mentions with similarity payloads. Pass a
    pretrained ``idf`` vector to skip the fitting pass (production path:
    the idf ships with the model in state/). Task-based stages: state
    arrives as a broadcast ref, so Ray's prestarted workers do the work
    with no actor-pool spin-up."""
    import ray

    extracted = pages_ds.map_batches(extract_stage, batch_format="pyarrow")
    idf_ref = None
    if use_tfidf:
        if idf is None:
            idf, _ = fit_idf(extracted, sample_mod=idf_sample_mod)
        # float32 before the put: producer top-k/norm selection and the
        # consumer-side weight recompute must share one precision
        idf_ref = ray.put(np.asarray(idf, dtype=np.float32))
    ds = extracted.map_batches(
        normalize_batch,
        fn_kwargs={"idf_ref": idf_ref},
        batch_format="pyarrow",
        batch_size=512,
    )
    # ``return_idf``: the score stage recomputes tf-idf weights from the
    # packed transport (features._unpack_tfidf) and needs the SAME idf —
    # hand back the existing broadcast ref (one plasma copy, one
    # per-worker cache slot) alongside the dataset.
    return (ds, idf_ref) if return_idf else ds


def train_pairwise_model(features_ds, seed: int = 42) -> str:
    """Driver-side GBT fit on the (small) labeled feature set — the
    reference trains on <60k labeled pairs (BASELINE.md), so collecting
    to the driver matches its scale contract; scoring stays distributed.
    Returns the serialized model JSON."""
    df = features_ds.select_columns(FEATURE_NAMES + ["label"]).to_pandas()
    X = df[FEATURE_NAMES].to_numpy(dtype=np.float64)
    y = df["label"].to_numpy(dtype=np.float64)
    model = GBTClassifier(n_estimators=60, learning_rate=0.2, max_depth=3)
    model.fit(X, y)
    return model.to_json()


def run_er_pipeline(
    pages_ds,
    model_json: str | None = None,
    workdir: str | None = None,
    n_max: int = 512,
    threshold: float = 0.5,
    use_tfidf: bool = True,
    idf_sample_mod: int = 1,
    idf=None,
    keep_gold: bool = True,
    cc_method: str = "auto",
    evaluate: bool = True,
    prune_hamming: int | None = 16,
):
    """Run the full pipeline. Returns a dict with the clusters Dataset,
    scored-pairs Dataset, trained model JSON, and (if labeled) metrics.

    With ``workdir`` set, each stage checkpoints to
    ``{workdir}/{stage}/`` with a lineage manifest; a rerun with the same
    fingerprints resumes from the last complete stage. Fingerprints fold
    in the INPUT identity (source files of ``pages_ds``), the idf vector
    and the model weights, and chain per stage — rerunning the same
    workdir with a different input/model/param invalidates every
    downstream checkpoint instead of silently reusing stale data
    (checkpoint.py contract).
    """
    import hashlib

    try:
        input_id = tuple(sorted(pages_ds.input_files() or []))
    except Exception:
        input_id = ("<non-file-input>",)
    idf_id = (
        hashlib.blake2b(idf.tobytes(), digest_size=8).hexdigest()
        if idf is not None
        else None
    )
    model_id = (
        hashlib.blake2b(model_json.encode(), digest_size=8).hexdigest()
        if model_json
        else None
    )
    fp_mentions = ckpt.fingerprint(
        PIPELINE_VERSION, "mentions", input_id, use_tfidf, idf_sample_mod, idf_id
    )
    fp_scored = ckpt.fingerprint(
        fp_mentions, "scored", n_max, keep_gold, model_id, threshold,
        prune_hamming,
    )
    fp_clusters = ckpt.fingerprint(fp_scored, "clusters", cc_method)
    stage_fps = {
        "mentions": fp_mentions,
        "features": fp_scored,
        "scored": fp_scored,
        "clusters": fp_clusters,
    }

    def _distinct(ds, col):
        from ..rayutil import shuffle_partitions

        return (
            ds.select_columns([col])
            .groupby(col, num_partitions=shuffle_partitions())
            .count()
            .count()
        )

    def _stage_counters(name):
        """Golden per-stage counts recorded in the checkpoint manifest —
        the reference asserts stage cardinalities after every SQL step
        (database/pubmed_inner_outer_feature.sql:106-108); here they ride
        in the manifest so a resumed run can re-assert them without
        recomputing the stage. Computed from the just-written files
        (checkpoint-time only, never on the streaming path)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if name == "mentions":
            return lambda ds: {
                "mentions": ds.count(),
                "distinct_hosts": _distinct(ds, "host"),
            }
        if name == "features":
            return lambda ds: {
                "pairs": ds.count(),
                "gold_pairs": int(ds.sum("label") or 0),
            }
        if name == "scored":

            def fn(ds):
                def agg(b):
                    n = pc.sum(
                        pc.greater_equal(b["score"], pa.scalar(float(threshold)))
                    ).as_py()
                    return pa.table({"n": pa.array([n or 0], pa.int64())})

                edges = (
                    ds.select_columns(["score"])
                    .map_batches(agg, batch_format="pyarrow")
                    .sum("n")
                )
                return {"pairs": ds.count(), "match_edges": int(edges or 0)}

            return fn
        if name == "clusters":
            return lambda ds: {
                "nodes": ds.count(),
                "clusters": _distinct(ds, "cluster_id"),
            }
        return None

    def persist(ds, name):
        """Break lineage once per stage: Parquet checkpoint (resumable)
        when workdir is set, else pin in the object store."""
        if workdir:
            return ckpt.checkpoint(
                ds,
                os.path.join(workdir, name),
                name,
                stage_fps[name],
                counters_fn=_stage_counters(name),
            )
        return ds.materialize()

    def persist_if_reused(ds, name):
        """Stages consumed exactly once in the streaming production path
        (no workdir, no eval) stay LAZY — their one consumer drives them
        with no extra barrier/materialization."""
        if workdir or evaluate:
            return persist(ds, name)
        return ds

    import ray

    mentions_lazy, idf_ref = prepare_mentions(
        pages_ds,
        use_tfidf=use_tfidf,
        idf_sample_mod=idf_sample_mod,
        idf=idf,
        return_idf=True,
    )
    mentions = persist(mentions_lazy, "mentions")
    # the fused score stage rebuilds tf-idf weights from the packed
    # transport, reusing the SAME broadcast ref the mentions were
    # built with (one plasma copy)
    # fused pair-gen + featurization: one hash shuffle, no wide pair rows
    if model_json is not None:
        # production path: scoring fused into the same bucket task
        scored = persist_if_reused(
            generate_pair_features(
                mentions,
                n_max=n_max,
                keep_gold=keep_gold,
                model_ref=ray.put(model_json),
                prune_hamming=prune_hamming,
                idf_ref=idf_ref,
            ),
            "scored",
        )
    else:
        if not keep_gold:
            raise ValueError("model_json required when gold labels absent")
        features = persist(
            generate_pair_features(
                mentions,
                n_max=n_max,
                keep_gold=keep_gold,
                prune_hamming=prune_hamming,
                idf_ref=idf_ref,
            ),
            "features",
        )
        model_json = train_pairwise_model(features)
        scored = persist(
            score_pairs(features, model_json, threshold=threshold), "scored"
        )
    edges = edges_from_scores(scored, threshold=threshold)
    clusters = persist_if_reused(
        assign_clusters(mentions, edges, method=cc_method), "clusters"
    )

    out = {"clusters": clusters, "scored": scored, "model_json": model_json}

    if evaluate and keep_gold:
        # pairwise metrics at threshold (reference metric.py semantics)
        sdf = scored.select_columns(["label", "score"]).to_pandas()
        out["pair_metrics"] = calc_metrics(sdf["label"], sdf["score"], prob=threshold)
        cdf = clusters.to_pandas()
        cluster_of = dict(zip(cdf["url"], cdf["cluster_id"]))
        # candidate-conditional co-membership metrics (scored pairs only)
        pdf = scored.select_columns(["url_1", "url_2", "label"]).to_pandas()
        out["cluster_metrics_candidates"] = cluster_pairwise_metrics(
            zip(pdf["url_1"], pdf["url_2"], pdf["label"]), cluster_of
        )
        # FULL-gold-pair metrics: every gold co-entity pair counts, even
        # ones blocking never surfaced — a recall miss in blocking shows
        # up here instead of being silently excluded
        mdf = mentions.select_columns(["url", "entity_id"]).to_pandas()
        out["cluster_metrics"] = cluster_full_gold_metrics(
            dict(zip(mdf["url"], mdf["entity_id"])), cluster_of
        )
    return out

"""User-extension surface (SURVEY.md §2.14): a ``Stage`` protocol +
registries, the analog of the reference's ``run(method=..., dataset=...,
cached_file_path=...)`` step API (src/comparison/name_feature_method.py:23)
and its model/feature registries (src/model/available_model.py:15-18,
src/comparison/inner_outer_feature_method.py:22-30).

A pipeline is an ordered list of stages; ``run_pipeline`` applies them to
a Dataset with an optional per-stage Parquet checkpoint (resume skips
completed stages by fingerprint).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Protocol, runtime_checkable

from ..sources import checkpoint as ckpt


@runtime_checkable
class Stage(Protocol):
    """A named Dataset -> Dataset transform with a version string (the
    version participates in the checkpoint fingerprint)."""

    name: str
    version: str

    def apply(self, ds):  # pragma: no cover - protocol
        ...


@dataclass
class FnStage:
    """Adapter: wrap any Dataset -> Dataset callable as a Stage.

    ``params`` holds the stage's effective configuration; it is folded
    into the checkpoint fingerprint so rerunning the same workdir with a
    different parameter value invalidates the stage (and everything
    downstream) instead of silently reusing stale data."""

    name: str
    fn: Callable
    version: str = "1"
    kwargs: dict = field(default_factory=dict)
    params: tuple = ()

    def apply(self, ds):
        return self.fn(ds, **self.kwargs)


STAGE_REGISTRY: dict[str, Callable[..., Stage]] = {}


def register_stage(name: str):
    """Decorator: register a Stage factory under a name."""

    def deco(factory):
        STAGE_REGISTRY[name] = factory
        return factory

    return deco


def make_stage(name: str, **kwargs) -> Stage:
    try:
        factory = STAGE_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown stage {name!r}; available: {sorted(STAGE_REGISTRY)}"
        ) from None
    return factory(**kwargs)


def run_pipeline(ds, stages: list[Stage], workdir: str | None = None):
    """Apply stages in order; with ``workdir``, checkpoint each stage to
    ``{workdir}/{stage.name}`` and resume from completed checkpoints."""
    fp = ""
    for stage in stages:
        fp = ckpt.fingerprint(
            fp, stage.name, stage.version, getattr(stage, "params", ())
        )
        out = None
        if workdir:
            stage_dir = os.path.join(workdir, stage.name)
            if ckpt.is_complete(stage_dir, fp):
                import ray.data as rd

                from ..sources.io import read_parquet_clean

                ds = read_parquet_clean(stage_dir, file_extensions=["parquet"])
                continue
        ds = stage.apply(ds)
        if workdir:
            ds = ckpt.checkpoint(ds, os.path.join(workdir, stage.name), stage.name, fp)
    return ds


# -- built-in registrations -------------------------------------------------


@register_stage("extract_text")
def _extract_stage_factory(**kwargs):
    from ..stages.mention_prep import extract_stage

    return FnStage(
        "extract_text",
        lambda ds: ds.map_batches(extract_stage, batch_format="pyarrow"),
        version="1",
    )


@register_stage("normalize")
def _normalize_stage_factory(idf_ref=None, **kwargs):
    from ..stages.mention_prep import normalize_batch

    return FnStage(
        "normalize",
        lambda ds: ds.map_batches(
            normalize_batch, fn_kwargs={"idf_ref": idf_ref}, batch_format="pyarrow"
        ),
        # v2: packed tfidf transport (tfidf_pk + tfidf_norm replace
        # tfidf_idx + tfidf_w) — old-schema checkpoints must not resume
        version="2",
        params=(idf_ref is not None, kwargs.get("idf_id")),
    )


@register_stage("pair_features")
def _pair_features_factory(
    n_max: int = 512,
    keep_gold: bool = True,
    model_ref=None,
    prune_hamming: int | None = None,
    idf_ref=None,
    **kw,
):
    from ..stages.blocking import generate_pair_features

    return FnStage(
        "pair_features",
        lambda ds: generate_pair_features(
            ds,
            n_max=n_max,
            keep_gold=keep_gold,
            model_ref=model_ref,
            prune_hamming=prune_hamming,
            idf_ref=idf_ref,
        ),
        version="3",
        # the feature rows depend on the idf CONTENT (weights rebuilt
        # from it at score time); callers that refit the idf between
        # runs pass idf_id (a content hash, as er.py's own
        # checkpointing does) so the fingerprint invalidates
        params=(
            n_max,
            keep_gold,
            prune_hamming,
            model_ref is not None,
            idf_ref is not None,
            kw.get("idf_id"),
        ),
    )

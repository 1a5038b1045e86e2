"""Trained-model persistence: the pretrained pairwise GBT ships with the
repo (state/pairwise_gbt.json), trained deterministically on the
sf0.001-derived labeled fixture by ``python -m
pubmed_and_method_ray.state.train`` — the "pretrained gradient-boosted
pairwise classifier" of BASELINE.json's north_star."""

from __future__ import annotations

import os

MODEL_PATH = os.path.join(os.path.dirname(__file__), "pairwise_gbt.json")
IDF_PATH = os.path.join(os.path.dirname(__file__), "idf.npz")


def load_pretrained_model_json() -> str | None:
    try:
        with open(MODEL_PATH) as f:
            return f.read()
    except OSError:
        return None


def save_model_json(blob: str) -> None:
    with open(MODEL_PATH, "w") as f:
        f.write(blob)


def load_pretrained_idf():
    """Pretrained hashed-ngram IDF table (fitted with the model; applying
    a frozen idf at scoring time is the standard fitted-vectorizer
    contract and saves a full corpus pass per run)."""
    import numpy as np

    try:
        with np.load(IDF_PATH) as z:
            return z["idf"]
    except OSError:
        return None


def save_idf(idf) -> None:
    import numpy as np

    np.savez_compressed(IDF_PATH, idf=idf)

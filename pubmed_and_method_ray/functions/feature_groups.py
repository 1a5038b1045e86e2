"""Named feature-set registry — the reference's experiment query surface
(/root/reference/src/comparison/feature_group.py:5-64 and the dispatch
table at src/comparison/inner_outer_feature_method.py:22-30), recast for
the web-graft feature vector. Feature sets are column subsets applied
with ``ds.select_columns`` (SURVEY.md §2.10)."""

from __future__ import annotations

from ..stages.features import FEATURE_NAMES

TEXT_FEATURES = ["jaccard_tokens", "jaccard_shingles", "tfidf_cosine", "simhash_sim"]
NAME_FEATURES = ["jw_title", "jw_path", "lev_path_sim", "title_len_ratio"]
CONTEXT_FEATURES = ["ts_proximity", "ambiguity", "same_lang"]

FEATURE_GROUPS: dict[str, list[str]] = {
    "all_features": list(FEATURE_NAMES),
    "text_features": TEXT_FEATURES,
    "name_features": NAME_FEATURES,
    "context_features": CONTEXT_FEATURES,
    # set-algebra combos, mirroring the reference's list arithmetic
    "text_name_features": TEXT_FEATURES + NAME_FEATURES,
    "no_context_features": [c for c in FEATURE_NAMES if c not in CONTEXT_FEATURES],
}


def get_feature_set(name: str) -> list[str]:
    try:
        return list(FEATURE_GROUPS[name])
    except KeyError:
        raise KeyError(
            f"unknown feature set {name!r}; available: {sorted(FEATURE_GROUPS)}"
        ) from None


def select_features(features_ds, name: str, keep: list[str] | None = None):
    """Project a features Dataset to a named feature set (+ id/label cols)."""
    cols = (keep or ["url_1", "url_2", "label"]) + get_feature_set(name)
    present = [c for c in cols if c in features_ds.schema().names]
    return features_ds.select_columns(present)

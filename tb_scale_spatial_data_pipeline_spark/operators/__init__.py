from .composites import grouped_median, argmax_composite, grouped_percentiles
from .joins import broadcast_lookup, dual_model_fallback, combo_dispatch, grid_zip_join
from .relabel import apply_rules, solar_shadow_rules
from .dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_band_buckets,
    lsh_candidate_pairs,
    ngram_jaccard,
    simhash_signatures,
    simhash16,
)
from .similarity import cosine_topk, lsh_ann_buckets, lsh_bucket
from .skew import salted_agg

__all__ = [
    "grouped_median",
    "argmax_composite",
    "grouped_percentiles",
    "broadcast_lookup",
    "dual_model_fallback",
    "combo_dispatch",
    "grid_zip_join",
    "apply_rules",
    "solar_shadow_rules",
    "exact_dedup",
    "minhash_signatures",
    "lsh_band_buckets",
    "lsh_candidate_pairs",
    "ngram_jaccard",
    "simhash_signatures",
    "simhash16",
    "cosine_topk",
    "lsh_ann_buckets",
    "lsh_bucket",
    "salted_agg",
]

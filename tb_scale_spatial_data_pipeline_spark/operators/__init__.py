from .composites import grouped_median, argmax_composite, grouped_percentiles
from .joins import broadcast_lookup, dual_model_fallback, combo_dispatch
from .relabel import apply_rules, solar_shadow_rules

__all__ = [
    "grouped_median",
    "argmax_composite",
    "grouped_percentiles",
    "broadcast_lookup",
    "dual_model_fallback",
    "combo_dispatch",
    "apply_rules",
    "solar_shadow_rules",
]

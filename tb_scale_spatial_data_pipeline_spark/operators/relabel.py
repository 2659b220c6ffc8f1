"""Conditional relabeling — the rule engine (SURVEY §2.2 P9).

The reference's heuristic post-processing
(`1_pixel_classification/pixel_classifier_stream.py:154-161`): solar
panels (12) with confidence < 0.60 → urban (2); shadow (16) → urban
(2). Expressed as a chained CASE WHEN — a single codegen'd projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

SOLAR = 12
SHADOW = 16
URBAN = 2
SOLAR_CONF_THRESHOLD = 0.60


def apply_rules(label: Column, rules: Sequence[tuple[Column, Column | int]]) -> Column:
    """Chain (condition, new_label) pairs into one CASE expression;
    first match wins, otherwise the label passes through."""
    expr = None
    for cond, new in rules:
        expr = F.when(cond, new) if expr is None else expr.when(cond, new)
    return label if expr is None else expr.otherwise(label)


def solar_shadow_rules(label: Column, confidence: Column) -> Column:
    """The reference's exact rule set."""
    return apply_rules(
        label,
        [
            ((label == SOLAR) & (confidence < SOLAR_CONF_THRESHOLD), F.lit(URBAN)),
            (label == SHADOW, F.lit(URBAN)),
        ],
    )

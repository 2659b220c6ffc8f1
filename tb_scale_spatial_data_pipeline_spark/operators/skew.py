"""Skew-mitigation operators (SURVEY §4 "AQE skew-join handling" +
the salting pattern for skewed aggregations).

AQE splits skewed JOIN partitions automatically, but a skewed
``groupBy`` key still funnels one key's rows into one reducer. Salting
splits each key into ``n_salts`` synthetic sub-keys, partial-aggregates
per sub-key (parallel), then merges the partials — correct for any
decomposable aggregate. Results are identical to the unsalted plan
(oracle-verified), which is the point: salting is a physical rewrite,
not a semantic one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[Column, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output-column → (input expression, merge_fn) where
    merge_fn ∈ {'sum', 'count', 'min', 'max'}: stage 1 aggregates per
    (keys, salt); stage 2 merges partials per keys ('count' partials
    merge with sum).
    """
    salt = (
        salt_source
        if salt_source is not None
        else F.floor(F.rand(seed=42) * n_salts)
    ).alias("_salt")

    stage1_aggs = []
    stage2_aggs = []
    for out, (expr, how) in aggs.items():
        if how == "sum":
            stage1_aggs.append(F.sum(expr).alias(f"_p_{out}"))
            stage2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif how == "count":
            stage1_aggs.append(F.count(expr).alias(f"_p_{out}"))
            stage2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif how == "min":
            stage1_aggs.append(F.min(expr).alias(f"_p_{out}"))
            stage2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif how == "max":
            stage1_aggs.append(F.max(expr).alias(f"_p_{out}"))
            stage2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported merge {how}")

    partial = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt").agg(*stage1_aggs)
    return partial.groupBy(*key_cols).agg(*stage2_aggs)

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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Salted equi-join for a skewed FACT side joining a small-but-not-
    broadcastable DIM side.

    AQE's skew-join split handles most cases at runtime, but it only
    fires on sort-merge joins and only when statistics reveal the skew;
    salting is the deterministic, planner-independent form. Each fact
    row gets a random salt in [0, n_salts); the dim side is EXPLODED
    across all n_salts values (dim must be the small side — its rows
    replicate n_salts×); joining on (keys..., salt) splits each hot
    key's rows over n_salts reducers. Results equal the unsalted join
    row-for-row (verified in tests) because every fact row still meets
    every matching dim row exactly once — under exactly one salt.

    ``how`` supports 'inner' and 'left' (fact-preserving); right/full
    would need the salt dropped from dim-only rows and are better
    served by swapping the sides.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner', 'left'}")
    salt = (
        salt_source
        if salt_source is not None
        else F.floor(F.rand(seed=42) * n_salts)
    ).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [*on, "_salt"], how).drop("_salt")

"""Scale-adaptive input spreading for CPU-dense pipelines.

The fixture tables are single-row-group parquet, so their scans are
one task regardless of core count — and any compute-dense map work
fused into the scan stage (shingling, per-token md5, regex profiling)
runs serially while the rest of the machine idles. ``spread_cpu``
repartitions ONLY when the input has fewer partitions than the
session's parallelism: at production split counts (every real table at
scale is many files/row groups) the condition is false and no shuffle
is added, so this is the "derive partitioning from the input" rule,
not a local-mode constant.

Only use it in front of per-row CPU-heavy work whose results are
partition-order independent (hash/agg/join shapes — everything in the
dedup/text tiers); the round-robin spread changes row placement, never
row content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_cpu(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` across the default parallelism iff the plan
    currently has fewer partitions; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

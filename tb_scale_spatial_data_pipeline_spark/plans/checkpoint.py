"""Stage memoization policy (SURVEY §4): the reference skips
already-built products via ``os.path.exists``
(`0_preprocessing/feature_stacking.py:261-262,318,336-338`). The Spark
engine's equivalent: materialize each pipeline stage as a named
parquet dataset and reuse it when present — incremental recompute
across driver restarts, with parquet's atomic job commit standing in
for the reference's temp-file discipline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def materialize_stage(
    df: DataFrame, path: str, spark: SparkSession | None = None, force: bool = False
) -> DataFrame:
    """Write-if-absent + read-back. The read-back (not the in-memory
    df) is returned so downstream stages see the exact persisted
    bytes — the same recompute-avoidance semantics as the reference's
    exists-skip, but job-atomic (a failed write leaves no partial
    product thanks to the parquet committer)."""
    spark = spark or df.sparkSession
    marker = os.path.join(path, "_SUCCESS")
    if force or not os.path.exists(marker):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)

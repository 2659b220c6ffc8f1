"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (dual-model fallback classification,
  SURVEY §7 "minimum end-to-end slice") on sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY §2 and
  the north-star extensions; each callable (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``: equivalent ANSI SQL per query for the DuckDB
  differential check. Names absent here are rows-only checked.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tb_scale_spatial_data_pipeline_spark.plans import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dual-model fallback classification (reference E4,
    `3_object_classification/object_classifier.py:149-181`) as a single
    DataFrame program — broadcast lookup join, backup-rule coalesce,
    default fill."""
    q = all_queries()["dual_model_fallback"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()

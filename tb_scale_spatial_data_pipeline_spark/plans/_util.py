"""Shared helpers for the query registry.

Cross-engine float determinism convention: monetary/measure columns in
the fixtures carry ≤2 decimal places, so SUM/AVG are computed over
exact DECIMAL casts and cast back to DOUBLE at the end — bit-identical
between Spark and DuckDB regardless of partitioning/accumulation
order. (A double-accumulated parallel sum is order-dependent in the
last ulp; decimal arithmetic is exact, making the order irrelevant.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent exact sum of a ≤`scale`-dp double column."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent mean: exact decimal sum / count, in double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double") / F.count(col)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"

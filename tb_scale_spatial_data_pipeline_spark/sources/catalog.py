"""Parquet catalog over the fixture tables.

Mirrors the reference's source layer (SURVEY §2.1): glob file-pattern
scans (`0_preprocessing/feature_stacking.py:67-70`), header/metadata
reads (`:177-179`), and streaming vector scans
(`3_object_classification/object_classifier.py:193-204`) all become
``spark.read.parquet`` — Catalyst handles column pruning and predicate
pushdown down to the parquet scan, which is the scale-relevant property
(a 100 TB table is only readable if filters and projections reach the
row-group level; `.explain` must show PushedFilters/ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet scan: pruning/pushdown are
    Catalyst's job — do not collect or materialize here.

    TIMESTAMP(NANOS) parquet columns (the `events.ts` fixture) arrive
    as nanos-since-epoch longs (``spark.sql.legacy.parquet.nanosAsLong``)
    and are truncated to microsecond timestamps here — the same value
    DuckDB sees at µs resolution.
    """
    if name == "events":
        # defensive: the caller's session may not carry the builder
        # config (e.g. the driver's own session) — the legacy conf is
        # runtime-settable and required to read TIMESTAMP(NANOS)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Unify `ts` to TIMESTAMP (with local-tz semantics, session tz UTC)
    across fixture generations: TIMESTAMP(NANOS) parquet arrives as
    nanos-since-epoch longs (truncated to µs — the value DuckDB sees),
    TIMESTAMP(MICROS) without a timezone arrives as TIMESTAMP_NTZ (a
    same-value cast under the UTC session tz). Watermarks and time
    windows require the TIMESTAMP type, so this runs at every events
    read — batch and streaming."""
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql use)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

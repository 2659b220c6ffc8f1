"""Dynamic partition pruning (DPP): when a partitioned fact table
joins a dimension filtered at runtime, Spark injects a dynamic pruning
subquery into the fact scan — partitions are skipped based on the
dim's qualifying keys without any static predicate on the fact. At
100 TB this is what saves the scan when the partition predicate only
exists on the other side of the join.
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F


def test_dpp_subquery_injected_into_fact_scan(spark, tmp_path):
    fact = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).cast("int").alias("part_key"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "fact_parted")
    fact.write.partitionBy("part_key").parquet(path)
    factp = spark.read.parquet(path)
    dim = spark.range(20).select(
        F.col("id").cast("int").alias("d_key"),
        F.when(F.col("id") < 3, "hot").otherwise("cold").alias("tier"),
    )
    j = factp.join(dim, factp["part_key"] == dim["d_key"]).where(
        F.col("tier") == "hot"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan
    # correctness: only the 3 hot partitions' rows survive
    assert j.count() == sum(1 for i in range(10_000) if i % 20 < 3)


def test_dpp_actually_skips_files(spark, tmp_path):
    fact = spark.range(2_000).select(
        (F.col("id") % 10).cast("int").alias("part_key"),
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "fact_skip")
    fact.write.partitionBy("part_key").parquet(path)
    factp = spark.read.parquet(path)
    dim = spark.range(10).select(F.col("id").cast("int").alias("d_key"))
    j = factp.join(dim.where(F.col("d_key") == 7), factp["part_key"] == F.col("d_key"))
    files = j.select(F.input_file_name().alias("f")).distinct().collect()
    assert files and all("part_key=7" in r["f"] for r in files)

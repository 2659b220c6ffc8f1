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


def test_runtime_bloom_filter_injected(spark, tmp_path):
    """Runtime bloom-filter join pruning: for a selective dim join on a
    NON-partition column, Spark can inject a bloom filter built from
    the dim side into the fact scan — row-group/row skipping where DPP
    cannot apply. The conf is the 100 TB knob; assert the rewrite fires
    when forced."""
    path = str(tmp_path / "fact_bloom")
    spark.range(200_000).select(
        (F.col("id") % 1000).alias("join_key"), F.col("id").alias("v")
    ).write.parquet(path)
    factp = spark.read.parquet(path)
    dpath = str(tmp_path / "dim_bloom")
    spark.range(1000).select(
        F.col("id").alias("d_key"),
        F.when(F.col("id").between(100, 104), "hot").otherwise("cold").alias("tier"),
    ).write.parquet(dpath)
    # the rewrite wants a *selective* predicate on the creation side,
    # and it must be on a NON-join column — a join-key range would be
    # propagated to the fact by constraint inference instead (no bloom
    # filter needed; that cheaper rewrite wins)
    dim = spark.read.parquet(dpath).where(F.col("tier") == "hot")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # the injection rule skips joins it expects to broadcast (a
        # broadcast join already prunes via its hash relation); force
        # the shuffle-join path a 100 TB fact/dim pair would take
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the test fact is tiny; drop the 10 GB application-side floor
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = factp.join(dim, factp["join_key"] == dim["d_key"])
        plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "bloom_filter_agg" in plan or "might_contain" in plan, plan
        assert j.count() == 5 * 200  # keys 100..104, 200 fact rows each
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)

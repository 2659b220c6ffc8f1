"""Bucketed co-partitioned zip join (PLANS.md scale item): writing
both band stacks bucketed on the grid key lets the J4 zip join run
with NO exchange — the plan-level property that matters at 100 TB,
where re-shuffling two co-produced stacks would dominate the job."""

from __future__ import annotations

import io
import contextlib

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def warehouse_spark(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    spark.sql("USE bucketdb")
    yield spark
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    spark.sql("USE default")


def test_bucketed_zip_join_has_no_exchange(warehouse_spark):
    spark = warehouse_spark
    base = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
    qty = base.groupBy("k").agg(F.sum("v").alias("band_qty"))
    price = base.groupBy("k").agg(F.max("v").alias("band_price"))
    for name, df in (("stack_qty", qty), ("stack_price", price)):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .saveAsTable(name)
        )
    # force the sort-merge path (the planner would broadcast these tiny
    # tables; at real scale both sides are huge and SMJ is the choice)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("stack_qty")
        b = spark.table("stack_price")
        joined = a.join(b, "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert joined.count() == 10_000
        # bucketed scans co-partition both sides: no shuffle exchange
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

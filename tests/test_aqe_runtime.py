"""Runtime re-planning properties (SURVEY §4 / PLANS.md scale items):

1. AQE skew-join splitting: a join with one pathologically hot key is
   re-planned at runtime — the executed plan carries the skew marker
   and the result is still exact. At 100 TB this is what stops one
   reducer from receiving a whole hot partition.
2. AQE partition coalescing: a deliberately over-partitioned shuffle
   is coalesced down at runtime (initial shuffle.partitions is only a
   hint — the property that makes one global setting workable across
   queries of very different sizes).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _executed_plan(df) -> str:
    # final (adaptively re-planned) physical plan — explain() only
    # shows it after execution materializes the AQE stages
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # left: 100k rows of ONE hot key + a uniform tail
        hot = spark.range(100_000).select(
            F.lit(7).alias("k"), F.col("id").alias("payload")
        )
        tail = spark.range(1_000).select(
            (F.col("id") % 100 + 100).cast("long").alias("k"),
            F.col("id").alias("payload"),
        )
        left = hot.union(tail)
        right = spark.range(200).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
        )
        joined = left.join(right, "k")
        plan = _executed_plan(joined)
        assert "skew=true" in plan, plan
        # exactness under the split: hot key 7 matches all 100k rows,
        # tail keys 100..199 all fall inside right's 0..199 key range
        assert joined.count() == 101_000
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "512")
    try:
        small = spark.range(1_000).select((F.col("id") % 10).alias("g"), F.col("id").alias("v"))
        agg = small.groupBy("g").agg(F.sum("v").alias("s"))
        agg.collect()
        # runtime partition count after AQE coalescing << 512
        n_parts = agg.rdd.getNumPartitions()
        assert n_parts < 64, f"AQE did not coalesce: {n_parts} partitions"
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead" in plan or "coalesced" in plan, plan
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

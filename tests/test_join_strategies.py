"""Physical join-strategy selection (SURVEY §2.4 'Spark's planner
supplies the physical join choice'): the same logical equi-join plans
as broadcast-hash, shuffled-hash, or sort-merge depending on hints and
session knobs — the knob surface an operator-of-100TB actually turns.
"""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _sides(spark):
    big = spark.range(50_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    small = spark.range(500).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
    return big, small


def test_broadcast_hint_wins(spark):
    big, small = _sides(spark)
    plan = _plan(big.join(F.broadcast(small), "k"))
    assert "BroadcastHashJoin" in plan, plan


def test_shuffled_hash_via_hint(spark):
    big, small = _sides(spark)
    plan = _plan(big.join(small.hint("shuffle_hash"), "k"))
    assert "ShuffledHashJoin" in plan, plan


def test_sort_merge_when_broadcast_disabled(spark):
    big, small = _sides(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(big.join(small.hint("merge"), "k"))
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_all_strategies_agree_on_result(spark):
    big, small = _sides(spark)
    expected = 500
    assert big.join(F.broadcast(small), "k").count() == expected
    assert big.join(small.hint("shuffle_hash"), "k").count() == expected
    assert big.join(small.hint("merge"), "k").count() == expected

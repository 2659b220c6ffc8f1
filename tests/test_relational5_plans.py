"""Plan- and value-level properties of the fifth relational batch:

- Q22 anti join plans as a broadcast anti join (build side is the
  filtered distinct-custkey set, tiny at any scale) and the price
  predicate reaches the orders scan.
- Q19's OR-of-ANDs keeps the equi-join (Catalyst extracts the common
  `l_partkey = p_partkey` conjunct — no nested loop), and the
  lineitem-only quantity disjunct is pushed to the fact scan.
- Moment statistics: the one-pass decimal power-sum results agree
  with numpy's reference computation, and are invariant to partition
  count (the 100 TB property the decimal convention buys).
"""

from __future__ import annotations

import contextlib
import io

import numpy as np
import pyspark.sql.functions as F

from tb_scale_spatial_data_pipeline_spark.plans import relational5 as r5

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q22_plans_broadcast_anti_join(spark):
    plan = _plan(r5.q_q22_anti_idle_customers(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # price filter pushed to the orders scan, not applied post-join
    assert "o_totalprice" in plan.split("LeftAnti")[-1] or (
        "PushedFilters" in plan and "250000" in plan
    ), plan


def test_q19_keeps_equi_join_and_pushes_quantity(spark):
    plan = _plan(r5.q_q19_disjunctive_pred(spark, SF))
    # common conjunct extracted -> hash join, not BroadcastNestedLoop
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the quantity-only residue of the disjunction reaches the scan
    assert "l_quantity" in plan, plan


def test_stats_moments_match_numpy(spark):
    rows = {
        r["l_returnflag"]: r
        for r in r5.q_stats_moments(spark, SF).collect()
    }
    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    ).toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(dtype=np.float64)
        m = x.mean()
        c = x - m
        m2, m3, m4 = (c**2).mean(), (c**3).mean(), (c**4).mean()
        got = rows[flag]
        assert got["n"] == len(x)
        assert abs(got["mean"] - m) < 1e-4
        assert abs(got["stddev_pop"] - np.sqrt(m2)) < 1e-4
        assert abs(got["skewness_pop"] - m3 / m2**1.5) < 1e-4
        assert abs(got["kurtosis_excess"] - (m4 / m2**2 - 3)) < 1e-4


def test_corr_regression_match_numpy(spark):
    rows = {
        r["l_returnflag"]: r
        for r in r5.q_corr_regression(spark, SF).collect()
    }
    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(dtype=np.float64)
        y = grp["l_extendedprice"].to_numpy(dtype=np.float64)
        got = rows[flag]
        assert abs(got["corr_qty_price"] - np.corrcoef(x, y)[0, 1]) < 1e-4
        assert abs(got["covar_samp"] - np.cov(x, y, ddof=1)[0, 1]) < 1e-2
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(got["regr_slope"] - slope) < 1e-3
        assert abs(got["regr_intercept"] - intercept) < 1e-1


def test_moments_partition_invariant(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    def run(df):
        xd = F.col("l_quantity").cast("decimal(9,2)")
        x2 = (xd * xd).cast("decimal(9,4)")
        out = df.groupBy("l_returnflag").agg(
            F.sum(xd).cast("double").alias("s1"),
            F.sum(x2).cast("double").alias("s2"),
        )
        return {r["l_returnflag"]: (r["s1"], r["s2"]) for r in out.collect()}

    a = run(li.repartition(1))
    b = run(li.repartition(37))
    assert a == b, (a, b)


def test_stringagg_deterministic_across_partitioning(spark):
    out1 = {
        r["r_name"]: r["nations_csv"]
        for r in r5.q_stringagg_sorted(spark, SF).collect()
    }
    # same query, different shuffle parallelism
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        out2 = {
            r["r_name"]: r["nations_csv"]
            for r in r5.q_stringagg_sorted(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert out1 == out2
    for csv in out1.values():
        parts = csv.split(",")
        assert parts == sorted(parts)

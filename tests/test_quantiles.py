"""Unit tests for operators/quantiles.py — the distributed-selection
order statistics that replaced every raw-table global window (round-7).

Ground truth is a driver-side pandas sort of the same fixture data;
the equivalence claim under test is the module's central theorem: with
a unique sort key, cut-tuple binning == ntile bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
    after_cut,
    exact_order_statistics,
    ntile_bin_column,
    ntile_cut_positions,
)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


def _truth(pdf, cols, asc, pos):
    srt = pdf.sort_values(cols, ascending=asc, kind="mergesort").reset_index(
        drop=True
    )
    return [tuple(float(v) for v in srt.iloc[p - 1]) for p in pos]


def test_ntile_cut_positions_partition_sizes():
    # n=10, k=4 -> ntile sizes 3,3,2,2 -> ends 3,6,8
    assert ntile_cut_positions(10, 4) == [3, 6, 8]
    # even split
    assert ntile_cut_positions(8, 4) == [2, 4, 6]
    # k > n degenerates to one row per leading bin
    assert ntile_cut_positions(3, 5) == [1, 2, 3, 3]


def test_order_statistics_match_driver_sort(orders, spark):
    pdf = orders.select("o_totalprice", "o_orderkey").toPandas()
    pos = [1, 7, len(pdf) // 2, len(pdf)]
    got = exact_order_statistics(orders, ["o_totalprice", "o_orderkey"], pos)
    assert [tuple(map(float, g)) for g in got] == _truth(
        pdf, ["o_totalprice", "o_orderkey"], [True, True], pos
    )


def test_order_statistics_mixed_direction(orders):
    pdf = orders.select("o_totalprice", "o_orderkey").toPandas()
    pos = [2, 100, 1400]
    got = exact_order_statistics(
        orders, ["o_totalprice", "o_orderkey"], pos, ascending=[False, True]
    )
    assert [tuple(map(float, g)) for g in got] == _truth(
        pdf, ["o_totalprice", "o_orderkey"], [False, True], pos
    )


def test_order_statistics_survive_heavy_duplicates(spark):
    # 1000 rows over only 3 distinct values: range partitions are
    # forced to split tie runs across boundaries
    df = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "v int, k int"
    )
    pos = [1, 334, 335, 667, 1000]
    got = exact_order_statistics(df, ["v", "k"], pos)
    pdf = df.toPandas()
    assert [tuple(map(float, g)) for g in got] == _truth(
        pdf, ["v", "k"], [True, True], pos
    )


def test_positions_out_of_range_raises(orders):
    with pytest.raises(ValueError):
        exact_order_statistics(orders, ["o_totalprice", "o_orderkey"], [0])


def test_ntile_bin_column_equals_window_ntile(orders):
    """The central theorem: unique sort key -> cut-tuple binning is
    ntile, row for row, including mixed sort directions."""
    for k, asc in ((5, [True, True]), (7, [False, True])):
        keys = ["o_totalprice", "o_orderkey"]
        mine = orders.withColumn(
            "bin", ntile_bin_column(orders, keys, k, ascending=asc)
        )
        w = Window.orderBy(
            *[F.col(c).asc() if a else F.col(c).desc() for c, a in zip(keys, asc)]
        )
        ref = orders.select(
            "o_orderkey", F.ntile(k).over(w).alias("bin_ref")
        )
        diff = (
            mine.join(ref, "o_orderkey")
            .where(F.col("bin") != F.col("bin_ref"))
            .count()
        )
        assert diff == 0, f"k={k} asc={asc}"


def test_global_cumsum_matches_window(orders, spark):
    """Distributed prefix scan == single-partition running sum, on the
    integer lattice (exact regrouping)."""
    from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
        with_global_cumsum,
    )

    df = orders.select(
        "o_orderkey", (F.col("o_custkey") % 100).cast("long").alias("v")
    )
    got = with_global_cumsum(df, ["o_orderkey"], ["v"])
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.select("o_orderkey", F.sum("v").over(w).alias("ref"))
    diff = (
        got.join(ref, "o_orderkey")
        .where(F.col("cum_v") != F.col("ref"))
        .count()
    )
    assert diff == 0


def test_global_cumsum_decimal_and_desc(orders):
    from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
        with_global_cumsum,
    )

    df = orders.select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    )
    got = with_global_cumsum(
        df, ["v", "o_orderkey"], ["v"], ascending=[False, True]
    )
    w = Window.orderBy(F.desc("v"), F.asc("o_orderkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = df.select("o_orderkey", F.sum("v").over(w).alias("ref"))
    diff = (
        got.join(ref, "o_orderkey")
        .where(F.col("cum_v") != F.col("ref"))
        .count()
    )
    assert diff == 0


def test_global_rank_matches_row_number(orders):
    from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
        with_global_rank,
    )

    got = with_global_rank(orders, ["o_totalprice", "o_orderkey"], out_col="r")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ref = orders.select(
        "o_orderkey", F.row_number().over(w).alias("ref")
    )
    diff = (
        got.join(ref, "o_orderkey").where(F.col("r") != F.col("ref")).count()
    )
    assert diff == 0


def test_scan_results_invariant_to_range_count(orders):
    """num_ranges is an execution knob, never a semantics knob: 1, 3
    and 64 ranges must give identical order statistics and cumsums
    (1 range = the degenerate single-partition case; 3 = ranges that
    split tie runs; 64 = more ranges than fixture partitions)."""
    from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
        exact_order_statistics,
        with_global_cumsum,
    )

    pos = [1, 500, 1500]
    base = None
    for nr in (1, 3, 64):
        got = exact_order_statistics(
            orders, ["o_totalprice", "o_orderkey"], pos, num_ranges=nr
        )
        base = got if base is None else base
        assert got == base, f"num_ranges={nr}"

    df = orders.select(
        "o_orderkey", (F.col("o_custkey") % 10).cast("long").alias("v")
    )
    ref = None
    for nr in (1, 3, 64):
        got = (
            with_global_cumsum(df, ["o_orderkey"], ["v"], num_ranges=nr)
            .orderBy("o_orderkey")
            .select("cum_v")
            .toPandas()["cum_v"]
            .tolist()
        )
        ref = got if ref is None else ref
        assert got == ref, f"num_ranges={nr}"


def test_cumsum_all_equal_sort_keys_with_tiebreak(spark):
    """Degenerate skew: every row shares one value key; the o_orderkey
    tiebreak still defines a total order and the scan must agree with
    the single-partition window."""
    from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
        with_global_cumsum,
    )

    df = spark.createDataFrame(
        [(7, i, i % 5) for i in range(2000)], "v int, k int, val long"
    )
    got = with_global_cumsum(df, ["v", "k"], ["val"])
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.select("k", F.sum("val").over(w).alias("ref"))
    assert (
        got.join(ref, "k").where(F.col("cum_val") != F.col("ref")).count() == 0
    )


def test_order_statistics_property_random(spark):
    """Property check over adversarial value shapes: random data with
    heavy ties, negatives, and denormal-ish spreads — selection must
    equal the driver-side sort for every requested rank."""
    import random

    rng = random.Random(421)
    for trial in range(5):
        n = rng.randint(5, 400)
        vals = [
            (rng.choice([rng.uniform(-5, 5), float(rng.randint(-2, 2))]), i)
            for i in range(n)
        ]
        df = spark.createDataFrame(vals, "v double, k int")
        pos = sorted(rng.sample(range(1, n + 1), min(5, n)))
        got = exact_order_statistics(
            df, ["v", "k"], pos, num_ranges=rng.choice([1, 4, 16])
        )
        srt = sorted(vals)
        want = [tuple(map(float, srt[p - 1])) for p in pos]
        assert [tuple(map(float, g)) for g in got] == want, f"trial {trial}"


def test_after_cut_is_strict_lexicographic(spark):
    df = spark.createDataFrame(
        [(1.0, 1), (1.0, 2), (2.0, 1)], "v double, k int"
    )
    marked = df.select(
        "v", "k", after_cut(["v", "k"], [True, True], (1.0, 2)).alias("a")
    ).collect()
    got = {(r["v"], r["k"]): r["a"] for r in marked}
    assert got == {(1.0, 1): False, (1.0, 2): False, (2.0, 1): True}


def test_positions_arguments_validated(orders):
    # exactly one of positions / positions_fn
    with pytest.raises(ValueError, match="exactly one"):
        exact_order_statistics(orders, ["o_totalprice", "o_orderkey"])
    with pytest.raises(ValueError, match="exactly one"):
        exact_order_statistics(
            orders,
            ["o_totalprice", "o_orderkey"],
            positions=[1],
            positions_fn=lambda n: [1],
        )


def test_results_aligned_to_requested_positions(orders):
    """Results come back in the CALLER's order with duplicates kept —
    a positions_fn returning [r, r] (e.g. trimmed-stats cuts at tiny n
    where lo == hi) must still 2-unpack."""
    pdf = orders.select("o_totalprice", "o_orderkey").toPandas()
    pos = [100, 5, 5, 100]
    got = exact_order_statistics(orders, ["o_totalprice", "o_orderkey"], pos)
    assert len(got) == 4
    truth = _truth(pdf, ["o_totalprice", "o_orderkey"], [True, True], pos)
    assert [tuple(map(float, g)) for g in got] == truth
    lo, hi = exact_order_statistics(
        orders, ["o_totalprice", "o_orderkey"], positions_fn=lambda n: [7, 7]
    )
    assert lo == hi


def test_num_ranges_derived_from_plan_stats(orders):
    """A stats-bearing parquet scan derives num_ranges from estimated
    bytes / target_range_bytes (floored at shuffle.partitions), so a
    100 TB key projection can't silently run at the session conf's 32
    ranges."""
    from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
        _derived_num_ranges,
    )

    keyproj = orders.select("o_totalprice", "o_orderkey")
    floor = int(
        orders.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # generous target -> floor wins
    assert _derived_num_ranges(keyproj, target_range_bytes=1 << 40) == floor
    # 1 KiB target -> the fixture's ~15k-row key projection must derive
    # more ranges than the floor, proportional to its stats estimate
    derived = _derived_num_ranges(keyproj, target_range_bytes=1024)
    assert derived > floor
    # and the default path still answers (no exception, >= floor)
    assert _derived_num_ranges(keyproj) >= floor


def test_nan_keys_internally_consistent(spark):
    """NaN routing (repartitionByRange) and ordering
    (sortWithinPartitions) now share Spark's comparator — NaN greater
    than every real double under ASC and DESC alike — so selection
    with NaN keys returns exactly the rows of Spark's own total order,
    including the DESC case where pandas' na_position would have
    disagreed."""
    import math as _math

    vals = [(float("nan") if i % 7 == 0 else float(i % 13), i) for i in range(200)]
    df = spark.createDataFrame(vals, "v double, k int")

    def spark_key(t, desc):
        v, k = t
        big = _math.inf if _math.isnan(v) else v
        return (-big if desc else big, -k if desc else k)

    for desc in (False, True):
        srt = sorted(vals, key=lambda t: spark_key(t, desc))
        pos = [1, 2, 29, 100, 200]
        got = exact_order_statistics(
            df, ["v", "k"], pos, ascending=[not desc, not desc], num_ranges=8
        )
        for g, p in zip(got, pos):
            want = srt[p - 1]
            assert g[1] == want[1], f"desc={desc} rank={p}"
            assert (_math.isnan(g[0]) and _math.isnan(want[0])) or g[0] == want[0]


def test_ntile_bin_column_k32_envelope(orders):
    """The documented envelope bound: k=32 chained-literal binning
    still equals the window ntile row-for-row."""
    keys = ["o_totalprice", "o_orderkey"]
    mine = orders.withColumn("bin", ntile_bin_column(orders, keys, 32))
    w = Window.orderBy(*keys)
    ref = orders.select("o_orderkey", F.ntile(32).over(w).alias("bin_ref"))
    assert (
        mine.join(ref, "o_orderkey")
        .where(F.col("bin") != F.col("bin_ref"))
        .count()
        == 0
    )


def test_cumsum_adversarial_ties_desc_mixed(spark):
    """Verdict r7 stretch: DESC+mixed-direction sort with DUPLICATE
    metric values — the unique-key tiebreaker contract is what makes
    the prefix scan equal the sequential window under ties."""
    rows = [((i * 7) % 10, i, (i * 3) % 4) for i in range(3000)]
    df = spark.createDataFrame(rows, "v int, k int, val long")
    from tb_scale_spatial_data_pipeline_spark.operators.quantiles import (
        with_global_cumsum,
    )

    got = with_global_cumsum(
        df, ["v", "k"], ["val"], ascending=[False, True], num_ranges=16
    )
    w = Window.orderBy(F.desc("v"), F.asc("k")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = df.select("k", F.sum("val").over(w).alias("ref"))
    assert (
        got.join(ref, "k").where(F.col("cum_val") != F.col("ref")).count() == 0
    )

"""Round-15 third-implementation cross-checks (the r14 discipline):
representative new statistics recomputed in plain NumPy from the raw
parquet (loaded via pandas — no Spark, no DuckDB), compared against
the registry queries' Spark outputs. The Spark<->DuckDB differential
is the primary gate; this guards against BOTH engines sharing a
mistranscribed formula.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def daily_cents() -> np.ndarray:
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    df = pd.DataFrame({"d": orders["o_orderdate"].to_numpy(), "y": cents})
    daily = df.groupby("d")["y"].sum().sort_index()
    return daily.to_numpy()


def _one(spark, name):
    from tb_scale_spatial_data_pipeline_spark.plans import all_queries

    return all_queries()[name](spark, SF_SMOKE).collect()


def test_gearys_c_crosscheck(spark, daily_cents):
    y = daily_cents.astype(np.float64)
    n = len(y)
    num = n * np.sum(np.diff(y) ** 2)
    den = 2.0 * (n * np.sum(y * y) - y.sum() ** 2)
    row = _one(spark, "gearys_c")[0]
    assert row["n_days"] == n
    assert abs(row["gearys_c"] - num / den) < 1e-6


def test_yule_walker_crosscheck(spark, daily_cents):
    y = daily_cents.astype(np.float64)
    u = len(y) * y - y.sum()
    c0 = np.dot(u, u)
    c1 = np.dot(u[:-1], u[1:])
    c2 = np.dot(u[:-2], u[2:])
    den = c0 * c0 - c1 * c1
    row = _one(spark, "yule_walker_ar2")[0]
    assert abs(row["phi1"] - c1 * (c0 - c2) / den) < 1e-6
    assert abs(row["phi2"] - (c0 * c2 - c1 * c1) / den) < 1e-6


def test_runs_test_crosscheck(spark, daily_cents):
    s = np.sign(np.diff(daily_cents.astype(np.int64)))
    s = s[s != 0]
    runs = 1 + int(np.sum(s[1:] != s[:-1]))
    n1, n2 = int((s == 1).sum()), int((s == -1).sum())
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
    )
    row = _one(spark, "runs_test_wald_wolfowitz")[0]
    assert (row["runs"], row["n_up"], row["n_down"]) == (runs, n1, n2)
    assert abs(row["z_score"] - (runs - mu) / np.sqrt(var)) < 1e-6


def test_siegel_crosscheck(spark, daily_cents):
    y = daily_cents.astype(np.float64)
    i = np.arange(1, len(y) + 1, dtype=np.float64)
    inner = []
    for a in range(len(y)):
        sl = (y - y[a]) / (i - i[a])
        inner.append(np.median(np.delete(sl, a)))
    slope = float(np.median(inner))
    row = _one(spark, "siegel_repeated_median")[0]
    assert abs(row["slope_cents_per_day"] - slope) < 1e-4
    assert abs(
        row["intercept_cents"] - float(np.median(y - slope * i))
    ) < 1e-1


def test_kz_filter_crosscheck(spark, daily_cents):
    y = daily_cents.astype(np.float64)
    cur = y
    for _ in range(3):
        k = np.convolve(cur, np.ones(7), mode="valid")
        cur = k
    want = cur / 343.0 / 100.0  # dollars
    rows = _one(spark, "kz_filter_smoothing")
    got = np.array([r["kz_smoothed_dollars"] for r in rows])
    assert len(got) == len(want)
    assert np.max(np.abs(got - want)) < 1e-5


def test_cliffs_delta_crosscheck(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    x = np.sort(j.loc[j.c_mktsegment == "BUILDING", "o_totalprice"].to_numpy())
    z = np.sort(j.loc[j.c_mktsegment == "MACHINERY", "o_totalprice"].to_numpy())
    # gt = #(x > z) via searchsorted on the sorted other sample
    gt = int(np.searchsorted(z, x, side="left").sum())
    lt = int((len(z) - np.searchsorted(z, x, side="right")).sum())
    row = _one(spark, "cliffs_delta_effect")[0]
    assert (row["n_greater"], row["n_less"]) == (gt, lt)
    assert abs(row["cliffs_delta"] - (gt - lt) / (len(x) * len(z))) < 1e-9

"""Grouped composite aggregations (SURVEY §2.3 A1–A4).

The reference builds temporal composites per pixel: a nanmedian NDVI
monthly composite (`0_preprocessing/feature_stacking.py:106-138`) and a
max-NDVI argmax composite that keeps the whole 7-band payload of the
winning image (`:140-167`). Both are single shuffle-free-on-map-side
grouped aggregates in Spark: partial aggregation (map-side combine)
means the shuffle moves only per-group state, not raw pixels — the
property that makes this work when "group" = pixel and there are 10^12
of them. Nulls (masked pixels) are ignored natively by Spark
aggregates, reproducing nanmedian/masked-max without special cases.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Auto-flip threshold for exact→approx percentiles: above this
# plan-estimated input size, exact sort-based percentiles are the
# registry's worst scaler (measured 3.8× wall at 10× data), while
# percentile_approx keeps a bounded per-group sketch that combines
# map-side. 1 GiB ≈ 10^8 doubles — comfortably exact below, sketch
# above. Oracle fixtures (sf ≤ 0.1, a few hundred MB) stay exact.
AUTO_APPROX_BYTES = 1 << 30


_LONG_MAX = (1 << 63) - 1


def _auto_exact(df: DataFrame, exact: bool | None, threshold_bytes: int) -> bool:
    """Resolve exact=None to a size-based choice using Catalyst's
    plan-statistics estimate (driver-side only — runs no job).

    Callers who need result precision pinned independent of
    stats/AQE/session config must pass exact=True/False explicitly —
    the auto path trades that invariance for not sorting 100 TB.

    Sentinel handling: leaves without stats (in-memory relations, RDD
    scans) report exactly spark.sql.defaultSizeInBytes (Long.MaxValue
    by default) — ONLY that exact value is treated as UNKNOWN → exact
    (unknown-size inputs are local/test relations; every real 100 TB
    input is a file scan whose footer stats yield a genuine estimate).
    Statistics.sizeInBytes is a BigInt, so genuinely huge estimates
    (join products) can EXCEED Long.MaxValue — those are 'huge', not
    'unknown', and flip to approx. If the private plan-stats API is
    unavailable (e.g. Spark Connect), fall back to exact."""
    if exact is not None:
        return exact
    try:
        sentinel = int(
            df.sparkSession.conf.get("spark.sql.defaultSizeInBytes", str(_LONG_MAX))
        )
    except Exception:
        sentinel = _LONG_MAX
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # Spark Connect / API drift: no stats → stay exact
        return True
    if est == sentinel:
        return True
    return est <= threshold_bytes


def grouped_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str | Column,
    out_col: str = "median_value",
    exact: bool | None = True,
    auto_threshold_bytes: int = AUTO_APPROX_BYTES,
) -> DataFrame:
    """Per-group median ignoring NULLs (A1, nanmedian composite).

    ``exact=True`` uses Spark's exact ``median`` (linear-interpolated,
    matches DuckDB's ``median``); ``exact=False`` switches to
    ``percentile_approx`` — the knob to turn at 100 TB where exact
    median forces a full sort of each group's values. The default is
    ``exact=True``: result precision never silently depends on plan
    statistics. ``exact=None`` OPTS IN to the size-based auto-flip
    (approx above ``auto_threshold_bytes``, see AUTO_APPROX_BYTES) —
    say so explicitly when approximate tails are acceptable.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    agg = (
        F.median(value)
        if _auto_exact(df, exact, auto_threshold_bytes)
        else F.percentile_approx(value, 0.5)
    )
    return df.groupBy(*group_cols).agg(agg.alias(out_col))


def argmax_composite(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str | Column,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Argmax-by-key (A2/A4): per group, the payload of the row with the
    max ``order_col``; masked rows (NULL order) are never winners —
    exactly the reference's masked→-inf exclusion
    (`0_preprocessing/feature_stacking.py:162-165`).

    Implemented as ``max_by`` per payload column with a deterministic
    tie-break: max_by on a struct(order, payload...) falls back to
    struct comparison, so ties resolve by payload order rather than
    arrival order. One aggregate, one shuffle, map-side partials.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    winner = F.max(F.struct(order.alias("_ord"), *[F.col(c) for c in payload_cols])).alias("_w")
    out = df.where(order.isNotNull()).groupBy(*group_cols).agg(winner)
    cols = [F.col(c) for c in group_cols]
    cols.append(F.col("_w._ord").alias("max_" + (order_col if isinstance(order_col, str) else "order")))
    cols.extend(F.col(f"_w.{c}").alias(c) for c in payload_cols)
    return out.select(*cols)


def grouped_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percentiles: Sequence[float] = (0.02, 0.98),
    exact: bool | None = True,
    auto_threshold_bytes: int = AUTO_APPROX_BYTES,
) -> DataFrame:
    """Grouped percentile aggregate (A3) for the contrast stretch (P8).

    Exact ``percentile`` (continuous-interpolated, matches DuckDB
    quantile_cont) by default; ``percentile_approx`` as the 100 TB
    path. ``exact=True`` (default) pins precision; ``exact=None``
    OPTS IN to resolving by plan-estimated input size against
    ``auto_threshold_bytes``; ``exact=False`` pins approx. Output columns are named p<percent> (p2, ...).
    """
    aggs = []
    use_exact = _auto_exact(df, exact, auto_threshold_bytes)
    for p in percentiles:
        name = f"p{int(round(p * 100))}"
        if use_exact:
            aggs.append(F.percentile(F.col(value_col), F.lit(p)).alias(name))
        else:
            aggs.append(F.percentile_approx(F.col(value_col), F.lit(p)).alias(name))
    return df.groupBy(*group_cols).agg(*aggs)

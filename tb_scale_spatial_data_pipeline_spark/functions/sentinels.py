"""Sentinel-nodata ↔ SQL NULL normalization (SURVEY §2.2 P5/P6).

The reference uses sentinel values instead of nulls: -9999.0 output
nodata (`0_preprocessing/feature_stacking.py:43`), 0 default input
nodata (`:42`), NaN for compute
(`1_pixel_classification/pixel_classifier_stream.py:121-122`), and
converts back on write (`0_preprocessing/feature_stacking.py:138`).
Inside this engine the convention is: sentinels are mapped to real
NULLs at the scan boundary so Spark's null-ignoring aggregates
reproduce nanmedian/masked-max semantics for free, and mapped back at
the sink. All expressions are codegen-able Catalyst exprs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NODATA_OUT = -9999.0


def is_nodata(x: Column, sentinel: float = NODATA_OUT, atol: float = 1e-2) -> Column:
    """|x - sentinel| < atol, the reference's isclose(-9999, atol=1e-2)
    test (`1_pixel_classification/pixel_classifier_stream.py:121`),
    plus NaN detection."""
    return F.isnan(x) | (F.abs(x - F.lit(sentinel)) < F.lit(atol))


def sentinel_to_null(x: Column, sentinel: float = NODATA_OUT, atol: float = 1e-2) -> Column:
    """Scan-side: sentinel (or NaN) → NULL."""
    return F.when(~is_nodata(x, sentinel, atol), x)


def null_to_sentinel(x: Column, sentinel: float = NODATA_OUT) -> Column:
    """Sink-side: NULL/NaN → sentinel (nan_to_num(x, nan=-9999),
    `0_preprocessing/feature_stacking.py:138`)."""
    return F.coalesce(F.nanvl(x, F.lit(sentinel)), F.lit(sentinel))

"""Composite-key signatures (SURVEY §2.2 P10, P14, P15).

The reference keys its per-pixel model dispatch on the tuple of
non-NaN band names (`1_pixel_classification/pixel_classifier_stream.py:131-133`)
and MD5-hashes model names longer than 100 chars (`:45-55`). Both are
expressed here as built-in column functions — `concat_ws` over
conditional name literals, and `md5` — so signature computation stays
JVM-side even over billions of pixel rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def combo_signature(cols: Sequence[tuple[str, Column]], sep: str = "_") -> Column:
    """Null-pattern signature: names of the non-null columns joined by
    ``sep``. ``cols`` is [(band_name, column), ...]. concat_ws skips
    NULL elements natively, which implements the reference's
    tuple-of-valid-band-names in one expression."""
    parts = [F.when(c.isNotNull(), F.lit(name)) for name, c in cols]
    return F.concat_ws(sep, *parts)


def hashed_model_key(key: Column, max_len: int = 100) -> Column:
    """Key shortening: md5 when longer than ``max_len``
    (`1_pixel_classification/pixel_classifier_stream.py:45-55`)."""
    return F.when(F.length(key) > max_len, F.md5(key)).otherwise(key)

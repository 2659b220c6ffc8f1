"""Join-shaped operators (SURVEY §2.4 J1–J5).

The reference never calls a join API but three of its patterns are
joins: the seg_id→prediction dict map
(`3_object_classification/object_classifier.py:134-146,162-165`), the
dual-model fallback on lookup misses (`:167-177`), and the per-combo
model dispatch (`1_pixel_classification/pixel_classifier_stream.py:135-144`).
In Spark each becomes a broadcast hash join: the lookup side is small
(models, prediction caches) while the probe side is the 100 TB fact —
broadcasting avoids shuffling the fact entirely, which is the single
most important join decision at scale. Explicit ``broadcast()`` hints
are used because these lookup tables are *derived* (post-aggregation),
so the optimizer's size estimate can be badly wrong.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_lookup(
    facts: DataFrame,
    lookup: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """J1: broadcast lookup join — `pd.Series.map(preds_map)` as a
    left broadcast-hash join; the fact side never shuffles."""
    return facts.join(F.broadcast(lookup), on=on, how=how)


def dual_model_fallback(
    facts: DataFrame,
    main_lookup: DataFrame,
    on: str | Sequence[str],
    main_col: str,
    backup_expr: Column,
    out_col: str = "PredClass",
    default: float | int = 0,
) -> DataFrame:
    """J2: left-join to the main prediction lookup; rows that miss get
    the backup expression; anything still null gets ``default``
    (the reference's fillna(0),
    `3_object_classification/object_classifier.py:167-177`)."""
    joined = broadcast_lookup(facts, main_lookup, on=on, how="left")
    return joined.withColumn(
        out_col, F.coalesce(F.col(main_col), backup_expr, F.lit(default))
    ).drop(main_col)


def combo_dispatch(
    pixels: DataFrame,
    models: DataFrame,
    on: str = "combo_sig",
) -> DataFrame:
    """J3: keyed model dispatch. Inner broadcast join = left-semi
    filter (combos with no active model are dropped this pass,
    `1_pixel_classification/pixel_classifier_stream.py:135-136`) +
    payload fetch (the model reference travels with the row group)."""
    return pixels.join(F.broadcast(models), on=on, how="inner")


def grid_zip_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """J4: grid-aligned zip (band concatenation) — equi-join of
    co-registered tile/pixel tables on the grid key. When both sides
    are bucketed/partitioned on the key this is a co-partitioned zip
    with no shuffle; at 100 TB write both stacks bucketed by tile."""
    return left.join(right, on=list(keys), how=how)

"""Multimodal-column queries (rows-only: the decode stub is pandas
kernel logic, not SQL-expressible; invariants live in
tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.media import (
    image_channel_stats,
    resize_images,
    sample_frames,
    synth_media_table,
)

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_q("multimodal_image_features")
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_table(spark, sf_dir)
    stats = image_channel_stats(media)
    return stats.select(
        "media_id",
        *[F.round(c, 6).alias(c) for c in ["mean_c0", "mean_c1", "mean_c2", "std_c0", "std_c1", "std_c2"]],
    )


@_q("multimodal_resize")
def q_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_table(spark, sf_dir)
    out = resize_images(media, out_w=4, out_h=4)
    return out.select("media_id", "width", "height", "channels", F.length("payload").alias("n_bytes"))


@_q("multimodal_frame_sample")
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media_table(spark, sf_dir)
    out = sample_frames(media, every_k=2)
    return out.select("media_id", "frame_idx", F.round("frame_mean", 6).alias("frame_mean"))

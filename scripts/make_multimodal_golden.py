"""Generate the golden-table oracle fixtures for the two oracle-paired
multimodal queries (plans/media_queries.py).

The media decode tier is a deterministic byte transform (from-scratch
PNG/GIF/JPEG codecs over md5-chain pixels), so its expected output over
the SF-independent fixed fixture is a constant table. This script
computes it ONCE and pins it under tb_scale_spatial_data_pipeline_spark/
fixtures/; the DuckDB oracle then reads the pinned parquet back —
regression-pin (golden-file) semantics. The codec byte contracts are
independently pinned by tests/test_jpeg_codec.py, test_gif_codec.py and
tests/test_multimodal.py, so a change that silently altered decode
output would fail those before it could "refresh" a wrong golden table.

Re-run (and commit the result) ONLY when the fixture or feature
definitions intentionally change:

    python scripts/make_multimodal_golden.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(
    REPO, "tb_scale_spatial_data_pipeline_spark", "fixtures"
)


def main() -> None:
    from tb_scale_spatial_data_pipeline_spark.plans.media_queries import (
        q_audio_features,
        q_frame_sample,
        q_image_features,
        q_multimodal_neardup,
        q_multimodal_phash_neardup,
        q_resize,
    )
    from tb_scale_spatial_data_pipeline_spark.session import get_spark

    os.makedirs(FIXTURES, exist_ok=True)
    spark = get_spark("golden")
    for name, fn in (
        ("multimodal_golden_features", q_image_features),
        ("multimodal_golden_phash", q_multimodal_phash_neardup),
        ("multimodal_golden_resize", q_resize),
        ("multimodal_golden_frames", q_frame_sample),
        ("multimodal_golden_neardup", q_multimodal_neardup),
        ("multimodal_golden_audio", q_audio_features),
    ):
        pdf = fn(spark, "").toPandas()  # fixed fixture ignores sf_dir
        out = os.path.join(FIXTURES, f"{name}.parquet")
        pdf.to_parquet(out, index=False)
        print(f"wrote {out}: {len(pdf)} rows")


if __name__ == "__main__":
    main()

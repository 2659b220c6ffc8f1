from .media import (
    synth_media_table,
    decode_images,
    image_channel_stats,
    resize_images,
    sample_frames,
)

__all__ = [
    "synth_media_table",
    "decode_images",
    "image_channel_stats",
    "resize_images",
    "sample_frames",
]

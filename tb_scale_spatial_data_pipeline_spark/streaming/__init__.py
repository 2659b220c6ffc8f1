from .events import (
    events_stream,
    run_stream_to_table,
    stream_tumbling_counts,
    stream_sliding_counts,
    stream_session_windows,
    stream_dedup_within_watermark,
)

__all__ = [
    "events_stream",
    "run_stream_to_table",
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_windows",
    "stream_dedup_within_watermark",
]

from .aggregations import (
    hourly_event_counts,
    sessionize_batch,
    streaming_hourly_event_counts,
    streaming_sessionize,
)

__all__ = [
    "hourly_event_counts",
    "sessionize_batch",
    "streaming_hourly_event_counts",
    "streaming_sessionize",
]

from .ingest import (
    incremental_er,
    read_pages_stream,
    stream_dedup,
)
from .windows import extract_event_props, sessionize, windowed_event_counts

__all__ = [
    "incremental_er",
    "read_pages_stream",
    "stream_dedup",
    "extract_event_props",
    "sessionize",
    "windowed_event_counts",
]

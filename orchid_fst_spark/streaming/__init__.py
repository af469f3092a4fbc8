from .ingest import (
    incremental_er,
    read_pages_stream,
    stream_dedup,
)
from .stateful import streaming_fuzzy_match
from .windows import (
    extract_event_props,
    sessionize,
    sessionize_stream,
    windowed_event_counts,
)

__all__ = [
    "incremental_er",
    "read_pages_stream",
    "stream_dedup",
    "streaming_fuzzy_match",
    "extract_event_props",
    "sessionize",
    "sessionize_stream",
    "windowed_event_counts",
]

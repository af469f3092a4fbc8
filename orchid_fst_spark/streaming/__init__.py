from .ingest import (
    incremental_er,
    read_pages_stream,
    stream_dedup,
)
from .joins import stream_interval_join
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
    "stream_interval_join",
    "streaming_fuzzy_match",
    "extract_event_props",
    "sessionize",
    "sessionize_stream",
    "windowed_event_counts",
]

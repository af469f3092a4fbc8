from .ingest import (
    incremental_er,
    read_pages_stream,
    stream_dedup,
)
from .ingest import (
    dedup_from_state,
    fs_em_from_state,
    stream_fs_pattern_counts,
    stream_near_dedup,
    stream_swoosh,
    swoosh_from_state,
    stream_text_index,
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
    "stream_near_dedup",
    "dedup_from_state",
    "stream_swoosh",
    "swoosh_from_state",
    "stream_fs_pattern_counts",
    "fs_em_from_state",
    "stream_text_index",
    "streaming_fuzzy_match",
    "extract_event_props",
    "sessionize",
    "sessionize_stream",
    "windowed_event_counts",
]

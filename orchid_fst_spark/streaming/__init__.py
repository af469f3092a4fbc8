from .ingest import (
    incremental_er,
    read_pages_stream,
    stream_dedup,
)

__all__ = ["incremental_er", "read_pages_stream", "stream_dedup"]

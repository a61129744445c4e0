from .dedup import (
    dedup_stream,
    message_digest,
    run_stream_dedup_bounded,
    run_ttl_dedup_bounded,
)
from .source import events_message_stream

__all__ = [
    "dedup_stream",
    "events_message_stream",
    "message_digest",
    "run_stream_dedup_bounded",
    "run_ttl_dedup_bounded",
]

from .pipeline import (
    append_sink_run,
    cdc_stream,
    refresh_sink_run,
    session_agg,
    sliding_agg,
    tumbling_agg,
    upsert_stream_run,
)

__all__ = [
    "append_sink_run",
    "cdc_stream",
    "refresh_sink_run",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
    "upsert_stream_run",
]

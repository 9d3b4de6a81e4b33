"""Structured Streaming surface: micro-batch reuse of the batch feature DAG."""

from funcify_feature_eng_spark.streaming.runner import (
    materialize_stream,
    session_windows_stream,
)

__all__ = ["materialize_stream", "session_windows_stream"]

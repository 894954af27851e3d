"""Structured Streaming variant of the ingest path (see stream_pipeline.py)."""

from .stream_pipeline import run_stream, streaming_severity_counts, total_sink_counts

__all__ = ["run_stream", "streaming_severity_counts", "total_sink_counts"]

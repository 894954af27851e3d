"""Structured Streaming variant of the ingest path (see stream.py)."""

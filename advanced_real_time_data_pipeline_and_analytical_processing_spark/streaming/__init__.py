"""Structured Streaming layer: file ingest pipeline + event-time windows."""

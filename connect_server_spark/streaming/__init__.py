"""Structured Streaming surface: windowed aggregations over the events
stream and stateful per-key status tracking."""

"""Structured Streaming: the engine's incremental-processing plane."""

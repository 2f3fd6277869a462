"""Structured Streaming surface: windows, watermarks, dedup, upsert sink."""

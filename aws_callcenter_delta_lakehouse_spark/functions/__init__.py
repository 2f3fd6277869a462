"""Validation rule engine + scalar helpers."""

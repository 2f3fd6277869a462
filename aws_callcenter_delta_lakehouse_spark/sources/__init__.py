"""Readers, writers, and the MERGE-capable managed table."""

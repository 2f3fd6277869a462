"""Medallion pipeline: DQ validation -> Silver upsert -> Gold analytics."""

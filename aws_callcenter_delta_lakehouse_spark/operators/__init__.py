"""Operator library: relational ops Spark lacks natively plus the
LLM-data-pipeline operators (dedup, similarity, text, multimodal)."""

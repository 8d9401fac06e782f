"""Structured Streaming operators (north-star §2B streaming surface)."""

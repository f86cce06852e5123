"""Structured Streaming surface: incremental KG construction."""

"""Distributed operators: extract, link, canonicalize, dedup, similarity."""

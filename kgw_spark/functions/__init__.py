"""Shared row-level semantics: extraction rules, MeTTa quoting,
informative-value predicate, text analysis, hashing."""

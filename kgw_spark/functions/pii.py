"""PII detection and redaction over a text column.

Every large-scale training-data pipeline scrubs personally identifying
information before a corpus ships; this module implements the scrub as
pure JVM column expressions (``regexp_extract_all`` /
``regexp_replace`` — no Python in the hot path, fully pushed into the
scan that reads the corpus anyway, no shuffle).

Pattern discipline: the patterns use only syntax with IDENTICAL
semantics in Java regex (Spark) and RE2 (DuckDB, for the value oracle)
— character classes, bounded repetition, ``\\b`` word boundaries; no
lookarounds, no backreferences. Detection counts and the redacted text
itself are therefore exactly reproducible across engines, which is what
makes the scrub auditable: ``sha256(redacted)`` is a portable
certificate of what shipped.

At 100 TB this is one narrow projection per document — the same scan
cost as the token-count pass it typically rides along with.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: redaction applies email → ipv4 → phone; counts are computed
# on the ORIGINAL text so overlapping matches never double-redact a
# count. Kept deliberately conservative (high precision): a corpus
# scrub that nukes every number does more harm than a scoped pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{2} [0-9]{3} [0-9]{4}\b"

PATTERNS = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "ipv4": (IPV4_RE, "<IP>"),
    "phone": (PHONE_RE, "<PHONE>"),
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind match counts on the original text."""
    return {
        kind: F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        for kind, (pat, _repl) in PATTERNS.items()
    }


def redact_pii(col: Column) -> Column:
    """All PII spans replaced by typed placeholders, in PATTERNS order
    (email before ipv4: an address like user@10.0.0.1 redacts as one
    email, the same composition order as the SQL twin)."""
    out = col
    for pat, repl in PATTERNS.values():
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_sql(text_expr: str) -> dict[str, str]:
    """The identical computation as ANSI/DuckDB SQL fragments (the
    oracle twin): per-kind count expressions plus the redacted text.
    DuckDB's regexp_replace needs the 'g' flag to match Spark's
    replace-all semantics."""
    counts = {
        kind: f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for kind, (pat, _repl) in PATTERNS.items()
    }
    redacted = text_expr
    for pat, repl in PATTERNS.values():
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    counts["redacted"] = redacted
    return counts

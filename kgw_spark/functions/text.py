"""Text-analysis column expressions for training-data pipelines.

All pure ``pyspark.sql.functions`` column builders — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Each has an exact
ANSI-SQL twin (used as the DuckDB oracle in __spark_entry__.py), so
formulas deliberately use only portable constructs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword list (shared with the SQL oracle)
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "on", "for"]

# marker words for the n-gram-free language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "que"],
}

PUNCT_CLASS = "[.,!?;:]"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), "\\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish token count: words and punctuation count separately."""
    words = F.size(F.regexp_extract_all(col, F.lit("[A-Za-z0-9_]+"), 0))
    punct = F.size(F.regexp_extract_all(col, F.lit(PUNCT_CLASS), 0))
    return words + punct


def punct_ratio(col: Column) -> Column:
    n_punct = F.size(F.regexp_extract_all(col, F.lit(PUNCT_CLASS), 0))
    return n_punct.cast("double") / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    )
    return stop.cast("double") / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]: rewards mid-length
    docs and a sane stopword share, penalizes punctuation soup."""
    length_term = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 10.0)
    return F.round(
        length_term * 0.4 + stop_term * 0.3 + punct_term * 0.3, 6
    )


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(col)
    return {
        lang: _marker_hits(toks, markers) for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Marker-word language ID; deterministic tie-break by language code
    ascending; 'und' when no marker hits."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(
                (-scores[lang]).alias("neg"), F.lit(lang).alias("lang")
            )
            for lang in sorted(scores)
        ]
    )
    best = F.array_min(pairs)
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Rolling polynomial document fingerprint over whitespace tokens:
    h = (h*1000003 + len(tok)*131 + ascii(first_char)) mod 2147483647.
    Portable: the identical fold runs in DuckDB via list_reduce."""
    toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * 1000003
            + F.length(t).cast("long") * 131
            + F.ascii(F.substring(t, 1, 1)).cast("long")
        )
        % 2147483647,
    )

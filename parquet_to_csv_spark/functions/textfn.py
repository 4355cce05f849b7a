"""Text primitives for the LLM-pipeline operators (SURVEY.md E4/E5).

Everything is a native Column expression (regexp/split/array functions
are codegen'd JVM-side); the regexes are RE2-compatible so the DuckDB
oracle can run the identical pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# BPE-ish lexer: words, digit runs, or single non-space symbols.
# Kept RE2-safe (no lookaround) so DuckDB's regexp_extract_all matches.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokens of lowercased text, empty strings removed."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))


def regex_tokens_col(text: Column | str = "text") -> Column:
    """BPE-ish regex tokens (words / digit runs / symbols)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_REGEX), F.lit(0))


def normalized_text_col(text: Column | str = "text") -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_col(text: Column | str = "text") -> Column:
    """Deterministic 128-bit content fingerprint of normalized text.

    md5 hex — identical in Spark and DuckDB, so it is oracle-checkable
    (unlike engine-private hashes like xxhash64).
    """
    return F.md5(normalized_text_col(text))

"""PII detection and redaction for training-data pipelines.

Regex-pattern detectors (email / phone / IPv4 / SSN-shaped) as JVM Column
expressions — one narrow map over the corpus, no shuffle, no Python.  A
production pipeline swaps sharper patterns (or an NER model via
``mapInPandas``) into the same operator shape; the engine-side contract —
per-doc hit counts plus a redacted text column, computed in one scan — is
what this module pins down.

Patterns deliberately use only the regex subset with identical semantics in
Java (Spark) and RE2 (DuckDB oracles): character classes, bounded repeats,
non-capturing groups, word boundaries.  No backreferences, no lookaround.

The reference has no text operators (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: detector name → pattern.  Order matters for redaction: longer/more
#: specific first so e.g. an SSN inside a longer digit run is not half-eaten
#: by a later pattern.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-pattern match counts (``regexp_count`` — one pass per pattern)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def redact(text: Column | str, token: str = "[PII]") -> Column:
    """Replace every PII match with ``token`` (chained global
    ``regexp_replace`` passes, one per pattern, in ``PII_PATTERNS`` order)."""
    c = F.col(text) if isinstance(text, str) else text
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, token)
    return c


def pii_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    token: str = "[PII]",
) -> DataFrame:
    """Per-document PII audit: one count column per detector, a total, and
    the redacted text — a single narrow map stage (fanned out on an
    under-split local corpus)."""
    from parquery_spark.operators.util import fan_out

    src = fan_out(df, id_col)
    counts = pii_counts(F.col(text_col))
    total = sum(counts.values())
    return src.select(
        "*",
        *[cnt.alias(f"n_{name}") for name, cnt in counts.items()],
        total.alias("n_pii"),
        redact(F.col(text_col), token).alias("redacted_text"),
    )

"""PII redaction and URL extraction for training-corpus cleaning.

Reference parity: no counterpart in the reference repo — extension-layer
operators for LLM data prep (pre-training corpora are routinely scrubbed
of emails/phones/IPs and analyzed by source domain).

The regex patterns are deliberately restricted to syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
classes, bounded repetition, greedy quantifiers, word boundaries — no
backreferences, no lookaround.

Scale notes (100 TB): every operator here is a narrow projection of
JVM-side ``regexp_replace`` / ``regexp_extract_all`` calls — scan-speed,
no shuffle, no UDF, whole-stage codegen. ``domain_counts`` adds one
aggregation shuffle keyed by domain (partial aggregation collapses
per-partition counts first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EMAIL_RE",
    "PHONE_RE",
    "IPV4_RE",
    "URL_RE",
    "redact_pii",
    "extract_urls",
    "extract_domains",
    "domain_counts",
]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
URL_RE = r"https?://[^\s]+"

# Order matters: URLs first (they may contain digit runs a phone pattern
# would mangle), then emails, then IPs, then phones.
_DEFAULT_RULES: tuple[tuple[str, str], ...] = (
    (URL_RE, "<URL>"),
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    rules: tuple[tuple[str, str], ...] = _DEFAULT_RULES,
) -> DataFrame:
    """Replace every match of each (pattern, token) rule in order,
    writing to ``out_col`` (defaults to in-place). All replacements are
    global (every occurrence)."""
    col: Column = F.col(text_col)
    for pattern, token in rules:
        col = F.regexp_replace(col, pattern, token)
    return df.withColumn(out_col or text_col, col)


def extract_urls(text: Column) -> Column:
    """Array of URL matches, in document order."""
    return F.regexp_extract_all(text, F.lit(URL_RE), 0)


def extract_domains(text: Column) -> Column:
    """Array of lowercased registrable-host strings for each URL in the
    document (scheme and path stripped, port kept out by the host class)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(r"https?://([A-Za-z0-9.-]+)"), 1),
        lambda h: F.lower(h),
    )


def domain_counts(
    df: DataFrame, text_col: str = "text", out_col: str = "domain"
) -> DataFrame:
    """Documents-per-domain table: explode extracted domains, count per
    domain (one shuffle, map-side combined)."""
    return (
        df.select(F.explode(extract_domains(F.col(text_col))).alias(out_col))
        .groupBy(out_col)
        .agg(F.count("*").alias("n_docs"))
    )

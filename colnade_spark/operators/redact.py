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
    "DOMAIN_RE",
    "redact_pii",
    "pii_counts",
    "extract_urls",
    "extract_domains",
    "domain_counts",
    "domain_suffixes",
    "blocked_doc_ids",
    "domain_blocklist_gate",
]

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# KNOWN OVER-MATCH: ISO dates / numeric ranges ('2026-08-14') satisfy the
# digit-run shape; separating them needs lookaround, which the Java/RE2
# common subset lacks. Redaction errs toward scrubbing — acceptable for
# PII (same bias as the Bloom decontaminator), documented for callers
# who keep dates.
PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
# (?i): schemes are case-insensitive ('HTTP://...' is a URL too)
URL_RE = r"(?i)https?://[^\s]+"
# optional userinfo ('http://user@host/...') must not be mistaken for the
# host — groups after a non-capturing skip keep index 1 = host in both
# Java regex and RE2
DOMAIN_RE = r"(?i)https?://(?:[^/@\s]*@)?([A-Za-z0-9.-]+)"

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


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_urls, n_emails, n_ips, n_phones): per-document PII match
    counts — the audit table behind a redaction run (which corpus
    slices carry contact data, how much scrubbing a source needs,
    whether a crawler is leaking credential-bearing URLs). Counts are
    INDEPENDENT per pattern over the raw text (a phone-shaped digit
    run inside a URL counts under both), unlike ``redact_pii`` which
    applies rules sequentially — this is the observability view, not
    the scrub. Scan-side regexp_count projections; no shuffle, no UDF,
    text never leaves the scan."""
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(F.col(text_col), F.lit(PHONE_RE)).cast("long").alias("n_phones"),
    )


def extract_urls(text: Column) -> Column:
    """Array of URL matches, in document order."""
    return F.regexp_extract_all(text, F.lit(URL_RE), 0)


def extract_domains(text: Column) -> Column:
    """Array of lowercased registrable-host strings for each URL in the
    document (scheme, optional userinfo, and path stripped; port kept
    out by the host class). Hosts are normalized by stripping trailing
    dots: a fully-qualified ``banned.example.`` resolves identically to
    ``banned.example``, and left unstripped its dot-boundary suffixes
    (``banned.example.``, ``example.``, ``''``) would all miss the
    blocklist — a trivial gate bypass."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(DOMAIN_RE), 1),
        lambda h: F.regexp_replace(F.lower(h), r"\.+$", ""),
    )


def domain_counts(
    df: DataFrame, text_col: str = "text", out_col: str = "domain"
) -> DataFrame:
    """Documents-per-domain table: distinct domains per doc exploded and
    counted (one shuffle, map-side combined). array_distinct keeps the
    count a DOCUMENT count — a page linking example.com three times
    contributes 1, matching the column name."""
    return (
        df.select(
            F.explode(
                F.array_distinct(extract_domains(F.col(text_col)))
            ).alias(out_col)
        )
        .groupBy(out_col)
        .agg(F.count("*").alias("n_docs"))
    )


def domain_suffixes(dom: Column) -> Column:
    """Dot-boundary suffix chain of a host: ``a.b.c`` ->
    ``[a.b.c, b.c, c]`` — turns "block this domain and its subdomains"
    into plain string EQUALITY (hash-joinable; an endswith predicate
    against a big blocklist would force a nested-loop join)."""
    parts = F.split(dom, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def blocked_doc_ids(
    df: DataFrame,
    blocked: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    subdomains: bool = True,
) -> DataFrame:
    """Ids of documents containing a URL on a blocked domain (the C4 /
    RefinedWeb URL-blocklist stage); ``subdomains=True`` also catches
    ``*.domain`` hosts via the suffix chain.

    Scale shape: blocklists are 10^4-10^6 entries — tiny next to the
    corpus — so the exploded (id, host-suffix) stream LEFT-SEMI joins the
    BROADCAST blocklist on equality; text never shuffles and the output
    is ids only (feed to a left_anti join like decontaminate)."""
    spark = df.sparkSession
    # explicit schema: an EMPTY blocklist must mean "block nothing",
    # not an infer-schema crash
    # blocklist entries get the same normalization as extracted hosts
    # (lowercase, trailing dots stripped) so 'banned.example.' in either
    # position still matches
    bl = F.broadcast(
        spark.createDataFrame(
            [(d.lower().rstrip("."),) for d in blocked], "_sfx string"
        )
    )
    staged = df.withColumn("_doms", extract_domains(F.col(text_col)))
    key = (
        F.explode(
            F.array_distinct(
                F.flatten(F.transform(F.col("_doms"), domain_suffixes))
            )
        )
        if subdomains
        else F.explode(F.array_distinct(F.col("_doms")))
    )
    return (
        staged.select(F.col(id_col), key.alias("_sfx"))
        .join(bl, "_sfx", "left_semi")
        .select(id_col)
        .distinct()
    )


def domain_blocklist_gate(
    df: DataFrame,
    blocked: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    subdomains: bool = True,
) -> DataFrame:
    """The corpus minus documents with blocked-domain URLs (full rows
    preserved; ids ride the joins, not text)."""
    bad = blocked_doc_ids(df, blocked, id_col, text_col, subdomains)
    return df.join(bad, id_col, "left_anti")

"""PII redaction / URL extraction: pattern-by-pattern hand checks plus
rule-ordering pins (URLs before phones so digit runs inside URLs never
half-redact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from colnade_spark.operators import redact


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(
        [
            (1, "mail me at john.doe+spam@example.co.uk today"),
            (2, "call +1 (555) 123-4567 or 555 867 5309 now"),
            (3, "server at 192.168.1.254 and 10.0.0.1:8080"),
            (4, "see https://Sub.Example.org/a?b=1 and http://x.io"),
            (5, "clean text with no pii at all"),
            (6, "combo: a@b.com via http://c.de/f on 1.2.3.4 call 555-1234-999"),
        ],
        ["doc_id", "text"],
    )


def test_redact_each_kind(pii_df):
    out = {r.doc_id: r.text for r in redact.redact_pii(pii_df).collect()}
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "call <PHONE> or <PHONE> now"
    assert out[3].startswith("server at <IP> and <IP>")
    assert out[4] == "see <URL> and <URL>"
    assert out[5] == "clean text with no pii at all"
    assert "<EMAIL>" in out[6] and "<URL>" in out[6] and "<IP>" in out[6]


def test_redact_out_col_preserves_original(pii_df):
    out = redact.redact_pii(pii_df, out_col="clean")
    r = out.filter("doc_id = 1").first()
    assert "@example.co.uk" in r.text and "<EMAIL>" in r.clean


def test_url_and_domain_extraction(pii_df):
    r = pii_df.filter("doc_id = 4").select(
        redact.extract_urls(F.col("text")).alias("u"),
        redact.extract_domains(F.col("text")).alias("d"),
    ).first()
    assert r.u == ["https://Sub.Example.org/a?b=1", "http://x.io"]
    assert r.d == ["sub.example.org", "x.io"]


def test_domain_counts(pii_df):
    counts = {r.domain: r.n_docs for r in redact.domain_counts(pii_df).collect()}
    assert counts["x.io"] == 1 and counts["sub.example.org"] == 1
    assert counts["c.de"] == 1


def test_urls_redacted_before_phone_rule(spark):
    # digits inside a URL must vanish with the URL, not become <PHONE>
    df = spark.createDataFrame(
        [(1, "go to http://site.com/12345678901 now")], ["doc_id", "text"]
    )
    out = redact.redact_pii(df).first().text
    assert out == "go to <URL> now"


def test_domain_suffixes_hand_checked(spark):
    from colnade_spark.operators.redact import domain_suffixes
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a.b.c",), ("com",)], ["d"])
    got = {r.d: r.s for r in df.select("d", domain_suffixes(F.col("d")).alias("s")).collect()}
    assert got["a.b.c"] == ["a.b.c", "b.c", "c"]
    assert got["com"] == ["com"]


def test_blocklist_gate_subdomains_and_exact(spark):
    from colnade_spark.operators.redact import blocked_doc_ids, domain_blocklist_gate

    df = spark.createDataFrame(
        [
            (1, "see http://ads.bad.com/x"),      # subdomain of blocked apex
            (2, "see http://bad.com/x"),          # blocked apex exactly
            (3, "see http://notbad.com/x"),       # NOT a dot-boundary match
            (4, "see http://good.org/x"),
            (5, "no links here"),
            (6, "see https://Exact.Host.net/y"),  # exact host, case-folded
        ],
        ["doc_id", "text"],
    )
    bad = {r.doc_id for r in blocked_doc_ids(df, ["bad.com", "exact.host.net"]).collect()}
    assert bad == {1, 2, 6}
    kept = {r.doc_id for r in domain_blocklist_gate(df, ["bad.com", "exact.host.net"]).collect()}
    assert kept == {3, 4, 5}
    # subdomains=False: only exact host matches
    strict = {r.doc_id for r in blocked_doc_ids(df, ["bad.com"], subdomains=False).collect()}
    assert strict == {2}


def test_blocklist_join_is_broadcast(spark):
    from colnade_spark.operators.redact import blocked_doc_ids

    df = spark.createDataFrame([(1, "x http://a.b.com/p")], ["doc_id", "text"])
    plan = (
        blocked_doc_ids(df, ["b.com"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_domain_extraction_userinfo_and_scheme_case(spark):
    from colnade_spark.operators.redact import blocked_doc_ids, extract_domains
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "x http://evil@bad.com/p"),   # userinfo must not hide the host
            (2, "x HTTP://bad.com/p"),        # scheme case-insensitive
            (3, "x HtTpS://sub.bad.com/p"),
        ],
        ["doc_id", "text"],
    )
    doms = {
        r.doc_id: r.d
        for r in df.select(
            "doc_id", extract_domains(F.col("text")).alias("d")
        ).collect()
    }
    assert doms[1] == ["bad.com"]
    assert doms[2] == ["bad.com"]
    assert doms[3] == ["sub.bad.com"]
    bad = {r.doc_id for r in blocked_doc_ids(df, ["bad.com"]).collect()}
    assert bad == {1, 2, 3}


def test_empty_blocklist_blocks_nothing(spark):
    from colnade_spark.operators.redact import domain_blocklist_gate

    df = spark.createDataFrame([(1, "x http://a.com/p")], ["doc_id", "text"])
    assert domain_blocklist_gate(df, []).count() == 1


def test_domain_counts_are_per_document(spark):
    from colnade_spark.operators.redact import domain_counts

    df = spark.createDataFrame(
        [(1, "http://a.com/1 http://a.com/2 http://b.com/x")],
        ["doc_id", "text"],
    )
    got = {r.domain: r.n_docs for r in domain_counts(df).collect()}
    assert got == {"a.com": 1, "b.com": 1}


def test_trailing_dot_fqdn_cannot_bypass_blocklist(spark):
    """A fully-qualified trailing-dot host (http://banned.example./x)
    resolves identically to banned.example; unnormalized it splits to
    ['banned','example',''] and every suffix misses the blocklist."""
    from colnade_spark.operators.redact import blocked_doc_ids, extract_domains

    df = spark.createDataFrame(
        [
            (1, "see http://banned.example./x"),     # trailing-dot FQDN
            (2, "see http://ads.banned.example./x"), # subdomain + trailing dot
            (3, "see http://banned.example/x"),      # plain form
            (4, "see http://fine.example/x"),
        ],
        ["doc_id", "text"],
    )
    bad = {r.doc_id for r in blocked_doc_ids(df, ["banned.example"]).collect()}
    assert bad == {1, 2, 3}
    # blocklist entries written with a trailing dot normalize too
    bad2 = {r.doc_id for r in blocked_doc_ids(df, ["banned.example."]).collect()}
    assert bad2 == {1, 2, 3}
    # extract_domains itself emits the normalized host
    doms = df.filter(F.col("doc_id") == 1).select(
        extract_domains(F.col("text")).alias("d")
    ).head().d
    assert doms == ["banned.example"]


def test_pii_counts_hand_checked(spark):
    """Independent per-pattern counts over raw text; overlapping
    matches (digit runs inside URLs) count under both patterns by
    design; clean text counts zero everywhere."""
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c@d.org, call +1 (555) 123-4567"),
            (2, "see https://x.example/a and http://y.example/b at 10.0.0.1"),
            (3, "clean prose with no contact data at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in redact.pii_counts(df).collect()}
    assert (got[1].n_emails, got[1].n_phones, got[1].n_urls, got[1].n_ips) == (2, 1, 0, 0)
    assert (got[2].n_urls, got[2].n_ips, got[2].n_emails) == (2, 1, 0)
    assert (got[3].n_urls, got[3].n_emails, got[3].n_ips, got[3].n_phones) == (0, 0, 0, 0)

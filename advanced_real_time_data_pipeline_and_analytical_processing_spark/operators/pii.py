"""PII detection and redaction over text columns.

A large-scale training-data pipeline scrubs personally identifiable
information (emails, phone numbers, IP addresses) before anything else
ships downstream. The reference pipeline has no PII stage (its
validation layer, code/helpers.py:60-142, only checks nullness/ranges);
this module adds the standard scrub pass as pure Catalyst expressions:

- detection is ``regexp_count`` per class (JVM regex, evaluated inside
  whole-stage codegen in the scan stage — no shuffle, no UDF);
- redaction is chained ``regexp_replace`` with stable placeholder
  tokens, so downstream dedup/fingerprints see identical text for
  identical redacted content.

The patterns deliberately use the portable regex subset (character
classes, bounded repetition, ``\\b``) that means the same thing to
Java's regex engine and to RE2-family engines (DuckDB, Go) — the
DuckDB oracle for the ``pii_scrub_stats`` query runs the literal same
patterns.

At 100 TB this is a map-only pass: it pipelines with the parquet scan
and whatever projection follows, adds zero exchanges, and the regex
cost is linear in bytes scanned.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Portable across Java regex and RE2 (DuckDB): no lookaround, no
# backreferences. Lowercase-only on purpose — callers normalize case
# first (the engine's text stack lowercases in `text.tokens`).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Order matters: emails are scrubbed before IPs so a dotted-quad inside
# an email domain is already gone when the IP pass runs; the oracle SQL
# must (and does) apply the same order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-class match counts — one ``regexp_count`` each, all
    evaluated in the same codegen stage as the scan."""
    return {
        name: F.regexp_count(text_col, F.lit(pat)) for name, pat, _ in PII_PATTERNS
    }


def scrub(text_col: Column) -> Column:
    """Redact every PII class with its placeholder token, in the fixed
    PII_PATTERNS order (email -> phone -> ip)."""
    out = text_col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out

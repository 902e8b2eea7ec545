"""PII masking — pure Catalyst expressions.

The standard pre-training scrub (CCNet/Dolma-style): replace emails,
IPv4 addresses, and phone-like digit runs with typed placeholder
tokens before text ships to a tokenizer. Patterns use the regex
subset where Java regex (Spark) and RE2 (DuckDB oracle) agree —
character classes, bounded repetition, ``\\b``; no lookaround.

Masking order matters and is fixed: EMAIL → IP → PHONE, so an
address's digits are never half-eaten by the phone pattern first.
The phone pattern is deliberately loose (any 9+-char digit/space/
hyphen run) — pre-training scrubs prefer false positives over leaked
numbers; tune per corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "PII_EMAIL_RE",
    "PII_IPV4_RE",
    "PII_PHONE_RE",
    "mask_pii",
    "pii_stats",
]

PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"
PII_PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def mask_pii(col) -> Column:
    """Text with emails → ``[EMAIL]``, IPv4 → ``[IP]``, phone-like
    digit runs → ``[PHONE]``. Single shuffle-free projection."""
    col = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(col, PII_EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, PII_IPV4_RE, "[IP]")
    out = F.regexp_replace(out, PII_PHONE_RE, "[PHONE]")
    return out


def pii_stats(col) -> Column:
    """struct(n_emails, n_ips, n_phones) — independent pattern counts
    over the raw text (a digit-bearing email can also count as a
    phone run; counts are per-pattern detector hits, not disjoint
    entities)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.regexp_count(col, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(col, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(col, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
    )

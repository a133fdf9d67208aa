"""PII scrubbing and text normalization — training-corpus hygiene
operators (no reference analog; solrizer serves curated repository
metadata, this engine feeds web text into training pipelines).

All pure Column expressions (regexp_replace / regexp_count), chosen
from the regex subset that Java regex and RE2 (DuckDB) evaluate
identically so the oracles stay exact: no lookaround, no backrefs,
explicit character classes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: deliberately simple, high-precision patterns (production systems
#: layer validators on top; the Spark shape is what matters here)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(text: Column | str) -> Column:
    """struct(n_emails, n_ips, n_phones) — audit counts before
    scrubbing (map-side, one pass per pattern)."""
    c = _col(text)
    return F.struct(
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phones"),
    )


def scrub_pii(text: Column | str) -> Column:
    """Redact emails → ``[EMAIL]``, IPv4 → ``[IP]``, phone numbers →
    ``[PHONE]``. Email first (it may contain digit runs), then IP
    (dots), then phone (dashes) — the patterns are disjoint after each
    replacement."""
    c = _col(text)
    c = F.regexp_replace(c, EMAIL_RE, "[EMAIL]")
    c = F.regexp_replace(c, IPV4_RE, "[IP]")
    c = F.regexp_replace(c, PHONE_RE, "[PHONE]")
    return c


def normalize_text(text: Column | str) -> Column:
    """Canonical whitespace form: control chars (C0 + DEL) → space,
    any whitespace run → one space, trimmed. The idempotent first step
    of every text pipeline (token counts and shingles assume
    single-space separation)."""
    c = _col(text)
    c = F.regexp_replace(c, r"[\x00-\x1f\x7f]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)

"""PII redaction for webtext curation: emails / IPv4 / phone → tags.

The C4/CCNet-style pre-training scrub step.  Like functions/wet.py
this is a chain of ``regexp_replace`` — pure Catalyst, whole-stage
codegen, map-only at any scale — and the patterns are deliberately
restricted to syntax that Java regex (Spark) and RE2 (DuckDB) evaluate
identically (no lookaround, no backreferences), so the DuckDB oracle
(q67) pins every rule byte-exactly.

Contract (conservative by design — a redactor that eats prices or
version numbers destroys training data):
  * emails   ``local@dom.tld``                      → ``<EMAIL>``
  * IPv4     dotted quad, word-bounded              → ``<IP>``
  * phones   international form ``+CC nnn nnn nnnn``
             (leading ``+`` required; bare 10-digit
             runs are left alone on purpose)        → ``<PHONE>``

Order matters and is part of the contract: emails first (their local
parts may contain digit runs), then IPs (dotted quads would otherwise
feed the phone rule's digit groups), then phones.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["redact_pii", "pii_flags", "EMAIL_RE", "IPV4_RE", "PHONE_RE"]

# shared with the q67 oracle SQL — keep in sync with catalog_text.py
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,2}[ -]?\d{3}[ -]?\d{3,4}[ -]?\d{4}\b"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def redact_pii(text: Column | str) -> Column:
    """Replace every email/IPv4/international-phone occurrence with
    its tag.  Pure codegen; apply after markup strip so patterns see
    visible text, not attribute soup."""
    t = _col(text)
    t = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, IPV4_RE, "<IP>")
    t = F.regexp_replace(t, PHONE_RE, "<PHONE>")
    return t


def pii_flags(text: Column | str) -> dict[str, Column]:
    """Per-kind boolean detectors (for funnel stats / audit sampling —
    cheaper than diffing redacted text)."""
    t = _col(text)
    return {
        "has_email": t.rlike(EMAIL_RE),
        "has_ip": t.rlike(IPV4_RE),
        "has_phone": t.rlike(PHONE_RE),
    }

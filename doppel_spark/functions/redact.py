"""PII scrubbing columns for training-data pipelines — pure Catalyst.

Emails and IPv4 literals are the two scrub classes whose regexes are
expressible identically in Java regex (Spark) and RE2 (DuckDB oracle):
no lookaround, no backreferences, ASCII word boundaries only. Phone
numbers are deliberately out of scope here — their useful patterns are
locale-dependent and dialect-divergent, the wrong fit for an
exact-cross-engine contract (a production cut would add them behind
the same column API).

Replacement order is pinned: emails first, then IPv4 — so a dotted
quad embedded in an email's domain (``a@1.2.3.4.com``) is consumed by
the email pass and never double-redacted. (A *bare* dotted-quad domain
``a@1.2.3.4`` is not an email at all — the pattern requires an
alphabetic TLD — so its quad is redacted by the IP pass.) Both the
Spark columns and any oracle must apply the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: valid in both Java regex and RE2, ASCII-only on purpose
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"


def _text_col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def email_count(text: Column | str) -> Column:
    """# email literals in ``text`` (counted BEFORE any redaction)."""
    return (F.regexp_count(_text_col(text), F.lit(EMAIL_PATTERN))
            .cast("long").alias("n_emails"))


def ipv4_count(text: Column | str) -> Column:
    """# IPv4 literals in ``text`` as matched by the redaction pass —
    i.e. counted AFTER emails are consumed, mirroring the pinned order."""
    scrubbed = F.regexp_replace(_text_col(text), EMAIL_PATTERN, EMAIL_TOKEN)
    return (F.regexp_count(scrubbed, F.lit(IPV4_PATTERN))
            .cast("long").alias("n_ips"))


def redact_pii(text: Column | str) -> Column:
    """``text`` with emails → ``<EMAIL>`` then IPv4 → ``<IP>``."""
    t = _text_col(text)
    t = F.regexp_replace(t, EMAIL_PATTERN, EMAIL_TOKEN)
    t = F.regexp_replace(t, IPV4_PATTERN, IPV4_TOKEN)
    return t.alias("text_clean")

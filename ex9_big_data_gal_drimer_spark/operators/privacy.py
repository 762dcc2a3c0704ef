"""PII detection / redaction (training-pipeline guardrail op).

A pre-training corpus pass must strip contact information before text
reaches a training shard (reference analogue: none — this is one of
the LLM-pipeline extensions the engine adds on top of the reference's
query surface).  Detection and redaction are single regexp column
expressions — map-side only, no shuffle, whole-stage-codegen'd — so
the pass costs one scan at any corpus size.

Patterns are deliberately conservative RE2-compatible subsets (no
backreferences, no lookarounds) so the same regex text runs in Spark
(Java regex) and in the DuckDB oracle (RE2) with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Email addresses (conservative: local@domain.tld).
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"

#: International-ish phone numbers: +CC-NNN-NNNN with 1-2 digit
#: country code and dash or space separators.
PHONE_RE = r"\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{4}"

EMAIL_MASK = "[EMAIL]"
PHONE_MASK = "[PHONE]"


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts in a text column."""
    return (
        F.regexp_count(col, F.lit(EMAIL_RE)),
        F.regexp_count(col, F.lit(PHONE_RE)),
    )


def redact_pii(col: Column) -> Column:
    """Replace every email/phone match with a fixed mask token.

    Email first, then phone — the masks contain no digits or ``@`` so
    the second pass cannot re-match inside the first pass's output.
    """
    no_email = F.regexp_replace(col, EMAIL_RE, EMAIL_MASK)
    return F.regexp_replace(no_email, PHONE_RE, PHONE_MASK)

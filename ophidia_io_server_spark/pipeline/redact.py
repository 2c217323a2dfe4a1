"""PII redaction for training corpora — the scrub-before-train step.

Pure JVM ``regexp_replace`` chains (codegen'd, no UDF, trivially
partition-parallel): emails, phone-like number runs, IPv4 addresses and
bare URLs are replaced with stable placeholder tokens so downstream dedup/
fingerprinting still aligns across documents redacted the same way.

The patterns are deliberately conservative (high precision): training-scale
corpora cannot afford manual review of false positives, and a missed rare
format is recoverable by adding a pattern — an over-eager one silently
destroys clean text.  Counts are emitted per category so corpus reports can
track PII density by source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# order matters: URLs may contain '@' or digit runs — redact them first
PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"\bhttps?://[^\s]+", "<URL>"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # phone: 7+ digits allowing separators, anchored on digit boundaries
    ("phone", r"\b\+?\d[\d\s().-]{5,}\d\b", "<PHONE>"),
]


def redact_text_col(text: Column) -> Column:
    """Redacted text Column (placeholders substituted, category order fixed)."""
    out = text
    for _, pat, token in PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``<text_col>_redacted`` plus per-category match counts
    (``n_url``, ``n_email``, ``n_ipv4``, ``n_phone``) and ``has_pii``."""
    out = docs.withColumn(f"{text_col}_redacted", redact_text_col(F.col(text_col)))
    total = None
    work = F.col(text_col)
    for name, pat, token in PATTERNS:
        cnt = F.size(F.split(work, pat)) - 1
        # count on the progressively-redacted text so overlapping categories
        # (an email inside a URL) are attributed once, like the replacement
        work = F.regexp_replace(work, pat, token)
        out = out.withColumn(f"n_{name}", cnt.cast("bigint"))
        total = cnt if total is None else total + cnt
    return out.withColumn("has_pii", total > 0)

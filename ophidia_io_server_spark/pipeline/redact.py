"""PII redaction for training corpora — the scrub-before-train step.

Pure JVM ``regexp_replace`` chains (codegen'd, no UDF, trivially
partition-parallel): emails, phone numbers, IPv4 addresses and bare URLs
are replaced with stable placeholder tokens so downstream dedup/
fingerprinting still aligns across documents redacted the same way.

The patterns are deliberately conservative (high precision): training-scale
corpora cannot afford manual review of false positives, and a missed rare
format is recoverable by adding a pattern — an over-eager one silently
destroys clean text.  The phone pattern therefore requires REAL phone
structure — an international ``+CC`` prefix, a ``(NNN)`` area-code group,
or the 3-3-4 separated layout — instead of "any 7+ digit/separator run"
(which redacted ISO dates, year pairs, score ranges and spaced decimals
wholesale; reproduced in ``tests/test_pipeline_curation.py``).  Bare
unseparated digit runs (``5551234567``) are NOT matched: at corpus scale
they are indistinguishable from ids/hashes.  Counts are emitted per
category so corpus reports can track PII density by source.

Every pattern stays inside the RE2-compatible subset (no lookbehind, no
backreferences; ``\\b``/``\\B`` are fine) so the same strings run verbatim
in DuckDB ``regexp_*`` for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Phone alternation, precision-first.  ``\B\+`` (not a word boundary before
# '+') keeps math like ``2+345 678 9012`` unredacted while ``tel:+44 ...``
# and line-initial ``+1 ...`` still match.  Digit-group shapes:
#   +CC (AAAA) GG[-GG...]   international with parenthesized area code
#   +CC GG GG GG[...]       international, 2-4-digit groups, 2-4 groups
#   (NNN) NNN-NNNN          parenthesized area code
#   NNN-NNN-NNNN            consistent dash (3-3-4 — an ISO date is 4-2-2)
#   NNN.NNN.NNNN            consistent dot (a decimal never has 3.3.4)
_PHONE = (
    r"(?:"
    r"\B\+\d{1,3}[ .-]?\(\d{1,4}\)[ .-]?\d{2,4}(?:[ .-]\d{2,4}){1,3}\b"
    r"|\B\+\d{1,3}(?:[ .-]\d{2,4}){2,4}\b"
    r"|\(\d{3}\)[ .-]?\d{3}[ .-]?\d{4}\b"
    r"|\b\d{3}-\d{3}-\d{4}\b"
    r"|\b\d{3}\.\d{3}\.\d{4}\b"
    r")"
)

# order matters: URLs may contain '@' or digit runs — redact them first
PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"\bhttps?://[^\s]+", "<URL>"),
    ("email", r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", _PHONE, "<PHONE>"),
]


def redact_text_col(text: Column) -> Column:
    """Redacted text Column (placeholders substituted, category order fixed)."""
    out = text
    for _, pat, token in PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def redact_cols(text: Column) -> dict[str, Column]:
    """The full redaction projection as named Columns: ``text_redacted``,
    per-category counts ``n_url/n_email/n_ipv4/n_phone`` and ``has_pii`` —
    reusable inside a wider single-scan select (the gate row does this).

    NULL text stays NULL in ``text_redacted`` but degrades to 0 counts and
    ``has_pii = false`` — NULL counts would poison downstream filters
    (``WHERE NOT has_pii`` silently dropping NULL-text rows)."""
    cols: dict[str, Column] = {"text_redacted": redact_text_col(text)}
    total = F.lit(0).cast("bigint")
    work = text
    for name, pat, token in PATTERNS:
        # explicit NULL guard: with ANSI off, size(split(NULL)) is -1 (legacy
        # sizeOfNull), so a bare coalesce would yield -2, not 0
        cnt = F.when(text.isNull(), F.lit(0)).otherwise(
            F.size(F.split(work, pat)) - 1).cast("bigint")
        # count on the progressively-redacted text so overlapping categories
        # (an email inside a URL) are attributed once, like the replacement
        work = F.regexp_replace(work, pat, token)
        cols[f"n_{name}"] = cnt
        total = total + cnt
    cols["has_pii"] = total > 0
    return cols


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``<text_col>_redacted`` plus per-category match counts
    (``n_url``, ``n_email``, ``n_ipv4``, ``n_phone``) and ``has_pii``."""
    out = docs
    for name, col in redact_cols(F.col(text_col)).items():
        target = f"{text_col}_redacted" if name == "text_redacted" else name
        out = out.withColumn(target, col)
    return out

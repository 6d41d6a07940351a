"""PII redaction for pre-training corpora.

The standard corpus-hygiene pass (BigScience/ROOTS-style): replace
emails, IP addresses, and phone numbers with typed placeholder tokens
BEFORE dedup/tokenization, so (a) models don't memorize contact
details and (b) two pages differing only in an injected email address
dedup to the same content.

Everything is ``regexp_replace`` / ``regexp_count`` column chains —
JVM-side, codegen, no Python.  The patterns are deliberately
precision-first (a false redaction corrupts training text silently;
a miss is caught by later passes): the phone pattern requires
separator structure or a ``+`` country prefix rather than matching
any digit run.  ``PII_PATTERNS`` is the extension point — a
deployment appends its own (IBAN, SSN, ...) without touching the
operator.

Redaction is idempotent (placeholders don't re-match any pattern) and
order-stable (patterns apply in dict order; emails before phones so a
phone-looking local-part is already gone when the phone pass runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ordered: earlier patterns run first
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # pattern, replacement token
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    # octet-bounded so versions like 1.2.3 or 10.20.30.400 don't match
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b",
        "<IP>",
    ),
    # four precise shapes — paren area code, +CC with separators,
    # three-group national, compact international.  Plain digit runs
    # and two-group pairs (ids, years, "2024-2025") never match.
    "phone": (
        r"(?<![\w.])(?:"
        r"(?:\+\d{1,3}[\s.-]?)?\(\d{2,4}\)[\s.-]?\d{3,4}(?:[\s.-]\d{3,4}){1,2}"
        r"|\+\d{1,3}[\s.-]\d{2,4}(?:[\s.-]\d{2,4}){1,3}"
        r"|\d{3}[\s.-]\d{3}[\s.-]\d{4}"
        r"|\+\d{7,15}"
        r")(?![\w.-])",
        "<PHONE>",
    ),
}


def scrub_expr(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    out = text
    for kind in kinds or tuple(PII_PATTERNS):
        pat, tok = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, tok)
    return out


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Redact the selected PII kinds in ``text_col`` (in place unless
    ``out_col`` names a new column)."""
    return df.withColumn(
        out_col or text_col, scrub_expr(F.col(text_col), kinds)
    )


def pii_counts(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-row match counts per kind (``n_email``, ``n_ipv4``, ...) —
    the audit relation a pipeline aggregates to decide whether a
    source needs scrubbing at all."""
    out = df
    for kind in kinds or tuple(PII_PATTERNS):
        pat, _ = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint"),
        )
    return out

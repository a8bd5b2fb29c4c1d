"""PII detection and redaction for training-data curation: emails,
phone numbers, IPv4 addresses replaced with typed placeholder tokens,
with per-document match counts for audit accounting.

All patterns live in the Java-regex ∩ RE2 common subset (no
backreferences, no lookaround) so the exact same strings drive Spark's
``regexp_replace``/``regexp_count`` and the DuckDB oracle — redaction
must be engine-portable or the audit trail is unverifiable.

Scale posture: pure JVM-side regex projections in the document scan —
no shuffle, no UDF, composes into the same single pass as the quality /
language / token-stats projections (q40-style curation pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: email first (an email would otherwise leave its digits for
# the phone pattern to chew on), then phone, then ip
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"(\+[0-9]{1,3}[ -])?[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    out_col: str = "redacted",
) -> DataFrame:
    """Append ``out_col`` (text with each PII kind replaced by its
    placeholder, applied in ``PII_PATTERNS`` declaration order) and one
    ``n_<kind>`` count column per requested kind (counted on the
    ORIGINAL text, before any replacement, so counts are independent of
    redaction order)."""
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}; "
                         f"available: {sorted(PII_PATTERNS)}")
    src = F.coalesce(F.col(text_col), F.lit(""))
    out = df
    for kind in PII_PATTERNS:
        if kind in kinds:
            out = out.withColumn(
                f"n_{kind}",
                F.regexp_count(src, F.lit(PII_PATTERNS[kind][0])))
    red = src
    for kind, (pat, token) in PII_PATTERNS.items():
        if kind in kinds:
            red = F.regexp_replace(red, pat, token)
    return out.withColumn(out_col, red)

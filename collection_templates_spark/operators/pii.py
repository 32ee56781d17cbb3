"""PII redaction for training corpora — native regexp machinery only.

Classic corpus-prep step (scrub emails / phone numbers / IPs before
training); the reference has no analogue (its inputs are public wiki
titles — SURVEY §0), so this is part of the LLM-pipeline extension suite
alongside dedup / decontamination / packing.

Patterns are deliberately engine-portable: no lookaround, no
backreferences, ASCII word boundaries only — the exact same pattern
strings run under Java regex (Spark) and RE2 (DuckDB), which is what lets
the driver oracle replay redaction byte-for-byte. All work is
``regexp_replace`` / ``regexp_count`` column expressions: whole-stage
codegen, zero Python, scan-speed at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — applied in this fixed order. Patterns
#: are portable across Java regex and RE2 (no lookaround/backrefs).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
) -> DataFrame:
    """Adds per-kind match counts (``n_email``/``n_phone``/``n_ipv4``,
    counted on the ORIGINAL text) and the redacted text in ``out_col``
    (default: ``{text_col}_redacted``).

    Counts before replacement, then replaces in the fixed PII_PATTERNS
    order — email first so an address is never half-eaten by the IP rule
    (domains with dotted quads), phones before bare digit runs would be
    if a broader rule is ever added.
    """
    out_col = out_col or f"{text_col}_redacted"
    for kind, pattern, _ in PII_PATTERNS:
        df = df.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pattern))
        )
    redacted = F.col(text_col)
    for _, pattern, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pattern, repl)
    return df.withColumn(out_col, redacted)

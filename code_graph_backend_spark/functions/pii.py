"""PII detection/redaction — a standard pre-training curation pass the
reference (a code-graph service) has no analogue for; first-class
extension alongside functions/dedup.py and functions/text.py.

Design: pure JVM-side `regexp_count` / `regexp_replace` — the hot path
stays inside whole-stage codegen, no Python worker, no shuffle (map-only).
The patterns use only syntax with identical semantics in Java regex and
RE2 (character classes, bounded repetition, \\b), which is what makes the
operator oracle-checkable against DuckDB: both engines must produce the
SAME redacted string byte-for-byte.

At 100 TB this is an embarrassingly parallel scan: cost is linear in
corpus bytes, no state crosses rows, and the regex set is compiled once
per task by the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters: each pattern is applied to the output of the previous
# one, identically in Spark and in the SQL oracle twin.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3} \d{3} \d{4,8}", "<PHONE>"),
]


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails / IPv4 addresses / international phone numbers.

    Returns (id, clean_text, n_email, n_ipv4, n_phone, n_pii). Counts are
    measured on the ORIGINAL text (before any replacement) so overlapping
    pattern classes never double-count a replacement artifact.
    """
    clean = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, token)
    out = docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        *counts,
    )
    total = sum((F.col(f"n_{n}") for n, _, _ in PII_PATTERNS[1:]),
                F.col(f"n_{PII_PATTERNS[0][0]}"))
    return out.withColumn("n_pii", total.cast("long")).select(
        id_col, "clean_text",
        *[F.col(f"n_{n}").cast("long").alias(f"n_{n}") for n, _, _ in PII_PATTERNS],
        "n_pii",
    )

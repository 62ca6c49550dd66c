"""PII detection & redaction over document text.

Standard corpus-hygiene pass before pretraining: find and mask emails, North
American phone numbers, and IPv4 addresses. All patterns are written in the
common subset of Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` word boundaries — so every count and every
redacted byte has an exact SQL mirror.

Everything is per-row JVM expressions (``regexp_extract_all`` /
``regexp_replace``): no Python, no shuffle, linear scan — the same
whole-stage-codegen shape as :mod:`.text`. Redaction order is part of the
contract (emails first, then phones, then IPs) since replacements can in
principle create or destroy later matches; both engines apply the same chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — applied in order
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per rule against the ORIGINAL text."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _ in PII_RULES
    }


def redacted_col(text: Column) -> Column:
    """Text with all PII masked, rules applied in PII_RULES order."""
    out = text
    for _, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII report: counts per category + md5/length of the redacted
    text (the md5 pins every redacted byte without hauling text around)."""
    text = F.col(text_col)
    counts = pii_counts(text)
    return df.select(
        F.col(id_col),
        *[counts[name].cast("long").alias(f"n_{name}") for name, _, _ in PII_RULES],
        F.md5(redacted_col(text)).alias("redacted_md5"),
        F.length(redacted_col(text)).cast("long").alias("redacted_len"),
    )


def redact_documents_oracle_sql(table: str = "documents", text_expr: str = "text") -> str:
    counts = ", ".join(
        f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_RULES
    )
    red = text_expr
    for _, pat, repl in PII_RULES:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
    SELECT doc_id, {counts},
           md5({red}) AS redacted_md5,
           CAST(length({red}) AS BIGINT) AS redacted_len
    FROM {table}
    """


def with_synthetic_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Append a deterministic PII footer (email + phone + IP derived from the
    doc id) — gives the redaction entry guaranteed positives on the synthetic
    corpus, mirrored exactly by :func:`synthetic_pii_sql`."""
    i = F.col(id_col)
    footer = F.concat_ws(
        "",
        F.col(text_col),
        F.lit(" contact user"),
        i.cast("string"),
        F.lit("@example.com at 10.0."),
        (i % 256).cast("string"),
        F.lit("."),
        (i % 251).cast("string"),
        F.lit(" call 555-"),
        (100 + i % 900).cast("string"),
        F.lit("-"),
        (1000 + i % 9000).cast("string"),
    )
    return df.withColumn(text_col, footer)


def synthetic_pii_sql(text_expr: str = "text", id_expr: str = "doc_id") -> str:
    return (
        f"({text_expr} || ' contact user' || {id_expr} || '@example.com at 10.0.' "
        f"|| ({id_expr} % 256) || '.' || ({id_expr} % 251) || ' call 555-' "
        f"|| (100 + {id_expr} % 900) || '-' || (1000 + {id_expr} % 9000))"
    )

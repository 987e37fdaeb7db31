"""PII detection and redaction for web-crawl text.

The standard pre-training scrub (C4 / CCNet / RefinedWeb all carry a
variant): find emails, phone numbers, IP addresses and SSN-shaped
ids, count them, and replace each with a typed placeholder token.

Scale shape: a single stateless projection — every pattern is one
``regexp_count`` + ``regexp_replace`` pair, pure JVM regex inside
whole-stage codegen, zero shuffle, zero python. At 100 TB this is a
map-only pass whose cost is the parquet scan itself.

Every pattern is written in the Java-regex ∩ RE2 common dialect (no
lookarounds, no backrefs) so the DuckDB oracle runs the *identical*
expressions — the catalog query ``pii_redact`` is hash-strict on the
redacted text.

Redaction is SEQUENTIAL (email → ip → ssn → phone, each class
counted on the text as left by the previous replace) so overlapping
matches resolve identically in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: each entry is (name, pattern, placeholder); counts
# are taken on the running (already partially redacted) text.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9][A-Za-z0-9.-]*\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
        "<PHONE>",
    ),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Add ``out_col`` (text with every PII span replaced by its
    placeholder) and one ``n_<class>`` count column per PII class.

    Counts are per the sequential contract above: each class counts
    matches remaining after the previous classes were redacted, so
    the sum over classes is the exact number of replaced spans.
    """
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return df.select("*", *counts, cur.alias(out_col))


def pii_oracle_exprs(text_sql: str) -> tuple[list[str], str]:
    """The DuckDB-SQL twin of :func:`redact_pii`: returns
    (count_exprs, redacted_expr) built over the SQL expression
    ``text_sql``, using the same patterns in the same order.

    Used by the catalog oracle so the SQL is generated from the SAME
    pattern table — the oracle can't silently drift from the engine.
    """
    counts = []
    cur = text_sql
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(length(regexp_extract_all({cur}, '{p}')) AS BIGINT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{p}', '{repl}', 'g')"
    return counts, cur

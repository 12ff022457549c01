"""PII detection / redaction — the scrub pass a webtext corpus gets
before training (emails, phone numbers, IPv4 addresses).

All patterns are written in the common subset of Java regex (Spark's
``regexp_*``) and RE2 (DuckDB): character classes + greedy quantifiers
+ ``\\b`` only — no lookaround, no backreferences, no alternation whose
leftmost-first (Java) vs leftmost-longest (RE2) semantics could
diverge.  That keeps detection counts and redacted text BYTE-IDENTICAL
across engines, so the op is exact-oracle-checkable like every other
column kernel in this repo.

Scale shape: pure JVM column expressions (``regexp_count`` /
``regexp_replace``) — narrow map over the scan, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: pattern table: (name, regex, replacement token).  Order matters for
#: redaction (emails before phones so the digits in a mailbox name
#: can't be half-eaten by the phone pattern).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone",
     r"\+\d[\d ()-]{6,14}\d",
     "<PHONE>"),
    ("ipv4",
     r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
     "<IP>"),
]


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII pattern: n_email, n_phone, n_ipv4.

    Counts CASCADE: each type is counted on text with all earlier
    patterns already redacted, so the digits inside a mailbox name
    can't double-count as a phone number — the counts always agree
    with what ``redact_col`` actually replaces.
    """
    out, cur = [], text
    for name, pat, token in PII_PATTERNS:
        out.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return out


def redact_col(text: Column) -> Column:
    """Text with every PII match replaced by its type token."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_email, n_phone, n_ipv4, n_pii, redacted_md5).

    ``redacted_md5`` fingerprints the redacted text so the oracle
    verifies the REPLACEMENT bytes, not just the counts, without
    shipping full documents through the compare.
    """
    t = F.col(text_col)
    counts = pii_counts(t)
    stats = df.select(
        F.col(id_col).alias("doc_id"),
        *counts,
        F.md5(redact_col(t)).alias("redacted_md5"),
    )
    total = sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS),
                F.lit(0))
    names = [f"n_{name}" for name, _, _ in PII_PATTERNS]
    return stats.select(
        "doc_id", *names,
        total.cast("bigint").alias("n_pii"), "redacted_md5")


# -- DuckDB twins -----------------------------------------------------------

def _sql_escape(pat: str) -> str:
    # standard SQL string literal: only the quote needs doubling
    # (backslashes pass through to RE2 untouched)
    return pat.replace("'", "''")


def sql_pii_counts(col: str) -> list[str]:
    # cascaded like pii_counts: each count runs on text with earlier
    # patterns already redacted
    out, cur = [], col
    for name, p, token in PII_PATTERNS:
        out.append(
            f"length(regexp_extract_all({cur}, '{_sql_escape(p)}'))"
            f"::BIGINT AS n_{name}")
        cur = (f"regexp_replace({cur}, '{_sql_escape(p)}', "
               f"'{token}', 'g')")
    return out


def sql_redact(col: str) -> str:
    out = col
    for _, p, token in PII_PATTERNS:
        out = (f"regexp_replace({out}, '{_sql_escape(p)}', "
               f"'{token}', 'g')")
    return out


def sql_pii_stats(rel: str, text_col: str = "text",
                  id_col: str = "doc_id") -> str:
    counts = ",\n         ".join(sql_pii_counts(text_col))
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    names = ", ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
SELECT doc_id, {names}, ({total})::BIGINT AS n_pii, redacted_md5
FROM (
  SELECT {id_col} AS doc_id,
         {counts},
         md5({sql_redact(text_col)}) AS redacted_md5
  FROM {rel}
)
"""

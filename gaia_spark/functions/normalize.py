"""Unicode text normalization — NFC + control-strip + space-collapse.

Web-crawl text arrives in mixed normalization forms (decomposed
accents from mac filesystems / OCR, stray C0 control bytes from
broken encodings); training corpora normalize to NFC so that
tokenizers and exact/near dedup see one byte form per logical string
(a decomposed "Café" and precomposed "Café" must dedup
together).  The kernel applies, in contract order:

1. Unicode NFC (canonical composition).
2. ASCII control chars ``[\\x00-\\x1f\\x7f]`` -> single space
   (tab/newline included: downstream packing is token-based, layout
   whitespace carries no signal).
3. Collapse runs of spaces, trim ends.

Steps 2-3 are pure JVM ``regexp_replace`` columns.  Step 1 has no
Spark built-in, so it is the one licensed Python hop: an
Arrow-batched ``pandas_udf`` (document-kernel class per SURVEY §2.2
— same budget as the tagger).  The UDF is a narrow map: no shuffle,
no state, whole-stage codegen on both regexp passes around it.

DuckDB twin: ``nfc_normalize`` (utf8proc) matches Python's
``unicodedata.normalize("NFC", ...)`` — both implement Unicode
canonical composition; cross-checked byte-exact in
tests/test_normalize.py including decomposed/precomposed pairs.

Scale shape (100 TB): per-row cost only — the plan is scan ->
project(UDF, regexp) -> downstream; Arrow batch transfer is the
bottleneck, mitigated by projecting ONLY (id, text) into the UDF
stage and re-attaching nothing (the normalized column replaces the
raw one in place).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: regex fragments shared by the Spark column and the DuckDB twin —
#: plain escapes (\x41-style) that Java regex and RE2 read identically.
CTRL_RE = r"[\x00-\x1f\x7f]"
MULTISPACE_RE = " +"


def _nfc_udf():
    # created lazily: pandas_udf resolves its return type against the
    # active session, so decorating at import time would require one
    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        """Arrow-batched Unicode NFC; None passes through."""
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))
    return nfc


def normalize_col(text: Column) -> Column:
    """NFC -> control-strip -> space-collapse -> trim, as one column.

    The regexp passes stay JVM-side/codegen; only NFC crosses to
    Python (Arrow batches).
    """
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(_nfc_udf()(text), CTRL_RE, " "),
            MULTISPACE_RE, " "))


def norm_stats(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc normalization fingerprint: (id, raw_len, norm_len,
    norm_md5, changed) — the audit table a curation run materializes
    before swapping raw text for normalized.

    ``changed`` pinpoints the docs whose bytes moved (NFC recompose
    or control/space cleanup) without shipping the text twice.
    """
    norm = normalize_col(F.col(text_col))
    return (
        df.select(
            F.col(id_col),
            F.length(text_col).alias("raw_len"),
            F.length(norm).alias("norm_len"),
            F.md5(norm).alias("norm_md5"),
            (F.md5(norm) != F.md5(text_col)).cast("int").alias("changed"),
        )
    )


def sql_norm_stats(rel: str, text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB twin of norm_stats (nfc_normalize = utf8proc NFC)."""
    norm = (f"trim(regexp_replace(regexp_replace("
            f"nfc_normalize({text_col}), '{CTRL_RE}', ' ', 'g'),"
            f" '{MULTISPACE_RE}', ' ', 'g'))")
    return f"""
SELECT {id_col},
       length({text_col})::BIGINT AS raw_len,
       length({norm})::BIGINT AS norm_len,
       md5({norm}) AS norm_md5,
       (md5({norm}) <> md5({text_col}))::INT AS changed
FROM {rel}
"""

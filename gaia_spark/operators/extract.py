"""T1 — HTML→text extraction as an Arrow-batched scalar pandas UDF.

Reference semantics: rsd→ltf conversion (/root/reference/README.md:44),
i.e. raw bytes → canonical text with stable sentence/token offsets.
The UDF body is the *same pure function* as the single-node oracle
(gaia_ref/extract.py), which is what makes the byte-identical-per-url
invariant (BASELINE.json:15) a test of the distribution machinery
(Arrow transfer, partitioning, task retries) rather than of two
divergent extractors.

Scale notes:
- scalar pandas UDF (not mapInPandas): Catalyst keeps the projection
  pipelined with the scan; only (url, html) columns are read when this
  stage runs (column pruning — never drag `html` further downstream).
- dtype is forced to object/str on the way out; pandas must never
  coerce to NaN (SURVEY.md §2.6 "never let pandas/Arrow coerce").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from gaia_ref.extract import extract_text, split_sentences


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_text(h) for h in html], index=html.index, dtype=object
    )


_SENT_SCHEMA = ArrayType(
    StructType(
        [
            StructField("sent_id", IntegerType(), False),
            StructField("begin", IntegerType(), False),
            StructField("end", IntegerType(), False),
        ]
    )
)


@pandas_udf(_SENT_SCHEMA)
def split_sentences_udf(text: pd.Series) -> pd.Series:
    return pd.Series(
        [split_sentences(t or "") for t in text], index=text.index
    )


def extract_col(html: Column) -> Column:
    return extract_text_udf(html)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → (url, warc_ts, lang, text).

    Recomputes `text` from `html` unconditionally (the input column MAY
    be null per FIXTURES.md §1) and drops `html` so no downstream stage
    can accidentally scan the heavy binary column.
    """
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        extract_text_udf(F.col("html")).alias("text"),
    )

"""S1–S5 — corpus sources: pages, page_meta, ASR/OCR-style unions.

The reference ingests ltf/rsd text, the parent_child_tab metadata TSV,
and ASR/OCR transcript files (/root/reference/README.md:44); here the
corpus is the `pages` table in the BASELINE.json input_hint shape and
the metadata table is either read (TSV/parquet) or derived from urls —
SURVEY.md §2.1 S3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

# registrable-domain extraction from an http(s) url
_DOMAIN_RE = r"^https?://([^/]+)/"


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_parent_child_tab(spark: SparkSession, path: str) -> DataFrame:
    """The reference's sorted TSV (child_uid, parent_uid, content_date)
    — /root/reference/README.md:44,90."""
    return (
        spark.read.option("sep", "\t").option("header", True)
        .csv(path)
        .withColumn("content_date", F.to_date("content_date"))
    )


def derive_page_meta(pages: DataFrame) -> DataFrame:
    """Web-native parent_child_tab: url→child, domain→parent,
    warc_ts→content_date (SURVEY.md §1.3)."""
    return pages.select(
        F.col("url").alias("child_uid"),
        F.regexp_extract("url", _DOMAIN_RE, 1).alias("parent_uid"),
        F.to_date("warc_ts").alias("content_date"),
    )


def union_transcripts(pages: DataFrame, extra: DataFrame, source: str) -> DataFrame:
    """S4/S5: ASR/OCR-style extra text rows unioned into the corpus with
    a provenance tag (README.md:44 `gaiaaida/asr` outputs)."""
    p = pages.withColumn("source", F.lit("web"))
    e = extra.withColumn("source", F.lit(source))
    return p.unionByName(e)

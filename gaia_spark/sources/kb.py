"""S8 — background-KB readers (LORELEI entities.tab analog,
/root/reference/README.md:128; Freebase/GeoNames/Wikipedia per the
architecture diagram).  Small, read-only, broadcast at join time."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_kb_entities(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_kb_aliases(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_entities_tab(spark: SparkSession, path: str) -> DataFrame:
    """TSV form for parity with LDC2018E80 entities.tab (README.md:128)."""
    return spark.read.option("sep", "\t").option("header", True).csv(path)

"""S6/S7 — media blob reader (`.ldcc` container) + shot-boundary table.

Reference inputs (/root/reference/README.md:87-90,133-137):

- S6: `data/jpg/jpg/*.jpg[.ldcc]` and
  `data/video_shot_boundaries/representative_frames/*/*.png[.ldcc]` —
  image blobs, optionally wrapped in an LDC `.ldcc` container (a
  fixed-size header prepended to the raw payload bytes).
- S7: `docs/masterShotBoundary.msb` — the TSV spine mapping each
  representative keyframe to its parent video segment and shot
  interval; every vision stage joins through it (and through the
  parent_children tab, sources/pages.py S3) to reach text provenance.

Spark shape: `spark.read.format("binaryFile")` gives
(path, modificationTime, length, content) with per-file split points —
the canonical distributed blob scan (each file is one task, no
fake-splitting of images).  The `.ldcc` unwrap is a pure column
expression over `content` (JVM-side substring, zero Python); a pandas
UDF twin exists for parity with multimodal.py's batch path.

The container shipped here has no real `.ldcc` corpora, so the header
geometry is a documented constant: ``LDCC_HEADER_LEN`` bytes, starting
with the ASCII magic ``LDCC``.  Files without the magic (or without the
``.ldcc`` suffix) pass through unmodified — the reader never corrupts
plain blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: container header: ASCII magic + reserved bytes, then raw payload
LDCC_MAGIC = b"LDCC"
LDCC_HEADER_LEN = 16

#: masterShotBoundary.msb columns (headerless TSV)
MSB_SCHEMA = (
    "parent_uid string, keyframe_id string, shot_id string, "
    "t_start double, t_end double"
)


def read_media_blobs(spark: SparkSession, path: str) -> DataFrame:
    """S6 scan: one row per media file.

    → (path, media_uid, n_bytes, content); ``media_uid`` is the file
    stem with ``.ldcc`` (and one media extension) stripped — the id the
    msb/parent_children spine uses.
    """
    raw = spark.read.format("binaryFile").load(path)
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    stem = F.regexp_replace(
        fname, r"\.(jpg|jpeg|png|gif|mp4|mkv)(\.ldcc)?$", "")
    return raw.select(
        "path",
        stem.alias("media_uid"),
        F.col("length").alias("n_bytes"),
        "content",
    )


def unwrap_ldcc(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Strip the LDCC_HEADER_LEN-byte container header where present.

    Pure column expressions (binary substring — JVM-side): a row is
    unwrapped iff its blob starts with the ``LDCC`` magic; anything
    else passes through byte-identical.  Adds ``was_wrapped``.
    """
    c = F.col(content_col)
    magic = F.substring(c, 1, len(LDCC_MAGIC))
    is_wrapped = magic == F.lit(LDCC_MAGIC)
    payload = F.expr(
        f"substring({content_col}, {LDCC_HEADER_LEN + 1}, "
        f"length({content_col}) - {LDCC_HEADER_LEN})"
    )
    return df.withColumn("was_wrapped", is_wrapped).withColumn(
        content_col, F.when(is_wrapped, payload).otherwise(c)
    )


def unwrap_ldcc_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas twin of unwrap_ldcc (same schema + ``was_wrapped``)
    for pipelines already inside an Arrow pass; semantics are
    equivalence-tested against the column-expression path."""
    for pdf in it:
        blobs = pdf["content"]
        wrapped = blobs.map(
            lambda b: bytes(b[:len(LDCC_MAGIC)]) == LDCC_MAGIC)
        pdf = pdf.assign(
            was_wrapped=wrapped,
            content=[
                bytes(b[LDCC_HEADER_LEN:]) if w else bytes(b)
                for b, w in zip(blobs, wrapped)
            ],
        )
        yield pdf


def wrap_ldcc(payload: bytes) -> bytes:
    """Build a container blob (test-fixture helper; the header after
    the magic is reserved/zero in our synthetic corpora)."""
    header = LDCC_MAGIC + b"\x00" * (LDCC_HEADER_LEN - len(LDCC_MAGIC))
    return header + payload


def read_shot_boundaries(spark: SparkSession, path: str) -> DataFrame:
    """S7: masterShotBoundary.msb (headerless TSV) → typed spine table."""
    return (
        spark.read.option("sep", "\t").schema(MSB_SCHEMA).csv(path)
    )


def keyframes_with_parents(
    msb: DataFrame, page_meta: DataFrame
) -> DataFrame:
    """Join keyframes to their parent document row via the S3
    parent_children spine: (keyframe_id, shot_id, t_start, t_end,
    parent_uid, content_date).  Broadcast the msb side — the shot table
    is tiny relative to a web corpus."""
    return F.broadcast(msb).join(
        page_meta.select(
            F.col("child_uid").alias("parent_uid"), "content_date"
        ).dropDuplicates(["parent_uid"]),
        "parent_uid",
        "left",
    )

"""Multimodal (image/audio/video) column plumbing.

GAIA's vision stages consume jpg/keyframe-png blobs, optionally
`.ldcc`-wrapped (/root/reference/README.md:87-88,134-137).  At Spark
scale the pattern is: media as opaque `BINARY` columns + typed metadata
structs, decode/feature work as Arrow-batched `mapInPandas` so one
Python worker amortizes codec/model setup per partition.

The actual codecs (PIL/ffmpeg/torchvision) are NOT in this container,
so `decode_image_batch` raises NotImplementedError behind a flag and
the default path is a DETERMINISTIC FAKE decoder (pure function of the
bytes) — the Spark-side plumbing (schema, batching, partitioning) is
real and tested; swap `_fake_decode` for a real codec on a cluster
with the libs installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: magic-byte prefixes → media type (hex, uppercase)
MAGIC = (
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),      # wav/avi container
    ("00000018667479", "mp4"),
    ("1A45DFA3", "mkv"),
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("frames", IntegerType(), True),
])


def sniff_type_col(blob: Column) -> Column:
    """Magic-byte media-type sniff as a pure column expression."""
    h = F.upper(F.hex(F.substring(blob, 1, 8)))
    expr = F.lit("unknown")
    for prefix, name in reversed(MAGIC):
        expr = F.when(h.startswith(prefix), F.lit(name)).otherwise(expr)
    return expr


def sql_sniff_type(blob: str) -> str:
    """DuckDB mirror of sniff_type_col (hex prefix CASE).  DuckDB has
    no BLOB substring, so hex first and slice the hex string."""
    h = f"substring(upper(hex({blob})), 1, 16)"
    whens = " ".join(
        f"WHEN {h} LIKE '{p}%' THEN '{n}'" for p, n in MAGIC
    )
    return f"CASE {whens} ELSE 'unknown' END"


def _fake_decode(buf: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, frames) as a pure
    function of the payload bytes.  Replace with a real codec."""
    n = len(buf)
    return (n % 1024, (n // 1024) % 1024, 1 + n % 7)


def decode_media(df: DataFrame, id_col: str = "media_id",
                 blob_col: str = "blob", real: bool = False) -> DataFrame:
    """BINARY blobs → typed media metadata via Arrow-batched mapInPandas.

    ``real=True`` is the cluster path (needs PIL/ffmpeg): stubbed here.
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError(
                "real codecs (PIL/ffmpeg) not installed in this container")
        for pdf in it:
            rows = []
            for mid, buf in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(buf) if buf is not None else b""
                hexhead = b[:8].hex().upper()
                mtype = next(
                    (n for p, n in MAGIC if hexhead.startswith(p)),
                    "unknown")
                w, h, fr = _fake_decode(b)
                rows.append((int(mid), mtype, len(b), w, h, fr))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return df.select(
        F.col(id_col), F.col(blob_col)
    ).mapInPandas(batches, schema=MEDIA_SCHEMA)


def media_meta_cols(df: DataFrame, id_col: str,
                    blob_col: str) -> DataFrame:
    """Column-expression twin of decode_media's fake path (for the SQL
    oracle cross-check): same outputs, no Python."""
    n = F.octet_length(F.col(blob_col)).cast("bigint")
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        sniff_type_col(F.col(blob_col)).alias("media_type"),
        n.alias("n_bytes"),
        (n % 1024).cast("int").alias("width"),
        (F.floor(n / F.lit(1024)) % 1024).cast("int").alias("height"),
        (F.lit(1) + (n % 7)).cast("int").alias("frames"),
    )

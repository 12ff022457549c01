"""Multimodal plumbing: binary columns, sniffing, fake-decode parity."""

import pytest
from pyspark.sql import functions as F

from gaia_spark.functions import multimodal as mm

BLOBS = [
    (0, bytes.fromhex("89504E47") + b"png-payload-bytes"),
    (1, bytes.fromhex("FFD8FF") + b"jpeg-payload"),
    (2, b"no magic header here"),
    (3, bytes.fromhex("1A45DFA3") + b"matroska"),
    (4, b""),
]


@pytest.fixture(scope="module")
def media_df(spark):
    return spark.createDataFrame(BLOBS, "media_id long, blob binary")


def test_sniff_type(spark, media_df):
    r = {x.media_id: x.t for x in media_df.select(
        "media_id", mm.sniff_type_col(F.col("blob")).alias("t")).collect()}
    assert r == {0: "png", 1: "jpeg", 2: "unknown", 3: "mkv",
                 4: "unknown"}


def test_decode_media_mapinpandas_matches_column_twin(spark, media_df):
    """The Arrow-batched fake decoder and the pure-column twin must be
    row-identical — the column twin is what the DuckDB oracle checks,
    the mapInPandas path is what a real codec would replace."""
    a = sorted(tuple(r) for r in mm.decode_media(
        media_df, "media_id", "blob").collect())
    b = sorted(tuple(r) for r in mm.media_meta_cols(
        media_df, "media_id", "blob").collect())
    assert a == b


def test_decode_media_real_path_is_stubbed(spark, media_df):
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        mm.decode_media(media_df, "media_id", "blob", real=True).collect()


def test_fake_decode_deterministic():
    assert mm._fake_decode(b"abc") == mm._fake_decode(b"abc")
    w, h, fr = mm._fake_decode(b"x" * 5000)
    assert (w, h, fr) == (5000 % 1024, (5000 // 1024) % 1024,
                          1 + 5000 % 7)

"""S6/S7: binaryFile scan, .ldcc round-trip, msb spine join."""

import os

import pytest
from pyspark.sql import functions as F

from gaia_spark.sources import media as ms

PNG = bytes.fromhex("89504E470D0A1A0A") + b"fakepngpayload" * 20
JPG = bytes.fromhex("FFD8FFE0") + b"fakejpgpayload" * 33


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "IMG_0001.jpg.ldcc").write_bytes(ms.wrap_ldcc(JPG))
    (d / "IMG_0002.jpg").write_bytes(JPG)
    (d / "KF_0001_12.png.ldcc").write_bytes(ms.wrap_ldcc(PNG))
    return str(d)


def test_ldcc_roundtrip_byte_identical(spark, media_dir):
    got = ms.unwrap_ldcc(ms.read_media_blobs(spark, media_dir))
    rows = {r.media_uid: r for r in got.collect()}
    assert bytes(rows["IMG_0001"].content) == JPG
    assert bytes(rows["IMG_0002"].content) == JPG
    assert bytes(rows["KF_0001_12"].content) == PNG
    assert rows["IMG_0001"].was_wrapped and rows["KF_0001_12"].was_wrapped
    assert not rows["IMG_0002"].was_wrapped


def test_ldcc_pandas_twin_equivalent(spark, media_dir):
    base = ms.read_media_blobs(spark, media_dir)
    col = ms.unwrap_ldcc(base).select(
        "media_uid", "content", "was_wrapped")
    schema = "path string, media_uid string, n_bytes long, " \
             "content binary, was_wrapped boolean"
    pud = base.mapInPandas(ms.unwrap_ldcc_batches, schema).select(
        "media_uid", "content", "was_wrapped")
    a = {(r.media_uid, bytes(r.content), r.was_wrapped)
         for r in col.collect()}
    b = {(r.media_uid, bytes(r.content), r.was_wrapped)
         for r in pud.collect()}
    assert a == b


def test_msb_reader_and_parent_join(spark, tmp_path, media_dir):
    msb_path = str(tmp_path / "masterShotBoundary.msb")
    with open(msb_path, "w") as f:
        f.write("VID_001\tKF_0001_12\tshot_12\t10.0\t12.5\n")
        f.write("VID_001\tKF_0001_13\tshot_13\t12.5\t14.0\n")
        f.write("VID_404\tKF_0404_01\tshot_01\t0.0\t1.0\n")
    msb = ms.read_shot_boundaries(spark, msb_path)
    assert msb.count() == 3
    meta = spark.createDataFrame(
        [("VID_001", "2020-01-01")],
        "child_uid string, content_date string")
    joined = ms.keyframes_with_parents(msb, meta)
    rows = {r.keyframe_id: r for r in joined.collect()}
    assert rows["KF_0001_12"].content_date == "2020-01-01"
    assert rows["KF_0001_12"].t_end == 12.5
    assert rows["KF_0404_01"].content_date is None  # orphan keeps row
    # plan: broadcast side is the msb spine
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

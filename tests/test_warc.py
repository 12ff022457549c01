"""WARC source (sources/warc.py): framing, gzip members, file scan."""

import gzip

import pytest

from gaia_spark.sources.warc import (
    encode_warc_record,
    parse_warc,
    read_warc_files,
)

DOCS = [
    ("http://a.test/1", "2024-01-01T00:00:00Z", "<p>alpha &amp; beta</p>"),
    ("http://b.test/2", "2024-01-02T12:30:00Z", "<html>two\nlines</html>"),
    ("http://c.test/3", "2024-01-03T23:59:59Z", "emoji \U0001f600 page"),
]


def _blob() -> bytes:
    return b"".join(encode_warc_record(u, d, h.encode("utf-8"))
                    for u, d, h in DOCS)


def test_roundtrip_plain_and_order():
    got = parse_warc(_blob())
    assert got == [(u, d, h.encode("utf-8")) for u, d, h in DOCS]


def test_multi_member_gzip():
    gz = b"".join(
        gzip.compress(encode_warc_record(u, d, h.encode("utf-8")),
                      mtime=0)
        for u, d, h in DOCS)
    assert parse_warc(gz) == parse_warc(_blob())


def test_non_response_records_skipped():
    rec = encode_warc_record(*DOCS[0][:2], DOCS[0][2].encode())
    warcinfo = rec.replace(b"WARC-Type: response",
                           b"WARC-Type: warcinfo", 1)
    assert parse_warc(warcinfo + rec) == parse_warc(rec)


def test_truncated_body_raises():
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(_blob()[:-40])


def test_trailing_garbage_after_gzip_raises():
    gz = gzip.compress(_blob(), mtime=0) + b"junk"
    with pytest.raises(ValueError, match="trailing"):
        parse_warc(gz)


def test_read_warc_files_scan(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_blob())
    (tmp_path / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(
            encode_warc_record(u + "?gz", d, h.encode()), mtime=0)
            for u, d, h in DOCS))
    df = read_warc_files(spark, str(tmp_path)).orderBy("url")
    rows = df.collect()
    assert len(rows) == 6
    assert {r.url for r in rows} == (
        {u for u, _, _ in DOCS} | {u + "?gz" for u, _, _ in DOCS})
    by_url = {r.url: r for r in rows}
    for u, d, h in DOCS:
        assert bytes(by_url[u].html) == h.encode("utf-8")
        assert by_url[u].warc_ts.isoformat().startswith(d[:10])
        assert by_url[u].warc_path.endswith("a.warc")

"""WARC/1.0 source — the raw upstream of the Common-Crawl-style pages
table (BASELINE.json input_hint: ``(url, warc_ts, html, ...)``).

The reference consumes LDC packages; a Common-Crawl-scale deployment
of this engine ingests WARC ("Web ARChive", ISO 28500) instead, so the
pages table has a real producer.  Pure-python record framing per the
public spec — no warcio dependency:

    WARC/1.0\\r\\n  +  header lines  +  \\r\\n\\r\\n
    body of exactly Content-Length bytes  +  \\r\\n\\r\\n

``response`` records wrap an HTTP/1.1 message; the html payload is the
HTTP body after the first blank line.  ``.warc.gz`` files are
MULTI-MEMBER gzip (one member per record, the Common Crawl layout) —
decoded with a zlib loop so every member is read, where a plain
``gzip.decompress`` would already work but hide malformed tails.

Scale shape: ``read_warc_files`` is a binaryFile scan (one task per
WARC file — CC files are ~1 GB, a natural partition) feeding a
mapInPandas GENERATOR that yields record batches as it parses, so one
task never materializes more than a batch beyond the raw blob Spark
already holds.  At real scale the columnar cdx index would map byte
ranges to tasks; that belongs to the storage layer, not this kernel.
The record PARSER is also exposed over a binary column
(``parse_warc_col_batches``) so the driver can oracle it by
round-trip: encode documents → parse → compare to the engine-computed
originals (``web_warc_roundtrip`` ★).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"
GZIP_MAGIC = b"\x1f\x8b"

#: output schema of every reader/parser in this module
WARC_SCHEMA = ("warc_path string, url string, warc_ts timestamp, "
               "html binary")


def encode_warc_record(url: str, date_iso: str, html: bytes) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 200.

    Deterministic: the record id is derived from the url, never from
    a clock or RNG (SURVEY.md §4.3.5 — re-encoding is bit-identical).
    """
    http = (b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html; charset=utf-8" + CRLF
            + b"Content-Length: " + str(len(html)).encode() + CRLF
            + CRLF + html)
    headers = (b"WARC/1.0" + CRLF
               + b"WARC-Type: response" + CRLF
               + b"WARC-Record-ID: <urn:uri:" + url.encode() + b">" + CRLF
               + b"WARC-Target-URI: " + url.encode() + CRLF
               + b"WARC-Date: " + date_iso.encode() + CRLF
               + b"Content-Type: application/http; msgtype=response" + CRLF
               + b"Content-Length: " + str(len(http)).encode() + CRLF)
    return headers + CRLF + http + CRLF + CRLF


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress ALL members of a multi-member gzip stream."""
    out = []
    rest = blob
    while rest[:2] == GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        rest = d.unused_data
    if rest:
        raise ValueError(
            f"warc: {len(rest)} trailing bytes after gzip members")
    return b"".join(out)


def parse_warc(blob: bytes) -> list[tuple[str, str, bytes]]:
    """blob (plain or .gz) → [(url, warc_date_iso, html_bytes)] for
    every ``response`` record, in file order.

    Raises on broken framing (truncated body, missing Content-Length)
    — a torn WARC is an ingestion error, never silently short data.
    """
    if blob[:2] == GZIP_MAGIC:
        blob = _gunzip_members(bytes(blob))
    else:
        blob = bytes(blob)
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos:pos + 2] == CRLF:  # inter-record padding
            pos += 2
            continue
        head_end = blob.index(CRLF + CRLF, pos)
        head = blob[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"warc: bad record header at byte {pos}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body = blob[head_end + 4:head_end + 4 + clen]
        if len(body) != clen:
            raise ValueError(
                f"warc: truncated body at byte {pos} "
                f"({len(body)} < {clen})")
        pos = head_end + 4 + clen
        if fields.get("warc-type") == "response":
            http_split = body.find(CRLF + CRLF)
            html = body[http_split + 4:] if http_split >= 0 else b""
            out.append((fields.get("warc-target-uri", ""),
                        fields.get("warc-date", ""), html))
    return out


def _records_frame(path: str, blob: bytes) -> pd.DataFrame:
    recs = parse_warc(blob)
    return pd.DataFrame({
        "warc_path": [path] * len(recs),
        "url": [r[0] for r in recs],
        "warc_ts": pd.to_datetime([r[1] for r in recs],
                                  format="%Y-%m-%dT%H:%M:%SZ"),
        "html": [r[2] for r in recs],
    })


def parse_warc_col_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over (warc_path string, blob binary) rows →
    WARC_SCHEMA; one yielded frame per input blob keeps memory
    bounded by a single file's records."""
    for pdf in it:
        for path, blob in zip(pdf["warc_path"], pdf["blob"]):
            yield _records_frame(path, blob)


def read_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``*.warc`` / ``*.warc.gz`` files → WARC_SCHEMA rows.

    One binaryFile row per WARC file; record parsing streams inside
    the Arrow pass (generator — no per-task buffering beyond the
    blob).  Feed the result straight to ``extract_pages`` (T1).
    """
    raw = (
        spark.read.format("binaryFile").load(path)
        .select(F.col("path").alias("warc_path"),
                F.col("content").alias("blob"))
    )
    return raw.mapInPandas(parse_warc_col_batches, WARC_SCHEMA)

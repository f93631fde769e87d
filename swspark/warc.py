"""WARC 1.0 source/sink — the on-disk format of real Common Crawl.

The engine's canonical input is the pages table
(url, warc_ts, html, text, lang — BASELINE.json input_hint); this
module turns raw WARC files into that shape:

- ``parse_warc_member``: pure-Python WARC/1.0 parser (header block +
  content block, per-record gzip members per the WARC spec); handles
  ``response`` records, strips the embedded HTTP/1.1 response header
  to recover the payload.
- ``read_warc``: distributed reader — ``binaryFile`` scan of
  ``*.warc`` / ``*.warc.gz`` + a ``mapInPandas`` exploder (one input
  file row -> many page rows). Whole-file reads are the WARC access
  pattern (records are not splittable without an index; at 100 TB the
  unit of parallelism is the ~1 GB WARC file, exactly like Common
  Crawl's 64k-file crawls).
- ``write_warc_file``: minimal conformant writer used by tests and
  fixture tooling.

Only the WARC fields this engine consumes are modeled
(WARC-Target-URI, WARC-Date, WARC-Type, Content-Length).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_PAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("warc_file", StringType()),
    ]
)

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
    return headers


def _strip_http_response(payload: bytes) -> bytes:
    """WARC response records embed the HTTP response; the page bytes
    start after the first CRLFCRLF."""
    if payload[:5] in (b"HTTP/",):
        idx = payload.find(b"\r\n\r\n")
        if idx >= 0:
            return payload[idx + 4 :]
    return payload


def parse_warc_bytes(data: bytes) -> list[tuple[str, datetime, bytes]]:
    """Parse a WARC file (possibly multi-member gzip) into
    (url, ts, html) tuples for ``response`` records."""
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: GzipFile iterates members transparently
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    out: list[tuple[str, datetime, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        length = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4  # record ends with two CRLFs
        if len(body) < length:
            break  # truncated record (partial download) -> drop
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "1970-01-01T00:00:00Z")
        ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
        out.append((url, ts, _strip_http_response(body)))
    return out


def read_warc(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """Distributed WARC scan -> (url, warc_ts, html, warc_file)."""
    from swspark.sources import read_html_glob  # reuse glob splitting

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path_or_glob)
        .select("path", "content")
    )

    def explode_warc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "warc_file": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                for url, ts, html in parse_warc_bytes(bytes(content)):
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["html"].append(html)
                    rows["warc_file"].append(path)
            yield pd.DataFrame(rows)

    return files.mapInPandas(explode_warc, WARC_PAGE_SCHEMA)


def write_warc_file(
    path: str,
    pages: list[tuple[str, datetime, bytes]],
    compress: bool = False,
) -> None:
    """Minimal WARC/1.0 writer (response records with an embedded
    HTTP/1.1 200 header), per-record gzip members when ``compress``."""
    chunks: list[bytes] = []
    for i, (url, ts, html) in enumerate(pages):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        record = header + http + b"\r\n\r\n"
        chunks.append(gzip.compress(record) if compress else record)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))

"""WARC source tests: round-trip write/parse, gzip members, HTTP
stripping, distributed read, and extraction byte-identity from WARC."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from swspark.warc import parse_warc_bytes, read_warc, write_warc_file


def sample_pages():
    return [
        ("https://a.test/1", datetime(2026, 1, 2, 3, 4, 5),
         b"<html><body><p>one</p></body></html>"),
        ("https://a.test/2", datetime(2026, 2, 3, 4, 5, 6),
         b"<html><body><p>two &amp; half</p></body></html>"),
    ]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(tmp_path, compress):
    p = str(tmp_path / ("x.warc.gz" if compress else "x.warc"))
    write_warc_file(p, sample_pages(), compress=compress)
    with open(p, "rb") as fh:
        got = parse_warc_bytes(fh.read())
    assert [(u, t) for u, t, _ in got] == [(u, t) for u, t, _ in sample_pages()]
    assert got[0][2] == sample_pages()[0][2]  # HTTP header stripped


def test_warc_ignores_non_response_records(tmp_path):
    p = str(tmp_path / "x.warc")
    write_warc_file(p, sample_pages())
    with open(p, "rb") as fh:
        data = fh.read()
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    got = parse_warc_bytes(warcinfo + data)
    assert len(got) == 2


def test_read_warc_distributed(spark, tmp_path):
    from swspark.extract.udf import apply_extraction
    from swspark.fixtures import generate_corpus

    c = generate_corpus("tiny")
    wiki = c.pages[c.pages.url.str.contains("wiki")].head(10)
    pages = [
        (r.url, r.warc_ts.to_pydatetime(), bytes(r.html))
        for r in wiki.itertuples()
    ]
    write_warc_file(str(tmp_path / "a.warc"), pages[:5])
    write_warc_file(str(tmp_path / "b.warc.gz"), pages[5:], compress=True)

    df = read_warc(spark, str(tmp_path))
    assert df.count() == 10
    assert set(r.url for r in df.select("url").collect()) == set(
        u for u, _, _ in pages
    )
    # byte-identity survives the WARC round trip
    rec, _, errs = apply_extraction(df, "fulltext")
    assert errs.count() == 0
    exp = spark.createDataFrame(wiki[["url", "text"]])
    bad = rec.alias("g").join(exp.alias("e"), "url").where(
        F.col("g.text") != F.col("e.text")
    )
    assert bad.count() == 0

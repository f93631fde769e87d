"""Page sources.

The reference reads pages from three places (SURVEY.md §3): HTTP
(crawl), a local file glob (``sws scrap --files``, scraper.rs:251-297
— A6), and a single page (scraper.rs:299-308 — A7). In this engine:

- the pages parquet/Iceberg table is the primary source (A1 mapping);
- ``read_html_glob`` is the offline batch source: Spark's binaryFile
  reader with a path glob — distributed, whole-file rows, pushdown on
  path/length;
- ``single_page`` wraps one (url, html) into a 1-row DataFrame for
  debugging extraction specs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_html_glob(spark: SparkSession, pattern: str) -> DataFrame:
    """Local/remote HTML files -> (url, html) rows.

    ``pattern`` like 'pages/**/*.html'. Uses the binaryFile format:
    file discovery and reads are distributed; ``pathGlobFilter``
    prunes non-matching files at listing time (scraper.rs:251-297
    analogue — paths channel ≙ file index, worker pool ≙ tasks).
    """
    directory = pattern
    glob_part = None
    # split the static prefix from the glob suffix
    specials = set("*?[{")
    parts = pattern.split(os.sep)
    for i, p in enumerate(parts):
        if any(ch in specials for ch in p):
            directory = os.sep.join(parts[:i]) or "."
            glob_part = os.sep.join(parts[i:])
            break
    reader = spark.read.format("binaryFile")
    if glob_part is not None and os.sep not in glob_part:
        reader = reader.option("pathGlobFilter", glob_part)
        if "**" in glob_part:
            reader = reader.option("recursiveFileLookup", "true")
        load_path = directory
    else:
        load_path = pattern
    df = reader.load(load_path)
    # location_kind stamps the source for ctx.location(): glob pages
    # are PATH locations (sws-lua scraper.rs:269), crawled pages URL
    return df.select(
        F.col("path").alias("url"),
        F.col("content").alias("html"),
        F.lit("PATH").alias("location_kind"),
    )


def single_page(
    spark: SparkSession, url: str, html: bytes | str,
    location_kind: str = "URL",
) -> DataFrame:
    """One-page source (A7) — the unit-test/debug path.
    ``location_kind`` mirrors PageLocation::{Url, Path}: pass "PATH"
    when ``url`` is a filesystem path (`sws scrap --files` analogue)."""
    if isinstance(html, str):
        html = html.encode()
    return spark.createDataFrame(
        [(url, bytearray(html), location_kind)],
        "url string, html binary, location_kind string",
    )

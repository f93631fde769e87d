"""Simulated fetch + flow accounting.

The reference downloads over HTTP (crawler.rs:179-201). In this
engine "fetch" is an equi-join of the scheduled frontier against the
Common-Crawl-style pages table (SURVEY.md §2 A1) — on a cluster this
is a storage-partitioned/bucketed join on ``url``; a URL missing from
the table is the download-error path (on_dl_error policy,
crawler.rs:104-118, 391-412).

Flow counters (pages_in / pages_out, crawler.rs:256-258,301,385) map
to ``df.observe`` metrics so they ride the same job, cost nothing
extra, and land in wave lineage.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

_fetch_seq = itertools.count()


def fetch_pages(
    frontier: DataFrame,
    pages: DataFrame,
    on_dl_error: str = "skip",
    page_cols: tuple[str, ...] = ("html",),
) -> tuple[DataFrame, DataFrame, Observation]:
    """frontier(url, ...) |x| pages(url, html, ...) -> fetched, dl_errors.

    Returns (fetched_df, dl_errors_df, observation). The observation
    yields {'pages_in', 'pages_out'} after the first action on
    fetched_df — the quiescence accounting of A28.
    """
    obs = Observation(f"fetch-{next(_fetch_seq)}")
    joined = frontier.join(
        pages.select("url", *page_cols), "url", "left"
    )
    joined = joined.observe(
        obs,
        F.count(F.lit(1)).alias("pages_in"),
        F.count(F.col(page_cols[0])).alias("pages_out"),
    )
    fetched = joined.where(F.col(page_cols[0]).isNotNull())
    dl_errors = joined.where(F.col(page_cols[0]).isNull()).select(
        "url", F.lit("download error: url not in pages table").alias("error")
    )
    if on_dl_error == "fail":
        n = dl_errors.count()
        if n:
            raise RuntimeError(f"{n} download errors (on_dl_error=fail)")
    return fetched, dl_errors, obs

"""Structured Streaming surface.

The reference is an unbounded-stream system (URL channel -> bounded
page queue -> workers; quiescence termination, crawler.rs:417-433).
The engine's primary model is batch waves (SURVEY.md §1.3), but the
same operators run unchanged as a stream when pages *arrive*
continuously (e.g. WARC drops landing in object storage):

- ``stream_pages``: file-source readStream over the pages layout —
  each new parquet file is a micro-batch (the page-queue analogue;
  ``maxFilesPerTrigger`` is the backpressure knob ≙ page_buffer,
  config.rs:53-55);
- ``stream_extract``: the identical Arrow extraction UDF applied to
  the stream (records + discovered URLs + error column);
- ``stream_host_rates``: event-time windowed per-host fetch counts
  with a watermark — late pages fold into their window until the
  watermark passes (the batch model simply puts them in a later wave);
- ``stateful_host_budget``: applyInPandasWithState token-bucket — the
  reference's RateLimiter (limiter.rs:19-57) as an explicit streaming
  state machine: per host, tokens refill per micro-batch, admitted
  rows decrement.

All sinks in tests run with trigger(availableNow=True) + checkpoint,
so the stream is deterministic and resumable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_extract(pages: DataFrame, spec: str):
    """Streaming extraction: identical UDF, identical explode shape.
    Returns (records, discovered_urls, errors) streaming DataFrames."""
    from swspark.extract.udf import apply_extraction

    return apply_extraction(pages, spec)


def stream_host_rates(
    pages: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Per-host fetch counts per event-time window (the politeness
    accounting signal), late-data tolerant up to the watermark."""
    from swspark import urlnorm

    return (
        pages.withColumn("host", urlnorm.url_host(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "host")
        .agg(F.count(F.lit(1)).alias("n_fetched"))
        .select(
            F.col("win.start").alias("window_start"),
            "host",
            "n_fetched",
        )
    )


BUDGET_STATE_SCHEMA = StructType([StructField("tokens", LongType())])
BUDGET_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("admitted", IntegerType()),
    ]
)


def make_host_budget_fn(refill_per_batch: int, burst: int):
    """Token-bucket state function (RateLimiter semantics,
    limiter.rs:19-57): per host, ``refill_per_batch`` tokens are added
    each micro-batch up to ``burst``; each admitted URL consumes one.
    Deterministic admit order: url ASC (the scheduler tiebreak)."""

    def fn(key, pdfs, state: GroupState):
        (host,) = key
        if state.exists:
            (tokens,) = state.get
        else:
            tokens = burst
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("url")
        admit = min(int(tokens), len(rows))
        out = rows[["url"]].copy()
        out["host"] = host
        out["admitted"] = [1] * admit + [0] * (len(rows) - admit)
        tokens = min(tokens - admit + refill_per_batch, burst)
        state.update((int(tokens),))
        yield out[["host", "url", "admitted"]]

    return fn


def stateful_host_budget(
    pages: DataFrame, refill_per_batch: int = 5, burst: int = 10
) -> DataFrame:
    """Custom stateful streaming operator: per-host token-bucket
    admission via applyInPandasWithState."""
    from swspark import urlnorm

    with_host = pages.select(
        urlnorm.url_host(F.col("url")).alias("host"), "url"
    )
    return with_host.groupBy("host").applyInPandasWithState(
        make_host_budget_fn(refill_per_batch, burst),
        outputStructType=BUDGET_OUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Run a streaming query to a parquet sink and block until the
    available data is drained (deterministic for tests/batch-catchup)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=available_now)
        .start()
    )
    q.awaitTermination()

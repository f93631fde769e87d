"""Record sinks.

The reference has a single-threaded CSV writer fed by a channel
(A8 — scraper.rs:129-171, writer.rs:5-116): headerless, flexible
arity, configurable dialect (delimiter / escape / terminator), file
modes Create/Append/Truncate. Here the sink is a distributed
``df.write.csv`` — per-partition streams replace the writer thread;
ordering within the output is nondeterministic in both systems
(crawler.rs:167 buffer_unordered).

Records are also persisted as parquet (``write_parquet``) because
parquet is the engine's native interchange for oracle checks and
downstream waves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",  # Truncate ≙ overwrite, Append ≙ append (writer.rs:92-116)
    delimiter: str = ",",
    escape: str | None = None,
    terminator: str | None = None,
    header: bool = False,
) -> None:
    w = (
        df.write.mode(mode)
        .option("header", "true" if header else "false")
        .option("sep", delimiter)
        .option("emptyValue", "")
    )
    if escape is not None:
        # writer.rs:28-38: setting an escape char turns double-quote
        # escaping off in favor of backslash-style escaping.
        w = w.option("escape", escape)
    if terminator is not None:
        w = w.option("lineSep", terminator)
    w.csv(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)

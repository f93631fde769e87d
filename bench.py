"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "frontier_urls_scheduled_fetched_per_sec", "value": N,
   "unit": "sec", "queries": {...per-query seconds...}, "sf": ...}

- headline metric: frontier URLs scheduled+fetched per second through
  the full wave machinery (canonicalize+hash -> bloom/anti-join vs a
  pre-seeded seen-set -> per-host window-rank budget cutoff -> salted
  repartition -> fetch join), on a deterministic synthetic frontier
  with a hot-host skew (BASELINE.json metric).
- per-query timings: the entry queries at $SPARK_GRAFT_SF_DIR
  (default /root/testdata/sf0.1) plus extraction throughput on
  fixture pages.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_URLS (frontier rows, default 2_000_000),
SPARK_GRAFT_BENCH_QUERIES (comma list to restrict).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def build_synthetic_frontier(spark, n_urls: int, n_hosts: int = 1000):
    """Deterministic frontier with one hot registered domain owning
    ~10% of URLs (the skew case the salted repartition must absorb)."""
    df = spark.range(n_urls)
    host_id = F.when(F.pmod("id", F.lit(10)) == 0, F.lit(0)).otherwise(
        F.pmod(F.xxhash64("id"), F.lit(n_hosts))
    )
    return df.select(
        F.concat(
            F.lit("https://h"),
            host_id.cast("string"),
            F.lit(".example.test/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), host_id.cast("string"), F.lit(".example.test")).alias(
            "host"
        ),
        F.lit(0).alias("priority"),
        F.lit(None).cast("timestamp").alias("last_fetch_ts"),
    )


def bench_crawl_wave(spark, n_urls: int) -> tuple[float, int]:
    """One full scheduling wave over the synthetic frontier; returns
    (seconds, urls_scheduled_and_fetched)."""
    from swspark.scheduler import Throttle, salted_repartition, schedule_wave
    from swspark.seen import with_url_identity

    frontier = with_url_identity(build_synthetic_frontier(spark, n_urls))
    # pre-seeded seen-set: 25% of the id space, materialized first so
    # its build cost is not billed to the wave
    seen = with_url_identity(
        build_synthetic_frontier(spark, n_urls // 4).select("url")
    ).select("url_hash", "url_canon")
    seen = seen.persist()
    seen.count()
    # per-host budgets: delays cycle 0.5/1/2 like the fixtures; the
    # wave_period is scaled so budgets admit ~half the frontier
    hosts = frontier.select("host").distinct()
    m = F.length("host") % 3
    budgets = hosts.select(
        "host",
        F.when(m == 0, F.lit(0.5))
        .when(m == 1, F.lit(1.0))
        .otherwise(F.lit(2.0))
        .alias("crawl_delay"),
    )
    # simulated pages store (url -> payload) as a second scan of the
    # same generator: the fetch join is real, the payload is synthetic
    pages = build_synthetic_frontier(spark, n_urls).select(
        "url", F.encode(F.repeat(F.lit("x"), 64), "utf-8").alias("html")
    )

    t0 = time.perf_counter()
    candidates = frontier.join(seen, ["url_hash", "url_canon"], "left_anti")
    wave_period = max(1.0, n_urls / 2000.0)  # admit a large wave
    scheduled = schedule_wave(
        candidates, budgets, wave_period, Throttle("CONCURRENT", 1e18)
    )
    scheduled = salted_repartition(
        scheduled, spark.sparkContext.defaultParallelism, 16
    )
    fetched = scheduled.join(pages, "url")
    n = fetched.count()
    dt = time.perf_counter() - t0
    seen.unpersist()
    return dt, n


def bench_extraction(spark) -> tuple[float, int]:
    """Extraction throughput: full DOM parse + selector program over
    the fixture dict pages (Arrow UDF path), pages/sec."""
    import tempfile

    from swspark.extract.udf import apply_extraction
    from swspark.fixtures import ensure_corpus

    d = ensure_corpus(os.path.join(tempfile.gettempdir(), "swspark-bench-corpus"),
                      "small")
    pages = spark.read.parquet(os.path.join(d, "pages.parquet")).select(
        "url", "html"
    )
    pages = pages.persist()
    n = pages.count()
    t0 = time.perf_counter()
    rec, _urls, _errs = apply_extraction(pages, "fulltext")
    rec.count()
    dt = time.perf_counter() - t0
    pages.unpersist()
    return dt, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_urls = int(os.environ.get("SPARK_GRAFT_BENCH_URLS", "2000000"))
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")

    from swspark.session import get_spark

    spark = get_spark("swspark-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    timings: dict[str, float] = {}

    # headline: wave throughput
    dt, n_fetched = bench_crawl_wave(spark, n_urls)
    timings["crawl_wave_synthetic"] = round(dt, 3)
    urls_per_sec = n_fetched / dt if dt else 0.0

    edt, n_pages = bench_extraction(spark)
    timings["extract_fulltext_20k_pages"] = round(edt, 3)

    bench_queries = [
        "schedule_wave", "seen_anti_join", "host_agg", "events_daily",
        "exact_dedup", "token_stats", "quality_score", "lang_id",
        "fingerprint", "ann_topk", "minhash_lsh", "embedding_neardup",
    ]
    if only:
        bench_queries = [q for q in bench_queries if q in only.split(",")]
    qs = entry.queries()
    for name in bench_queries:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "frontier_urls_scheduled_fetched_per_sec",
        "value": round(urls_per_sec, 1),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "frontier_urls": n_urls,
        "urls_fetched": n_fetched,
        "extract_pages_per_sec": round(n_pages / edt, 1) if edt else 0.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Hot-host rank pre-prune (r4): the coarse-key threshold cut must be
EXACT — schedule_wave with pre-prune forced on returns byte-identical
schedules to the plain two-phase rank, for adversarial order columns
(priorities, fetch timestamps, unicode urls, ties)."""

import pytest
from pyspark.sql import functions as F

from swspark.scheduler import (
    Throttle,
    _coarse_order_key,
    preprune_hot_hosts,
    schedule_wave,
)

N_PER_HOST = 3000


@pytest.fixture(scope="module")
def frontier(spark):
    # 3 hosts x 3000 rows: mixed priorities, some fetched timestamps,
    # unicode/short urls, heavy ties — everything the order sorts on
    df = spark.range(3 * N_PER_HOST).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 3).cast("string"),
            F.lit(".test/"),
            F.when(F.col("id") % 7 == 0, F.lit("café/"))
            .when(F.col("id") % 11 == 0, F.lit(""))  # short urls
            .otherwise(F.lit("p/")),
            F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string"),
                 F.lit(".test")).alias("host"),
        F.when(F.col("id") % 5 == 0, F.lit(None))
        .otherwise((F.col("id") % 4).cast("int")).alias("priority"),
        F.when(F.col("id") % 6 == 0,
               F.timestamp_seconds(1700000000 + F.col("id") % 97 * 1000))
        .otherwise(F.lit(None).cast("timestamp")).alias("last_fetch_ts"),
    )
    return df


@pytest.fixture(scope="module")
def budgets(spark):
    return spark.createDataFrame(
        [("h0.test", 1.0), ("h1.test", 0.25), ("h2.test", None)],
        "host string, crawl_delay double",
    )


def _collect(df):
    return sorted(
        (r.host, r.url, r.rank) for r in df.select("host", "url", "rank").collect()
    )


def test_preprune_schedule_identical(spark, frontier, budgets):
    kw = dict(wave_period=10.0, throttle=Throttle("CONCURRENT", 7))
    plain = schedule_wave(frontier, budgets, preprune=False, **kw)
    pruned = schedule_wave(
        frontier, budgets, preprune=True, preprune_hot_min_rows=10, **kw
    )
    a, b = _collect(plain), _collect(pruned)
    assert a == b
    assert len(a) > 0


def test_preprune_with_backoff_and_cap(spark, frontier, budgets):
    kw = dict(wave_period=10.0, throttle=Throttle("PER_SECOND", 0.5),
              max_urls_per_wave=9)
    bb = budgets.withColumn(
        "backoff_k",
        F.when(F.col("host") == "h1.test", F.lit(2)).otherwise(F.lit(None)),
    )
    plain = schedule_wave(frontier, bb, preprune=False, **kw)
    pruned = schedule_wave(
        frontier, bb, preprune=True, preprune_hot_min_rows=10, **kw
    )
    assert _collect(plain) == _collect(pruned)


def test_preprune_actually_cuts_rows(spark, frontier, budgets):
    base = frontier.join(F.broadcast(budgets), "host", "left").withColumn(
        "_budget", F.lit(5)
    )
    pruned = preprune_hot_hosts(base, hot_min_rows=10)
    n_in, n_out = frontier.count(), pruned.count()
    # per host ~ grid-rounded (budget + 3n/accuracy) rows survive;
    # with n=3000, budget=5, accuracy=1e4: a few dozen per host
    assert n_out < n_in / 10, (n_in, n_out)
    assert n_out >= 3 * 5  # never below the schedulable set


def test_coarse_key_monotone_along_order(spark, frontier):
    import os.path

    urls = [r.url for r in frontier.where(F.col("host") == "h1.test")
            .select("url").collect()]
    cp = len(os.path.commonprefix(urls))
    rows = (
        frontier.where(F.col("host") == "h1.test")
        .withColumn("_ck", _coarse_order_key(F.lit(cp)))
        .orderBy(
            F.desc_nulls_last("priority"),
            F.asc_nulls_first("last_fetch_ts"),
            F.asc("url"),
        )
        .select("_ck")
        .collect()
    )
    ks = [r._ck for r in rows]
    assert all(a <= b for a, b in zip(ks, ks[1:]))
    assert ks[0] < ks[-1]  # the key actually discriminates


def test_coarse_key_fits_double_exactly(spark, frontier):
    # 53-bit bound: percentile_approx stores doubles; int64-wide keys
    # would round and could push a threshold below its true rank
    mx = frontier.select(
        F.max(_coarse_order_key(F.lit(0))).alias("m")
    ).collect()[0].m
    assert mx < 2**53

"""Crawl-driver integration tests (SURVEY.md §5 items 3-5): golden
crawl-order traces, seen-set dedup law, checkpoint/resume equality."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from swspark.driver import CrawlConfig, CrawlState, crawl
from swspark.fixtures import generate_corpus

WAVE_PERIOD = 10.0


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus("tiny")


@pytest.fixture(scope="module")
def tables(spark, corpus):
    return {
        "pages": spark.createDataFrame(corpus.pages),
        "sitemaps": spark.createDataFrame(corpus.sitemaps),
        "robots": spark.createDataFrame(corpus.robots[["host", "body"]]),
        "seeds": spark.createDataFrame(corpus.seeds),
    }


def scenario_seeds(tables, scenario):
    return tables["seeds"].where(F.col("scenario") == scenario)


def accept_term(url, kind):
    return F.when(kind == "URLSET", url.contains("term=")).otherwise(F.lit(True))


def run_crawl(spark, tables, scenario, warehouse, spec, accept=None, **kw):
    cfg = CrawlConfig(spec=spec, wave_period=WAVE_PERIOD, **kw)
    return cfg, crawl(
        spark,
        cfg,
        str(warehouse),
        scenario_seeds(tables, scenario),
        tables["sitemaps"],
        tables["robots"],
        tables["pages"],
        accept=accept,
    )


def expected_trace(urls_by_host: dict[str, list[str]], delays: dict[str, float]):
    """Independent (pandas-free) scheduling simulation: budget =
    max(1, floor(period/delay)); rank order = url ASC (equal priority,
    null last_fetch_ts); URLs leave the frontier once scheduled."""
    remaining = {h: sorted(set(us)) for h, us in urls_by_host.items()}
    trace = []
    wave = 0
    while any(remaining.values()):
        for h in sorted(remaining):
            budget = max(1, math.floor(WAVE_PERIOD / delays[h]))
            batch = remaining[h][:budget]
            remaining[h] = remaining[h][budget:]
            for rank, u in enumerate(batch, start=1):
                trace.append((wave, h, u, rank))
        wave += 1
    return pd.DataFrame(trace, columns=["wave", "host", "url", "rank"])


def test_dict_crawl_golden_trace_and_dedup(spark, corpus, tables, tmp_path):
    cfg, totals = run_crawl(
        spark, tables, "dict_sitemap", tmp_path / "w1", "urbandict",
        accept=accept_term,
    )
    state = CrawlState(str(tmp_path / "w1"))
    trace = state.trace.read(spark).toPandas()

    # dedup law: no URL scheduled twice despite 5% duplicate sitemap
    # entries (FIXTURES.md §2)
    assert trace.url.is_unique

    # golden trace: all accepted dict term urls (incl 404s, which are
    # attempted once), ranked by url per wave under budget 10/0.5=20
    dict_urls = sorted(
        u
        for u in set(
            corpus.golden_urbandict.url.tolist() + corpus.missing_urls
        )
    )
    delays = dict(zip(corpus.robots.host, corpus.robots.crawl_delay))
    exp = expected_trace({"dict.example.test": dict_urls}, delays)
    got = trace.sort_values(["wave", "host", "url"]).reset_index(drop=True)
    exp = exp.sort_values(["wave", "host", "url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["wave", "host", "url", "rank"]].astype({"wave": int, "rank": int}),
        exp.astype({"wave": int, "rank": int}),
    )

    # records match goldens
    rec = state.records.read(spark).drop("wave").toPandas()
    exp_rec = corpus.golden_urbandict
    key = ["url", "def_index"]
    pd.testing.assert_frame_equal(
        rec.sort_values(key).reset_index(drop=True)[exp_rec.columns.tolist()],
        exp_rec.sort_values(key).reset_index(drop=True),
    )

    # 404 accounting: one download error, attempted exactly once
    errs = state.errors.read(spark).toPandas()
    dl = errs[errs.stage == "download"]
    assert sorted(dl.url) == sorted(corpus.missing_urls)


def test_wiki_crawl_discovery_and_budgets(spark, corpus, tables, tmp_path):
    cfg, totals = run_crawl(
        spark, tables, "wiki_pages", tmp_path / "w2", "fandom"
    )
    state = CrawlState(str(tmp_path / "w2"))
    trace = state.trace.read(spark).toPandas()
    assert trace.url.is_unique

    # wave 0 = the 7 faction seeds; creatures appear only later
    w0 = trace[trace.wave == 0]
    assert len(w0) == 7
    assert all("_(H7)" in u for u in w0.url)

    # budget: wiki crawl_delay=1.0 -> 10/wave; 28 creatures -> waves 1-3
    delays = dict(zip(corpus.robots.host, corpus.robots.crawl_delay))
    budget = max(1, math.floor(WAVE_PERIOD / delays["wiki.example.test"]))
    later = trace[trace.wave > 0]
    assert later.groupby("wave").size().max() <= budget
    assert set(later.url) == set(corpus.golden_fandom_urls.discovered_url)

    # all creature records extracted across waves
    rec = state.records.read(spark).toPandas()
    assert len(rec) == len(corpus.golden_fandom)


def test_news_multihost_budgets(spark, corpus, tables, tmp_path):
    cfg, totals = run_crawl(
        spark, tables, "news_sitemaps", tmp_path / "w3", "fulltext"
    )
    state = CrawlState(str(tmp_path / "w3"))
    trace = state.trace.read(spark).toPandas()
    delays = dict(zip(corpus.robots.host, corpus.robots.crawl_delay))
    news_urls = {
        h: [u for u in corpus.pages.url if h in u]
        for h in delays
        if h.startswith("news")
    }
    exp = expected_trace(news_urls, delays)
    got = trace.sort_values(["wave", "host", "url"]).reset_index(drop=True)
    exp = exp.sort_values(["wave", "host", "url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["wave", "host", "url", "rank"]].astype({"wave": int, "rank": int}),
        exp.astype({"wave": int, "rank": int}),
    )


def test_resume_equals_uninterrupted(spark, corpus, tables, tmp_path):
    """Kill after wave 2, resume -> identical records/seen/trace."""
    _, t_full = run_crawl(
        spark, tables, "wiki_pages", tmp_path / "full", "fandom"
    )
    cfg = CrawlConfig(spec="fandom", wave_period=WAVE_PERIOD, max_waves=2)
    crawl(
        spark, cfg, str(tmp_path / "part"),
        scenario_seeds(tables, "wiki_pages"), tables["sitemaps"],
        tables["robots"], tables["pages"],
    )
    cfg2 = CrawlConfig(spec="fandom", wave_period=WAVE_PERIOD)
    crawl(
        spark, cfg2, str(tmp_path / "part"),
        scenario_seeds(tables, "wiki_pages"), tables["sitemaps"],
        tables["robots"], tables["pages"], resume=True,
    )
    sf = CrawlState(str(tmp_path / "full"))
    sp = CrawlState(str(tmp_path / "part"))
    for name, key in (
        ("trace", ["wave", "host", "url"]),
        ("seen", ["url_canon"]),
        ("records", ["url", "creature"]),
    ):
        a = getattr(sf, name).read(spark).toPandas().sort_values(key).reset_index(drop=True)
        b = getattr(sp, name).read(spark).toPandas().sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_compaction_invariant_and_resume_across_boundary(
    spark, corpus, tables, tmp_path
):
    """Compaction is pure maintenance: with compact_every_waves=2 the
    trace/seen/records must be byte-identical to the default-cadence
    run, and a kill-after-wave-3 resume (which reconstructs the
    frontier from bucketed base + op-log deltas ACROSS a compaction
    boundary) must replay to the same state."""
    _, _ = run_crawl(
        spark, tables, "dict_sitemap", tmp_path / "cfull", "urbandict",
        accept=accept_term,
    )
    cfg_k = CrawlConfig(spec="urbandict", wave_period=WAVE_PERIOD,
                        compact_every_waves=2)
    crawl(
        spark, cfg_k, str(tmp_path / "ck"),
        scenario_seeds(tables, "dict_sitemap"), tables["sitemaps"],
        tables["robots"], tables["pages"], accept=accept_term,
    )
    cfg_part = CrawlConfig(spec="urbandict", wave_period=WAVE_PERIOD,
                           compact_every_waves=2, max_waves=3)
    crawl(
        spark, cfg_part, str(tmp_path / "cpart"),
        scenario_seeds(tables, "dict_sitemap"), tables["sitemaps"],
        tables["robots"], tables["pages"], accept=accept_term,
    )
    crawl(
        spark, cfg_k, str(tmp_path / "cpart"),
        scenario_seeds(tables, "dict_sitemap"), tables["sitemaps"],
        tables["robots"], tables["pages"], accept=accept_term, resume=True,
    )
    sf = CrawlState(str(tmp_path / "cfull"))
    for other in ("ck", "cpart"):
        so = CrawlState(str(tmp_path / other))
        for name, key in (
            ("trace", ["wave", "host", "url"]),
            ("seen", ["url_canon", "wave"]),
        ):
            a = (getattr(sf, name).read(spark).toPandas()
                 .sort_values(key).reset_index(drop=True))
            b = (getattr(so, name).read(spark).toPandas()
                 .sort_values(key).reset_index(drop=True))
            pd.testing.assert_frame_equal(a, b[a.columns.tolist()], obj=f"{other}.{name}")
    # the compacting run really did compact: current seen snapshot is
    # a bucketed base (+ maybe deltas), not a pure append chain
    assert CrawlState(str(tmp_path / "ck")).seen.base_version() is not None


def test_resume_mid_wave_crash_reconciles(spark, corpus, tables, tmp_path):
    """A crash BETWEEN a wave's table commits and the frontier pointer
    commit must not double-append on resume: reconciliation rolls
    records/trace/seen/... back to the frontier's wave, then replays."""
    _, t_full = run_crawl(
        spark, tables, "wiki_pages", tmp_path / "full2", "fandom"
    )
    cfg = CrawlConfig(spec="fandom", wave_period=WAVE_PERIOD, max_waves=2)
    crawl(
        spark, cfg, str(tmp_path / "part2"),
        scenario_seeds(tables, "wiki_pages"), tables["sitemaps"],
        tables["robots"], tables["pages"],
    )
    state = CrawlState(str(tmp_path / "part2"))
    next_wave = state.frontier.manifest()["lineage"]["next_wave"]

    # simulate the torn wave: records/trace/seen got their wave-N
    # commits, the frontier pointer did not
    rec_g = (
        state.records.read(spark).limit(1)
        .withColumn("url", F.lit("CRASH"))
        .withColumn("wave", F.lit(next_wave))
    )
    state.records.commit(rec_g, mode="append", lineage={"wave": next_wave})
    state.trace.commit(
        state.trace.read(spark).limit(1)
        .withColumn("wave", F.lit(next_wave))
        .withColumn("url", F.lit("CRASH")),
        mode="append", lineage={"wave": next_wave},
    )
    state.seen.commit(
        spark.createDataFrame(
            [(123456789, "CRASH", "CRASH", next_wave)],
            "url_hash long, url_canon string, url string, wave int",
        ),
        mode="append", lineage={"wave": next_wave},
    )

    cfg2 = CrawlConfig(spec="fandom", wave_period=WAVE_PERIOD)
    crawl(
        spark, cfg2, str(tmp_path / "part2"),
        scenario_seeds(tables, "wiki_pages"), tables["sitemaps"],
        tables["robots"], tables["pages"], resume=True,
    )
    sf = CrawlState(str(tmp_path / "full2"))
    sp = CrawlState(str(tmp_path / "part2"))
    for name, key in (
        ("trace", ["wave", "host", "url"]),
        ("seen", ["url_canon"]),
        ("records", ["url", "creature"]),
    ):
        a = getattr(sf, name).read(spark).toPandas().sort_values(key).reset_index(drop=True)
        b = getattr(sp, name).read(spark).toPandas().sort_values(key).reset_index(drop=True)
        assert not (b == "CRASH").any().any(), f"{name} kept torn-wave rows"
        pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_recrawl_aging(spark, corpus, tables, tmp_path):
    """recrawl_after_waves=2: a URL fetched in wave w is fetched again
    in wave w+2, indefinitely (here bounded by max_waves=5 -> waves
    0, 2, 4); idle waves in between schedule nothing."""
    seeds = spark.createDataFrame(
        [("https://news0.example.test/articles/000001", "PAGES", "x"),
         ("https://news0.example.test/articles/000002", "PAGES", "x")],
        "seed string, seed_kind string, scenario string",
    )
    cfg = CrawlConfig(spec="fulltext", wave_period=WAVE_PERIOD,
                      recrawl_after_waves=2, max_waves=5)
    totals = crawl(
        spark, cfg, str(tmp_path / "w5"), seeds, tables["sitemaps"],
        tables["robots"], tables["pages"],
    )
    state = CrawlState(str(tmp_path / "w5"))
    trace = state.trace.read(spark).toPandas()
    assert sorted(trace.wave.unique().tolist()) == [0, 2, 4]
    per_url = trace.groupby("url").wave.apply(lambda s: sorted(s.tolist()))
    assert all(v == [0, 2, 4] for v in per_url), per_url.to_dict()
    assert totals["waves"] == 3  # idle waves are not fetch waves
    # never-refetched-too-early law: consecutive fetches >= ttl apart
    assert (trace.sort_values(["url", "wave"])
            .groupby("url").wave.diff().dropna() >= 2).all()


def test_recrawl_resurrects_raw_url(spark, corpus, tables, tmp_path):
    """A URL whose RAW form differs from its canonical form (explicit
    :443) must refetch on recrawl: resurrection goes through the raw
    url carried in the seen table, not url_canon — fetch joins the
    pages source on the exact string (regression: r2 resurrected
    url_canon, so non-canonical URLs fetched once then produced
    phantom download errors on every recrawl)."""
    raw = "https://news0.example.test:443/articles/weird"
    pages = tables["pages"].unionByName(
        spark.createDataFrame(
            [(raw, "<html><body>weird</body></html>")], "url string, body string"
        ).select(
            "url",
            F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
            F.col("body").cast("binary").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit("en").alias("lang"),
        ).select(tables["pages"].columns),
    )
    seeds = spark.createDataFrame(
        [(raw, "PAGES", "x")], "seed string, seed_kind string, scenario string"
    )
    cfg = CrawlConfig(spec="fulltext", wave_period=WAVE_PERIOD,
                      recrawl_after_waves=2, max_waves=3)
    crawl(spark, cfg, str(tmp_path / "w5raw"), seeds, tables["sitemaps"],
          tables["robots"], pages)
    state = CrawlState(str(tmp_path / "w5raw"))
    trace = state.trace.read(spark).toPandas()
    assert sorted(trace.wave.tolist()) == [0, 2]
    assert set(trace.url) == {raw}  # raw form both times
    errs = state.errors.read(spark).where(F.col("stage") == "download")
    assert errs.count() == 0, errs.toPandas()


def test_error_backoff_halves_budget(spark, corpus, tables, tmp_path):
    """A host with download errors in the backoff window gets half the
    budget next wave: 4 missing URLs (sort first) fill wave 0 with
    errors -> wave 1 runs at budget 2 -> wave 2 (no errors in the
    1-wave window) back to 4."""
    from swspark.scheduler import Throttle

    host = "news0.example.test"
    # ',' < '0' so the missing URLs sort (and schedule) first
    missing = [f"https://{host}/articles/,{i}" for i in range(4)]
    existing = sorted(
        r.url for r in tables["pages"].select("url").collect()
        if host in r.url and "/articles/" in r.url
    )[:6]
    assert len(existing) == 6
    seeds = spark.createDataFrame(
        [(u, "PAGES", "x") for u in missing + existing],
        "seed string, seed_kind string, scenario string",
    )
    cfg = CrawlConfig(
        spec="fulltext", wave_period=WAVE_PERIOD,
        throttle=Throttle("PER_SECOND", 0.4),  # explicit budget 4/wave
        error_backoff_window=1,
    )
    crawl(
        spark, cfg, str(tmp_path / "w6"), seeds, tables["sitemaps"],
        tables["robots"], tables["pages"],
    )
    state = CrawlState(str(tmp_path / "w6"))
    trace = state.trace.read(spark).toPandas()
    sizes = trace.groupby("wave").size().to_dict()
    assert sizes == {0: 4, 1: 2, 2: 4}, sizes
    errs = state.errors.read(spark).toPandas()
    assert sorted(errs[errs.stage == "download"].url) == sorted(missing)


def test_robots_disallow_enforced(spark, corpus, tables, tmp_path):
    """A frontier URL under a Disallow prefix must never be scheduled."""
    seeds = spark.createDataFrame(
        [("https://news0.example.test/private/secret", "PAGES", "x"),
         ("https://news0.example.test/articles/000001", "PAGES", "x")],
        "seed string, seed_kind string, scenario string",
    )
    cfg = CrawlConfig(spec="fulltext", wave_period=WAVE_PERIOD)
    crawl(
        spark, cfg, str(tmp_path / "w4"), seeds, tables["sitemaps"],
        tables["robots"], tables["pages"],
    )
    state = CrawlState(str(tmp_path / "w4"))
    urls = [r.url for r in state.trace.read(spark).select("url").collect()]
    assert urls == ["https://news0.example.test/articles/000001"]


def test_idle_resurrection_committed_to_oplog(spark, corpus, tables, tmp_path):
    """ADVICE r4 (medium): resurrected URLs from a fully-throttled
    (idle, n_sched==0) wave must land in the frontier op log before
    next_wave advances past them — otherwise a later resume rebuilds a
    frontier silently missing them and read_wave never re-derives the
    expiry (it consults wave w-ttl exactly once)."""
    from swspark.driver import _reconstruct_frontier
    from swspark.scheduler import Throttle

    urls = ["https://news0.example.test/articles/000001",
            "https://news0.example.test/articles/000002"]
    seeds = spark.createDataFrame(
        [(u, "PAGES", "x") for u in urls],
        "seed string, seed_kind string, scenario string",
    )
    wh = str(tmp_path / "widle")
    # phase 1: fetch both at wave 0
    cfg1 = CrawlConfig(spec="fulltext", wave_period=WAVE_PERIOD,
                       recrawl_after_waves=2, max_waves=1)
    crawl(spark, cfg1, wh, seeds, tables["sitemaps"], tables["robots"],
          tables["pages"])
    # phase 2: paused throttle (PER_SECOND 0.05 x period 10 -> budget 0):
    # wave 1 idle, wave 2 resurrects both URLs but schedules nothing
    cfg2 = CrawlConfig(spec="fulltext", wave_period=WAVE_PERIOD,
                       recrawl_after_waves=2, max_waves=3,
                       throttle=Throttle("PER_SECOND", 0.05))
    crawl(spark, cfg2, wh, seeds, tables["sitemaps"], tables["robots"],
          tables["pages"], resume=True)
    state = CrawlState(wh)
    # the idle resurrection wave was committed: pointer advanced AND
    # the op log reconstructs the resurrected frontier
    assert state.frontier.manifest()["lineage"]["next_wave"] == 3
    recon = _reconstruct_frontier(spark, state.frontier)
    assert sorted(r.url for r in recon.collect()) == sorted(urls)
    # phase 3: resume with a live throttle -> both refetch at wave 3
    cfg3 = CrawlConfig(spec="fulltext", wave_period=WAVE_PERIOD,
                       recrawl_after_waves=2, max_waves=4)
    crawl(spark, cfg3, wh, seeds, tables["sitemaps"], tables["robots"],
          tables["pages"], resume=True)
    trace = state.trace.read(spark).toPandas()
    per_url = trace.groupby("url").wave.apply(lambda s: sorted(s.tolist()))
    assert all(v == [0, 3] for v in per_url), per_url.to_dict()

"""CLI (sws-cli parity), glob source, and Structured Streaming tests."""

import glob
import os
import subprocess
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

from swspark.fixtures import ensure_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    return ensure_corpus(str(d), "tiny")


def _read_csv_dir(path, columns):
    files = [f for f in glob.glob(os.path.join(path, "*.csv")) if os.path.getsize(f)]
    df = pd.concat(
        [pd.read_csv(f, header=None, dtype=str, keep_default_na=False) for f in files],
        ignore_index=True,
    )
    df.columns = columns
    return df


def test_cli_scrap_pages(corpus_dir, tmp_path):
    out = str(tmp_path / "rec")
    r = subprocess.run(
        [sys.executable, "-m", "swspark", "scrap",
         "--spec", "urbandict",
         "--pages", os.path.join(corpus_dir, "pages.parquet"),
         "--cpus", "4", "-o", out],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = _read_csv_dir(out, ["url", "word", "def_index", "date", "meaning",
                              "example"])
    exp = pd.read_parquet(os.path.join(corpus_dir, "golden_urbandict.parquet"))
    assert len(got) == len(exp)


def test_cli_scrap_glob_and_single_file(corpus_dir, tmp_path):
    # write fixture pages out as .html files, scrape via glob (A6)
    pages = pd.read_parquet(os.path.join(corpus_dir, "pages.parquet"))
    wiki = pages[pages.url.str.contains("wiki.example.test")].head(8)
    html_dir = tmp_path / "html"
    html_dir.mkdir()
    for i, row in enumerate(wiki.itertuples()):
        (html_dir / f"page{i}.html").write_bytes(bytes(row.html))
    out = str(tmp_path / "rec2")
    r = subprocess.run(
        [sys.executable, "-m", "swspark", "scrap",
         "--spec", "fulltext", "--glob", str(html_dir / "*.html"),
         "--cpus", "4", "-o", out],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got = _read_csv_dir(out, ["url", "text"])
    assert len(got) == 8

    # single file (A7)
    out3 = str(tmp_path / "rec3")
    r = subprocess.run(
        [sys.executable, "-m", "swspark", "scrap",
         "--spec", "fulltext", "--file", str(html_dir / "page0.html"),
         "--cpus", "2", "-o", out3],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(_read_csv_dir(out3, ["url", "text"])) == 1


def test_cli_crawl_end_to_end(corpus_dir, tmp_path):
    out = str(tmp_path / "rec")
    wh = str(tmp_path / "wh")
    r = subprocess.run(
        [sys.executable, "-m", "swspark", "crawl",
         "--spec", "fandom", "--scenario", "wiki_pages",
         "--seeds", os.path.join(corpus_dir, "seeds.parquet"),
         "--sitemaps", os.path.join(corpus_dir, "sitemaps.parquet"),
         "--robots", os.path.join(corpus_dir, "robots.parquet"),
         "--pages", os.path.join(corpus_dir, "pages.parquet"),
         "--warehouse", wh, "--cpus", "4", "-o", out],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    cols = ["url", "faction", "creature", "tier", "upgraded", "size",
            "attack_type", "range", "dwelling", "cost_per_unit", "growth",
            "attack", "defense", "hit_points", "damage", "initiative",
            "speed", "morale", "destiny", "wave"]
    got = _read_csv_dir(out, cols)
    exp = pd.read_parquet(os.path.join(corpus_dir, "golden_fandom.parquet"))
    assert len(got) == len(exp)
    assert "crawl done" in r.stderr


# --- streaming ---------------------------------------------------------


@pytest.fixture(scope="module")
def pages_stream_dir(spark, corpus_dir, tmp_path_factory):
    """Pages laid out as multiple parquet files (micro-batch food)."""
    d = str(tmp_path_factory.mktemp("stream-in"))
    pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    pages.repartition(6).write.mode("overwrite").parquet(d)
    return d


def test_stream_extract_matches_batch(spark, corpus_dir, pages_stream_dir,
                                      tmp_path):
    from swspark.streaming import run_to_parquet, stream_extract, stream_pages

    stream = stream_pages(spark, pages_stream_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    rec, _urls, _errs = stream_extract(stream, "fulltext")
    out = str(tmp_path / "out")
    run_to_parquet(rec, out, str(tmp_path / "ckpt"))
    got = spark.read.parquet(out)
    exp = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
    assert got.count() == exp.count()
    # byte-identity through the streaming path too
    j = got.alias("g").join(exp.alias("e"), "url").where(
        F.col("g.text") != F.col("e.text")
    )
    assert j.count() == 0


def test_stream_host_rates_watermark(spark, pages_stream_dir, tmp_path):
    from swspark.streaming import run_to_parquet, stream_host_rates, stream_pages

    stream = stream_pages(spark, pages_stream_dir)
    rates = stream_host_rates(stream, window="1 day", watermark="2 days")
    out = str(tmp_path / "rates")
    run_to_parquet(rates, out, str(tmp_path / "ckpt"))
    got = spark.read.parquet(out)
    assert got.where(F.col("n_fetched") <= 0).count() == 0
    hosts = {r.host for r in got.select("host").distinct().collect()}
    assert any(h.startswith("news") for h in hosts)


def test_stateful_host_budget_token_bucket(spark, pages_stream_dir, tmp_path):
    """Token bucket: burst admits, then refill-per-batch caps later
    micro-batches (limiter.rs:19-57 semantics in streaming state)."""
    from swspark.streaming import (
        run_to_parquet,
        stateful_host_budget,
        stream_pages,
    )

    stream = stream_pages(spark, pages_stream_dir, max_files_per_trigger=1)
    admitted = stateful_host_budget(stream, refill_per_batch=3, burst=5)
    out = str(tmp_path / "admit")
    run_to_parquet(admitted, out, str(tmp_path / "ckpt"))
    got = spark.read.parquet(out).toPandas()
    assert set(got.admitted.unique()) <= {0, 1}
    # per host: admissions bounded by burst + refills, and no URL lost
    per_host = got.groupby("host").admitted.agg(["count", "sum"])
    assert (per_host["sum"] <= per_host["count"]).all()
    assert (per_host["sum"] > 0).all()

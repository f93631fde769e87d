"""M1 end-to-end slice (SURVEY.md §7): seed sitemapindex -> urlset ->
accept-filter -> fetch from pages table -> extract -> CSV.

Mirrors reference lifecycle §3.1 steps A1-A4, A10, A9, A12-A19, A8
for a single wave, no seen-set, no politeness.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from swspark.extract.udf import apply_extraction
from swspark.fetch import fetch_pages
from swspark.fixtures import generate_corpus
from swspark.sink import write_csv
from swspark.sitemaps import expand_sitemaps


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus("tiny")


@pytest.fixture(scope="module")
def tables(spark, corpus):
    return {
        "pages": spark.createDataFrame(corpus.pages),
        "sitemaps": spark.createDataFrame(corpus.sitemaps),
        "seeds": spark.createDataFrame(corpus.seeds),
    }


def accept_term_urls(url, kind):
    """urbandict.lua:5-11 as a pushdown-friendly Column expression."""
    return F.when(kind == "URLSET", url.contains("term=")).otherwise(F.lit(True))


def test_m1_end_to_end(spark, corpus, tables, tmp_path):
    seeds = tables["seeds"].where(F.col("scenario") == "dict_sitemap").select(
        F.col("seed").alias("sitemap_url")
    )
    res = expand_sitemaps(spark, seeds, tables["sitemaps"], accept=accept_term_urls)
    assert res.levels == 2  # index -> urlsets
    assert res.errors.count() == 0

    frontier = res.frontier
    n_frontier = frontier.count()
    # all dict term urls (+ dups + 404s), extras rejected by accept
    urls = [r.url for r in frontier.select("url").collect()]
    assert all("term=" in u for u in urls)

    # dedup here is plain distinct (M1 has no seen-set yet)
    distinct_frontier = frontier.select("url").distinct()

    fetched, dl_errs, obs = fetch_pages(distinct_frontier, tables["pages"])
    rec, disc, errs = apply_extraction(fetched, "urbandict")
    out = os.path.join(tmp_path, "records")
    write_csv(rec, out)

    # golden comparison (order-insensitive)
    import pandas as pd

    files = glob.glob(os.path.join(out, "*.csv"))
    got = pd.concat(
        [pd.read_csv(f, header=None, dtype=str, keep_default_na=False)
         for f in files if os.path.getsize(f)],
        ignore_index=True,
    )
    got.columns = ["url", "word", "def_index", "date", "meaning", "example"]
    exp = corpus.golden_urbandict.astype(str)
    key = ["url", "def_index"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s[got_s.columns])

    # flow accounting: pages_out < pages_in iff 404 fixtures exist
    m = obs.get
    assert m["pages_in"] == distinct_frontier.count()
    assert m["pages_in"] - m["pages_out"] == len(corpus.missing_urls)
    assert dl_errs.count() == len(corpus.missing_urls)
    assert errs.count() == 0


def test_m1_wiki_pages_with_discovery(spark, corpus, tables):
    """wiki_pages scenario: seed pages -> extract -> sendUrl feedback
    (A22) -> second wave fetches discovered creatures."""
    seeds = tables["seeds"].where(F.col("scenario") == "wiki_pages").select(
        F.col("seed").alias("url")
    )
    fetched, _, _ = fetch_pages(seeds, tables["pages"])
    rec1, disc1, errs1 = apply_extraction(fetched, "fandom")
    assert rec1.count() == 0  # faction pages produce no records
    assert errs1.count() == 0

    wave2 = disc1.select(F.col("discovered_url").alias("url")).distinct()
    fetched2, dl2, _ = fetch_pages(wave2, tables["pages"])
    assert dl2.count() == 0
    rec2, disc2, errs2 = apply_extraction(fetched2, "fandom")
    assert disc2.count() == 0
    got = rec2.toPandas().sort_values("url").reset_index(drop=True)
    exp = corpus.golden_fandom.sort_values("url").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, exp[got.columns])


def test_sitemap_parse_error_policy(spark, tables):
    """on_xml_error routing (A29): a missing sitemap body and a bad
    XML body produce error rows, not task failures."""
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "sitemap_url": ["https://x.test/nope.xml", "https://x.test/bad.xml"],
            }
        )
    )
    sm = spark.createDataFrame(
        pd.DataFrame(
            {
                "sitemap_url": ["https://x.test/bad.xml"],
                "kind": ["URLSET"],
                "body": [b"<html>not a sitemap</html>"],
            }
        )
    )
    res = expand_sitemaps(spark, bad, sm)
    assert res.frontier.count() == 0
    errs = {r.sitemap_url: r.error for r in res.errors.collect()}
    assert "nope.xml" in " ".join(errs)
    assert any("unexpected sitemap root" in e for e in errs.values())
    with pytest.raises(RuntimeError):
        expand_sitemaps(spark, bad, sm, on_xml_error="fail")

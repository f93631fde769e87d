"""Golden extraction tests over the fixture corpus (SURVEY.md §5
layers 2-3 prerequisites).

- byte-identical full-document inner_text per url (BASELINE.json
  input_hint invariant), checked both in-process and through the
  Spark Arrow-UDF path;
- per-spec records equal the independently generated goldens
  (order-insensitive — reference CSV order is nondeterministic,
  crawler.rs:167);
- sendUrl discovery equals the golden link set (fandom_mmh7.lua:23-28).
"""

import pandas as pd
import pytest

from swspark.extract.dom import Html
from swspark.extract.specs import FANDOM, URBANDICT
from swspark.fixtures import generate_corpus


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus("tiny")


def test_fulltext_byte_identity_inprocess(corpus):
    for _, r in corpus.pages.iterrows():
        got = Html.parse_document(bytes(r.html)).root.inner_text()
        assert got == r.text, f"inner_text mismatch for {r.url}"


def test_urbandict_records_match_golden(corpus):
    got = []
    dict_pages = corpus.pages[corpus.pages.url.str.contains("dict.example.test")]
    for _, r in dict_pages.iterrows():
        recs, urls = URBANDICT.scrap_page(Html.parse_document(bytes(r.html)), r.url)
        assert urls == []
        for rec in recs:
            got.append([r.url] + rec)
    got_df = pd.DataFrame(got, columns=["url", *URBANDICT.fields])
    exp_df = corpus.golden_urbandict
    key = ["url", "def_index"]
    got_df = got_df.sort_values(key).reset_index(drop=True)
    exp_df = exp_df.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_df, exp_df[got_df.columns])


def test_fandom_records_and_urls_match_golden(corpus):
    recs_out, urls_out = [], []
    wiki_pages = corpus.pages[corpus.pages.url.str.contains("wiki.example.test")]
    for _, r in wiki_pages.iterrows():
        recs, urls = FANDOM.scrap_page(Html.parse_document(bytes(r.html)), r.url)
        for rec in recs:
            recs_out.append([r.url] + rec)
        for u in urls:
            urls_out.append((r.url, u))
    got_rec = pd.DataFrame(recs_out, columns=["url", *FANDOM.fields]).sort_values(
        "url").reset_index(drop=True)
    exp_rec = corpus.golden_fandom.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_rec, exp_rec[got_rec.columns])

    got_urls = pd.DataFrame(urls_out, columns=["url", "discovered_url"]).sort_values(
        ["url", "discovered_url"]).reset_index(drop=True)
    exp_urls = corpus.golden_fandom_urls.sort_values(
        ["url", "discovered_url"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_urls, exp_urls)


def test_fulltext_byte_identity_spark_udf(spark, corpus):
    """The same invariant through the distributed path: pages ->
    Arrow UDF -> records; every row must round-trip byte-identically."""
    from pyspark.sql import functions as F

    from swspark.extract.udf import apply_extraction

    pdf = corpus.pages[["url", "html", "text"]].copy()
    df = spark.createDataFrame(pdf)
    rec, _urls, errs = apply_extraction(df, "fulltext")
    assert errs.count() == 0
    joined = rec.alias("r").join(df.alias("p"), "url").where(
        F.col("r.text") != F.col("p.text")
    )
    assert joined.count() == 0
    assert rec.count() == len(pdf)


def test_sitemap_fixture_shape(corpus):
    sm = corpus.sitemaps
    assert (sm.kind == "INDEX").sum() == 1
    idx = sm[sm.kind == "INDEX"].iloc[0]
    assert idx.sitemap_url.endswith(".xml.gz")
    import gzip

    body = gzip.decompress(bytes(idx.body))
    assert b"<sitemapindex" in body
    urlsets = sm[sm.kind == "URLSET"]
    assert len(urlsets) == 12  # 4 dict + 8 news
    assert all(b"<urlset" in bytes(b) for b in urlsets.body)


def test_robots_fixture_shape(corpus):
    rb = corpus.robots
    assert set(rb.crawl_delay.unique()) == {0.5, 1.0, 2.0}
    assert all("User-agent: SWSbot" in b for b in rb.body)
    assert all("Sitemap:" in b for b in rb.body)

"""Durable Bloom-shard delta tests: fixed-geometry merge, resume
loads shards instead of rebuilding, geometry mismatch falls back."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_fixed_geometry_delta_merge(spark):
    from swspark.seen import build_filter_shards, load_shards

    a = spark.createDataFrame([(i,) for i in range(0, 200)], "url_hash long")
    b = spark.createDataFrame([(i,) for i in range(200, 400)], "url_hash long")
    sh_a = build_filter_shards(a, 4, fixed_bits=1 << 14, fixed_k=5)
    sh_b = build_filter_shards(b, 4, fixed_bits=1 << 14, fixed_k=5)
    merged = load_shards(sh_a.unionByName(sh_b))
    h = np.arange(400, dtype=np.int64)
    buckets = np.mod(h, 4)
    for bkt in range(4):
        assert merged[bkt].contains_many(h[buckets == bkt]).all()


def test_geometry_mismatch_raises(spark):
    from swspark.seen import build_filter_shards, load_shards

    a = spark.createDataFrame([(i,) for i in range(0, 50)], "url_hash long")
    sh1 = build_filter_shards(a, 2, fixed_bits=1 << 12, fixed_k=3)
    sh2 = build_filter_shards(a, 2, fixed_bits=1 << 13, fixed_k=3)
    with pytest.raises(ValueError, match="geometry"):
        load_shards(sh1.unionByName(sh2))


def test_resume_uses_persisted_shards(spark, tmp_path):
    from swspark.driver import CrawlConfig, CrawlState, _rebuild_blooms, crawl
    from swspark.fixtures import generate_corpus

    c = generate_corpus("tiny")
    T = dict(
        pages=spark.createDataFrame(c.pages),
        sitemaps=spark.createDataFrame(c.sitemaps),
        robots=spark.createDataFrame(c.robots[["host", "body"]]),
        seeds=spark.createDataFrame(c.seeds),
    )
    cfg = CrawlConfig(spec="fandom", max_waves=2)
    crawl(
        spark, cfg, str(tmp_path), T["seeds"].where(F.col("scenario") == "wiki_pages"),
        T["sitemaps"], T["robots"], T["pages"],
    )
    state = CrawlState(str(tmp_path))
    assert state.shards.exists()
    lin = state.shards.manifest()["lineage"]
    assert lin["geometry"] == [cfg.bloom_bits_per_bucket, cfg.bloom_k]
    assert lin["seen_version"] == state.seen.current_version()

    # resume path: blooms come from the shard table and agree with the
    # exact seen set (no false negatives)
    seen_df = state.seen.read(spark)
    blooms = _rebuild_blooms(spark, state, seen_df, cfg,
                             cfg.bloom_bits_per_bucket, cfg.bloom_k)
    hashes = np.array([r.url_hash for r in seen_df.collect()], dtype=np.int64)
    buckets = np.mod(hashes, cfg.n_seen_buckets)
    buckets = np.where(buckets < 0, buckets + cfg.n_seen_buckets, buckets)
    for b in np.unique(buckets):
        assert blooms[int(b)].contains_many(hashes[buckets == b]).all()

    # geometry bump -> fallback rebuild still yields valid blooms
    cfg2 = CrawlConfig(spec="fandom", bloom_bits_per_bucket=1 << 18)
    blooms2 = _rebuild_blooms(spark, state, seen_df, cfg2,
                              cfg2.bloom_bits_per_bucket, cfg2.bloom_k)
    for b in np.unique(buckets):
        assert blooms2[int(b)].contains_many(hashes[buckets == b]).all()
        assert blooms2[int(b)].m == 1 << 18

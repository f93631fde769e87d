"""URL-seen set: partitioned Bloom + cuckoo filters over an exact
seen table.

The reference has **no** seen structure — sws happily fetches a URL
twice if two sitemaps or sendUrl repeat it (verified absence in
crates/sws-crawler/; SURVEY.md §2 Part B). The north rule introduces
one for 10^10-URL scale:

- exact truth: a ``seen(url_hash, url, wave)`` table hash-bucketed by
  ``pmod(url_hash, n_buckets)`` (storage-partitioned so the exact
  anti-join never shuffles the big side);
- fast path: one Bloom filter per bucket (no false negatives ->
  a candidate that misses is **definitely new** and skips the join);
- deletion/compaction path: a cuckoo filter per bucket (supports
  delete; used when URLs are evicted for re-crawl);
- only Bloom-positive candidates reach the exact ``left_anti`` join,
  so at steady state the join input is ~fpp x |candidates| + true dups.

Filters are numpy bit/bucket arrays serialized to bytes, stored as
checkpoint artifacts keyed by (bucket, version) and rebuilt
incrementally: a wave only rebuilds the buckets it inserted into
(SURVEY.md §4, §7 risk 3). All per-row work is vectorized numpy
inside Arrow UDFs / applyInPandas — no per-row Python.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from swspark import urlnorm
from swspark.planmemo import memoize_plan

# --- hashing ----------------------------------------------------------

_MASK64 = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — derives independent hash streams from
    the 64-bit url_hash (public-domain algorithm)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def _hash_pair(url_hash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h = url_hash.astype(np.uint64)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h ^ np.uint64(0xDEADBEEFCAFEF00D)) | np.uint64(1)
    return h1, h2


# --- Bloom filter -------------------------------------------------------


class BloomFilter:
    """Plain m-bit / k-hash Bloom filter with double hashing
    (h1 + i*h2), vectorized add/contains over numpy arrays."""

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = (
            bits if bits is not None else np.zeros((self.m + 7) // 8, dtype=np.uint8)
        )

    @classmethod
    def sized_for(cls, n: int, fpp: float = 0.01) -> "BloomFilter":
        n = max(n, 1)
        m = max(8, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _positions(self, url_hash: np.ndarray) -> np.ndarray:
        h1, h2 = _hash_pair(url_hash)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add_many(self, url_hash: np.ndarray) -> None:
        if len(url_hash) == 0:
            return
        pos = self._positions(np.asarray(url_hash)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, url_hash: np.ndarray) -> np.ndarray:
        if len(url_hash) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(url_hash))
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, m: int, k: int, data: bytes) -> "BloomFilter":
        return cls(m, k, np.frombuffer(data, dtype=np.uint8).copy())

    def merge(self, other: "BloomFilter") -> None:
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)


# --- Cuckoo filter --------------------------------------------------------


class CuckooFilter:
    """Cuckoo filter: 4-slot buckets, 16-bit fingerprints, 2 candidate
    buckets (partial-key cuckoo hashing). Supports delete — the
    compaction/re-crawl path Bloom can't serve."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        # power-of-two bucket count for cheap alt-bucket XOR math
        self.n_buckets = 1 << (int(n_buckets) - 1).bit_length()
        self.table = (
            table
            if table is not None
            else np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
        )
        self._rng = np.random.default_rng(42)

    @classmethod
    def sized_for(cls, n: int, load: float = 0.84) -> "CuckooFilter":
        return cls(max(1, int(math.ceil(n / (cls.SLOTS * load)))))

    def _fp_and_index(self, url_hash: np.ndarray):
        h1, h2 = _hash_pair(np.asarray(url_hash))
        fp = (h2 & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 = empty slot
        i1 = (h1 % np.uint64(self.n_buckets)).astype(np.int64)
        return fp, i1

    def _alt_index(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        salt = _splitmix64(fp.astype(np.uint64))
        return ((i.astype(np.uint64) ^ salt) % np.uint64(self.n_buckets)).astype(
            np.int64
        )

    def insert_many(self, url_hash: np.ndarray) -> int:
        """Insert; returns number of items that failed (filter full)."""
        fp, i1 = self._fp_and_index(url_hash)
        failed = 0
        for f, i in zip(fp, i1):
            if not self._insert_one(int(f), int(i)):
                failed += 1
        return failed

    def _insert_one(self, fp: int, i1: int) -> bool:
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        i = i1 if self._rng.integers(2) else i2
        cur = np.uint16(fp)
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            cur, self.table[i, slot] = self.table[i, slot], cur
            i = int(
                self._alt_index(np.array([i]), np.array([cur], dtype=np.uint16))[0]
            )
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False

    def contains_many(self, url_hash: np.ndarray) -> np.ndarray:
        if len(url_hash) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_and_index(url_hash)
        i2 = self._alt_index(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, url_hash: np.ndarray) -> int:
        """Delete one copy of each; returns count actually deleted."""
        fp, i1 = self._fp_and_index(url_hash)
        i2 = self._alt_index(i1, fp)
        deleted = 0
        for f, a, b in zip(fp, i1, i2):
            done = False
            for i in (int(a), int(b)):
                row = self.table[i]
                hit = np.nonzero(row == f)[0]
                if len(hit):
                    row[hit[0]] = 0
                    deleted += 1
                    done = True
                    break
            if not done:
                pass
        return deleted

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, n_buckets: int, data: bytes) -> "CuckooFilter":
        t = np.frombuffer(data, dtype=np.uint16).copy().reshape(-1, cls.SLOTS)
        return cls(n_buckets, t)


# --- distributed seen-set ---------------------------------------------------

SHARD_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("n_items", LongType()),
        StructField("m_bits", LongType()),
        StructField("k", IntegerType()),
        StructField("bloom", BinaryType()),
        StructField("cuckoo_buckets", LongType()),
        StructField("cuckoo", BinaryType()),
    ]
)


@memoize_plan
def with_url_identity(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Attach canonical url_hash + bucket-ready identity columns."""
    canon = urlnorm.canonicalize(F.col(url_col))
    return df.withColumn("url_canon", canon).withColumn(
        "url_hash", F.xxhash64(F.col("url_canon"))
    )


def bucket_of(url_hash: F.Column, n_buckets: int) -> F.Column:
    return F.pmod(url_hash, F.lit(n_buckets)).cast("int")


def build_filter_shards(
    seen: DataFrame, n_buckets: int, fpp: float = 0.01,
    fixed_bits: int | None = None, fixed_k: int | None = None,
) -> DataFrame:
    """Build per-bucket Bloom+cuckoo shards from the exact seen table.

    With ``fixed_bits``/``fixed_k`` the Bloom geometry is pinned so
    per-wave delta shards are OR-mergeable with prior shards (the
    incremental checkpoint path); otherwise each shard is sized for
    its own cardinality (full-rebuild path).

    seen must have column ``url_hash``. One groupBy(bucket) shuffle,
    then a single pass per group — O(|seen|/n_buckets) memory each.
    """
    sized = seen.select(
        "url_hash", bucket_of(F.col("url_hash"), n_buckets).alias("bucket")
    )

    def _build(key, pdf):
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        if fixed_bits is not None:
            bf = BloomFilter(fixed_bits, fixed_k or 7)
        else:
            bf = BloomFilter.sized_for(len(h), fpp)
        bf.add_many(h)
        cf = CuckooFilter.sized_for(len(h))
        cf.insert_many(h)
        return pd.DataFrame(
            {
                "bucket": [key[0]],
                "n_items": [len(h)],
                "m_bits": [bf.m],
                "k": [bf.k],
                "bloom": [bf.to_bytes()],
                "cuckoo_buckets": [cf.n_buckets],
                "cuckoo": [cf.to_bytes()],
            }
        )

    return sized.groupBy("bucket").applyInPandas(_build, SHARD_SCHEMA)


def load_shards(shards_df: DataFrame) -> dict[int, BloomFilter]:
    """Collect shard rows into a {bucket: BloomFilter} dict, OR-merging
    rows of the same bucket (per-wave delta shards with identical
    geometry). Total size ~ 1.2 bytes/URL at fpp=0.01 — for truly
    10^10-scale runs the UDF would mmap shard files instead of
    broadcasting; interface unchanged."""
    out: dict[int, BloomFilter] = {}
    for r in shards_df.collect():
        bf = BloomFilter.from_bytes(r.m_bits, r.k, bytes(r.bloom))
        prev = out.get(r.bucket)
        if prev is None:
            out[r.bucket] = bf
        elif prev.m == bf.m and prev.k == bf.k:
            prev.merge(bf)
        else:  # geometry changed (config bump) -> caller rebuilds
            raise ValueError(
                f"bloom shard geometry mismatch in bucket {r.bucket}: "
                f"({prev.m},{prev.k}) vs ({bf.m},{bf.k})"
            )
    return out


def bloom_geometry(
    expected_urls: int, n_buckets: int, fpp: float = 0.01
) -> tuple[int, int]:
    """Derive (bits_per_bucket, k) from the EXPECTED total URL count —
    the 10^10-scale knob. A fixed 2^20-bit default holds ~10^6 URLs
    per bucket at fpp 0.01 and silently saturates (FPR -> 1) beyond
    that; sizing from cardinality keeps the discovery fast path
    meaningful at any scale. Bits are rounded up to a power of two so
    per-wave delta shards stay OR-mergeable under one geometry."""
    n = max(1, expected_urls // max(1, n_buckets))
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m_bits = 1 << max(13, (m - 1).bit_length())
    k = max(1, round(m_bits / n * math.log(2)))
    return m_bits, min(k, 16)


def write_shard_files(
    blooms: dict[int, BloomFilter], shard_dir: str,
    buckets: "set[int] | None" = None,
) -> dict[int, tuple[int, int, str]]:
    """Persist shard bitmaps as raw files for the mmap read path
    (``buckets`` limits the rewrite to this wave's touched shards).
    At 10^10 URLs the full filter set is ~1.2 GB/10^10 x fpp terms —
    too big to broadcast per wave; executors mmap the files instead
    (shard_dir must be cluster-visible: NFS/EFS/alluxio or a
    node-local sync). Atomic per file (write-tmp + rename)."""
    import uuid as _uuid

    os.makedirs(shard_dir, exist_ok=True)
    meta: dict[int, tuple[int, int, str]] = {}
    for b, bf in blooms.items():
        path = os.path.join(shard_dir, f"bloom_{b:05d}.bits")
        if buckets is None or b in buckets or not os.path.exists(path):
            tmp = path + f".tmp-{_uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as fh:
                fh.write(bf.to_bytes())
            os.replace(tmp, path)
        meta[b] = (bf.m, bf.k, path)
    return meta


_MMAP_CACHE: dict[tuple[str, float], np.ndarray] = {}


def _mmap_bits(path: str) -> np.ndarray:
    """Per-executor-process mmap cache keyed by (path, mtime): a
    rewritten shard is re-mapped, an unchanged one costs nothing
    (pages stay in the OS cache across waves)."""
    mtime = os.path.getmtime(path)
    key = (path, mtime)
    arr = _MMAP_CACHE.get(key)
    if arr is None:
        # evict only stale epochs of THIS shard; other buckets' live
        # mappings stay cached (clearing everything would re-memmap
        # every probed shard each batch whenever any one shard moved)
        for stale in [k for k in _MMAP_CACHE if k[0] == path]:
            del _MMAP_CACHE[stale]
        arr = np.memmap(path, dtype=np.uint8, mode="r")
        _MMAP_CACHE[key] = arr
    return arr


def make_maybe_seen_udf(
    spark: SparkSession,
    blooms: dict[int, BloomFilter],
    n_buckets: int,
    shard_dir: str | None = None,
    touched_buckets: "set[int] | None" = None,
):
    """Vectorized 'maybe seen' probe. Two transports for the shard
    bitmaps: broadcast bytes (default; fine to ~100s of MB) or mmap
    files under ``shard_dir`` (the 10^10 path — only (m, k, path)
    triples ship with the closure; executors map pages on demand).
    ``touched_buckets`` limits the shard-file rewrite to the buckets
    this wave's delta actually modified (None = write everything —
    the first call of a session, when on-disk files may be stale):
    at 10^10 scale a full rewrite is multi-GB of driver IO per wave
    and bumps every mtime, forcing executors to re-map all shards."""
    if shard_dir is not None:
        meta = write_shard_files(blooms, shard_dir, buckets=touched_buckets)
        bc = spark.sparkContext.broadcast(meta)

        @F.pandas_udf("boolean")
        def maybe_seen(url_hash: pd.Series) -> pd.Series:
            h = url_hash.to_numpy(dtype=np.int64)
            buckets = np.mod(h, n_buckets)
            buckets = np.where(buckets < 0, buckets + n_buckets, buckets)
            out = np.zeros(len(h), dtype=bool)
            for b in np.unique(buckets):
                ent = bc.value.get(int(b))
                if ent is None:
                    continue
                m, k, path = ent
                bf = BloomFilter(m, k, _mmap_bits(path))
                mask = buckets == b
                out[mask] = bf.contains_many(h[mask])
            return pd.Series(out)

        return maybe_seen

    bc = spark.sparkContext.broadcast(
        {b: (f.m, f.k, f.to_bytes()) for b, f in blooms.items()}
    )

    @F.pandas_udf("boolean")
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        shards = {
            b: BloomFilter.from_bytes(m, k, d) for b, (m, k, d) in bc.value.items()
        }
        h = url_hash.to_numpy(dtype=np.int64)
        buckets = np.mod(h, n_buckets)
        buckets = np.where(buckets < 0, buckets + n_buckets, buckets)
        out = np.zeros(len(h), dtype=bool)
        for b in np.unique(buckets):
            bf = shards.get(int(b))
            if bf is None:
                continue
            mask = buckets == b
            out[mask] = bf.contains_many(h[mask])
        return pd.Series(out)

    return maybe_seen


@memoize_plan
def filter_new_urls(
    spark: SparkSession,
    candidates: DataFrame,
    seen: "DataFrame | list[DataFrame]",
    blooms: dict[int, BloomFilter] | None,
    n_buckets: int,
    shard_dir: str | None = None,
    touched_buckets: "set[int] | None" = None,
) -> DataFrame:
    """Return candidates not in the seen set.

    Fast path: Bloom 'definitely new' rows skip the join entirely
    (bitmaps via broadcast or, at scale, mmap files — ``shard_dir``).
    Slow path: Bloom-positive rows take exact ``left_anti`` joins on
    url_hash+url_canon (hash-first keeps the join key narrow; the url
    equality guards against xxhash64 collisions at 10^10 scale).

    ``seen`` may be a list of parts from SnapshotTable.read_split:
    part 0 is the bucketed compacted base — its anti-join is a
    sort-merge that shuffles ONLY the (wave-sized) suspect side, the
    10^10-row base streams from its bucket files — and later parts
    are recent per-wave deltas, joined broadcast.
    candidates must carry url_hash/url_canon (with_url_identity).
    """
    if blooms:
        maybe_seen = make_maybe_seen_udf(spark, blooms, n_buckets,
                                         shard_dir=shard_dir,
                                         touched_buckets=touched_buckets)
        flagged = candidates.withColumn("_maybe", maybe_seen(F.col("url_hash")))
        definitely_new = flagged.where(~F.col("_maybe")).drop("_maybe")
        suspects = flagged.where(F.col("_maybe")).drop("_maybe")
    else:
        definitely_new = candidates.limit(0)
        suspects = candidates
    parts = seen if isinstance(seen, list) else [seen]
    confirmed_new = suspects
    for i, part in enumerate(parts):
        rhs = part.select("url_hash", "url_canon")
        if i > 0:
            rhs = F.broadcast(rhs)  # delta parts are wave-sized
        confirmed_new = confirmed_new.join(
            rhs, ["url_hash", "url_canon"], "left_anti"
        )
    return definitely_new.unionByName(confirmed_new)

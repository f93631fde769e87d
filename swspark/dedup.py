"""Deduplication operators for web-scale corpora.

Five strategies over a documents table (doc_id, text, ...), each a
different point on the exactness/cost curve:

- exact          : hash-groupBy on a content fingerprint (1 shuffle)
- ngram_jaccard  : exact Jaccard over character shingles via an
                   inverted-index self-join (ground truth for the
                   approximate methods; SQL-expressible -> oracle)
- minhash_lsh    : shingle -> minhash signature -> band-bucket join ->
                   Jaccard verify; the 100 TB scale path — candidate
                   pairs ~ O(true dups), never O(n^2)
- simhash        : 64-bit simhash, near-dup = Hamming <= k via
                   band-equality blocking
- embedding      : cosine near-dup via random-hyperplane LSH blocking
                   (swspark.simsearch supplies the primitives)

All heavy lifting is built-in (explode / groupBy / join / HOFs);
minhash signatures are computed with nested JVM higher-order
functions — no Python in the hot path. Pair outputs are canonical
(doc_a < doc_b) for order-insensitive comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(text: Column) -> Column:
    """Shared normalization for fingerprints/shingles: lowercase,
    collapse non-alnum runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text (JVM HOFs).

    Texts shorter than n yield an empty set: Spark's sequence(1, 0) is
    the *descending* [1, 0], not empty like SQL generate_series, so the
    range is gated on length >= n to match the DuckDB oracle."""
    t = normalized_text(text)
    idx = F.when(
        F.length(t) >= n, F.sequence(F.lit(1), F.length(t) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.substring(t, i, n))
    return F.array_distinct(grams)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents:
    (fingerprint, keep_id, dup_ids, n). One shuffle, map-side partial
    aggregation for free."""
    fp = F.md5(normalized_text(F.col(text_col)))
    return (
        docs.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("all_ids"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard-similar pairs via inverted-index self-join.

    Plan shape: explode shingles -> self-join on shingle (co-occurrence
    counts) -> join per-doc sizes -> filter. The shingle join is the
    scale bottleneck (hot shingles fan out); minhash_lsh_pairs is the
    production path — this is the oracle-checked ground truth.
    """
    sized = docs.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("sz", F.size("sh"))
    inv = sized.select("id", F.explode("sh").alias("g"))
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), "g")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sized.select("id", "sz")
    out = (
        pairs.join(sizes.withColumnsRenamed({"id": "doc_a", "sz": "sz_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"id": "doc_b", "sz": "sz_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def minhash_signature(text: Column, k: int = 64, n: int = 5) -> Column:
    """k-perm minhash signature as array<bigint>: for seed i, min over
    shingles of xxhash64(shingle, i). Nested HOFs — fully JVM-side.
    NOTE: reference semantics only — Catalyst's projection collapse
    re-evaluates the shingle array per permutation, so this is O(k)
    array builds per row; the production path is make_minhash_udf."""
    sh = char_shingles(text, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(F.transform(sh, lambda g: F.xxhash64(g, i))),
    )


def make_minhash_udf(k: int = 64):
    """Vectorized k-perm minhash from JVM shingle hashes (the
    simhash64_fast pattern, measured ~40x at 10^6 docs): the shingle
    set hashes ONCE JVM-side (xxhash64 per gram), then one Arrow batch
    op derives all k permutations via multiply-shift universal hashing
    sig_i = min_j (a_i * h_j + b_i mod 2^64), a_i odd — instead of k
    codegen'd array_min(transform(...)) passes that each rebuild the
    shingle array. Constants are fixed-seed so signatures are
    engine-stable across sessions."""
    rng = np.random.default_rng(0x5357)
    a = (rng.integers(1, 2**62, size=k, dtype=np.uint64) << np.uint64(1)) | (
        np.uint64(1)
    )
    b = rng.integers(0, 2**63, size=k, dtype=np.uint64)
    sentinel = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def minhash_from_hashes(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(sentinel)
                continue
            hv = np.asarray(h, dtype=np.int64).astype(np.uint64)
            m = (a[:, None] * hv[None, :] + b[:, None]).min(axis=1)
            out.append(m.astype(np.int64))
        return pd.Series(out)

    return minhash_from_hashes


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 64,
    bands: int = 16,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates_out: dict | None = None,
) -> DataFrame:
    """MinHash + LSH near-dup pairs, Jaccard-verified.

    bands x rows = k; with k=64, bands=16 (rows=4) the S-curve gives
    ~0.99 recall at J=0.8. Candidate generation: hash each band to a
    bucket, explode (doc -> bands rows), groupBy bucket -> pairs.
    Verification joins back the shingle sets and computes exact
    Jaccard, so false positives cost only the verify join.
    """
    rows = k // bands
    base = docs.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), n).alias("sh"),
    ).withColumn(
        # JVM hashes each shingle once; one Arrow op derives all k
        # permutations (see make_minhash_udf — the HOF variant paid an
        # O(k) projection-collapse re-evaluation of the shingle array)
        "sig",
        make_minhash_udf(k)(
            F.transform(F.col("sh"), lambda g: F.xxhash64(g))
        ),
    ).persist()
    # persist is load-bearing here (measured 24x): the banding join
    # and the Jaccard-verify join consume `base` under DIFFERENT keys,
    # so exchange reuse cannot kick in and the 64-permutation
    # signature would otherwise recompute per consumer. Spark's
    # ContextCleaner releases the cache when the returned plan is
    # GC'd; long-lived callers can also unpersist via the plan's
    # cached ancestor.

    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = base.select("id", "sig", band_idx).select(
        "id",
        "band",
        F.xxhash64(
            F.col("band"), F.slice(F.col("sig"), F.col("band") * rows + 1, rows)
        ).alias("bucket"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    if candidates_out is not None:
        # scale-telemetry hook (tools/bench_dedup_scale.py): expose the
        # pre-verification candidate set so the O(true dups) claim can
        # be measured, not just argued from the banding construction
        candidates_out["candidates"] = cand
    sh = base.select("id", "sh")
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "doc_a", "sh": "sh_a"}), "doc_a")
        .join(sh.withColumnsRenamed({"id": "doc_b", "sh": "sh_b"}), "doc_b")
        .withColumn(
            "inter", F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def simhash64(text: Column, n: int = 5) -> Column:
    """64-bit SimHash of the shingle set: bit j of the result is the
    sign of sum over shingles of (+1/-1 per shingle-hash bit j).
    Expressed with JVM HOFs — one aggregate per bit, unrolled in
    Python because shift amounts must be literals."""
    sh = char_shingles(text, n)
    hashes = F.transform(sh, lambda g: F.xxhash64(g))
    def _vote(hs, j):
        # closure (not default-arg) — pyspark inspects lambda arity
        return F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda a, h: a
            + (
                F.shiftrightunsigned(h, j).bitwiseAND(F.lit(1)).cast("long") * 2
                - 1
            ),
        )

    terms = []
    for j in range(64):
        vote = _vote(hashes, j)
        bit_value = F.lit(-(2**63) if j == 63 else (1 << j)).cast("long")
        terms.append(
            F.when(vote > 0, bit_value).otherwise(F.lit(0).cast("long"))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def make_simhash_udf():
    """Vectorized SimHash bit-vote: array<bigint> shingle hashes (from
    JVM xxhash64, so sketches stay engine-stable) -> 64-bit simhash.
    Output-identical to :func:`simhash64` (pytest-pinned) but one
    Arrow batch op instead of 64 codegen'd aggregate passes — the
    64-aggregate plan costs seconds of compile/codegen alone and
    bloats whole-stage codegen at scale."""

    @F.pandas_udf("long")
    def simhash_from_hashes(hashes: pd.Series) -> pd.Series:
        j = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        out = np.zeros(len(hashes), dtype=np.int64)
        for i, h in enumerate(hashes):
            if h is None or len(h) == 0:
                continue
            a = np.asarray(h, dtype=np.int64).astype(np.uint64)
            bits = (a[:, None] >> j) & one  # (n_shingles, 64)
            votes = 2 * bits.sum(axis=0).astype(np.int64) - len(a)
            word = ((one << j)[votes > 0]).sum(dtype=np.uint64)
            out[i] = word.astype(np.int64)
        return pd.Series(out)

    return simhash_from_hashes


def simhash64_fast(text: Column, n: int = 5) -> Column:
    """SimHash via JVM shingle hashing + numpy bit-vote (identical
    values to simhash64; see make_simhash_udf)."""
    sh = char_shingles(text, n)
    hashes = F.transform(sh, lambda g: F.xxhash64(g))
    return make_simhash_udf()(hashes)


# Above this corpus size the 64-bit/16-bit-band blocking saturates:
# random band collisions grow as 4n^2/2^16, measured cand/true = 3,084
# at 10^6 docs (tools/bench_dedup_scale.py, BENCH.md r4). The wide
# (128-bit, 32-bit-band) path measured 1.05/1.48 at 10^6/10^7.
SIMHASH64_DOC_CEILING = 200_000


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates_out: dict | None = None,
    scale: str = "auto",
    approx_count: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocking: split the hash into (max_hamming + 1) bands — by
    pigeonhole, any pair within the distance agrees on at least one
    full band, so a band-equality join finds all of them without n^2
    COMPARISONS. The 64-bit sketch's 16-bit bands still go quadratic
    in CANDIDATES past ~10^6 docs (4n^2/2^16 random band collisions;
    measured cand/true = 3,084 at 10^6 — BENCH.md r4), so corpus-scale
    runs must use the 128-bit wide path (simhash_pairs_wide, 32-bit
    bands, measured 1.05/1.48 cand/true at 10^6/10^7, recall 1.0).

    ``scale`` picks the path: "auto" (default) counts the docs
    (or trusts ``approx_count``) and escalates to the wide sketch
    above SIMHASH64_DOC_CEILING; "64" / "wide" force one. The wide
    path fixes max_hamming = 3 (its band layout), matching the
    default here.
    """
    if scale == "auto":
        n = approx_count if approx_count is not None else docs.count()
        scale = "wide" if n > SIMHASH64_DOC_CEILING else "64"
    if scale == "wide":
        if max_hamming != 3:
            raise ValueError(
                "simhash_pairs(scale='wide') supports max_hamming=3 "
                "only (4 x 32-bit bands); pass scale='64' to force "
                "the small-corpus sketch"
            )
        return simhash_pairs_wide(
            docs, id_col=id_col, text_col=text_col,
            candidates_out=candidates_out,
        )
    sims = docs.select(
        F.col(id_col).alias("id"), simhash64_fast(F.col(text_col)).alias("sim")
    ).persist()  # compute the sketch once for both self-join sides;
    # the cache is released by ContextCleaner when the plan is GC'd
    return simhash_pairs_from_sketches(sims, max_hamming,
                                       candidates_out=candidates_out)


def simhash_pairs_from_sketches(
    sims: DataFrame, max_hamming: int = 3,
    candidates_out: dict | None = None,
) -> DataFrame:
    """Pigeonhole band blocking over precomputed (id, sim) sketches —
    the sketch-level half of :func:`simhash_pairs`, separable so
    planted-perturbation oracles can flip known sketch bits and assert
    exact recovered distances."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    mask = (1 << width) - 1
    band_keys = F.array(
        *[
            F.shiftrightunsigned(F.col("sim"), b * width).bitwiseAND(F.lit(mask))
            for b in range(n_bands)
        ]
    )
    banded = sims.select(
        "id", "sim", F.posexplode(band_keys).alias("band", "key")
    )
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .distinct()
    )
    if candidates_out is not None:
        candidates_out["candidates"] = pairs.select("doc_a", "doc_b")
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_pairs_wide(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates_out: dict | None = None,
) -> DataFrame:
    """128-bit SimHash near-dup pairs at Hamming <= 3 — the 10^6+ scale
    path (measured, tools/bench_dedup_scale.py): the 64-bit sketch's
    pigeonhole bands are only 16 bits wide, so incidental band
    collisions grow ~ 4 x n^2 / 2^16 and the candidate set saturates
    around 10^6 docs. Two independent 64-bit sketches (seeded shingle
    hashes -> same numpy bit-vote) give 4 bands of 32 bits: collisions
    shrink by 2^16 while pigeonhole recall stays exact (3 flips can
    touch at most 3 of 4 bands). Hamming distance is over all 128
    hyperplanes, so <= 3 is a proportionally stricter similarity
    threshold than the 64-bit operator's.
    """
    sh = char_shingles(F.col(text_col))
    h0 = F.transform(sh, lambda g: F.xxhash64(g))
    h1 = F.transform(sh, lambda g: F.xxhash64(g, F.lit(1)))
    udf = make_simhash_udf()
    sims = docs.select(
        F.col(id_col).alias("id"), udf(h0).alias("s0"), udf(h1).alias("s1")
    ).persist()
    return simhash_pairs_wide_from_sketches(sims, candidates_out)


def simhash_pairs_wide_from_sketches(
    sims: DataFrame, candidates_out: dict | None = None
) -> DataFrame:
    """Banding half of :func:`simhash_pairs_wide` over precomputed
    (id, s0, s1) sketch pairs (separable for planted-bit oracles)."""
    mask = (1 << 32) - 1

    def band(b: int) -> Column:
        w = F.col("s0") if b < 2 else F.col("s1")
        return F.shiftrightunsigned(w, (b % 2) * 32).bitwiseAND(F.lit(mask))

    banded = sims.select(
        "id", "s0", "s1",
        F.posexplode(F.array(*[band(b) for b in range(4)])).alias(
            "band", "key"
        ),
    )
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.s0").alias("s0a"), F.col("a.s1").alias("s1a"),
            F.col("b.s0").alias("s0b"), F.col("b.s1").alias("s1b"),
        )
        .distinct()
    )
    if candidates_out is not None:
        candidates_out["candidates"] = pairs.select("doc_a", "doc_b")
    hamming = F.bit_count(
        F.col("s0a").bitwiseXOR(F.col("s0b"))
    ) + F.bit_count(F.col("s1a").bitwiseXOR(F.col("s1b")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
    )

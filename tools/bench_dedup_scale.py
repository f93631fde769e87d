"""Scale probe for the dedup family (VERDICT r3 #4): measure — not
argue — the "candidates ~ O(true dups)" claim at 10^6-10^7 docs.

Synthesizes documents fully JVM-side (no driver data): doc i's text is
20 deterministic pseudo-random "words"; every id with id % 100 == 1 is
a planted near-duplicate of id-1 (same 20 words + 1 extra word,
Jaccard ~ 0.95) for the minhash probe, or an exact copy for the
simhash probe. True-dup count is therefore closed-form (~n/100).

Per (op, n): candidate-pair count, verified/recovered pair count,
planted recall, wall time. One JSON line per run; summarize into
BENCH.md by hand or via --md.

Usage:  python tools/bench_dedup_scale.py --sizes 1000000,10000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_docs(spark: SparkSession, n: int, exact_dups: bool) -> DataFrame:
    """n docs, ~1% planted dups of the preceding id (JVM-only build)."""
    base = spark.range(n).withColumn(
        "src_id",
        F.when((F.col("id") % 100 == 1) & (F.col("id") > 0),
               F.col("id") - 1).otherwise(F.col("id")),
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda i: F.conv(
            F.abs(F.xxhash64(F.col("src_id") * 997 + i)).cast("string"),
            10, 36,
        ),
    )
    text = F.concat_ws(" ", words)
    if not exact_dups:
        # near-dup: planted copies append one extra unique word
        text = F.when(
            F.col("id") != F.col("src_id"),
            F.concat_ws(
                " ", F.concat_ws(" ", words),
                F.conv(F.abs(F.xxhash64(F.col("id"))).cast("string"), 10, 36),
            ),
        ).otherwise(text)
    return base.select(F.col("id").alias("doc_id"), text.alias("text"))


def probe_minhash(spark, n: int) -> dict:
    from swspark.dedup import minhash_lsh_pairs

    docs = synth_docs(spark, n, exact_dups=False)
    out: dict = {}
    t0 = time.perf_counter()
    verified = minhash_lsh_pairs(docs, threshold=0.8, candidates_out=out)
    cand = out["candidates"].persist()
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0
    ver = verified.persist()
    n_ver = ver.count()
    planted_found = ver.where(
        (F.col("doc_b") - F.col("doc_a") == 1) & (F.col("doc_b") % 100 == 1)
    ).count()
    t_total = time.perf_counter() - t0
    true_planted = (n - 2) // 100 + 1 if n > 1 else 0
    cand.unpersist()
    ver.unpersist()
    return {
        "op": "minhash_lsh", "n_docs": n, "candidates": n_cand,
        "verified_pairs": n_ver, "planted_found": planted_found,
        "true_planted": true_planted,
        "recall": round(planted_found / max(1, true_planted), 4),
        "cand_per_true_dup": round(n_cand / max(1, true_planted), 2),
        "sec_candidates": round(t_cand, 1), "sec_total": round(t_total, 1),
    }


def probe_simhash(spark, n: int, max_hamming: int = 3) -> dict:
    from swspark.dedup import simhash_pairs

    docs = synth_docs(spark, n, exact_dups=True)
    out: dict = {}
    t0 = time.perf_counter()
    pairs = simhash_pairs(docs, max_hamming=max_hamming,
                          candidates_out=out)
    cand = out["candidates"].persist()
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0
    p = pairs.persist()
    n_pairs = p.count()
    planted_found = p.where(
        (F.col("doc_b") - F.col("doc_a") == 1) & (F.col("doc_b") % 100 == 1)
    ).count()
    t_total = time.perf_counter() - t0
    true_planted = (n - 2) // 100 + 1 if n > 1 else 0
    cand.unpersist()
    p.unpersist()
    return {
        "op": "simhash_h3", "n_docs": n, "candidates": n_cand,
        "recovered_pairs": n_pairs, "planted_found": planted_found,
        "true_planted": true_planted,
        "recall": round(planted_found / max(1, true_planted), 4),
        "cand_per_true_dup": round(n_cand / max(1, true_planted), 2),
        "sec_candidates": round(t_cand, 1), "sec_total": round(t_total, 1),
    }


def probe_simhash_wide(spark, n: int) -> dict:
    from swspark.dedup import simhash_pairs_wide

    docs = synth_docs(spark, n, exact_dups=True)
    out: dict = {}
    t0 = time.perf_counter()
    pairs = simhash_pairs_wide(docs, candidates_out=out)
    cand = out["candidates"].persist()
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0
    p = pairs.persist()
    n_pairs = p.count()
    planted_found = p.where(
        (F.col("doc_b") - F.col("doc_a") == 1) & (F.col("doc_b") % 100 == 1)
    ).count()
    t_total = time.perf_counter() - t0
    true_planted = (n - 2) // 100 + 1 if n > 1 else 0
    cand.unpersist()
    p.unpersist()
    return {
        "op": "simhash_wide_h3", "n_docs": n, "candidates": n_cand,
        "recovered_pairs": n_pairs, "planted_found": planted_found,
        "true_planted": true_planted,
        "recall": round(planted_found / max(1, true_planted), 4),
        "cand_per_true_dup": round(n_cand / max(1, true_planted), 2),
        "sec_candidates": round(t_cand, 1), "sec_total": round(t_total, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000000,10000000")
    ap.add_argument("--simhash-sizes", default="1000000,3000000")
    ap.add_argument("--simhash-wide-sizes", default="")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=None, help="append JSONL here")
    args = ap.parse_args()

    from swspark.session import get_spark

    spark = get_spark("dedup-scale", cores=args.cpus,
                      shuffle_partitions=args.cpus * 4)
    results = []
    for n in [int(s) for s in args.sizes.split(",") if s]:
        r = probe_minhash(spark, n)
        print(json.dumps(r), flush=True)
        results.append(r)
    for n in [int(s) for s in args.simhash_sizes.split(",") if s]:
        r = probe_simhash(spark, n)
        print(json.dumps(r), flush=True)
        results.append(r)
    for n in [int(s) for s in args.simhash_wide_sizes.split(",") if s]:
        r = probe_simhash_wide(spark, n)
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.out:
        with open(args.out, "a") as fh:
            for r in results:
                fh.write(json.dumps(r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()

"""Prototype: distributed per-host row_number (the r4 scaling
diagnosis' fix path — BENCH.md "Amdahl serial fraction").

The production two-phase rank sorts a hot host's rows in ONE task at
every parallelism level. This prototype parallelizes the hot host by
ORDER-CONSISTENT bucketing: split each host's url range at sampled
boundary urls (bucket i holds rows with exactly i boundaries < url,
so equal urls share a bucket and bucket order refines url order),
rank within (host, bucket) windows — many parallel sorts — and add
per-bucket cumulative offsets (tiny, broadcast). Exactness checked
against the single-window rank; timed against the two-phase rank at
two parallelism levels on the bench's skewed frontier (priority/ts
constant there, so order reduces to url ASC; the general engine
version must fold priority/ts into the boundary comparison — r5).

Usage: python tools/proto_distributed_rank.py [n_urls] [--levels 8,32]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BOUNDS = 63
SAMPLE_MOD = 2048


def distributed_rank(spark, frontier, n_buckets: int = 64):
    """v2 (codegen probe): bucket on a numeric url key — the 4 bytes
    at the host's common-prefix offset (monotone-coarse w.r.t. url
    order; ties share a bucket) — via width_bucket over the host's
    actual key range. Every per-row expression folds into whole-stage
    codegen; the v1 HOF boundary filter ran interpreted (BENCH.md)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from swspark.scheduler import _common_prefix_len

    cp = frontier.groupBy("host").agg(
        _common_prefix_len(F.min("url"), F.max("url")).alias("_cp")
    )

    def byte(i):
        return F.least(
            F.coalesce(
                F.ascii(F.substring(F.col("url"), F.col("_cp") + i, 1)),
                F.lit(0),
            ),
            F.lit(255),
        ).cast("long")

    with_key = frontier.join(F.broadcast(cp), "host").withColumn(
        "_uk",
        byte(1) * F.lit(1 << 24) + byte(2) * F.lit(1 << 16)
        + byte(3) * F.lit(256) + byte(4),
    ).drop("_cp")
    rng = with_key.groupBy("host").agg(
        F.min("_uk").alias("_lo"), F.max("_uk").alias("_hi")
    )
    keyed = with_key.join(F.broadcast(rng), "host").withColumn(
        "_bkt",
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.expr(
                f"width_bucket(_uk, _lo, _hi + 1, {n_buckets})"
            ),
        ).otherwise(F.lit(1)),
    ).drop("_uk", "_lo", "_hi")
    counts = keyed.groupBy("host", "_bkt").count()
    woff = (
        Window.partitionBy("host")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("count").over(woff), F.lit(0))
    ).select("host", "_bkt", "_off")
    w = Window.partitionBy("host", "_bkt").orderBy(F.asc("url"))
    return (
        keyed.join(F.broadcast(offsets), ["host", "_bkt"])
        .withColumn("rank", (F.row_number().over(w) + F.col("_off")).cast("int"))
        .drop("_bkt", "_off")
    )


def two_phase_rank(spark, frontier, pre_salt: int = 16):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(pre_salt))
    w1 = Window.partitionBy(F.col("host"), salt).orderBy(F.asc("url"))
    pre = frontier.withColumn("_r1", F.row_number().over(w1)).drop("_r1")
    w2 = Window.partitionBy("host").orderBy(F.asc("url"))
    return pre.withColumn("rank", F.row_number().over(w2))


def worker(cores: int, n_urls: int, reps: int) -> None:
    from bench import apply_tmpfs_defaults, build_synthetic_frontier
    from pyspark.sql import functions as F
    from swspark.session import get_spark

    apply_tmpfs_defaults(clean_bench_dir=False)
    spark = get_spark(f"dr-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/swspark-bench"),
        f"rankpp-frontier-{n_urls}",
    )
    if not os.path.exists(path):
        build_synthetic_frontier(spark, n_urls, n_hosts=500).write.mode(
            "overwrite"
        ).parquet(path)
    frontier = spark.read.parquet(path).select("url", "host")

    # exactness on a subset vs the single-window ground truth
    sub = frontier.where(F.pmod(F.xxhash64("url"), F.lit(97)) == 0)
    from pyspark.sql import Window

    truth = sub.withColumn(
        "rank",
        F.row_number().over(Window.partitionBy("host").orderBy(F.asc("url"))),
    )
    got = distributed_rank(spark, sub)
    bad = (
        got.alias("g")
        .join(truth.alias("t"), ["host", "url"])
        .where(F.col("g.rank") != F.col("t.rank"))
        .count()
    )
    out = {"cores": cores, "n_urls": n_urls, "exactness_mismatches": bad,
           "arms": {}}
    for arm, fn in (("two_phase", two_phase_rank),
                    ("distributed", distributed_rank)):
        times = []
        for rep in range(reps + 1):
            t0 = time.perf_counter()
            fn(spark, frontier).select(F.max("rank")).collect()
            dt = time.perf_counter() - t0
            if rep:
                times.append(round(dt, 2))
        out["arms"][arm] = {"times": times, "min": min(times)}
    print("RESULT " + json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    levels = [
        int(x)
        for x in (
            sys.argv[sys.argv.index("--levels") + 1]
            if "--levels" in sys.argv
            else "8,32"
        ).split(",")
    ]
    reps = int(os.environ.get("DR_REPS", "2"))
    taskset = shutil.which("taskset")
    results = {}
    for cores in levels:
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               str(cores), str(n_urls), str(reps)]
        if taskset:
            cmd = [taskset, "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        lines = [ln for ln in p.stdout.splitlines()
                 if ln.startswith("RESULT ")]
        if not lines:
            print(p.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"worker {cores} failed")
        r = json.loads(lines[0][len("RESULT "):])
        results[cores] = r
        print(json.dumps(r), flush=True)
    if len(levels) == 2:
        lo, hi = levels
        for arm in ("two_phase", "distributed"):
            s = results[lo]["arms"][arm]["min"] / results[hi]["arms"][arm]["min"]
            print(json.dumps({"arm": arm,
                              f"speedup_{lo}to{hi}": round(s, 3),
                              "efficiency": round(s / (hi / lo), 3)}))


if __name__ == "__main__":
    main()

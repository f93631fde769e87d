"""Ablation: is the Python-UDF Bloom prefilter worth it in front of a
bucketed sort-merge anti-join, and how does each path scale 8->32?

The Bloom fast path trades a JVM-only merge join probe for an
Arrow round-trip through Python workers. On a bucketed, sorted seen
table the exact join is already cheap, so the prefilter may only pay
when |seen| >> |frontier| (its design point). Measures both paths at
both core counts, CPU-pinned like bench_scaling.

    python tools/bench_bloom_ablation.py [n_urls]
    python tools/bench_bloom_ablation.py --worker CORES N REPS
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_wave(spark, inputs, use_bloom: bool) -> tuple[float, int]:
    from bench import N_SEEN_BUCKETS
    from swspark.scheduler import Throttle, salted_repartition, schedule_wave
    from swspark.seen import filter_new_urls, with_url_identity

    n_urls = inputs["n_urls"]
    t0 = time.perf_counter()
    frontier = with_url_identity(inputs["frontier"])
    candidates = filter_new_urls(
        spark, frontier, inputs["seen"],
        inputs["blooms"] if use_bloom else None, N_SEEN_BUCKETS,
    )
    wave_period = max(1.0, n_urls / 2000.0)
    scheduled = schedule_wave(
        candidates, inputs["budgets"], wave_period, Throttle("CONCURRENT", 1e18)
    )
    scheduled = salted_repartition(
        scheduled, spark.sparkContext.defaultParallelism, 16
    )
    n = scheduled.join(inputs["pages"], "url").count()
    return time.perf_counter() - t0, n


def worker(cores: int, n_urls: int, reps: int) -> None:
    from bench import apply_tmpfs_defaults, prepare_crawl_wave
    from swspark.session import get_spark

    apply_tmpfs_defaults(clean_bench_dir=False)
    spark = get_spark(f"ablate-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    inputs = prepare_crawl_wave(spark, n_urls)
    out = {}
    for label, use_bloom in (("bloom", True), ("nobloom", False)):
        one_wave(spark, inputs, use_bloom)  # warmup
        runs = [one_wave(spark, inputs, use_bloom) for _ in range(reps)]
        out[label] = {
            "all_seconds": [round(dt, 2) for dt, _ in runs],
            "best_seconds": round(min(dt for dt, _ in runs), 2),
            "urls": runs[0][1],
        }
    print("RESULT " + json.dumps({"cores": cores, **out}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(os.environ.get("ABLATE_REPS", "3"))
    taskset = shutil.which("taskset")
    out = {}
    for cores in (8, 32):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               str(cores), str(n_urls), str(reps)]
        if taskset:
            cmd = [taskset, "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(p.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"worker cores={cores} failed")
        out[cores] = json.loads(line[-1][len("RESULT "):])
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

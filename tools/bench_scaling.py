"""Scaling-efficiency evidence run (BASELINE.md protocol).

Runs the same synthetic-frontier crawl wave at local[8] (N) and
local[32] (4N) — only spark.master and the core-proportional shuffle
partition count differ — three repetitions each, and reports median
throughput plus efficiency = (T32/T8) / (32/8).

Each parallelism level runs in its own subprocess so the JVMs are
fully independent. Usage:

    python tools/bench_scaling.py [n_urls]        # orchestrate
    python tools/bench_scaling.py --worker CORES N REPS   # internal
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(cores: int, n_urls: int, reps: int) -> None:
    from bench import prepare_crawl_wave, run_crawl_wave
    from swspark.session import get_spark

    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    inputs = prepare_crawl_wave(spark, n_urls)
    run_crawl_wave(spark, inputs)  # warmup (JIT/codegen), not recorded
    results = []
    for _ in range(reps):
        dt, n = run_crawl_wave(spark, inputs)
        results.append({"seconds": dt, "urls_fetched": n})
    print("RESULT " + json.dumps({"cores": cores, "runs": results}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    reps = int(os.environ.get("SCALING_REPS", "3"))
    # stale Spark JVMs from crashed/timed-out runs silently poison
    # the timings (observed: 6-20x inflation) — refuse to measure
    stale = subprocess.run(
        ["pgrep", "-f", "java.*spark"], capture_output=True, text=True
    ).stdout.strip()
    if stale:
        raise RuntimeError(
            f"stale Spark JVMs running (pids {stale.replace(chr(10), ',')}); "
            "kill them before benchmarking"
        )
    out = {}
    for cores in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cores), str(n_urls), str(reps)],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(p.stdout[-2000:], file=sys.stderr)
            print(p.stderr[-4000:], file=sys.stderr)
            raise RuntimeError(f"worker cores={cores} failed")
        out[cores] = json.loads(line[-1][len("RESULT "):])

    summary = {"n_urls": n_urls, "reps": reps}
    for cores, data in out.items():
        med = statistics.median(r["seconds"] for r in data["runs"])
        n = data["runs"][0]["urls_fetched"]
        summary[f"local{cores}"] = {
            "median_seconds": round(med, 2),
            "urls_fetched": n,
            "urls_per_sec": round(n / med, 1),
            "all_seconds": [round(r["seconds"], 2) for r in data["runs"]],
        }
    t8 = summary["local8"]["urls_per_sec"]
    t32 = summary["local32"]["urls_per_sec"]
    summary["scaling_efficiency"] = round((t32 / t8) / (32 / 8), 3)
    print(json.dumps(summary, indent=2))
    with open("BENCH_SCALING.json", "w") as fh:
        json.dump(summary, fh, indent=2)


if __name__ == "__main__":
    main()

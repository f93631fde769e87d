"""A/B probe for the hot-host rank pre-prune (VERDICT r3 #5) on the
POLITENESS shape: a frontier whose per-host pending counts dwarf the
budgets — the 10^10-frontier steady state, where the two-phase rank
otherwise sorts the whole frontier to schedule a sliver of it.

(The headline bench's unbounded-budget stress shape schedules every
row, so no top-k prune can engage there by construction — the hot
condition n > 64 x budget is never met. This probe is the shape the
pre-prune exists for.)

Per parallelism level (subprocess-isolated JVMs, like
tools/bench_scaling.py): time schedule_wave(...).count() with
preprune off vs on, reps each, over a parquet frontier on tmpfs.

Usage: python tools/bench_rank_preprune.py [n_urls] [--levels 16,32]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOSTS = 500
BUDGET = 1000


def worker(cores: int, n_urls: int, reps: int) -> None:
    from bench import apply_tmpfs_defaults, build_synthetic_frontier
    from swspark.scheduler import Throttle, schedule_wave
    from swspark.session import get_spark

    apply_tmpfs_defaults(clean_bench_dir=False)
    spark = get_spark(f"rankpp-{cores}", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/swspark-bench"),
        f"rankpp-frontier-{n_urls}",
    )
    if not os.path.exists(path):
        build_synthetic_frontier(spark, n_urls, n_hosts=N_HOSTS).write.mode(
            "overwrite"
        ).parquet(path)
    frontier = spark.read.parquet(path)
    budgets = spark.createDataFrame(
        [(f"h{i}.example.test", None) for i in range(N_HOSTS)],
        "host string, crawl_delay double",
    )
    out = {"cores": cores, "n_urls": n_urls, "arms": {}}
    for arm, pp in (("off", False), ("on", True)):
        times = []
        for rep in range(reps + 1):  # first rep = warmup, dropped
            t0 = time.perf_counter()
            n = schedule_wave(
                frontier, budgets, wave_period=10.0,
                throttle=Throttle("CONCURRENT", BUDGET), preprune=pp,
            ).count()
            dt = time.perf_counter() - t0
            if rep:
                times.append(round(dt, 2))
        out["arms"][arm] = {"times": times, "min": min(times),
                            "scheduled": n}
    print("RESULT " + json.dumps(out))


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
            else "16,32"
        ).split(",")
    ]
    reps = int(os.environ.get("RANKPP_REPS", "3"))
    taskset = shutil.which("taskset")
    from bench import _settle

    results = {}
    for cores in levels:
        settle = _settle(cores)
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
            print(p.stdout[-1500:], file=sys.stderr)
            print(p.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"worker {cores} failed")
        r = json.loads(lines[0][len("RESULT "):])
        r["settle"] = settle
        results[cores] = r
        print(json.dumps(r), flush=True)
    if len(levels) == 2:
        lo, hi = levels
        for arm in ("off", "on"):
            s = results[lo]["arms"][arm]["min"] / results[hi]["arms"][arm]["min"]
            print(json.dumps({
                "arm": arm, f"speedup_{lo}to{hi}": round(s, 3),
                "efficiency": round(s / (hi / lo), 3),
            }))


if __name__ == "__main__":
    main()

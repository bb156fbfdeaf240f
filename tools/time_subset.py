"""Time a subset of the decade-bench workloads at one scale.

Round-13 measurement helper (guide §1): warm best-of-N with the noop
sink, persisted-RDD/cache isolation between repeats (same discipline as
tools/bench_scale.py), job descriptions set per workload so the UI and
event logs are readable.

Usage: python tools/time_subset.py [sf_dir] workload [workload ...]
       (workload names as in tools/capture_plans.py / bench_scale.py)
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", args
    repeats = int(os.environ.get("REPEATS", "3"))

    from fraud_detection_project_spark.session import get_spark
    from tools import bench_scale
    from tools.capture_plans import workloads

    global SF_DIR
    spark = get_spark("time-subset")
    # capture_plans reads its module-level SF_DIR at import; rebind
    import tools.capture_plans as cp

    cp.SF_DIR = sf_dir
    wl = workloads(spark)
    unknown = [n for n in names if n not in wl]
    if unknown:
        print(f"unknown workloads: {unknown}; known: {list(wl)}")
        sys.exit(2)

    from fraud_detection_project_spark.queries import QUERIES

    bench_scale.consume(QUERIES["cleaning_chain"](spark, sf_dir))  # warm
    print(f"loadavg {os.getloadavg()}")
    for name in names:
        best, runs = float("inf"), []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"time_subset:{name}")
            t0 = time.perf_counter()
            bench_scale.consume(wl[name]())
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
            bench_scale._clear_persisted(spark)
        print(f"{name}: best {best:.3f}s  runs {runs}", flush=True)
    print(f"loadavg {os.getloadavg()}")
    spark.stop()


if __name__ == "__main__":
    main()

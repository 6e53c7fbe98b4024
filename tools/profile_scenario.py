"""Profile one bench state scenario: wall time, Spark job count, and
the kernel's phase_seconds — the intra-scenario attribution the
BENCH summary can't carry.

Usage: python tools/profile_scenario.py <scenario> [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from beavers_spark.session import get_spark

    scenario = dict(bench.INCREMENTAL)[name]
    spark = bench._bench_spark(f"profile_{name}")
    spark.range(1).count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    tracker = spark.sparkContext.statusTracker()

    for rep in range(reps):
        bench._untimed_gc(spark)
        spark.catalog.clearCache()
        jobs0 = len(tracker.getJobIdsForGroup(None))
        with tempfile.TemporaryDirectory() as workdir:
            t0 = time.perf_counter()
            n, metrics = scenario(spark, sf_dir, workdir)
            dt = time.perf_counter() - t0
        jobs1 = len(tracker.getJobIdsForGroup(None))
        print(
            f"rep{rep}: {dt:.2f}s  jobs={jobs1 - jobs0}  rows={n}",
            flush=True,
        )
        phases = metrics.get("phase_seconds")
        if phases:
            tot = sum(phases.values())
            for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
                print(f"    {k:>16}: {v:7.3f}s")
            print(f"    {'sum':>16}: {tot:7.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Dump .explain("formatted") for bench-tier declared queries into
plans/r13/<query>_<suffix>.txt (judge evidence for the optimization
round: before/after plan shapes per query).

Usage: python tools/dump_plans.py <suffix> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beavers_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from beavers_spark.plans import QUERIES

    tier = bench.HEADLINE + bench.ANALYTICS
    names = [n for n in tier if not only or n in only]
    # touched non-tier plans can be named explicitly
    names += [n for n in only if n in QUERIES and n not in tier]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("plan-dump")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR while planning: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Dump .explain("formatted") for bench-tier declared queries into
plans/<round>/<query>_<suffix>.txt (judge evidence for the optimization
rounds: before/after plan shapes per query).

Usage: python tools/dump_plans.py <suffix> [query ...]

Env:
- SPARK_GRAFT_PLANS_ROUND: output subdir under plans/ (default r14)
- SPARK_GRAFT_PLANS_EXECUTED=1: run each query (noop sink) first and
  dump the EXECUTED plan — with AQE this is the final re-optimized
  plan (isFinalPlan=true), the only dump that shows runtime exchange
  reuse / AQEShuffleRead decisions (VERDICT r13 item 2).
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
    round_dir = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    executed = os.environ.get("SPARK_GRAFT_PLANS_EXECUTED") == "1"

    import bench
    from beavers_spark.plans import QUERIES

    tier = bench.HEADLINE + bench.ANALYTICS
    names = [n for n in tier if not only or n in only]
    # touched non-tier plans can be named explicitly
    names += [n for n in only if n in QUERIES and n not in tier]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("plan-dump")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            if executed:
                df.write.format("noop").mode("overwrite").save()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR while planning: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {round_dir}/{name}_{suffix}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

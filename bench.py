"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query runs three times; the reported time is the best of the two
steady-state runs — the first run pays one-time whole-stage-codegen
compilation and Python worker startup, a constant that vanishes at real
data scale, and min-of-2 damps same-machine scheduling noise (observed
±15% on identical warm runs). The cold first-run total is still
recorded as ``cold_value`` for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from beavers_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q9",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q18",
    "tpch_q19",
    "tpch_q21",
    "tpch_q22",
    "etf_valuation",
    "last_by_keys",
    "groupby_sum",
    "window_rank",
    "sessionize",
    "hourly_rollup",
    "stats_by_segment",
    "asof_join_events",
    "word_count",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_lsh_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    from beavers_spark.plans import QUERIES

    spark = get_spark("beavers_spark_bench")
    # warm up the JVM + parquet footers outside the timed region
    spark.range(1).count()

    per_query: dict[str, float] = {}
    total = 0.0
    cold_total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        times = []
        for _ in range(3):
            start = time.perf_counter()
            n = fn(spark, sf_dir).count()
            times.append(time.perf_counter() - start)
        cold, warm = times[0], min(times[1:])
        per_query[name] = round(warm, 3)
        total += warm
        cold_total += cold
        print(
            f"# {name}: {warm:.3f}s warm / {cold:.3f}s cold ({n} rows)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "cold_value": round(cold_total, 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

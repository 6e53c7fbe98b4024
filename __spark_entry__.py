"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator plan from SURVEY.md §2
plus the beyond-reference LLM-data-pipeline surface, paired with DuckDB
oracle SQL (beavers_spark/plans/*).
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the ETF-valuation shape
    (broadcast join -> arithmetic -> keyed sum), reference
    examples/pyarrow_concepts.py:64-74."""
    from beavers_spark.plans import QUERIES

    return QUERIES["etf_valuation"](spark, "/root/testdata/sf0.001")


def _driver_checked_order() -> list[str]:
    """Least-recently-driver-checked plan names, derived from the
    committed ``CORRECTNESS_r*.json`` artifacts (VERDICT r11 item 3 —
    the hand-copied per-round lists this replaces had to be re-appended
    every round or the driver's 50-per-round window re-checked the same
    plans while others went stale). Each artifact's keys ARE the plans
    that round's driver window checked, so a plan's exposure priority
    is simply the last round it appeared in; ties break by name for a
    deterministic order. Plans never seen in any artifact (this round's
    additions) are absent here and front the ``queries()`` ordering."""
    repo = os.path.dirname(os.path.abspath(__file__))
    last_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        rnd = int(m.group(1))
        for name in rows:
            last_seen[name] = max(rnd, last_seen.get(name, -1))
    return sorted(last_seen, key=lambda n: (last_seen[n], n))


_DRIVER_CHECKED = _driver_checked_order()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2), never-
    driver-checked plans first, then least-recently-checked (see
    ``_driver_checked_order``) — the driver caps each round's window at
    50, so this rotation keeps every plan earning fresh green rows."""
    from beavers_spark.plans import QUERIES

    checked = set(_DRIVER_CHECKED)
    ordered = [n for n in QUERIES if n not in checked]
    ordered += [n for n in _DRIVER_CHECKED if n in QUERIES]
    return {n: QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here (approximate or
    non-SQL-expressible operators) get the driver's rows-only check."""
    from beavers_spark.plans import ORACLES

    return dict(ORACLES)

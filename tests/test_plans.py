"""Smoke every registered plan at sf0.001: runs, stable schema, sane rows.

The full DuckDB hash parity lives in tools/check_oracle.py (the driver's
t2 replica); this keeps `pytest -x -q` fast while still executing every
plan end-to-end.
"""

from __future__ import annotations

import pytest

from beavers_spark.plans import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    schema_first = df.schema
    rows = df.count()
    assert rows >= 0
    # column names must be oracle-compatible: no spark-generated names
    for field in schema_first.fields:
        assert "(" not in field.name, f"unaliased column {field.name!r} in {name}"


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_rows_only_queries_are_documented():
    # approximate ops are the only ones allowed to skip the SQL oracle —
    # and each one has a hash-checked quantitative gate query
    # (dedup_embedding_recall, ann_*_recall, approx_distinct_error)
    # ann_pq_topk is NOT here: it carries the full brute-force SQL
    # oracle (deterministic scan_partitions + total candidate keep at
    # registry scale); ann_ivfpq_topk is additionally pinned by the
    # hash-checked ann_ivfpq_exact_twin
    assert set(QUERIES) - set(ORACLES) == {
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_ivfpq_topk",
        "ann_knn_join",  # gated by ann_knn_join_recall (hash-checked)
        "approx_distinct",
        "dedup_embedding_cosine",
        "semantic_dedup",  # gated by semantic_dedup_check (hash-checked)
    }
    for gate in (
        "dedup_embedding_recall",
        "ann_knn_join_recall",
        "ann_lsh_recall",
        "ann_ivf_recall",
        "ann_pq_recall",
        "ann_ivfpq_recall",
        "approx_distinct_error",
    ):
        assert gate in ORACLES, f"{gate} gate must be hash-checked"

"""Embedding similarity search, end to end: the exact baseline, the
three approximate scale paths (LSH / IVF / IVF-PQ), and the streaming
index — with the recall and exactness relationships the registered
gates enforce, asserted inline.

Run: ``python examples/ann_search.py`` (or via tests/test_examples.py).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.plans.common import t  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("ann_search_example")
emb = t(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
queries = emb.filter(F.col("vec_id") < 10)


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


# 1. exact baseline: broadcast queries, one corpus scan, window top-k
from beavers_spark.functions.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    ivfpq_topk,
    lsh_bucketed_topk,
)

exact = _pairs(brute_force_topk(queries, emb, "vec_id", "vec_id", k=10))
assert len(exact) == 10 * queries.count()

# 2. LSH: multi-table hyperplane buckets — candidates from a (table,
# bucket) equi-join, exact rerank inside. Recall >= 0.9 is the
# registered gate (ann_lsh_recall).
lsh = _pairs(
    lsh_bucketed_topk(
        queries, emb, "vec_id", "vec_id", k=10,
        dim=64, n_planes=3, n_tables=16, multi_probe=False,
    )
)
assert len(lsh & exact) / len(exact) >= 0.9

# 3. IVF: k-means cells, probe-n-of-k, exact rerank in probed cells
ivf = _pairs(
    ivf_topk(
        queries, emb, "vec_id", "vec_id", k=10,
        n_cells=8, n_probe=5, n_assign=2,
    )
)
assert len(ivf & exact) / len(exact) >= 0.9

# 4. IVF-PQ: cells prune WHICH vectors are scored, PQ codes shrink WHAT
# the scoring scan reads; the exact refine re-scores candidates from
# raw vectors, so emitted sims are exact
ivfpq = _pairs(
    ivfpq_topk(
        queries, emb, "vec_id", "vec_id", k=10,
        n_cells=8, n_probe=5, n_assign=2, m=16, nbits=6, refine=16,
        scan_partitions=32,
    )
)
assert len(ivfpq & exact) / len(exact) >= 0.9

# 5. streaming: the same index maintained incrementally, cell-partitioned
# at rest; probing ALL cells degenerates to exact brute force
from beavers_spark.streaming import IncrementalIVFPQIndex  # noqa: E402

with tempfile.TemporaryDirectory() as tmp:
    index = IncrementalIVFPQIndex(
        os.path.join(tmp, "ivfpq"), id_col="vec_id",
        n_cells=4, m=16, nbits=6,
    )
    for i in range(3):  # three ingest waves; wave 0 trains the model
        index(emb.filter(F.col("vec_id") % 3 == i), i)
    full = _pairs(index.search(queries, k=10, n_probe=4, refine=100))
    assert full == exact  # all cells probed + wide refine == exact

print("ann_search example OK")

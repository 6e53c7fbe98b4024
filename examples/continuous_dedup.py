"""Continuous lexical dedup + chunking: the round-7 streaming tools.

A training-data ingest that never stops needs its dedup to be
incremental (each micro-batch pays O(batch + candidates), never a
corpus rescan) and its unit-of-work prep to be a pure scan. The flow:

1. feed document waves through ``IncrementalTfidfDedup`` — per wave,
   only the NEW docs are featurized; candidate pairs accumulate against
   the bucket-partitioned term registry;
2. read the near-dup pairs and clusters at any point — scored lazily
   under the CURRENT corpus statistics, so the result always equals the
   batch ``tfidf_cosine_pairs`` / ``dedup_tfidf_clusters`` on
   everything ingested so far (no moving-idf drift);
3. drop every non-representative cluster member, then chunk the
   survivors into fixed-size token windows with overlap
   (``chunk_documents``) — the context-bounded unit downstream
   tokenization and retrieval indexing consume.

Run: ``python examples/continuous_dedup.py``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.functions.curation import chunk_documents  # noqa: E402
from beavers_spark.functions.dedup import tfidf_cosine_pairs  # noqa: E402
from beavers_spark.plans.common import t  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402
from beavers_spark.streaming import IncrementalTfidfDedup  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("continuous_dedup_example")
docs = t(spark, SF_DIR, "documents").select("doc_id", "text")

with tempfile.TemporaryDirectory() as workdir:
    # 1. three arrival waves through the incremental kernel (in
    # production this is stream.writeStream.foreachBatch(dedup))
    dedup = IncrementalTfidfDedup(
        os.path.join(workdir, "state"),
        os.path.join(workdir, "cand"),
        text_col="text",
        id_col="doc_id",
        threshold=0.5,
    )
    for wave in range(3):
        dedup(docs.filter(F.pmod("doc_id", F.lit(3)) == wave), wave)

    # 2. read-time scoring equals the batch operator on the union —
    # scores included, whatever order the waves arrived in
    pairs = dedup.read_pairs(spark)
    batch = tfidf_cosine_pairs(docs, "text", "doc_id", threshold=0.5)
    got = {(r.doc1, r.doc2, r.cos) for r in pairs.collect()}
    want = {(r.doc1, r.doc2, r.cos) for r in batch.collect()}
    assert got == want and got, f"incremental != batch ({len(got)} pairs)"

    # keep one representative per near-dup cluster (the min doc id —
    # exactly the cluster label), drop every other member
    clusters = dedup.read_clusters(spark)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    kept = docs.join(drop, "doc_id", "left_anti")
    n_docs, n_drop = docs.count(), drop.count()
    assert kept.count() == n_docs - n_drop and n_drop > 0

    # 3. chunk the survivors into overlapping context windows — one
    # round-robin exchange then map-side only (no aggregation shuffle);
    # every chunk is at most chunk_size tokens and consecutive chunks
    # share `overlap` tokens
    chunks = chunk_documents(kept, "text", "doc_id", chunk_size=64, overlap=8)
    stats = chunks.agg(
        F.count("*").alias("n"),
        F.max("n_tokens").alias("max_tok"),
    ).collect()[0]
    assert stats.n >= kept.count() and stats.max_tok <= 64
    print(
        f"ok: {n_docs} docs -> {n_drop} near-dup members dropped -> "
        f"{stats.n} chunks (max {stats.max_tok} tokens)"
    )

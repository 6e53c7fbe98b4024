"""Training-data pipeline over the documents table: quality scoring,
token counting, exact dedup, near-dup clustering — the beyond-reference
operator family for 100 TB corpus curation (COVERAGE.md bonus section).

Everything stays Catalyst-visible (no row-at-a-time Python): hashes,
regex token counts and ratio features are JVM expressions; near-dup
clustering is an iterative join+agg fixpoint.

Run: ``python examples/training_pipeline.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.functions.dedup import (  # noqa: E402
    connected_components,
    exact_dedup,
    ngram_jaccard_pairs,
)
from beavers_spark.functions.text import quality_score, token_count_bpe_ish  # noqa: E402
from beavers_spark.plans.common import t  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("training_pipeline_example")
docs = t(spark, SF_DIR, "documents")
n_docs = docs.count()
assert n_docs > 0

# 1. quality + token features, all JVM-side expressions
scored = docs.select(
    "doc_id",
    *[expr.alias(name) for name, expr in quality_score(F.col("text")).items()],
    token_count_bpe_ish(F.col("text")).alias("bpe_tokens"),
)
feats = scored.agg(
    F.count(F.lit(1)).alias("n"),
    F.min("n_tokens").alias("min_tok"),
    F.sum(F.when(F.col("stopword_ratio") > 1, 1).otherwise(0)).alias("bad_ratio"),
).first()
assert feats.n == n_docs
assert feats.bad_ratio == 0  # ratios stay in range

# 2. quality filter — the pushdown-friendly curation gate
kept = scored.filter((F.col("n_tokens") >= 5) & (F.col("punct_ratio") < 0.5))
assert 0 < kept.count() <= n_docs

# 3. exact dedup: canonicalization map by content hash
canon = exact_dedup(docs, "text", "doc_id", min_copies=1)
assert canon.count() <= n_docs  # one row per distinct content

# 4. near-dup clusters: 3-gram Jaccard pairs -> connected components
pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2).select(
    "doc1", "doc2"
)
clusters = connected_components(pairs)
if clusters.count():
    # every member maps to the minimum doc_id of its component
    bad = clusters.filter(F.col("cluster_id") > F.col("doc_id")).count()
    assert bad == 0

# 4b. reproducible subset + split: id-hash buckets, not rand() — the
# sample and split never change across reruns or corpus growth
from beavers_spark.functions.sampling import (  # noqa: E402
    deterministic_sample,
    split_assign,
)

sample = deterministic_sample(docs, "doc_id", 0.2)
assert 0 < sample.count() < n_docs
splits = dict(
    split_assign(docs, "doc_id").groupBy("split").count().collect()
)
assert set(splits) == {"train", "val", "test"}
assert sum(splits.values()) == n_docs  # exactly one split per doc

# 5. continuous ingest: the same near-dedup, incrementally — each wave
# is checked against the whole corpus seen so far at O(batch) cost
import tempfile  # noqa: E402

from beavers_spark.functions.dedup import minhash_lsh_pairs  # noqa: E402
from beavers_spark.streaming import (  # noqa: E402
    IncrementalIVFIndex,
    IncrementalNearDedup,
)

with tempfile.TemporaryDirectory() as tmp:
    inc = IncrementalNearDedup(
        state_path=os.path.join(tmp, "state"),
        pairs_path=os.path.join(tmp, "pairs"),
        text_col="text",
        id_col="doc_id",
        threshold=0.2,
    )
    for wave in range(2):  # drive the foreachBatch kernel directly
        inc(docs.filter(F.col("doc_id") % 2 == wave), wave)
    inc_pairs = inc.read_pairs(spark).count()
    batch_pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.2
    ).count()
    assert inc_pairs == batch_pairs  # streamed == one-shot recompute

    # 6. embedding side: incrementally-built IVF index, partition-pruned
    emb = t(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    index = IncrementalIVFIndex(
        os.path.join(tmp, "ivf"), id_col="vec_id", n_cells=4
    )
    index(emb, 0)
    hits = index.search(emb.filter(F.col("vec_id") < 3), k=5, n_probe=2)
    assert hits.groupBy("query_id").count().agg(F.max("count")).first()[0] <= 5

    # 7. live cluster labels: the pair stream from step 5 feeds
    # IncrementalClusters; the final labeling equals the batch
    # connected-components over all pairs, regardless of batching
    from beavers_spark.streaming import IncrementalClusters  # noqa: E402

    live = IncrementalClusters(os.path.join(tmp, "clusters"), n_buckets=8)
    all_pairs = inc.read_pairs(spark).select("doc1", "doc2").localCheckpoint()
    for wave in range(2):
        live(all_pairs.filter(F.col("doc1") % 2 == wave), wave)
    live_labels = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in live.read_clusters(spark).collect()
    )
    batch_labels = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(all_pairs).collect()
    )
    assert live_labels == batch_labels

# 8. substring-granularity exact dedup + the mixture/quality passes a
# pretraining run composes after dedup
from beavers_spark.functions.curation import (  # noqa: E402
    chunk_dedup,
    token_budget_mix,
)
from beavers_spark.functions.terms import unigram_logprob  # noqa: E402

chunks_kept = chunk_dedup(docs, "text", "doc_id", k=10)
assert 0 < chunks_kept.count() <= n_docs  # all-duplicate docs disappear
assert chunks_kept.filter(F.col("n_kept") > F.col("n_chunks")).count() == 0

mixed = token_budget_mix(
    docs, "source", "doc_id", "n_chars",
    weights={"src1": 2.0}, budget=2000, default_weight=1.0,
)
assert 0 < mixed.count() < n_docs  # the budget binds

lm_scores = unigram_logprob(docs, "text", "doc_id")
assert lm_scores.count() == n_docs
assert lm_scores.filter(F.col("avg_logp") > 0).count() == 0  # log-probs

# 8b. substring-LEVEL exact dedup (Lee et al.'s duplicate-span pass):
# detect maximal duplicated k-token ranges, then cut them out of the
# corpus — the finer-grained sibling of chunk_dedup
from beavers_spark.functions.curation import (  # noqa: E402
    substring_dedup,
    substring_dedup_apply,
)

dup_ranges = substring_dedup(docs, "text", "doc_id", k=8)
assert dup_ranges.filter(
    F.col("span_end") <= F.col("span_start")
).count() == 0  # every range is non-empty and half-open
cleaned = substring_dedup_apply(docs, "text", "doc_id", k=8)
assert cleaned.count() == n_docs  # the edit keeps every doc row
assert cleaned.filter(
    F.col("n_dup_tokens") > F.col("n_tokens")
).count() == 0

# 9. streamed twin of the chunk dedup: waves in id order == one shot
from beavers_spark.streaming import IncrementalChunkDedup  # noqa: E402

with tempfile.TemporaryDirectory() as tmp:
    inc_chunks = IncrementalChunkDedup(
        os.path.join(tmp, "state"), os.path.join(tmp, "out"),
        text_col="text", id_col="doc_id", k=10,
    )
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    inc_chunks(docs.filter(F.col("doc_id") <= mid), 0)
    inc_chunks(docs.filter(F.col("doc_id") > mid), 1)
    inc_set = {
        (r.doc_id, r.clean_text)
        for r in inc_chunks.read_kept(spark).collect()
    }
    batch_set = {
        (r.doc_id, r.clean_text) for r in chunks_kept.collect()
    }
    assert inc_set == batch_set

print(
    f"training_pipeline: all asserts passed "
    f"({n_docs} docs, {kept.count()} kept, {canon.count()} distinct, "
    f"{inc_pairs} near-dup pairs incremental==batch, "
    f"{len(batch_set)} chunk-dedup survivors streamed==batch)"
)

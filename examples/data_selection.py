"""Data-selection pipeline over the documents/embeddings tables: the
"choose what to train on" stage, composing the four bounded-driver-model
fits (docs/concepts/training_data.md):

1. DSIR importance weights against a clean-source target model,
2. a fastText-style quality classifier trained on the same split,
3. temperature-scaled source mixing (p^0.5 budget rates),
4. k-means cluster-balanced sampling + top-PC projection on the
   embedding side,

then the intersection cut a real curation run would ship. Every fit
collects only model-sized state to the driver (n_buckets weights, k×dim
centroids, d-dim component) and scores the pool with broadcast probes
or scan-only folds — the shapes that survive a 100 TB pool.

Run: ``python examples/data_selection.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.functions.classifier import (  # noqa: E402
    logreg_fit,
    logreg_score,
)
from beavers_spark.functions.curation import temperature_mix  # noqa: E402
from beavers_spark.functions.dsir import dsir_logweights  # noqa: E402
from beavers_spark.functions.kmeans import cluster_balanced_sample  # noqa: E402
from beavers_spark.functions.pca import pca_project  # noqa: E402
from beavers_spark.plans.common import t  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TARGET = ("src0", "src1", "src2")  # the "clean reference" sources

spark = get_spark("data_selection_example")
docs = t(spark, SF_DIR, "documents")
n_docs = docs.count()
assert n_docs > 0

# 1. DSIR: weight every pool doc by target-likeness (two fixed-size
#    hashed n-gram models; the pool is scanned exactly once)
target = docs.filter(F.col("source").isin(*TARGET))
dsir = dsir_logweights(docs, target, "text", "doc_id", n_buckets=2048)
assert dsir.count() > 0

# 2. quality classifier on the same signal (positive = clean sources);
#    scoring is one feature pass + one broadcast join
labeled = docs.withColumn("is_clean", F.col("source").isin(*TARGET))
weights = logreg_fit(spark, labeled, "is_clean", n_buckets=2048)
probs = logreg_score(docs, weights, n_buckets=2048)
# the classifier agrees with its own training signal on average:
# clean-source docs score higher than the rest
means = (
    probs.join(docs.select("doc_id", "source"), "doc_id")
    .withColumn("clean", F.col("source").isin(*TARGET))
    .groupBy("clean")
    .agg(F.avg("prob").alias("p"))
)
by_clean = {r.clean: r.p for r in means.collect()}
assert by_clean[True] > by_clean[False]

# 3. temperature mixing: flatten source shares into budget keep-rates
#    (scan-level filter against a driver-built |sources|-row literal)
mixed = temperature_mix(
    docs, "source", "doc_id", "n_chars", alpha=0.5, budget=n_docs * 40
)
n_mixed = mixed.count()
assert 0 < n_mixed <= n_docs

# 4. the shipped cut: docs that pass the mix AND sit in the
#    target-like half of BOTH models — relative cuts (medians), not
#    absolute thresholds: a 2-step GD model's probabilities are
#    well-ORDERED long before they are calibrated
p50_prob = probs.agg(F.percentile("prob", 0.5).alias("m")).collect()[0]["m"]
p50_logw = dsir.agg(F.percentile("logw", 0.5).alias("m")).collect()[0]["m"]
cut = (
    mixed.select("doc_id")
    .join(dsir.filter(F.col("logw") > p50_logw).select("doc_id"), "doc_id")
    .join(probs.filter(F.col("prob") > p50_prob).select("doc_id"), "doc_id")
)
n_cut = cut.count()
assert 0 < n_cut < n_docs

# 5. embedding side: cluster-balanced sample + dominant-mode scores
emb = t(spark, SF_DIR, "embeddings")
balanced = cluster_balanced_sample(spark, emb, cap=25, k=8, iters=2)
per_cluster = balanced.groupBy("cluster").count().collect()
assert all(r["count"] <= 25 for r in per_cluster)
pc_scores = pca_project(spark, emb, iters=2)
assert pc_scores.count() == emb.count()

# 6. budget the shipped cut in REAL tokens: train a 4-merge BPE
#    tokenizer on the pool and count the cut under it (whitespace
#    counts overestimate; the learned tokenizer is the honest number)
from beavers_spark.functions.bpe import bpe_token_counts  # noqa: E402

bpe_counts = bpe_token_counts(spark, docs, n_merges=4)
cut_tokens = (
    bpe_counts.join(cut.select("doc_id"), "doc_id")
    .agg(F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).alias("t"))
    .collect()[0]["t"]
)
# every shipped doc has tokens, so the budget is positive iff the cut
# is non-empty (tiny fixtures can legitimately ship zero docs)
assert (cut_tokens > 0) == (n_cut > 0)

print(
    f"pool={n_docs} mixed={n_mixed} shipped={n_cut} "
    f"shipped_bpe_tokens={cut_tokens} clusters={len(per_cluster)} "
    f"clean_prob={by_clean[True]:.3f} other_prob={by_clean[False]:.3f}"
)
print("OK data_selection")

"""Corpus curation with the round-6 scale tools: held-out LM quality
gating, hot-bucket-capped near-dedup, and a Z-ordered curated layout.

The flow a 100 TB ingest actually runs:

1. score incoming docs against a unigram LM trained on a CLEAN split
   (not the data being scored) — keep the low-perplexity half;
2. near-dedup the survivors with MinHash-LSH, bucket-capped so
   boilerplate mega-buckets cannot send the band self-join quadratic;
3. write the curated corpus Z-ordered by (n_chars, doc_id) so later
   range scans on either dimension prune files via footer stats.

Run: ``python examples/curation_at_scale.py``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.functions.dedup import minhash_lsh_pairs  # noqa: E402
from beavers_spark.functions.terms import (  # noqa: E402
    lm_score,
    train_unigram_lm,
)
from beavers_spark.plans.common import t  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402
from beavers_spark.sources.layout import (  # noqa: E402
    file_span_report,
    write_zordered,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("curation_at_scale_example")
docs = t(spark, SF_DIR, "documents")

# 1. held-out LM gate: train on the even split (stand-in for a clean
# reference corpus), score the odd split, keep the better-scoring half
lm = train_unigram_lm(
    docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id"
)
scored = lm_score(
    docs.filter(F.col("doc_id") % 2 == 1), lm, "text", "doc_id"
)
median_ppl = scored.approxQuantile("perplexity", [0.5], 0.01)[0]
kept_ids = scored.filter(F.col("perplexity") <= median_ppl).select("doc_id")
kept = docs.join(kept_ids, "doc_id", "left_semi")
n_kept = kept.count()
assert 0 < n_kept < docs.count()

# 2. capped near-dedup: identical semantics for normal buckets, chain
# linking for boilerplate mega-buckets (O(B), connectivity preserved)
pairs = minhash_lsh_pairs(
    kept, "text", "doc_id", threshold=0.8, bucket_cap=64
)
dup_ids = pairs.select(F.col("doc2").alias("doc_id")).distinct()
curated = kept.join(dup_ids, "doc_id", "left_anti")
assert curated.count() <= n_kept

# 3. Z-ordered curated layout: both columns' per-file spans narrow, so
# range filters on EITHER prune files
out = tempfile.mkdtemp(prefix="curation_example_") + "/curated"
write_zordered(
    curated.select("doc_id", "n_chars", "text"),
    out,
    ["n_chars", "doc_id"],
    n_files=8,
)
spans = file_span_report(out, ["n_chars", "doc_id"])
assert spans["n_chars"] < 0.75 and spans["doc_id"] < 0.75, spans
back = spark.read.parquet(out)
assert back.count() == curated.count()

print(
    f"curation_at_scale: {n_kept} kept by LM gate, "
    f"{back.count()} after dedup, spans={spans}"
)

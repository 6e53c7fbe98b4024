"""Analytics function library (beyond-reference surface).

Large-scale training-data pipeline operators: text statistics, exact and
near deduplication (MinHash-LSH, SimHash, n-gram Jaccard), embedding
similarity search, and multimodal column plumbing. All Catalyst-native
except the clearly-marked Pandas-UDF paths.
"""

from beavers_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_score,
    tokens,
)
from beavers_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    md5_hash64,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from beavers_spark.functions.similarity import (  # noqa: F401
    brute_force_topk,
    cosine_sim,
    lsh_bucketed_topk,
)

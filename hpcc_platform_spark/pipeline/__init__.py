"""LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
analysis (tokens, quality, language ID), and multimodal column plumbing.

These are first-class engine components (BASELINE.json north star), built
on the same DataFrame combinators as the SURVEY §2 surface and designed for
the 100 TB regime: everything is a shuffle-on-key or broadcast pattern —
no driver-side loops over data.
"""

from hpcc_platform_spark.pipeline.dedup import (
    exact_dedup_docs,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from hpcc_platform_spark.pipeline.similarity import brute_force_topk, lsh_bucket_topk
from hpcc_platform_spark.pipeline.textstats import (
    language_id,
    quality_features,
    token_count,
)

__all__ = [
    "brute_force_topk",
    "exact_dedup_docs",
    "language_id",
    "lsh_bucket_topk",
    "minhash_lsh_candidates",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_features",
    "simhash64",
    "token_count",
]

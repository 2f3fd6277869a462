"""Operator library: relational ops Spark lacks natively plus the
LLM-data-pipeline operators (dedup, similarity, text, multimodal).

The commonly composed operators are re-exported here as the package's
public API.
"""

from .asof import asof_join, asof_join_pandas
from .components import cluster_summary, connected_components
from .dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidates,
    minhash_lsh_dedup_pairs,
    minhash_signature,
    shingle,
    simhash,
    simhash_near_pairs,
)
from .rangejoin import range_join
from .scd2 import scd2_apply, scd2_init
from .sessionize import sessionize
from .similarity import (
    ann_topk,
    brute_force_topk,
    cosine,
    cosine_near_dup_pairs,
    hyperplane_lsh_buckets,
    ivf_index,
    ivf_topk,
)
from .skew import salted_agg, salted_join

__all__ = [
    "asof_join",
    "asof_join_pandas",
    "cluster_summary",
    "connected_components",
    "exact_dedup",
    "jaccard_pairs",
    "lsh_candidates",
    "minhash_lsh_dedup_pairs",
    "minhash_signature",
    "shingle",
    "simhash",
    "simhash_near_pairs",
    "range_join",
    "scd2_apply",
    "scd2_init",
    "sessionize",
    "ann_topk",
    "brute_force_topk",
    "cosine",
    "cosine_near_dup_pairs",
    "hyperplane_lsh_buckets",
    "ivf_index",
    "ivf_topk",
    "salted_agg",
    "salted_join",
]

from .blocking import normalize_pages, candidate_pairs
from .scoring import score_pairs, match_edges
from .clustering import connected_components
from .pipeline import resolve, pairwise_f1
from .evaluate import pair_metrics, clustering_pair_metrics, blocking_quality
from .incremental import incremental_components, incremental_resolve
from .neighborhood import (
    block_graph,
    multipass_snm_pairs,
    ranked_records,
    sorted_neighborhood_pairs,
    suffix_blocking_pairs,
    wep_prune,
    wnp_prune,
)

__all__ = [
    "block_graph",
    "multipass_snm_pairs",
    "incremental_components",
    "incremental_resolve",
    "ranked_records",
    "sorted_neighborhood_pairs",
    "suffix_blocking_pairs",
    "wep_prune",
    "wnp_prune",
    "normalize_pages",
    "candidate_pairs",
    "score_pairs",
    "match_edges",
    "connected_components",
    "resolve",
    "pairwise_f1",
    "pair_metrics",
    "clustering_pair_metrics",
    "blocking_quality",
]

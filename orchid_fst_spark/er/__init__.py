from .blocking import normalize_pages, candidate_pairs
from .scoring import (
    default_fs_features,
    fs_em_match_edges,
    fs_em_train,
    fs_match_weights,
    fs_three_way,
    match_edges,
    mutual_best_pairs,
    score_pairs,
    trained_fs_features,
)
from .clustering import connected_components, golden_records, star_clusters
from .pipeline import resolve, pairwise_f1
from .evaluate import (
    blocking_quality,
    clustering_pair_metrics,
    pair_metrics,
    weight_threshold_sweep,
)
from .incremental import incremental_components, incremental_resolve
from .neighborhood import (
    block_graph,
    multipass_snm_pairs,
    phonetic_blocking_pairs,
    qgram_blocking_pairs,
    ranked_records,
    sorted_neighborhood_pairs,
    suffix_blocking_pairs,
    token_blocking_pairs,
    wep_prune,
    wnp_prune,
)

__all__ = [
    "block_graph",
    "multipass_snm_pairs",
    "incremental_components",
    "incremental_resolve",
    "phonetic_blocking_pairs",
    "qgram_blocking_pairs",
    "ranked_records",
    "sorted_neighborhood_pairs",
    "suffix_blocking_pairs",
    "token_blocking_pairs",
    "wep_prune",
    "wnp_prune",
    "normalize_pages",
    "candidate_pairs",
    "score_pairs",
    "match_edges",
    "default_fs_features",
    "fs_match_weights",
    "fs_em_train",
    "fs_em_match_edges",
    "fs_three_way",
    "trained_fs_features",
    "mutual_best_pairs",
    "connected_components",
    "golden_records",
    "star_clusters",
    "resolve",
    "pairwise_f1",
    "pair_metrics",
    "clustering_pair_metrics",
    "blocking_quality",
    "weight_threshold_sweep",
]

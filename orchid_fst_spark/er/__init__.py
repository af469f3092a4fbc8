from .blocking import normalize_pages, candidate_pairs
from .scoring import score_pairs, match_edges
from .clustering import connected_components
from .pipeline import resolve, pairwise_f1

__all__ = [
    "normalize_pages",
    "candidate_pairs",
    "score_pairs",
    "match_edges",
    "connected_components",
    "resolve",
    "pairwise_f1",
]

from .dictionary import (
    build_dict,
    match_lookup,
    prefix_lookup,
    range_lookup,
    fuzzy_lookup,
    fuzzy_join,
    fuzzy_self_pairs,
)

__all__ = [
    "build_dict",
    "match_lookup",
    "prefix_lookup",
    "range_lookup",
    "fuzzy_lookup",
    "fuzzy_join",
    "fuzzy_self_pairs",
]

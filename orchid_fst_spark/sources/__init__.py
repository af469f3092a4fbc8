from .fixtures import (
    gen_dict_words,
    gen_dict_kv,
    gen_pages,
    gen_sort_lines,
    fuzzy_golden,
)

__all__ = [
    "gen_dict_words",
    "gen_dict_kv",
    "gen_pages",
    "gen_sort_lines",
    "fuzzy_golden",
]

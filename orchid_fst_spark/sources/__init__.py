from .bucketed import read_table, write_bucketed
from .fixtures import (
    gen_dict_words,
    gen_dict_kv,
    gen_pages,
    gen_sort_lines,
    fuzzy_golden,
)

__all__ = [
    "read_table",
    "write_bucketed",
    "gen_dict_words",
    "gen_dict_kv",
    "gen_pages",
    "gen_sort_lines",
    "fuzzy_golden",
]

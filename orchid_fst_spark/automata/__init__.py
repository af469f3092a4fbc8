from .lev_dfa import LevenshteinDFA, compile_dfa
from .trie import Trie, trie_dfa_matches, deletion_variants

__all__ = [
    "LevenshteinDFA",
    "compile_dfa",
    "Trie",
    "trie_dfa_matches",
    "deletion_variants",
]

from .distance import (
    levenshtein,
    osa,
    damerau_levenshtein,
    batch_levenshtein,
    batch_levenshtein_py,
)
from .similarity import jaro_winkler

__all__ = [
    "levenshtein",
    "osa",
    "damerau_levenshtein",
    "batch_levenshtein",
    "batch_levenshtein_py",
    "jaro_winkler",
]

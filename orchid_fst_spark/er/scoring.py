"""Pairwise scoring stage.

Candidate key pairs get three similarity features in one Arrow pass —
banded OSA edit distance (numpy kernel), Jaro-Winkler
(DuckDB-compatible), token Jaccard (pure Catalyst array ops) — and a
boolean decision column.  The default decision reproduces the
reference's fuzzy-match semantics (dist <= k); the similarity features
support threshold rules for messier real-world keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.normalize import tokens
from ..functions.vectorized import jaro_winkler_sim


def score_pairs(pairs: DataFrame, a: str = "key_a", b: str = "key_b") -> DataFrame:
    """Add jw / token_jaccard columns to verified candidate pairs (which
    already carry the banded ``dist``)."""
    ta, tb = tokens(F.regexp_replace(a, "[/-]", " ")), tokens(
        F.regexp_replace(b, "[/-]", " ")
    )
    inter = F.size(F.array_intersect(F.array_distinct(ta), F.array_distinct(tb)))
    union = F.size(F.array_union(ta, tb))
    return (
        pairs.withColumn("jw", jaro_winkler_sim(F.col(a), F.col(b)))
        .withColumn(
            "token_jaccard",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)),
        )
    )


def match_edges(
    scored: DataFrame,
    k: int = 2,
    jw_floor: float = 0.0,
    jaccard_floor: float = 0.0,
) -> DataFrame:
    """Decision: edit distance within k (reference IsMatch semantics),
    optionally tightened by similarity floors.  Returns the edge list
    (key_a, key_b) for transitive clustering."""
    cond = F.col("dist") <= k
    if jw_floor > 0:
        cond = cond & (F.col("jw") >= jw_floor)
    if jaccard_floor > 0:
        cond = cond & (F.col("token_jaccard") >= jaccard_floor)
    return scored.filter(cond).select("key_a", "key_b")

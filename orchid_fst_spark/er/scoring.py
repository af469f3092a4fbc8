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


def fs_match_weights(
    scored: DataFrame,
    features: list[tuple[str, F.Column, float, float]] | None = None,
) -> DataFrame:
    """Fellegi–Sunter match weights (Fellegi & Sunter, JASA 1969) over
    scored candidate pairs: each feature contributes ``log2(m/u)`` on
    agreement and ``log2((1-m)/(1-u))`` on disagreement, where m/u are
    the feature's agreement probabilities among true matches /
    non-matches (caller-trained parameters — the documented model seam,
    like the hashed classifier's weights).

    ``features``: ``[(name, agreement_condition, m, u)]``; the default
    set uses the three similarity features ``score_pairs`` computes
    (edit distance <= 1, Jaro-Winkler >= 0.9 on the 6dp-rounded value,
    token Jaccard >= 0.5) with textbook-shaped priors.

    Adds one boolean ``agree_<name>`` per feature and ``fs_weight`` —
    the sum of per-feature weights, rounded 6dp.  All weights are
    PYTHON-computed literals folded into the plan (one fixed-order sum
    of constants per row, map-side, zero exchanges, and bit-exact in
    any engine — no runtime log calls).  Decide matches by thresholding
    ``fs_weight`` between the sorted weight masses of labeled pairs.
    """
    import math

    if features is None:
        features = [
            ("dist", F.col("dist") <= 1, 0.9, 0.01),
            ("jw", F.round(F.col("jw"), 6) >= 0.9, 0.85, 0.02),
            (
                "jaccard",
                F.round(F.col("token_jaccard"), 6) >= 0.5,
                0.8,
                0.05,
            ),
        ]
    out = scored
    total = F.lit(0.0)
    for name, cond, m, u in features:
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"feature {name}: need 0 < u < m < 1, got m={m} u={u}"
            )
        agree_w = math.log2(m / u)
        disagree_w = math.log2((1.0 - m) / (1.0 - u))
        out = out.withColumn(f"agree_{name}", cond)
        total = total + F.when(
            F.col(f"agree_{name}"), F.lit(agree_w)
        ).otherwise(F.lit(disagree_w))
    return out.withColumn("fs_weight", F.round(total, 6))

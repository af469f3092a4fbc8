"""Deterministic sampling / splitting operators for training-data
pipelines.

Hash-based Bernoulli sampling keyed on a stable id — the reproducible
alternative to ``df.sample()`` (whose RNG draw depends on partitioning
and Spark version).  The unit hash is md5-derived exactly like the
engine's LSH hyperplanes, so DuckDB oracles reproduce the selection
bit-for-bit: ``unit = int(md5(seed|key)[:8], 16) / 2^32``.

Scale design: the per-stratum rate table is a tiny broadcast join (a
rates map over languages/domains is ≤1e6 rows), the filter itself is a
pure Catalyst predicate evaluated map-side — no shuffle of the corpus
at all, and the selection is stable under repartitioning, insertion
order, and cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_UNIT_DEN = float(2**32)


def hash_unit(key: Column, seed: str = "s1") -> Column:
    """Deterministic uniform [0, 1) draw from ``md5(seed|key)`` (first
    8 hex chars as a 32-bit integer)."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_UNIT_DEN)


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, seed: str = "s1"
) -> DataFrame:
    """Keep each row iff its key's unit hash < ``rate`` — deterministic,
    partitioning-independent Bernoulli sampling."""
    return df.filter(hash_unit(F.col(key_col), seed) < float(rate))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: str = "s1",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: row kept iff
    ``hash_unit(key) < rates.get(stratum, default_rate)``.  The rates
    map joins in as a broadcast table (scales to ~1e6 strata — per-
    domain rates — without a driver-side literal CASE of that size).
    Strata absent from ``rates`` fall back to ``default_rate``.
    """
    spark = df.sparkSession
    # fixed internal column names (a caller's column name interpolated
    # into DDL would crash on non-identifier names); the join matches
    # the stratum as a STRING on both sides so a non-string stratum
    # column compares under one explicit, engine-stable cast instead of
    # whichever implicit coercion Spark picks
    rate_df = spark.createDataFrame(
        [(str(k), float(v)) for k, v in sorted(rates.items())],
        "_stratum string, _rate double",
    )
    joined = df.join(
        F.broadcast(rate_df),
        F.col(stratum_col).cast("string") == F.col("_stratum"),
        "left",
    )
    return (
        joined.withColumn(
            "_rate", F.coalesce("_rate", F.lit(float(default_rate)))
        )
        .filter(hash_unit(F.col(key_col), seed) < F.col("_rate"))
        .drop("_rate", "_stratum")
    )


def es_priority(key: Column, weight: Column, seed: str = "w1") -> Column:
    """Efraimidis–Spirakis A-Res selection priority for weighted
    sampling without replacement: ``ln(u) / w`` — the monotone twin of
    the textbook ``u^(1/w)`` key (TOMS 2006; public literature).  The
    uniform draw ``u = (h + 0.5) / 2^32`` is md5-derived like
    :func:`hash_unit` but offset half a step so ``u`` is strictly
    inside (0, 1) (``ln(0)`` can never appear).  Rounded to 6 dp so the
    DuckDB oracle twin orders identically (ties are broken by the key
    column at the call sites)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(_UNIT_DEN)
    return F.round(F.ln(u) / weight.cast("double"), 6)


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, k: int, seed: str = "w1"
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the ``k``
    rows with the largest :func:`es_priority` (ties broken by the key
    ascending), i.e. row ``i`` wins with probability proportional to
    its weight, jointly correct for all ``k`` (A-Res).  Rows with
    non-positive or NULL weight are excluded.

    Scale notes: ``orderBy(...).limit(k)`` plans as
    TakeOrderedAndProject — a per-partition top-k heap plus a driver
    merge of ``n_partitions * k`` rows; the corpus is never globally
    sorted and never shuffled.  Selection is partitioning-independent
    (pure function of key, weight, seed), so re-runs and cluster
    resizes reproduce the identical sample.
    """
    pri = es_priority(F.col(key_col), F.col(weight_col), seed)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", pri)
        .orderBy(F.desc("es_key"), F.col(key_col))
        .limit(int(k))
    )


def train_eval_split(
    df: DataFrame, key_col: str, eval_frac: float, seed: str = "split"
) -> DataFrame:
    """Add a ``split`` column ('eval' iff the key's unit hash <
    ``eval_frac``, else 'train') — the standard leakage-safe holdout
    assignment: a key always lands in the same split regardless of
    partitioning, re-runs, or corpus growth."""
    return df.withColumn(
        "split",
        F.when(hash_unit(F.col(key_col), seed) < float(eval_frac), "eval")
        .otherwise("train"),
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    seed: str = "q1",
) -> DataFrame:
    """Per-group quota sampling: keep a deterministic uniform sample of
    at most ``k`` rows per group — the corpus-balancing pass that stops
    a handful of mega-domains from dominating a training mix (domain /
    language quotas).

    Which rows survive is decided by a per-key md5 priority (the
    engine's standard hash-unit draw), so the selection is
    partitioning-independent, stable under corpus growth *outside* the
    group (new docs in other domains never change this domain's picks),
    and reproducible in any engine — unlike ``df.sample`` or an
    arbitrary LIMIT per group.  Within a group, adding rows can only
    displace the largest priorities (a uniform reservoir, Efraimidis-
    Spirakis with unit weights).

    Plan: delegates to ``ranking.group_topk`` ordered by (priority,
    key) — Spark's partial WindowGroupLimit executes BELOW the
    exchange, so even a mega-group ships at most k rows per map
    partition, never its full membership."""
    from .ranking import group_topk

    pr = hash_unit(F.col(key_col), seed)
    out = group_topk(
        df.withColumn("_pr", pr),
        group_cols,
        [F.col("_pr").asc(), F.col(key_col).asc()],
        k,
        rank_col="_rk",
    )
    return out.drop("_pr", "_rk")

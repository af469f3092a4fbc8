"""Mergeable probabilistic sketches: HyperLogLog and Count-Min.

The two constant-memory summaries a 100 TB corpus pipeline leans on —
distinct counting (how many unique hosts / normalized keys / shingles?)
without a giant ``distinct`` shuffle, and frequency estimation (how
often does this token appear?) without materializing the full term
dictionary.  Public-literature constructions only (Flajolet et al.
AofA'07 HyperLogLog; Cormode–Muthukrishnan J.Alg'05 Count-Min); no
reference-file grounding — this is the training-data-pipeline family.

Determinism discipline (the engine's md5 idiom, see sampling.hash_unit):
every hash is ``int(md5(seed|value)[:8], 16)`` — a 32-bit draw both
Spark and DuckDB compute bit-identically — and every sketch cell is an
INTEGER (register max-rank, bucket count), so the oracle compares
exactly.  The only doubles appear in the final HLL estimate, which is
one literal-over-integer division (single IEEE op, identical in both
engines) plus the documented linear-counting ``ln`` branch.

Scale notes: both sketches are one hash aggregate with map-side partial
combine down to a fixed number of rows (``2^p`` registers / ``d*w``
cells) — mergeable across partitions, days, and crawls by construction
(max for HLL, sum for CMS), so incremental corpus accounting never
re-scans history.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hll_registers",
    "hll_summary",
    "hll_estimate",
    "cms_sketch",
    "cms_lookup",
    "bloom_sketch",
    "bloom_probe",
    "bloom_collect",
    "bloom_contains",
]


def _h32(value: Column, seed: str) -> Column:
    """32-bit integer draw from md5(seed|value) — the engine-wide idiom."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), value.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    value_col: str,
    p: int = 9,
    seed: str = "hll",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register table for the values of ``value_col``:
    ``(group…, register, rho)`` with ``register`` = top ``p`` bits of
    the 32-bit md5 draw and ``rho`` = max over the register's values of
    (leading zeros of the remaining ``q = 32 - p`` bits) + 1.
    ``group_cols`` gives one independent sketch per group (per-host /
    per-language distinct accounting — each group is bounded at ``2^p``
    rows, so a million-host profile is a million small sketches, never
    a million ``distinct`` shuffles).

    Only registers that saw at least one value appear (absent register
    == rank 0); :func:`hll_summary` accounts for the missing ones.
    ``rho`` is computed as ``q + 1 - bitlength(w)`` with ``bitlength``
    = length of the base-2 string (``conv(w, 10, 2)``) — pure integer/
    string ops, so the DuckDB twin (``length(printf('%b', w))``) is
    bit-exact.  One hash aggregate, output is at most ``2^p`` rows per
    group.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    q = 32 - p
    g = list(group_cols or [])
    h = _h32(F.col(value_col), seed)
    reg = F.shiftright(h, q)
    w = h.bitwiseAND(F.lit((1 << q) - 1))
    # bitlength(w) = len(base-2 repr); w == 0 -> rho = q + 1 (all zeros)
    rho = F.when(w == 0, F.lit(q + 1)).otherwise(
        F.lit(q + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *g, reg.cast("long").alias("register"), rho.cast("long").alias("rho")
        )
        .groupBy(*g, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_summary(
    registers: DataFrame, p: int = 9, group_cols: list[str] | None = None
) -> DataFrame:
    """Integer-exact summary of an HLL register table — one row (or one
    row per group): ``(group…, m, n_zero, s_num)`` where ``m = 2^p``,
    ``n_zero`` counts registers never hit, and
    ``s_num = sum(2^(q + 1 - rho))`` over hit registers **plus**
    ``n_zero * 2^(q+1)`` — i.e. the harmonic-mean denominator
    ``sum(2^-rho)`` scaled by ``2^(q+1)`` so it stays a BIGINT (max
    ``2^p * 2^(q+1) = 2^34`` at p=9).  Everything the estimator needs,
    no floats — the oracle-comparable form.
    """
    m = 1 << p
    q = 32 - p
    g = list(group_cols or [])
    aggs = [
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.count("*")).cast("long").alias("n_zero"),
        (
            F.sum(F.expr(f"shiftleft(1L, {q + 1} - rho)"))
            + (F.lit(m) - F.count("*")) * F.lit(1 << (q + 1))
        )
        .cast("long")
        .alias("s_num"),
    ]
    if g:
        return registers.groupBy(*g).agg(*aggs)
    return registers.agg(*aggs)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(summary: DataFrame, p: int = 9) -> DataFrame:
    """Cardinality estimate from :func:`hll_summary`: the standard
    ``alpha_m * m^2 / sum(2^-rho)`` raw estimate with the small-range
    linear-counting correction (``m * ln(m / n_zero)`` when the raw
    estimate <= 2.5m and some register is empty).  Adds ``est``
    (rounded to 4 dp) to the summary row.  The raw branch is one
    literal/EXACT-integer division (bit-identical across engines); only
    the linear-counting branch touches ``ln``.
    """
    m = 1 << p
    q = 32 - p
    num = _alpha(m) * m * m * float(1 << (q + 1))
    raw = F.lit(num) / F.col("s_num")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero"))
    est = F.when((raw <= 2.5 * m) & (F.col("n_zero") > 0), linear).otherwise(raw)
    return summary.withColumn("est", F.round(est, 4))


def hll_error_bound(p: int = 9) -> float:
    """Published relative standard error of HLL at ``m = 2^p``."""
    return 1.04 / math.sqrt(float(1 << p))


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """Count-Min sketch of the ``term_col`` frequency distribution:
    ``(depth, bucket, c)`` rows with ``bucket = h32(cms{j}|term) % width``
    per hash row ``j`` — at most ``depth * width`` rows regardless of
    corpus size.  Point estimates are upper bounds (min over rows
    overestimates by at most ``e * N / width`` w.h.p.).

    Scale notes: one Expand (``depth`` rows per occurrence — a static
    constant, not data-dependent) into one hash aggregate with map-side
    partial combine; sketches from different corpus slices merge by
    summing cells.
    """
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")
    rows = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("depth"),
                (_h32(F.col(term_col), f"{seed}{j}") % width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.filter(F.col(term_col).isNotNull())
        .select(F.explode(rows).alias("r"))
        .select("r.depth", "r.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def _bloom_addr(value: Column, m_bits: int, k_hashes: int, seed: str) -> Column:
    """Array of k (word, mask) structs for ``value`` — 32-bit words
    (``word = bit // 32``, ``mask = 1 << (bit % 32)``), so every mask is
    a small positive BIGINT in both engines (64-bit words would need
    1 << 63, whose signedness DuckDB and the JVM disagree about)."""
    # mask = 2^(bit % 32) computed as an exact double pow (the Python
    # shiftleft wrapper only takes a literal shift amount; 2^n for
    # n <= 31 is exactly representable, so the cast back is lossless)
    return F.array(
        *[
            F.struct(
                ((_h32(value, f"{seed}{i}") % m_bits) / F.lit(32))
                .cast("long")
                .alias("word"),
                F.pow(
                    F.lit(2.0),
                    ((_h32(value, f"{seed}{i}") % m_bits) % 32).cast("double"),
                )
                .cast("long")
                .alias("mask"),
            )
            for i in range(k_hashes)
        ]
    )


def bloom_sketch(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 18,
    k_hashes: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Bloom filter (Bloom, CACM'70) over the values of ``value_col``
    as a bounded integer word table: ``(word, bits)`` with at most
    ``m_bits / 32`` rows regardless of corpus size — the membership
    twin of the HLL/CMS sketches (have we crawled this URL / seen this
    line hash?), with one-sided error: probes answer "definitely not
    seen" or "maybe seen" (false-positive rate ~``(1-e^{-kn/m})^k``).

    Same determinism discipline as the rest of the family: bit
    positions are md5-derived (``h32(seed{i}|value) % m_bits``) and
    every cell is an integer word, so a SQL engine reproduces the
    sketch bit-for-bit.  Mergeable across corpus slices / days by
    ``bit_or`` of the word cells.

    Scale notes: one static k-way Expand per value into ONE hash
    aggregate with map-side partial combine down to the fixed word
    table — no distinct shuffle, no state proportional to the corpus."""
    if m_bits < 32 or k_hashes < 1:
        raise ValueError("need m_bits >= 32 and k_hashes >= 1")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(_bloom_addr(F.col(value_col), m_bits, k_hashes, seed)).alias("r"))
        .select("r.word", "r.mask")
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    sketch: DataFrame,
    values: list[str],
    m_bits: int = 1 << 18,
    k_hashes: int = 4,
    seed: str = "bloom",
) -> DataFrame:
    """Probe a literal value list against a ``bloom_sketch`` word
    table: ``(value, maybe_present)`` with 1 iff ALL k addressed bits
    are set (sketch misses and untouched words count as 0 bits).  The
    probe side is tiny; the sketch side is bounded at ``m_bits / 32``
    rows — the lookup is one equi-join plus one aggregate, never a
    corpus scan.  ``m_bits``/``k_hashes``/``seed`` must match the
    build call (same contract as ``cms_lookup``).  Duplicate probe
    values are deduplicated (one output row per distinct value), and
    the verdict is ``min`` over the k addressed bits — NOT a
    ``sum == k`` count, which would return a false negative whenever a
    value reached the aggregate with more than k address rows (e.g. a
    duplicated probe) and silently break the one-sided-error
    guarantee."""
    spark = sketch.sparkSession
    probe = spark.createDataFrame(
        [(v,) for v in dict.fromkeys(values)], "value string"
    )
    addr = probe.select(
        "value",
        F.explode(_bloom_addr(F.col("value"), m_bits, k_hashes, seed)).alias("r"),
    ).select("value", "r.word", "r.mask")
    hit = (
        F.col("mask").bitwiseAND(F.coalesce("bits", F.lit(0).cast("long")))
        == F.col("mask")
    )
    return (
        addr.join(sketch, "word", "left")
        .groupBy("value")
        .agg(
            F.min(F.when(hit, 1).otherwise(0))
            .cast("long")
            .alias("maybe_present")
        )
    )


def bloom_collect(sketch: DataFrame, m_bits: int) -> list[int]:
    """Collect a ``bloom_sketch`` word table to a dense driver-side
    word list (index = word, value = 32-bit mask; untouched words 0).
    The sketch is BOUNDED at ``m_bits / 32`` longs (a 2^20-bit filter
    is 32k longs ≈ 256 KB), so this is the legitimate small-side
    collect that turns the filter into a broadcastable constant —
    the bloom analog of collecting a dimension table for a broadcast
    join."""
    words = [0] * ((m_bits + 31) // 32)
    for r in sketch.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_contains(
    value: Column,
    words: list[int],
    m_bits: int = 1 << 18,
    k_hashes: int = 4,
    seed: str = "bloom",
) -> Column:
    """Map-side bloom membership COLUMN: 1 iff all k addressed bits of
    ``value`` are set in the collected word list (``bloom_collect``) —
    the corpus-scale probe path.  ``bloom_probe`` answers a literal
    probe list; this annotates/filters an arbitrarily large frame
    ("drop already-crawled URLs", "skip already-seen line hashes")
    with ZERO shuffles and no Python: the word list rides the plan as
    a literal array (bounded by ``m_bits / 32`` — keep filters at
    ~2^20 bits or below on this path; beyond that, join against the
    word table instead) and the k bit tests are plain JVM integer
    expressions.  Same one-sided error as ``bloom_probe``: 0 =
    definitely not inserted, 1 = maybe.  NULL values answer 0
    (``bloom_sketch`` never inserts NULLs, so they are definitely not
    seen) rather than propagating NULL into downstream filters.  The
    word-list length must match ``m_bits`` — a mismatched collect
    would index past the array (NULL verdicts or ANSI errors), so it
    raises here instead."""
    if m_bits < 32 or k_hashes < 1:
        raise ValueError("need m_bits >= 32 and k_hashes >= 1")
    if len(words) != (m_bits + 31) // 32:
        raise ValueError(
            f"word list has {len(words)} words but m_bits={m_bits} needs "
            f"{(m_bits + 31) // 32} — bloom_collect/bloom_contains m_bits "
            "must match"
        )
    arr = F.lit(words)  # literal array<long>, element_at is 1-based
    checks = []
    for i in range(k_hashes):
        b = _h32(value, f"{seed}{i}") % m_bits
        word = (b / F.lit(32)).cast("long")
        mask = F.pow(F.lit(2.0), (b % 32).cast("double")).cast("long")
        checks.append(
            F.element_at(arr, (word + 1).cast("int")).bitwiseAND(mask) == mask
        )
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.when(value.isNull(), F.lit(0)).otherwise(out.cast("long")).cast(
        "long"
    )


def cms_lookup(
    sketch: DataFrame,
    terms: list[str],
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """Point-query the sketch for a literal probe list: ``(term, est)``
    with ``est = min`` over the ``depth`` rows of the addressed cell
    (0 when a cell was never touched).  The probe table is tiny and
    broadcast; the sketch side is at most ``depth * width`` rows — the
    whole lookup is a broadcast join plus one aggregate, never a scan
    of the corpus.
    """
    spark = sketch.sparkSession
    probe = spark.createDataFrame([(t,) for t in terms], "term string")
    addr = probe.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("depth"),
                        (_h32(F.col("term"), f"{seed}{j}") % width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("r"),
    ).select("term", "r.depth", "r.bucket")
    return (
        addr.join(sketch, ["depth", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("c", F.lit(0).cast("long"))).alias("est"))
    )

"""Sort-policy operators (the reference's lfsort subsystem, re-expressed).

The reference's distributed sort (hash split -> per-split sort -> k-way
merge, large_file_sorter.cpp) *is* Spark's Exchange + Sort; what survives
as engine semantics is the policy layer: sort by the *trimmed* line while
emitting the raw line (large_file_sorter.cpp:229-241), and the keep/drop
blank-line switch with an abandoned-line counter
(large_file_sorter.cpp:330-333, 492-494)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _trimmed(col) -> Column:
    """Strip the reference's whitespace set " \\t\\r\\n" from both ends
    (StringUtil::TrimString, string_util.cpp — Spark's ``trim`` strips
    only ASCII space, which diverges on tab-indented lines)."""
    return F.regexp_replace(col, r"^[ \t\r\n]+|[ \t\r\n]+$", "")


def sorted_lines(
    lines: DataFrame,
    line_col: str = "line",
    keep_blank: bool = True,
    seq_col: str | None = None,
) -> DataFrame:
    """Globally sort raw lines by their trimmed value.  Blank/whitespace-
    only lines are kept (sorted first) or dropped per ``keep_blank``.

    Tie-break among equal trimmed keys: ``seq_col`` (an input sequence
    number) when given — this reproduces the reference's *stable*
    insertion-order semantics byte-for-byte (multimap insertion,
    large_file_sorter.cpp:229-241) — else the raw line, which is
    deterministic but not insertion-stable."""
    df = lines.withColumn("_k", _trimmed(F.col(line_col)))
    if not keep_blank:
        df = df.filter(F.length("_k") > 0)
    tie = seq_col if seq_col else line_col
    return df.orderBy("_k", tie).select(line_col)


def sort_metrics(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """input/blank(abandoned)/output line counters (mirrors
    large_file_sorter.h:139-141)."""
    return lines.agg(
        F.count("*").alias("input_lines"),
        F.sum(
            (F.length(_trimmed(F.col(line_col))) == 0).cast("long")
        ).alias("blank_lines"),
        F.sum(
            (F.length(_trimmed(F.col(line_col))) > 0).cast("long")
        ).alias("output_lines"),
    )

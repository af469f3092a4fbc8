"""Sort-policy operators (the reference's lfsort subsystem, re-expressed).

The reference's distributed sort (hash split -> per-split sort -> k-way
merge, large_file_sorter.cpp) *is* Spark's Exchange + Sort; what survives
as engine semantics is the policy layer: sort by the *trimmed* line while
emitting the raw line (large_file_sorter.cpp:229-241), and the keep/drop
blank-line switch with an abandoned-line counter
(large_file_sorter.cpp:330-333, 492-494)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sorted_lines(
    lines: DataFrame, line_col: str = "line", keep_blank: bool = True
) -> DataFrame:
    """Globally sort raw lines by their trimmed value (stable: raw line
    breaks ties so output is deterministic).  Blank/whitespace-only lines
    are kept (sorted first) or dropped per ``keep_blank``."""
    df = lines.withColumn("_k", F.trim(F.col(line_col)))
    if not keep_blank:
        df = df.filter(F.length("_k") > 0)
    return df.orderBy("_k", line_col).select(line_col)


def sort_metrics(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """input/blank(abandoned)/output line counters (mirrors
    large_file_sorter.h:139-141)."""
    return lines.agg(
        F.count("*").alias("input_lines"),
        F.sum(
            (F.length(F.trim(F.col(line_col))) == 0).cast("long")
        ).alias("blank_lines"),
        F.sum(
            (F.length(F.trim(F.col(line_col))) > 0).cast("long")
        ).alias("output_lines"),
    )

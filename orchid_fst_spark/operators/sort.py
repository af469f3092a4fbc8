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


def ranked_lines(
    lines: DataFrame,
    line_col: str = "line",
    keep_blank: bool = True,
    seq_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``sorted_lines`` plus a global 1-based ``rank`` column — without a
    single-partition exchange.

    A naive ``row_number() OVER (ORDER BY ...)`` collapses everything
    onto one task.  Here the rank is a two-pass computation that stays
    fully parallel at any scale:

      1. range-repartition on the sort key + sort within partitions
         (globally sorted across ordered partitions — Spark's Exchange
         rangepartitioning, the same plan a global orderBy produces);
      2. one cheap counting job per partition (``spark_partition_id``
         groupBy — n_partitions scalar rows to the driver);
      3. rank = partition offset + local position, where the local
         position is ``row_number() OVER (PARTITION BY _pid ORDER BY
         _k, tie)`` — one window task per partition, fully parallel at
         any scale (n_partitions balanced window groups, never a
         single-partition exchange).  NOT derived from
         ``monotonically_increasing_id`` bit-slicing: the
         partition_id<<33 layout is an implementation detail Spark
         documents no contract for, and the ids are documented as
         non-consecutive.

    Duplicate lines get distinct consecutive ranks in an arbitrary order
    among themselves (same multiset of (line, rank) rows as any engine's
    row_number over the same ordering).  The sorted frame is
    ``localCheckpoint``ed between the two passes: both jobs observe one
    materialization, lineage is truncated, and — unlike a ``cache()``
    this function could never unpersist — the blocks are released by the
    ContextCleaner as soon as the caller drops the returned frame."""
    df = lines.withColumn("_k", _trimmed(F.col(line_col)))
    if not keep_blank:
        df = df.filter(F.length("_k") > 0)
    tie = seq_col if seq_col else line_col
    if num_partitions:
        n = num_partitions
    else:
        try:
            # 'auto' under AQE-coalescing setups is not int()-able
            n = int(
                lines.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except ValueError:
            n = lines.sparkSession.sparkContext.defaultParallelism
    srt = (
        df.repartitionByRange(n, F.col("_k"), F.col(tie))
        .sortWithinPartitions("_k", tie)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in srt.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    spark = lines.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    from pyspark.sql import Window

    local_pos = F.row_number().over(
        Window.partitionBy("_pid").orderBy("_k", tie)
    )
    return (
        srt.join(F.broadcast(off_df), "_pid")
        .withColumn("rank", (F.col("_off") + local_pos).cast("long"))
        .select(line_col, "rank")
    )


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

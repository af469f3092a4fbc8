#!/usr/bin/env python
"""`lfsort` — the reference's large-file sorter CLI
(large_file_sort_cmd.cpp:31-37), Spark-backed.

    lfsort -f input.txt -o output.txt [-i] [-t threads]

Semantics match the reference byte-for-byte (the goldens under the
reference's testdata are reproduced by tests/test_reference_golden.py):
lines sort by their TRIMMED value (whitespace set " \\t\\r\\n"), ties
keep input order (stable), raw lines are emitted; -i drops
blank/whitespace-only lines and reports them as abandoned.  -w/-s/-p
are accepted for drop-in compatibility; Spark's Exchange+Sort replaces
the split/merge machinery they tuned.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lfsort", description=__doc__)
    ap.add_argument("-f", "--input-file", required=True)
    ap.add_argument("-o", "--output-file", required=True)
    ap.add_argument("-i", "--ignore-empty-line", action="store_true")
    ap.add_argument("-t", "--thread-count", type=int, default=4)
    ap.add_argument("-w", "--work-directory", default="/tmp")  # compat
    ap.add_argument("-s", "--split-file-count", type=int, default=8)  # compat
    ap.add_argument("-p", "--parallel-task-count", type=int, default=3)  # compat
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from orchid_fst_spark.operators.sort import sort_metrics, sorted_lines
    from orchid_fst_spark.session import get_spark

    spark = get_spark(
        app_name="lfsort_cli",
        cores=args.thread_count,
        shuffle_partitions=max(args.thread_count * 2, 4),
    )
    # foreign-cwd safety: ship the package to python workers (addPyFile)
    import __spark_entry__ as entrymod

    entrymod._ship_package(spark)
    # single-file text read: one partition, monotonic id = input order
    # (the stable-sort tie-break the reference's multimap gives)
    lines = (
        spark.read.text(args.input_file)
        .coalesce(1)
        .select(F.col("value").alias("line"), F.monotonically_increasing_id().alias("seq"))
    )
    out = sorted_lines(
        lines, keep_blank=not args.ignore_empty_line, seq_col="seq"
    )
    with open(args.output_file, "w") as f:
        for r in out.collect():
            f.write(r.line + "\n")
    m = sort_metrics(lines.select("line")).collect()[0]
    print(
        f"sorted {m.input_lines} lines -> {args.output_file} "
        f"(blank/abandoned: {m.blank_lines})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

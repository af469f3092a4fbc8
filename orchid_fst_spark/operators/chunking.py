"""Document chunking and sequence packing for training-data pipelines
(tokenizer/context-window preparation; published pretraining practice —
no reference-file grounding, part of the training-data operator family
layered on top of the orchid-fst surface).

``chunk_documents`` splits each document's token stream into fixed-size
(optionally overlapping) windows — the standard context-window slicing
step before embedding or pretraining.  ``pack_sequences`` assigns each
document its position in a stream of fixed-token-budget training
sequences (a packing manifest: seq_id + offset), the greedy
concatenate-then-split layout used by most LM data loaders.

Scale design (100 TB):

* chunking is row-local: tokenize -> explode a per-doc offset sequence
  -> slice.  No shuffle at all; output size is the inherent chunk
  count.  The token array is materialized once per row below the
  Generate and referenced only as a plain slice argument (never inside
  a lambda body — the recorded CollapseProject HOF trap);
* packing needs a GLOBAL running total, which a naive
  ``sum() OVER (ORDER BY id)`` would compute on a single task.  Here it
  is the same two-pass distributed scan as ``sort.ranked_lines``:
  range-repartition by id, one per-partition counting job (n_partitions
  scalar rows to the driver), then partition-local window cumsums
  shifted by broadcast offsets — fully parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.normalize import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Fixed-size token windows per document: ``(id, chunk_id,
    n_tokens, chunk_text)``.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)``
    (0-based), for every offset ``i*stride`` strictly inside the
    document — so trailing chunks may be short, every token belongs to
    at least one chunk, and ``stride < chunk_tokens`` yields sliding
    overlap.  Empty documents (no tokens) emit no chunks.
    """
    stride = chunk_tokens if stride is None else stride
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("need chunk_tokens > 0 and stride > 0")
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    ).filter(F.size("_t") > 0)
    n_off = F.floor((F.size("_t") - 1) / stride).cast("int")
    ex = base.select(
        "id", "_t", F.explode(F.sequence(F.lit(0), n_off)).alias("chunk_id")
    )
    piece = F.slice("_t", F.col("chunk_id") * stride + 1, chunk_tokens)
    return ex.select(
        "id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_tokens: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Packing manifest ``(id, n_tokens, seq_id, seq_offset)``: lay the
    documents out in ``id`` order as one concatenated token stream cut
    into consecutive ``seq_tokens``-sized training sequences; a document
    starts in sequence ``seq_id`` at position ``seq_offset`` (documents
    may straddle a boundary — the boundary-free greedy layout LM loaders
    use).  ``id`` values must be unique (they define the layout order).

    The global running total is the two-pass distributed cumsum
    described in the module docstring — no single-partition window.
    The sorted frame is ``localCheckpoint``ed so both passes observe one
    materialization (same rationale as ``sort.ranked_lines``).
    """
    if seq_tokens <= 0:
        raise ValueError("need seq_tokens > 0")
    df = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    if num_partitions:
        n = num_partitions
    else:
        try:
            n = int(
                docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except ValueError:
            n = docs.sparkSession.sparkContext.defaultParallelism
    srt = (
        df.repartitionByRange(n, "id")
        .sortWithinPartitions("id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = sorted(
        (r["_pid"], r["s"])
        for r in srt.groupBy("_pid")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((int(pid), int(acc)))
        acc += int(s or 0)
    off_df = docs.sparkSession.createDataFrame(
        offsets, "_pid int, _off long"
    )
    local_before = F.coalesce(
        F.sum("n_tokens").over(
            Window.partitionBy("_pid")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    before = (F.col("_off") + local_before).alias("_before")
    return (
        srt.join(F.broadcast(off_df), "_pid")
        .select("id", "n_tokens", before)
        .select(
            "id",
            "n_tokens",
            # exact integral division: _before is the GLOBAL token
            # cumsum; long `/` in Spark is DOUBLE division, which loses
            # integer exactness past 2^53 — within reach of a
            # long-running 100 TB pipeline.  _before >= 0, so
            # truncating div == floor
            F.call_function("div", F.col("_before"), F.lit(int(seq_tokens)))
            .cast("long")
            .alias("seq_id"),
            (F.col("_before") % seq_tokens).cast("long").alias("seq_offset"),
        )
    )


def write_packed_shards(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_tokens: int = 2048,
    seqs_per_shard: int = 1024,
    num_partitions: int | None = None,
    mode: str = "error",
) -> DataFrame:
    """Materialize the ``pack_sequences`` layout as the shard-
    partitioned parquet artifact a training loader actually reads —
    the sink end of the training-data pipeline (dedup/filter upstream,
    chunk/pack here, loaders stream shards).

    A shard covers a CONTIGUOUS token range of ``seqs_per_shard *
    seq_tokens`` tokens, and every document contributes exactly the
    token SLICE that falls inside each shard it touches (a document
    straddling shard boundaries appears in every shard it spans, each
    row carrying only that shard's tokens) — so reading the shard
    directories [a, b) yields the COMPLETE, exact token stream of that
    range, no matter how long any single document is, and every
    shard's token count is exactly the shard budget (except the last).
    Rows carry ``(shard, gstart, id, n_tokens, slice_tokens,
    <text_col>)`` — ``gstart`` the slice's global token offset (the
    in-shard sort key), ``n_tokens`` the document's full length,
    ``slice_tokens`` this row's contribution — and are in-file sorted
    by ``(gstart, id)``; ``shard`` is a PARTITION DIRECTORY, so a
    loader (or resume) asking for a shard range prunes at planning
    time (the same contract as the persisted text/fuzzy indexes).

    Scale notes: one range exchange inside ``pack_sequences`` (the
    distributed cumsum), one id-keyed join to re-attach the text, a
    row-local slice explode (fan-out = shards spanned, usually 1), and
    one hash exchange on ``shard`` before the write.

    Returns the written artifact re-read, with ``shard`` cast back to
    the long it was computed as (partition-directory inference would
    otherwise narrow it to int)."""
    if seqs_per_shard <= 0:
        raise ValueError("need seqs_per_shard > 0")
    shard_tokens = int(seqs_per_shard) * int(seq_tokens)
    man = pack_sequences(docs, id_col, text_col, seq_tokens, num_partitions)
    # global token offset of the document start; integer div throughout
    # (the `/ then cast` double path loses exactness at ~2^43 quotients)
    g0 = F.expr(f"seq_id * {int(seq_tokens)} + seq_offset")
    with_text = (
        man.withColumn("gstart0", g0)
        .join(
            docs.select(
                F.col(id_col).alias("id"), F.col(text_col).alias(text_col)
            ),
            "id",
        )
        .withColumn("_toks", tokens(F.col(text_col)))
    )
    first_s = F.expr(f"gstart0 div {shard_tokens}")
    last_s = F.expr(
        f"greatest((gstart0 + n_tokens - 1) div {shard_tokens},"
        f" gstart0 div {shard_tokens})"  # n_tokens = 0 keeps one row
    )
    sliced = (
        with_text.withColumn(
            "shard", F.explode(F.sequence(first_s, last_s))
        )
        .withColumn(
            "gstart",
            F.greatest(F.expr(f"shard * {shard_tokens}"), F.col("gstart0")),
        )
        .withColumn(
            "slice_tokens",
            F.least(
                F.expr(f"(shard + 1) * {shard_tokens}"),
                F.col("gstart0") + F.col("n_tokens"),
            )
            - F.col("gstart"),
        )
        .select(
            "shard",
            "gstart",
            "id",
            "n_tokens",
            F.col("slice_tokens").cast("long").alias("slice_tokens"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("_toks"),
                    (F.col("gstart") - F.col("gstart0") + 1).cast("int"),
                    F.greatest(F.col("slice_tokens"), F.lit(0)).cast("int"),
                ),
            ).alias(text_col),
        )
    )
    (
        sliced.repartition("shard")
        .sortWithinPartitions("shard", "gstart", "id")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out_dir)
    )
    back = docs.sparkSession.read.parquet(out_dir)
    return back.withColumn("shard", F.col("shard").cast("long"))


def read_packed_shards(
    spark,
    path: str,
    shard_lo: int | None = None,
    shard_hi: int | None = None,
) -> DataFrame:
    """Loader-side read of the ``write_packed_shards`` artifact: the
    slice rows of shard directories ``[shard_lo, shard_hi)``, pruned at
    PLANNING time (the range filter lands on the raw partition column
    BEFORE the long cast, so it becomes a PartitionFilter — only the
    asked directories are even listed; plan + inputFiles pinned in
    tests/test_chunk_interval_setsim.py).  Because every shard carries
    exactly its token range, the result is the complete token stream of
    ``[shard_lo * shard_tokens, shard_hi * shard_tokens)`` — the
    resume/DDP contract: worker i reads its own shard range and nothing
    else."""
    df = spark.read.parquet(path)
    if shard_lo is not None:
        df = df.filter(F.col("shard") >= int(shard_lo))
    if shard_hi is not None:
        df = df.filter(F.col("shard") < int(shard_hi))
    return df.withColumn("shard", F.col("shard").cast("long"))


def sequences_from_shards(
    slices: DataFrame, text_col: str = "text", seq_tokens: int = 2048
) -> DataFrame:
    """Reconstruct the actual training sequences ``(seq_id, n_tokens,
    seq_text)`` from packed-shard slice rows — the inverse of
    ``pack_sequences`` + ``write_packed_shards`` (round-trip pinned by
    test: concatenating the sequences in seq_id order reproduces the
    corpus token stream in id order, every sequence exactly
    ``seq_tokens`` tokens except the last).

    Row-local re-slice (a slice spans the sequences it crosses — fan-out
    usually 1) then ONE groupBy(seq_id) assembling the pieces with an
    in-aggregate array_sort by global offset; a group holds at most
    ``seq_tokens`` tokens, so the aggregation buffer is bounded by the
    sequence budget, never by document length."""
    if seq_tokens <= 0:
        raise ValueError("need seq_tokens > 0")
    base = slices.filter(F.col("slice_tokens") > 0).select(
        "gstart", "slice_tokens", tokens(F.col(text_col)).alias("_toks")
    )
    first_q = F.expr(f"gstart div {int(seq_tokens)}")
    last_q = F.expr(f"(gstart + slice_tokens - 1) div {int(seq_tokens)}")
    ex = base.withColumn("seq_id", F.explode(F.sequence(first_q, last_q)))
    pstart = F.greatest(
        F.expr(f"seq_id * {int(seq_tokens)}"), F.col("gstart")
    )
    pend = F.least(
        F.expr(f"(seq_id + 1) * {int(seq_tokens)}"),
        F.col("gstart") + F.col("slice_tokens"),
    )
    piece = F.slice(
        F.col("_toks"),
        (pstart - F.col("gstart") + 1).cast("int"),
        (pend - pstart).cast("int"),
    )
    pieces = ex.select(
        "seq_id",
        pstart.alias("pstart"),
        (pend - pstart).cast("long").alias("p_n"),
        F.array_join(piece, " ").alias("piece"),
    )
    ps = F.array_sort(F.collect_list(F.struct("pstart", "piece")))
    return (
        pieces.groupBy("seq_id")
        .agg(F.sum("p_n").alias("n_tokens"), ps.alias("_ps"))
        .select(
            "seq_id",
            "n_tokens",
            F.array_join(
                F.transform("_ps", lambda s: s["piece"]), " "
            ).alias("seq_text"),
        )
    )

"""Sequence packing: lay the corpus out as one token stream (docs
concatenated in id order) and cut it into fixed-length training
sequences -- the GPT-style "concat and chunk" batch-prep step. The
operator computes each document's [start, end) offset in the stream and
which sequences it lands in, so a pipeline can route docs to sequence
shards and count boundary-crossing docs (the ones a packer either
splits or pads around).

Scale design -- the whole point is avoiding the naive formulation:

- A global ``Window.orderBy(id)`` prefix sum moves the ENTIRE corpus
  into one task (Spark plans an empty-frame window as a single
  partition). At 100 TB that's not slow, it's impossible.
- Instead: hierarchical scan. Range-partition by id (so partition p
  holds an id-contiguous slice), compute the per-partition token total
  (one tiny aggregate: #partitions rows), exclusive-prefix-sum those ON
  THE DRIVER (bounded by partition count, not data size -- the same
  bounded-collect pattern as k-means centroids), broadcast the offsets
  back, and do the intra-partition running sum with an ordinary
  partitioned window. Total cost: one range shuffle + one map-side
  window; the only driver traffic is one long per partition.
- The range-partitioned frame is persisted so the totals job and the
  main job see the SAME partition boundaries (range partitioning
  samples; two independent computations could split differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from testlog_etl_spark.util import persist_once


def with_stream_offsets(
    df: DataFrame, id_col: str, tok_col: str, num_parts: int = 32
) -> DataFrame:
    """Add ``start`` = exclusive prefix sum of ``tok_col`` in ``id_col``
    order (the doc's first-token offset in the concatenated stream).

    Caller must eventually unpersist or let the persisted intermediate
    age out; it is needed only while this plan is alive.
    """
    # a null token count contributes 0 to the stream and must not
    # poison the row's own offset (sum-over-window would yield null)
    ranged = persist_once(
        df.withColumn("_tok0", F.coalesce(F.col(tok_col).cast("long"), F.lit(0)))
        .repartitionByRange(num_parts, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    totals = ranged.groupBy("_pid").agg(F.sum("_tok0").alias("_t")).collect()
    acc = 0
    offsets = []
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["_t"] or 0
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["_pid", "_off"]) if offsets else None
    w = Window.partitionBy("_pid").orderBy(id_col)
    local = ranged.withColumn("_local", F.sum("_tok0").over(w) - F.col("_tok0"))
    if off_df is None:
        return local.withColumn("start", F.col("_local")).drop("_pid", "_local", "_tok0")
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn("start", (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_pid", "_local", "_off", "_tok0")
    )


def pack_chunks(
    df: DataFrame, id_col: str, tok_col: str, seq_len: int, num_parts: int = 32
) -> DataFrame:
    """Assign each doc its sequence span in the chunked stream:
    ``start_seq``/``end_seq`` = first/last sequence index the doc's
    tokens touch, ``crosses`` = doc straddles a sequence boundary.
    Zero-token docs get start_seq == end_seq and never cross."""
    out = with_stream_offsets(df, id_col, tok_col, num_parts)
    end = F.col("start") + F.coalesce(F.col(tok_col).cast("long"), F.lit(0))
    L = F.lit(int(seq_len))
    return (
        out.withColumn("start_seq", F.floor(F.col("start") / L))
        .withColumn(
            "end_seq",
            F.when(F.coalesce(F.col(tok_col), F.lit(0)) > 0, F.floor((end - 1) / L)).otherwise(
                F.floor(F.col("start") / L)
            ),
        )
        .withColumn("crosses", (F.col("end_seq") > F.col("start_seq")).cast("boolean"))
    )


def length_bucket(tok_count: Column, floor: int = 16, cap: int = 4096) -> Column:
    """Power-of-two padding bucket for length-bucketed batching: the
    smallest power of two >= tok_count (clamped to [floor, 2*cap] --
    docs past ``cap`` land in one overflow bucket). Batching same-bucket
    docs bounds padding waste at <50% per sequence vs pad-to-global-max;
    the ladder is explicit integer CASE arms (never float log2: whether
    log2(2^k) returns exactly k at a bucket boundary is libm-specific,
    and an off-by-one-ulp there flips a doc's bucket between engines)."""
    out = None
    b = floor
    while b <= cap:
        cond = tok_count <= b
        out = F.when(cond, b) if out is None else out.when(cond, b)
        b *= 2
    return out.otherwise(b).cast("int")


def chunk_with_overlap(
    df: DataFrame, id_col: str, text_col: str, window: int = 32, stride: int = 24
) -> DataFrame:
    """Cut each document into fixed-size token windows with overlap
    (``window`` tokens every ``stride`` -- the RAG/pretraining chunking
    step where stride < window preserves cross-boundary context).

    Emits one row per (doc, chunk): chunk_idx, chunk_len (short final
    chunks are kept, not padded -- padding is the packer's decision),
    and the chunk text. All array intrinsics (split / sequence / slice /
    explode), no Python, no shuffle: chunking is embarrassingly parallel
    and the explode multiplies rows ~n_tokens/stride-fold BEFORE any
    downstream aggregation, so callers should project away ``chunk_text``
    prior to any exchange (hash it if identity is all they need --
    the same keep-payload-out-of-shuffles rule as the dedup tiers).
    """
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    return (
        df.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n"))
        .select(id_col, "_toks", "_n", F.explode(starts).alias("_start"))
        .select(
            id_col,
            (F.col("_start") / stride).cast("int").alias("chunk_idx"),
            F.least(F.lit(window), F.col("_n") - F.col("_start")).cast("int").alias("chunk_len"),
            F.array_join(F.slice(F.col("_toks"), F.col("_start") + 1, window), " ").alias("chunk_text"),
        )
    )

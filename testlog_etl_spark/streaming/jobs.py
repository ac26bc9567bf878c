"""Streaming jobs over the driver's tables (SURVEY SS2.9).

Each job reads a parquet table as a file-source stream (the sandbox
stand-in for the reference's SQS+S3 block stream -- S2/S3), applies the
same DataFrame transform the batch path uses, and commits through either
a memory sink (bounded, query-shaped results) or `foreachBatch` +
idempotent write (the exactly-once-effect pipeline sink, T9).

Determinism: `run_to_completion` processes every available file then
stops, so results equal the batch query over the same input -- which is
exactly how each job's DuckDB oracle is phrased.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.tables import load_table, table_path

# scratch area inside the repo (sandbox: nothing outside /root/repo)
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source stream with the batch schema (streams cannot infer).
    The nanos->micros ts fix from tables.load_table is re-applied."""
    batch = load_table(spark, sf_dir, name)
    raw_schema = spark.read.parquet(table_path(sf_dir, name)).schema
    # trailing * turns the single-file path into a glob: the file source
    # requires a directory/glob (basePath must be a directory), and the
    # glob's parent becomes the basePath
    df = spark.readStream.schema(raw_schema).parquet(table_path(sf_dir, name) + "*")
    if name == "events":
        # mirror load_table's ts normalization (long nanos or TIMESTAMP_NTZ
        # -> instant TIMESTAMP): event-time watermarks reject NTZ
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    assert df.schema == batch.schema
    return df


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str = "complete") -> DataFrame:
    """Drain all available input into a memory sink, stop, return the
    result table (bounded by construction: aggregated output)."""
    spark = stream_df.sparkSession
    # no checkpoint: a persisted one would mark the input files done and
    # yield an empty table on re-run; memory-sink results are query-shaped
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-type counts -- the reference's rollup-by-key shape."""
    ev = stream_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def hourly_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window with a watermark (late-data bound).
    With the full file drained, complete-mode output equals the batch
    date_trunc aggregate."""
    ev = stream_table(spark, sf_dir, "events")
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
    )


def dedup_redelivered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once redelivery, deduped IN-STREAM: the block stream
    unioned with itself models a queue redelivering every message twice;
    ``dropDuplicatesWithinWatermark`` on the message id restores
    exactly-once semantics before any downstream transform, holding one
    state row per id only within the watermark horizon (bounded state --
    the alternative to deduping at the sink via deterministic-id
    overwrite; both are provided, like the reference's queue-ack plus
    sink-dedup belt-and-braces).

    Scale: state is keyed by event_id and expires with the watermark, so
    memory is bounded by (arrival rate x watermark), not stream length.
    """
    first = stream_table(spark, sf_dir, "events")
    redelivery = stream_table(spark, sf_dir, "events")
    both = first.unionByName(redelivery)
    return both.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])


def foreach_batch_idempotent(spark: SparkSession, sf_dir: str, out_path: str, query_name: str) -> None:
    """The reference's pipeline sink: each micro-batch is transformed and
    written via deterministic-id overwrite, so redelivery/re-run leaves
    the sink unchanged (SS2.9 exactly-once effect)."""
    from testlog_etl_spark.etl.sink import write_idempotent

    import shutil

    ev = stream_table(spark, sf_dir, "events")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.withColumn("day", F.to_date("ts"))
        write_idempotent(docs, out_path, id_cols=["event_id"], partition_by=["day"])

    # fresh checkpoint so a re-run REPROCESSES the input and exercises the
    # idempotent-overwrite path (in production the checkpoint stays and is
    # the SQS-commit analog; here re-run determinism is the contract)
    ckpt = os.path.join(SCRATCH, "ckpt", query_name)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = ev.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream INNER join: each click joined to the
    same user's purchases in the following 30 minutes.

    Both sides carry a 1-hour watermark and the join condition bounds
    event time on BOTH ends, so Spark can expire join state: a buffered
    click is dropped once the purchase-side watermark passes click ts +
    30 min (state ~ arrival rate x horizon, not stream length). Append
    mode emits each matched pair exactly once; with the file drained the
    pair set equals the batch range join, which is how the oracle is
    phrased. The RAW pairs go to the sink -- production would hang a
    windowed aggregate off the join (Spark supports chained stateful
    operators), but the memory-sink pair set is what the correctness
    gate compares."""
    ev = stream_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    ev2 = stream_table(spark, sf_dir, "events")
    purchases = (
        ev2.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts > c_ts AND p_ts <= c_ts + interval 30 minutes"
        ),
    )


def foreach_batch_upsert(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    query_name: str,
    key_col: str = "user_id",
) -> None:
    """CDC-style keyed upsert sink: every micro-batch MERGES into a keyed
    state table with latest-wins semantics -- the Structured Streaming
    analog of a streaming MERGE INTO (the reference's per-id ES upsert,
    SURVEY SS2.1 S6, generalized to keyed state).

    Per batch: reduce the batch to one row per key (latest by (ts,
    event_id) -- a total, engine-portable order), union with the current
    state table, reduce again, write to a temp dir and atomically swap.
    Latest-wins is commutative/associative across batches, so the final
    state is INDEPENDENT of how the input was split into micro-batches
    (the multi-batch driver query relies on exactly this), and replaying
    a batch is a no-op -- at-least-once delivery yields exactly-once
    state. On a real cluster the swap is a transactional table commit
    (Delta/Iceberg); dir-swap is the sandbox analog with the same
    contract."""
    import shutil

    from testlog_etl_spark.operators.dedup import latest_by

    raw_schema = spark.read.parquet(in_dir).schema
    stream = spark.readStream.schema(raw_schema).option("maxFilesPerTrigger", 1).parquet(in_dir)

    order = [F.col("ts").desc(), F.col("event_id").desc()]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        latest = latest_by(batch_df, [key_col], order)
        if os.path.isdir(out_path):
            current = spark.read.parquet(out_path)
            latest = latest_by(current.unionByName(latest), [key_col], order)
        tmp = out_path + ".tmp"
        latest.write.mode("overwrite").parquet(tmp)
        old = out_path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(out_path):
            os.rename(out_path, old)
        os.rename(tmp, out_path)
        shutil.rmtree(old, ignore_errors=True)

    ckpt = os.path.join(SCRATCH, "ckpt", query_name)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = stream.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SLIDING window (1 h length, 15 min slide): each event
    lands in 4 overlapping windows. Complements the tumbling form
    (`hourly_windowed_counts`): sliding windows are the trend-smoothing
    shape (rolling hourly rate refreshed every slide).

    Scale: Spark expands each row to its length/slide window copies
    BEFORE the shuffle, so the exchange carries (window, type) keys --
    state is bounded by (#open windows x #types), expired by the
    watermark, independent of stream length. Windows align to the epoch,
    so the batch twin is exact: the window starts covering ts are
    floor(ts/900)*900 - {0,900,1800,2700}."""
    ev = stream_table(spark, sf_dir, "events")
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched per micro-batch
    against a bounded dimension (the reference's cached-dimension
    enrichment, J1/S10, applied to its queue source). The static side is
    planned as a broadcast hash join INSIDE each micro-batch -- no
    stream state at all (unlike stream-stream joins), and the dim is
    re-resolvable between batches (slowly-changing dims pick up
    updates on the next trigger)."""
    ev = stream_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("view", "browse", 0.1), ("click", "engage", 0.5), ("purchase", "convert", 1.0)],
        "event_type string, stage string, weight double",
    )
    return (
        ev.join(F.broadcast(dim), "event_type")
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("weighted_value"),
        )
    )


def fresh_scratch_dir(subdir: str, ttl_sec: int = 600) -> str:
    """Reserve a fresh per-invocation uuid directory under
    SCRATCH/``subdir``, first pruning stale sibling runs older than
    ``ttl_sec``. Per-invocation dirs mean concurrent harness runs never
    race each other (one run's rmtree can't delete a block another is
    lazily reading -- a live sibling is by definition younger than the
    TTL); the sweep keeps the scratch area bounded across repeated
    suite/driver runs. Shared by the stream-input stagers AND the
    jsonl/csv/orc block-sink round-trip queries."""
    import shutil
    import time
    import uuid

    root = os.path.join(SCRATCH, subdir)
    if os.path.isdir(root):
        for d in os.listdir(root):
            p = os.path.join(root, d)
            try:
                if os.path.getmtime(p) < time.time() - ttl_sec:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass  # sibling swept by a concurrent run between list and stat
    return os.path.join(root, uuid.uuid4().hex)


def stage_stream_input(df: DataFrame, subdir: str, ttl_sec: int = 600) -> str:
    """Write ``df`` as the first micro-batch file of a fresh
    per-invocation stream-input directory under SCRATCH/``subdir``
    (see ``fresh_scratch_dir`` for the race/TTL contract). The shared
    front half of every drive-a-file-stream query in
    streaming_queries.py."""
    in_dir = fresh_scratch_dir(subdir, ttl_sec)
    df.coalesce(1).write.mode("append").parquet(in_dir)
    return in_dir


def stage_stream_batches(dfs: list, subdir: str, ttl_sec: int = 600) -> str:
    """Multi-batch variant of ``stage_stream_input``: write each frame
    as its own micro-batch file (arrival order = list order) into one
    fresh per-invocation input dir, with the same stale-sibling TTL
    sweep so repeated suite runs don't grow the scratch area without
    bound."""
    in_dir = fresh_scratch_dir(subdir, ttl_sec)
    for df in dfs:
        df.coalesce(1).write.mode("append").parquet(in_dir)
    return in_dir


def far_future_sentinel(df: DataFrame, days: int = 30, user_id: int = -1) -> DataFrame:
    """One-row end-of-input analog: the latest event bumped ``days``
    into the future under a reserved user id. Appending it as a final
    micro-batch advances the watermark past every real window/horizon so
    pending append-mode state flushes; results filter the reserved id.
    Built from the input row so the file matches the stream's schema
    byte-for-byte whatever this round's storage flavor is."""
    return (
        df.orderBy(F.col("ts").desc())
        .limit(1)
        .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {int(days)} DAYS"))
        .withColumn("user_id", F.lit(int(user_id)).cast(dict(df.dtypes)["user_id"]))
    )


def foreach_batch_mv(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    query_name: str,
) -> None:
    """Streaming aggregate-MV maintenance: every micro-batch is reduced
    to PARTIALS (per-type count/sum/min/max) and merged into the MV via
    operators/incremental.py::merge_mv -- the base stream is never
    rescanned, the MV table is the only state, and because the merge
    functions are commutative monoids the final MV is independent of
    how the input was split into batches (exactly the property the
    multi-batch driver query asserts against the one-shot batch
    aggregate). The unbounded-state alternative (complete-mode memory
    sink) holds every group in executor memory; the MV-merge form keeps
    state in the (transactional at scale: Delta/Iceberg commit; dir
    swap here) sink table instead."""
    import shutil

    from testlog_etl_spark.operators.incremental import aggregate_partials, merge_mv

    measures_build = {
        "n": ("count", F.lit(1)),
        "sum_value": ("sum", F.col("value")),
        "first_ts": ("min", F.col("ts")),
        "last_ts": ("max", F.col("ts")),
    }
    measures_merge = {"n": "count", "sum_value": "sum", "first_ts": "min", "last_ts": "max"}

    raw_schema = spark.read.parquet(in_dir).schema
    stream = spark.readStream.schema(raw_schema).option("maxFilesPerTrigger", 1).parquet(in_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = aggregate_partials(batch_df, ["event_type"], measures_build)
        if os.path.isdir(out_path):
            current = spark.read.parquet(out_path)
            delta = merge_mv(current, delta, ["event_type"], measures_merge)
        tmp = out_path + ".tmp"
        delta.write.mode("overwrite").parquet(tmp)
        old = out_path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(out_path):
            os.rename(out_path, old)
        os.rename(tmp, out_path)
        shutil.rmtree(old, ignore_errors=True)

    ckpt = os.path.join(SCRATCH, "ckpt", query_name)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = stream.writeStream.foreachBatch(sink).option("checkpointLocation", ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def foreach_batch_topk(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    query_name: str,
    k: int = 10,
) -> None:
    """Incremental global top-k maintenance: every micro-batch is
    reduced to its LOCAL top-k (value desc, event_id asc -- total
    order, so ties can't flap), unioned with the current k-row sink
    table, and the union's top-k overwrites the sink. State is the
    k-row table itself -- bounded however long the stream runs -- and
    because top-k over a union is associative/idempotent on a total
    order, the final table equals the batch top-k regardless of how
    the input was split (the property the driver query asserts)."""
    import shutil

    raw_schema = spark.read.parquet(in_dir).schema
    stream = spark.readStream.schema(raw_schema).option("maxFilesPerTrigger", 1).parquet(in_dir)

    def topk(df: DataFrame) -> DataFrame:
        return df.orderBy(F.desc("value"), F.asc("event_id")).limit(k)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        delta = topk(batch_df.select("event_id", "user_id", "event_type", "value"))
        if os.path.isdir(out_path):
            delta = topk(spark.read.parquet(out_path).unionByName(delta))
        tmp = out_path + ".tmp"
        delta.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = out_path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(out_path):
            os.rename(out_path, old)
        os.rename(tmp, out_path)
        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

"""Deduplication operators (T9 idempotency + the LLM-pipeline dedup
family's exact tier; near-dup tiers live in operators/neardup.py).

Scale notes:
- `exact_dedup` / `latest_by` shuffle once on the key; at 100 TB the key
  should be the natural document key (high cardinality, unskewed);
- `dropDuplicates` keeps an arbitrary row; `latest_by` makes the kept
  row DETERMINISTIC (max by order cols) -- required for oracle parity
  and for idempotent re-runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_by(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keep exactly one row per key: the first under `order` (pass desc
    columns for 'latest'). One shuffle; the window and the dedup share
    the same exchange."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (hash-groupBy under the hood)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def content_hash(col: Column) -> Column:
    """Normalized content fingerprint for exact text dedup: lowercase,
    collapse whitespace, xxhash64 (cheap, partition-order independent).

    Null text stays NULL: xxhash64(NULL) would return the seed (42),
    silently equating every null doc in joins/count-distinct -- the
    opposite of SQL null semantics, where a null fingerprint never
    equi-matches and COUNT(DISTINCT) skips it (what every oracle
    assumes)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.when(col.isNull(), F.lit(None).cast("bigint")).otherwise(F.xxhash64(norm))


def chunk_instances(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Explode each document into its non-overlapping k-token chunks
    (full chunks only): one row per (id, pos) with `chunk_hash` =
    xxhash64 of the chunk text. The shuffle-side unit for sub-document
    dedup -- only the 8-byte hash rides the exchange, never the text
    (hash equality == text equality up to xxhash64 collisions,
    ~n^2/2^65: negligible and deterministic)."""
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    chunks = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k, F.lit(k)),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))).alias("chunk_hash"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,chunk_hash:bigint>>"))
    ex = df.select(id_col, *carry, F.explode(chunks).alias("c"))
    return ex.select(id_col, *carry, F.col("c.pos").alias("pos"), F.col("c.chunk_hash").alias("chunk_hash"))


def dedup_chunks(instances: DataFrame, id_col: str) -> DataFrame:
    """Cross-document repeated-chunk removal (the RefinedWeb/CCNet
    line-dedup analog for unstructured text): among all instances of an
    identical chunk, keep ONLY the earliest by (id, pos); adds a `kept`
    boolean. One shuffle on chunk_hash; deterministic, so re-runs and
    oracles agree on exactly which instance survives."""
    w = Window.partitionBy("chunk_hash").orderBy(F.col(id_col), F.col("pos"))
    return instances.withColumn("kept", F.row_number().over(w) == 1)


def duplicated_gram_positions(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """(id, pos) for every token position starting a k-token gram that
    also occurs in at least one OTHER document.

    The distributed restatement of suffix-array substring dedup (Lee et
    al., "Deduplicating Training Data..."): any cross-doc repeated
    substring of >= k tokens is exactly a run of cross-doc repeated
    k-grams, so marking gram starts and merging runs (substring_spans)
    yields the maximal duplicated spans without ever materializing a
    suffix array. Shuffle discipline: grams ride the exchanges as
    8-byte xxhash64 keys with (id, pos) -- the text never leaves the
    scan stage; collision odds are ~n^2/2^65 (negligible,
    deterministic). Plan: one partial-agg shuffle to find cross-doc
    hashes, one equi-join back (both on the 8-byte key), no cartesian.
    """
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    ).otherwise(F.expr("cast(array() as array<bigint>)"))

    from testlog_etl_spark.util import spread

    g = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.posexplode(grams).alias("_pos", "_h")
    )
    # cross-doc: the hash occurs in >= 2 distinct docs (intra-doc repeats
    # alone do not make a gram "duplicated" for corpus dedup purposes).
    # min(id) != max(id) over the hash partition is that predicate with
    # constant per-key state, and it shares ONE exchange with the rows
    # it filters (r12, guide 2.4) -- the previous count_distinct rollup
    # + join-back moved the gram table through two full shuffles.
    w = Window.partitionBy("_h")
    return (
        g.withColumn("_cross", F.min(F.col(id_col)).over(w) != F.max(F.col(id_col)).over(w))
        .filter(F.col("_cross"))
        .select(F.col(id_col), F.col("_pos").alias("pos"))
    )


def substring_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Maximal cross-doc duplicated token spans per document: merge runs
    of duplicated k-gram start positions into (span_start, span_end)
    intervals (0-based token offsets, inclusive), token-coverage
    merging: two gram windows join one span when their covered token
    ranges overlap or touch.

    One window pass per doc partition does the merge (running max of
    gram starts; a gap > k opens a new span) -- the per-doc data is
    gram STARTS only, so partition skew is bounded by document length,
    not corpus size."""
    pos = duplicated_gram_positions(df, id_col, text_col, k)
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_max = F.max("pos").over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_span = F.when(prev_max.isNull() | (F.col("pos") > prev_max + k), 1).otherwise(0)
    grp = F.sum(new_span).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        pos.withColumn("_grp", grp)
        .groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start") + 1)
        .drop("_grp")
    )


def cdc_chunks(df: DataFrame, id_col: str, text_col: str, mask_bits: int = 3) -> DataFrame:
    """Content-defined chunking (FastCDC-style, tokens as the unit): a
    chunk boundary falls AFTER token i whenever the low ``mask_bits``
    bits of xxhash64(token_i) are zero -- expected chunk length
    2^mask_bits tokens. Unlike fixed-window chunking (chunk_instances),
    boundaries depend only on LOCAL content, so inserting or deleting a
    token re-synchronizes within one chunk instead of shifting every
    downstream chunk -- the property that makes CDC the dedup unit for
    append/edit-heavy corpora (tested:
    test_cdc_chunks_resync_after_insertion).

    The boundary test uses the SIGNED Spark hash's low bits
    (``& mask``), which equal the unsigned low bits -- the DuckDB twin
    tests ``unsigned % 2^bits`` on its generated XXH64 and lands on the
    same boundaries.

    Emits one row per (doc, chunk): chunk_idx, n_tok, chunk_text and
    chunk_hash. Row-local array intrinsics only -- no shuffle here; the
    cross-doc grouping downstream should key on ``chunk_hash`` (8
    bytes), never chunk_text (oracle-paired queries group by text to
    stay engine-comparable, at driver-test sizes only)."""
    mask = (1 << mask_bits) - 1
    toks = F.split(F.col(text_col), " ")
    n = F.size(F.col("_toks"))
    bnds = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.xxhash64(F.element_at(F.col("_toks"), i)).bitwiseAND(F.lit(mask)) == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    spans = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_bnds", bnds)
        .withColumn("_starts", F.concat(F.array(F.lit(0)), F.col("_bnds")))
        .withColumn("_ends", F.concat(F.col("_bnds"), F.array(n)))
    )
    ci = F.explode(F.sequence(F.lit(1), F.size(F.col("_starts"))))
    start = F.element_at(F.col("_starts"), F.col("chunk_idx"))
    end = F.element_at(F.col("_ends"), F.col("chunk_idx"))
    out = spans.select(id_col, "_toks", "_starts", "_ends", ci.alias("chunk_idx")).select(
        id_col,
        "chunk_idx",
        (end - start).alias("n_tok"),
        F.array_join(F.slice(F.col("_toks"), start + 1, end - start), " ").alias("chunk_text"),
    )
    return out.withColumn("chunk_hash", F.xxhash64(F.col("chunk_text")))

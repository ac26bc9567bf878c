"""r13 registration pack: the five operators parked in NOTES.md during
the registry freeze, each wrapped in its driver-shape query callable
``(spark, sf_dir) -> DataFrame`` with a DuckDB oracle twin —
**deliberately UNREGISTERED** (this module is NOT in
``suite._load_all``'s import list, so nothing here reaches the
driver's 526-query view; the registry stays frozen through the r12
drain window per COVERAGE.md's rotation policy).

r13's first commit is then mechanical: add ``"r13_pack"`` to
``_load_all``, replace the plain ``def``s below with ``@register``
decorations carrying the same (name, oracle, doc), and the pack's five
names join the steady-state window rotation. Every pair here already
has a passing local differential test (tests/test_r13_pack.py) that
runs the Spark callable and the oracle SQL side by side at sf=0.01 —
the same compare tools/verify_all.py performs.

Suite determinism rules apply throughout (suite.py module docstring):
identical aliases on both sides, rounded float aggregates, total
ORDER BY, no ARRAY/STRUCT/DECIMAL output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.tables import load_tables

# ---------------------------------------------------------------------------
# 1. sim_ivf_pq_topk — IVF-PQ composed ANN tier (operators/similarity.py::
#    ivf_pq_topk, landed r11; NOTES.md "IVF-PQ combined ANN tier")
# ---------------------------------------------------------------------------


def sim_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse cells prune the candidate set, PQ asymmetric distance
    ranks the survivors — the Jegou-composition of the two registered
    tiers (sim_pq_adc_topk, eval_ann_recall's IVF). At 100 TB the
    corpus lives as (cell, m one-byte codes) rows partitioned by cell;
    a probe reads nprobe cells of CODES and the per-query distance
    tables broadcast; full-dimension floats are read only at train
    time (plan-guarded: no vector rides any Exchange)."""
    from testlog_etl_spark.operators.similarity import ivf_pq_topk

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivf_pq_topk(queries, corpus, dim=64, k=5, nprobe=2)
    return out.select("q_id", "rank", "c_id", "adc").orderBy("q_id", "rank")


def ivf_pq_oracle_sql(
    dim: int = 64,
    m: int = 4,
    k_cells: int = 8,
    k_coarse: int = 8,
    n_iter: int = 2,
    nprobe: int = 2,
    k: int = 5,
    qbits: int = 20,
    q_pred: str = "vec_id < 8",
) -> str:
    """DuckDB twin of ivf_pq_topk, composed from the two existing
    replay bodies (llm_ops._ivf_topk_oracle coarse kmeans + probes;
    llm_ops._pq_adc_body per-subspace codebooks + ADC), with the
    candidate filter joining them. Validated r11 (moved here from
    tests/test_llm_ops.py for the r13 registration)."""
    g = float(1 << qbits)
    sd = dim // m

    def snap(x: str) -> str:
        return f"floor(({x}) * {g} + 0.5) / {g}"

    def sqd(a: str, b: str, d: int) -> str:
        return (
            f"reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, {d + 1}), "
            f"__i -> ({a}[__i] - {b}[__i]) * ({a}[__i] - {b}[__i]))), (__a, __x) -> __a + __x)"
        )

    def kmeans_blocks(prefix: str, src: str, d: int, kk: int) -> list[str]:
        out = [
            f"""{prefix}0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
         list_transform(sv, __x -> {snap('__x')}) AS centroid
  FROM (SELECT vec_id, sv FROM {src} ORDER BY vec_id LIMIT {kk})
)"""
        ]
        for i in range(1, n_iter + 1):
            prev = f"{prefix}{i - 1}"
            out.append(
                f"""{prefix}a{i} AS (
  SELECT vec_id, sv, cell FROM (
    SELECT {src}.vec_id, {src}.sv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY {src}.vec_id
                              ORDER BY {sqd(f'{src}.sv', 'c.centroid', d)}, c.cell) AS rn
    FROM {src} CROSS JOIN {prev} c
  ) WHERE rn = 1
),
{prefix}u{i} AS (
  SELECT cell, array_agg(mv ORDER BY idx) AS centroid FROM (
    SELECT cell, idx, {snap('AVG(val)')} AS mv FROM (
      SELECT cell, unnest(sv) AS val, unnest(range(1, {d + 1})) AS idx FROM {prefix}a{i}
    ) GROUP BY cell, idx
  ) GROUP BY cell
),
{prefix}{i} AS (
  SELECT p.cell, COALESCE({prefix}u{i}.centroid, p.centroid) AS centroid
  FROM {prev} p LEFT JOIN {prefix}u{i} ON p.cell = {prefix}u{i}.cell
)"""
            )
        return out

    blocks = ["v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)"]
    blocks.append("gv AS (SELECT vec_id, vec AS sv FROM v)")
    blocks += kmeans_blocks("g", "gv", dim, k_coarse)
    gfin = f"g{n_iter}"
    blocks.append(
        f"""coarse_cells AS (
  SELECT vec_id AS c_id, cell FROM (
    SELECT gv.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY gv.vec_id
                              ORDER BY {sqd('gv.sv', 'c.centroid', dim)}, c.cell) AS rn
    FROM gv CROSS JOIN {gfin} c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS q_id, cell FROM (
    SELECT gv.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY gv.vec_id
                              ORDER BY {sqd('gv.sv', 'c.centroid', dim)}, c.cell) AS rn
    FROM gv CROSS JOIN {gfin} c WHERE {q_pred}
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.q_id, s.c_id FROM probes p JOIN coarse_cells s ON s.cell = p.cell
)"""
    )
    for s in range(m):
        a, b = sd * s + 1, sd * (s + 1)
        blocks.append(f"v{s} AS (SELECT vec_id, vec[{a}:{b}] AS sv FROM v)")
        blocks += kmeans_blocks(f"f{s}_", f"v{s}", sd, k_cells)
        fin = f"f{s}_{n_iter}"
        blocks.append(
            f"""code{s} AS (
  SELECT vec_id AS c_id, {s} AS sub, cell FROM (
    SELECT v{s}.vec_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY v{s}.vec_id
                              ORDER BY {sqd(f'v{s}.sv', 'c.centroid', sd)}, c.cell) AS rn
    FROM v{s} CROSS JOIN {fin} c
  ) WHERE rn = 1
),
qd{s} AS (
  SELECT v{s}.vec_id AS q_id, {s} AS sub, c.cell,
         {sqd(f'v{s}.sv', 'c.centroid', sd)} AS qdist
  FROM v{s} CROSS JOIN {fin} c WHERE {q_pred}
)"""
        )
    codes = " UNION ALL ".join(f"SELECT * FROM code{s}" for s in range(m))
    qds = " UNION ALL ".join(f"SELECT * FROM qd{s}" for s in range(m))
    blocks.append(f"codes AS ({codes})")
    blocks.append(f"qd AS ({qds})")
    blocks.append(
        f"""pairs AS (
  SELECT qd.q_id, codes.c_id, ROUND(SUM(qd.qdist), 6) AS adc
  FROM codes
  JOIN qd ON qd.sub = codes.sub AND qd.cell = codes.cell
  JOIN cand ON cand.q_id = qd.q_id AND cand.c_id = codes.c_id
  WHERE qd.q_id <> codes.c_id
  GROUP BY qd.q_id, codes.c_id
),
ranked AS (
  SELECT q_id, c_id, adc,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, c_id) AS rank
  FROM pairs
)"""
    )
    body = ",\n".join(blocks)
    return f"""
WITH {body}
SELECT q_id, CAST(rank AS INT) AS rank, c_id, adc
FROM ranked WHERE rank <= {k}
ORDER BY q_id, rank
"""


# ---------------------------------------------------------------------------
# 2. sample_stratified_reservoir — per-stratum-seeded exact-k reservoir
#    (operators/sampling.py::stratified_reservoir, landed r11)
# ---------------------------------------------------------------------------

_RSV_SEEDS = {"en": "r13en", "zh": "r13zh"}
_RSV_K = 7


def sample_stratified_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(k, |stratum|) documents per language, drawn by
    ranking the 60-bit md5 of the length-prefixed (id, stratum, seed)
    preimage — merge-safe per-stratum seeds ('en'/'zh' carry their own;
    re-drawing one stratum or adding a new one cannot perturb any
    other). Rides grouped_topk, so a hot stratum never sorts in one
    task."""
    from testlog_etl_spark.operators.sampling import stratified_reservoir

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = stratified_reservoir(docs, "lang", "doc_id", k=_RSV_K, seeds=_RSV_SEEDS)
    return out.select("lang", "doc_id", "draw_rank").orderBy("lang", "draw_rank")


def stratified_reservoir_oracle_sql() -> str:
    seed_case = " ".join(
        f"WHEN '{sv}' THEN '{sd}'" for sv, sd in sorted(_RSV_SEEDS.items())
    )
    lp = (
        "coalesce(length({x})::VARCHAR || ':' || {x}, '-')"
    )
    pre = (
        lp.format(x="doc_id::VARCHAR")
        + " || " + lp.format(x="lang")
        + " || " + lp.format(x="sd")
    )
    return f"""
SELECT lang, doc_id, CAST(rk AS INT) AS draw_rank FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY try_cast(('0x' || substr(md5({pre}), 1, 15)) AS BIGINT), doc_id) AS rk
  FROM (SELECT lang, doc_id,
               CASE lang {seed_case} ELSE '0' END AS sd
        FROM documents)
) WHERE rk <= {_RSV_K}
ORDER BY lang, draw_rank
"""


# ---------------------------------------------------------------------------
# 3. text_grapheme_length_profile — byte/codepoint/grapheme length profile
#    (NOTES.md "grapheme-aware text length profile"; formula pinned r11 in
#    tests/test_properties.py::test_scoped_grapheme_length_cross_engine_fuzz)
# ---------------------------------------------------------------------------


def text_grapheme_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, variant): doc count plus avg/max length at all three
    granularities — bytes, codepoints, grapheme clusters. The corpus is
    ASCII, so combining-mark variants are derived IN the query to
    exercise the grapheme math: 'mid' inserts U+0301 after the first
    character (bytes +2, codepoints +1, graphemes +0), 'lead' prefixes
    a bare U+0301 to a 10-char slice (a degenerate leading cluster:
    graphemes = codepoints - 1 + 1).

    REPERTOIRE CONTRACT (pinned by the r11 cross-engine fuzz): the
    JVM-side cluster count length(regexp_replace(t, '[\\p{Mn}\\p{Me}]',
    '')) + (leading-mark-run ? 1 : 0) equals DuckDB's native
    length_grapheme over text WITHOUT ZWJ sequences, regional
    indicators, or Hangul jamo — which this corpus (ASCII + injected
    U+0301) satisfies by construction. Out-of-repertoire text needs a
    real UAX#29 segmenter and is out of scope for the JVM-only tier."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    mark = "\u0301"  # COMBINING ACUTE ACCENT (Mn)
    base = docs.select("doc_id", "lang", F.col("text").alias("t"))
    mid = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.substring("text", 1, 1), F.lit(mark), F.expr("substring(text, 2)")
        ).alias("t"),
    )
    lead = docs.select(
        "doc_id", "lang", F.concat(F.lit(mark), F.substring("text", 1, 10)).alias("t")
    )
    u = (
        base.withColumn("variant", F.lit("base"))
        .unionByName(mid.withColumn("variant", F.lit("mid")))
        .unionByName(lead.withColumn("variant", F.lit("lead")))
    )
    g = F.length(F.regexp_replace("t", r"[\p{Mn}\p{Me}]", "")) + F.when(
        F.col("t").rlike(r"^[\p{Mn}\p{Me}]"), F.lit(1)
    ).otherwise(F.lit(0))
    sized = u.select(
        "lang",
        "variant",
        F.octet_length("t").alias("nb"),
        F.length("t").alias("ncp"),
        g.alias("ng"),
    )
    return (
        sized.groupBy("lang", "variant")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("nb"), 4).alias("avg_bytes"),
            F.round(F.avg("ncp"), 4).alias("avg_codepoints"),
            F.round(F.avg("ng"), 4).alias("avg_graphemes"),
            F.max("ng").cast("long").alias("max_graphemes"),
        )
        .orderBy("lang", "variant")
    )


def grapheme_profile_oracle_sql() -> str:
    return """
WITH u AS (
  SELECT lang, 'base' AS variant, text AS t FROM documents
  UNION ALL
  SELECT lang, 'mid' AS variant,
         substr(text, 1, 1) || chr(769) || substr(text, 2) AS t FROM documents
  UNION ALL
  SELECT lang, 'lead' AS variant, chr(769) || substr(text, 1, 10) AS t FROM documents
)
SELECT lang, variant,
       count(*) AS n_docs,
       ROUND(AVG(strlen(t)), 4) AS avg_bytes,
       ROUND(AVG(length(t)), 4) AS avg_codepoints,
       ROUND(AVG(length_grapheme(t)), 4) AS avg_graphemes,
       CAST(MAX(length_grapheme(t)) AS BIGINT) AS max_graphemes
FROM u
GROUP BY lang, variant
ORDER BY lang, variant
"""


# ---------------------------------------------------------------------------
# 4. dedup_unicode_fold — casefold-then-fingerprint dedup tier
#    (NOTES.md "Unicode-normalization dedup tier")
# ---------------------------------------------------------------------------

_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def dedup_unicode_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold-then-fingerprint dedup: documents whose text differs only
    by letter case or whitespace runs share an md5 fingerprint and
    collapse into one group (canonical = min doc_id). The corpus is
    exact-unique, so case-swapped (+100000) and space-doubled
    (+200000) twins are derived IN the query; every group must come
    back with exactly 3 members iff the fold is correct on both
    engines.

    FOLD CONTRACT (NOTES.md; motivated by the pinned r09 divergence
    tests/test_properties.py::test_phonetic_key_casefold_divergence_is_pinned
    — Spark lower() applies full Unicode case mapping where DuckDB's is
    simple, so engine lower() is NOT portable): the fold is an EXPLICIT
    codepoint map — translate(t, 'A..Z', 'a..z') — plus single-space
    collapse of [space]+ runs and trim. ASCII-scoped by construction;
    extending the repertoire means extending the translate map on BOTH
    engines, never delegating to locale-aware case functions."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = docs.select("doc_id", "text")
    flipped = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.translate("text", _LOWER + _UPPER, _UPPER + _LOWER).alias("text"),
    )
    spaced = docs.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.replace(F.col("text"), F.lit(" "), F.lit("  ")).alias("text"),
    )
    u = base.unionByName(flipped).unionByName(spaced)
    folded = F.trim(
        F.regexp_replace(F.translate("text", _UPPER, _LOWER), " +", " ")
    )
    fp = u.select("doc_id", F.md5(folded).alias("fingerprint"))
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_members"),
            (F.count(F.lit(1)) - 1).alias("n_dups_removed"),
        )
        .select("canonical_id", "n_members", "n_dups_removed", "fingerprint")
        .orderBy("canonical_id")
    )


def unicode_fold_oracle_sql() -> str:
    return f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         translate(text, '{_LOWER + _UPPER}', '{_UPPER + _LOWER}') AS text
  FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, replace(text, ' ', '  ') AS text
  FROM documents
),
fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(translate(text, '{_UPPER}', '{_LOWER}'),
                                 ' +', ' ', 'g'))) AS fingerprint
  FROM u
)
SELECT MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_members,
       COUNT(*) - 1 AS n_dups_removed,
       fingerprint
FROM fp
GROUP BY fingerprint
ORDER BY canonical_id
"""


# ---------------------------------------------------------------------------
# 5. stream_watermark_lag_audit — per-trigger watermark vs event-time front
#    (NOTES.md "streaming watermark-lag audit"; replay semantics pinned r11
#    in tests/test_streaming.py::test_watermark_lag_audit_replay)
# ---------------------------------------------------------------------------

_WM_T1 = "2024-01-11 00:00:00"
_WM_T2 = "2024-01-21 00:00:00"
_WM_DELAY_MIN = 10


def stream_watermark_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs a REAL watermarked streaming aggregation (10-minute delay,
    1-hour windows) over the events table staged as three deterministic
    arrival batches (ts < Jan 11 / < Jan 21 / rest, maxFilesPerTrigger=1)
    and scrapes each trigger's reported eventTime stats into the audit
    frame (batch_seq, max_event_ts, watermark_ts, lag_sec) — 'how far
    ahead of the held watermark does each trigger's data run?'.

    Oracle-able because the reported watermark is DETERMINISTIC under
    staged single-file triggers (pinned r11): epoch-initial, then
    max(event ts over PRIOR batches) - delay. Event times are truncated
    to seconds BEFORE the stream so the progress strings round-trip
    exactly. The scrape reads q.recentProgress (driver-side, bounded:
    one dict per trigger, 3 data triggers)."""
    import datetime as dt
    import uuid

    from testlog_etl_spark.streaming import jobs

    ev = (
        load_tables(spark, sf_dir, ("events",))["events"]
        .select("event_id", F.date_trunc("second", "ts").alias("ts"))
    )
    parts = [
        ev.filter(F.col("ts") < _WM_T1),
        ev.filter((F.col("ts") >= _WM_T1) & (F.col("ts") < _WM_T2)),
        ev.filter(F.col("ts") >= _WM_T2),
    ]
    in_dir = jobs.stage_stream_batches(parts, "wm_lag_audit")
    stream = (
        spark.readStream.schema(parts[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    agg = (
        stream.withWatermark("ts", f"{_WM_DELAY_MIN} minutes")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    qname = f"wm_lag_audit_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode("update").format("memory").queryName(qname).start()
    try:
        q.processAllAvailable()
        progress = [p if isinstance(p, dict) else p.asDict() for p in q.recentProgress]
    finally:
        q.stop()

    def parse(s: str) -> dt.datetime:
        fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
        return dt.datetime.strptime(s, fmt)

    rows = []
    data_batches = sorted(
        (p for p in progress if p["numInputRows"] > 0), key=lambda p: p["batchId"]
    )
    for seq, p in enumerate(data_batches):
        mx = parse(p["eventTime"]["max"])
        wm = parse(p["eventTime"]["watermark"])
        rows.append(
            (
                seq,
                mx.strftime("%Y-%m-%d %H:%M:%S"),
                wm.strftime("%Y-%m-%d %H:%M:%S"),
                int((mx - wm).total_seconds()),
            )
        )
    out = spark.createDataFrame(
        rows, "batch_seq long, max_event_ts string, watermark_ts string, lag_sec long"
    )
    return out.orderBy("batch_seq")


def watermark_lag_oracle_sql() -> str:
    return f"""
WITH e AS (
  SELECT date_trunc('second', ts) AS ts FROM events
),
b AS (
  SELECT ts,
         CASE WHEN ts < TIMESTAMP '{_WM_T1}' THEN 0
              WHEN ts < TIMESTAMP '{_WM_T2}' THEN 1
              ELSE 2 END AS batch_seq
  FROM e
),
bm AS (SELECT batch_seq, max(ts) AS mx FROM b GROUP BY batch_seq),
wm AS (
  SELECT batch_seq, mx,
         COALESCE(max(mx) OVER (ORDER BY batch_seq
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  - INTERVAL {_WM_DELAY_MIN} MINUTE,
                  TIMESTAMP '1970-01-01 00:00:00') AS w
  FROM bm
)
SELECT CAST(batch_seq AS BIGINT) AS batch_seq,
       strftime(mx, '%Y-%m-%d %H:%M:%S') AS max_event_ts,
       strftime(w, '%Y-%m-%d %H:%M:%S') AS watermark_ts,
       CAST(epoch(mx) - epoch(w) AS BIGINT) AS lag_sec
FROM wm
ORDER BY batch_seq
"""


# name -> (query fn, oracle SQL, doc one-liner) — the r13 registration
# reads this mapping verbatim.
R13_PACK: dict[str, tuple] = {
    "sim_ivf_pq_topk": (sim_ivf_pq_topk, ivf_pq_oracle_sql(), "IVF-PQ composed ANN tier"),
    "sample_stratified_reservoir": (
        sample_stratified_reservoir,
        stratified_reservoir_oracle_sql(),
        "per-stratum-seeded merge-safe exact-k reservoir",
    ),
    "text_grapheme_length_profile": (
        text_grapheme_length_profile,
        grapheme_profile_oracle_sql(),
        "byte/codepoint/grapheme length profile (scoped repertoire)",
    ),
    "dedup_unicode_fold": (
        dedup_unicode_fold,
        unicode_fold_oracle_sql(),
        "explicit-codepoint-map casefold fingerprint dedup",
    ),
    "stream_watermark_lag_audit": (
        stream_watermark_lag_audit,
        watermark_lag_oracle_sql(),
        "per-trigger watermark vs event-time front audit",
    ),
}

"""Driver-facing inverted-index and quantile-gate queries
(operators/postings.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from testlog_etl_spark.operators import postings, textstats
from testlog_etl_spark.suite import register
from testlog_etl_spark.tables import load_tables


@register(
    "index_postings",
    doc="inverted index over documents: term -> (tf, df, sorted doc-id "
    "postings) in one partial-aggregated shuffle; max_df stopword cutoff "
    "(390) drops corpus-wide terms BEFORE any posting list materializes.",
    oracle="""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS term
  FROM documents
),
g AS (
  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df,
         array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
  FROM t GROUP BY term
)
SELECT term, tf, df, postings FROM g
WHERE df <= 390
ORDER BY term
""",
)
def index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        postings.build_postings(docs, "doc_id", textstats.tokens(F.col("text")), max_df=390)
        # suite convention: collections are stringified (sorted + joined)
        # so the driver's typed value-hash sees identical scalars
        .select("term", "tf", "df", F.array_join("postings", ",").alias("postings"))
        .orderBy("term")
    )


@register(
    "filter_quality_quantile",
    doc="per-source quantile gate: keep docs in the top quarter of "
    "n_chars WITHIN their source. Exact percentile per group (tiny "
    "thresholds frame) broadcast back -- zero corpus shuffles.",
    oracle="""
WITH thr AS (
  SELECT source, quantile_cont(n_chars, 0.75) AS t
  FROM documents GROUP BY source
)
SELECT d.source, count(*) AS n_kept,
       CAST(SUM(d.n_chars) AS BIGINT) AS chars,
       min(d.n_chars) AS min_kept
FROM documents d JOIN thr ON d.source = thr.source
WHERE d.n_chars >= thr.t
GROUP BY d.source
ORDER BY d.source
""",
)
def filter_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    kept = postings.quantile_threshold_filter(
        docs, "source", F.col("n_chars"), quantile=0.75, keep="upper"
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars"),
            F.min("n_chars").alias("min_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_bm25_topk",
    doc="BM25 ranked retrieval (Lucene idf variant) for a fixed 3-term "
    "query: filtered-explode term scan (moves <= |Q| rows per doc, not "
    "corpus tokens), broadcast N/avglen/df stats, per-doc contribution "
    "sum ranked by ROUNDED score with doc-id ties; top-k via "
    "TakeOrderedAndProject, the rank window runs over k rows only "
    "(operators/postings.py::bm25_topk).",
    oracle="""
WITH base AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
lens AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avg_len FROM lens),
hits AS (
  SELECT b.doc_id, l.dl, t.term, count(*) AS tf
  FROM base b
  JOIN lens l ON l.doc_id = b.doc_id,
  LATERAL (SELECT unnest(list_filter(b.toks, x -> x IN ('spark', 'join', 'window'))) AS term) t
  GROUP BY b.doc_id, l.dl, t.term
),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
scored AS (
  SELECT h.doc_id,
         ROUND(SUM(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (h.tf * (1.2 + 1)) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avg_len))
         ), 4) AS score,
         count(*) AS n_terms
  FROM hits h JOIN dfreq d ON d.term = h.term, stats s
  GROUP BY h.doc_id
),
ranked AS (
  SELECT doc_id, score, n_terms,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT doc_id, score, n_terms, rank FROM ranked WHERE rank <= 10
ORDER BY rank
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = postings.bm25_topk(
        docs, "doc_id", textstats.tokens(F.col("text")), ["spark", "join", "window"], k=10
    )
    return out.orderBy("rank")


@register(
    "index_phrase_search",
    doc="exact phrase search ('table scan') via aligned anchors "
    "(operators/postings.py::phrase_search): each phrase term's "
    "occurrences reduce to position-minus-offset anchors, so the "
    "phrase match is a (doc, anchor) equi-join per term -- no window, "
    "no per-doc scan, join inputs term-selectivity-sized. The IR "
    "primitive beside BM25 (ranked) and postings (boolean).",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(w) AS term, unnest(range(0, len(w))) AS p FROM tok
),
s0 AS (SELECT doc_id, p - 0 AS anchor FROM pos WHERE term = 'table'),
s1 AS (SELECT doc_id, p - 1 AS anchor FROM pos WHERE term = 'scan')
SELECT s0.doc_id AS doc_id, count(*) AS n_matches
FROM s0 JOIN s1 USING (doc_id, anchor)
GROUP BY s0.doc_id
ORDER BY doc_id
""",
)
def index_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    out = postings.phrase_search(
        docs, "doc_id", textstats.tokens(F.col("text")), ["table", "scan"]
    )
    return out.orderBy("doc_id")


@register(
    "index_boolean_retrieval",
    doc="boolean retrieval (join AND vector AND NOT slow): the exploded "
    "(doc, term) stream is filtered to the QUERY'S terms before any "
    "exchange (term-selectivity-sized input, same prune as phrase "
    "search), then one doc-keyed aggregate evaluates the AND/NOT as "
    "boolean max flags -- no per-term join chain, no posting-list "
    "materialization. Output: matching doc ids with their source and "
    "length. Oracle evaluates membership with list_contains.",
    oracle="""
WITH t AS (
  SELECT doc_id, source, n_chars,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, source, n_chars
FROM t
WHERE list_contains(toks, 'join') AND list_contains(toks, 'vector')
  AND NOT list_contains(toks, 'slow')
ORDER BY doc_id
""",
)
def index_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    terms = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(textstats.tokens(F.col("text"))).alias("term"),
    )
    hits = (
        terms.where(F.col("term").isin("join", "vector", "slow"))
        .groupBy("doc_id", "source", "n_chars")
        .agg(
            F.max(F.when(F.col("term") == "join", 1).otherwise(0)).alias("h_a"),
            F.max(F.when(F.col("term") == "vector", 1).otherwise(0)).alias("h_b"),
            F.max(F.when(F.col("term") == "slow", 1).otherwise(0)).alias("h_not"),
        )
    )
    return (
        hits.where((F.col("h_a") == 1) & (F.col("h_b") == 1) & (F.col("h_not") == 0))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "search_rrf_fusion",
    doc="hybrid-retrieval rank fusion (operators/postings.py::"
    "rrf_fusion): BM25 and length-normalized TF-IDF each rank the "
    "corpus for the same 3-term query (top-20 lists, ROUNDED-score + "
    "doc-id ties), then Reciprocal Rank Fusion sum(1/(60+rank)) fuses "
    "them into the final top-10 -- the standard way to combine lexical "
    "and secondary rankers without score calibration. Every rank "
    "window runs AFTER a TakeOrderedAndProject limit (k-row frames); "
    "the fused join chain is over two 20-row lists.",
    oracle="""
WITH base AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
lens AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avg_len FROM lens),
hits AS (
  SELECT b.doc_id, l.dl, t.term, count(*) AS tf
  FROM base b
  JOIN lens l ON l.doc_id = b.doc_id,
  LATERAL (SELECT unnest(list_filter(b.toks, x -> x IN ('spark', 'join', 'window'))) AS term) t
  GROUP BY b.doc_id, l.dl, t.term
),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
bm_scored AS (
  SELECT h.doc_id,
         ROUND(SUM(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (h.tf * (1.2 + 1)) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avg_len))
         ), 4) AS score
  FROM hits h JOIN dfreq d ON d.term = h.term, stats s
  GROUP BY h.doc_id
),
bm AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bm_scored QUALIFY r <= 20
),
tf_scored AS (
  SELECT h.doc_id,
         ROUND(SUM((h.tf::DOUBLE / h.dl) * ln((s.n_docs + 1.0) / (d.df + 1.0))), 6) AS score
  FROM hits h JOIN dfreq d ON d.term = h.term, stats s
  GROUP BY h.doc_id
),
tfr AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
  FROM tf_scored QUALIFY r <= 20
),
fused AS (
  SELECT COALESCE(bm.doc_id, tfr.doc_id) AS doc_id,
         CAST(bm.r AS INT) AS rank_bm25, CAST(tfr.r AS INT) AS rank_tfidf,
         ROUND(COALESCE(1.0 / (60 + bm.r), 0) + COALESCE(1.0 / (60 + tfr.r), 0), 6) AS rrf
  FROM bm FULL JOIN tfr ON bm.doc_id = tfr.doc_id
)
SELECT doc_id, rank_bm25, rank_tfidf, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank
FROM fused QUALIFY rank <= 10
ORDER BY rank
""",
)
def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    Q = ["spark", "join", "window"]
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bm = postings.bm25_topk(docs, "doc_id", textstats.tokens(F.col("text")), Q, k=20)

    q = F.array(*[F.lit(t) for t in Q])
    base = docs.select(
        "doc_id", textstats.tokens(F.col("text")).alias("_t")
    ).select("doc_id", "_t", F.size("_t").alias("dl"))
    n = base.agg(F.count(F.lit(1)).alias("n"))
    hits = (
        base.select(
            "doc_id",
            "dl",
            F.explode(F.filter("_t", lambda t: F.array_contains(q, t))).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    tf_scored = (
        hits.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(
                    (F.col("tf").cast("double") / F.col("dl"))
                    * F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                ),
                6,
            ).alias("score")
        )
    )
    tfr = (
        tf_scored.orderBy(F.desc("score"), "doc_id")
        .limit(20)
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("score"), "doc_id")))
    )
    out = postings.rrf_fusion(
        [bm.select("doc_id", "rank"), tfr.select("doc_id", "rank")], "doc_id", c=60, k=10
    )
    return out.select(
        "doc_id",
        F.col("rank_0").alias("rank_bm25"),
        F.col("rank_1").alias("rank_tfidf"),
        "rrf",
        "rank",
    ).orderBy("rank")


@register(
    "eval_dcg_ndcg",
    doc="ranking-quality metric for the retrieval family: NDCG@10 of "
    "the BM25 ranking (operators/postings.py::bm25_topk, the same "
    "ranked list text_bm25_topk signs) against graded relevance = "
    "count of query terms present in the doc (0..3). DCG discounts by "
    "log2(rank+1); IDCG re-ranks the WHOLE corpus by relevance via "
    "TakeOrderedAndProject (rank window after the limit, k rows). One "
    "summary row -- the eval readout a retrieval pipeline gates on.",
    oracle="""
WITH base AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
rel AS (
  SELECT doc_id,
         (list_contains(toks, 'spark')::INT + list_contains(toks, 'join')::INT
          + list_contains(toks, 'window')::INT) AS rel
  FROM base
),
lens AS (SELECT doc_id, len(toks) AS dl FROM base),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avg_len FROM lens),
hits AS (
  SELECT b.doc_id, l.dl, t.term, count(*) AS tf
  FROM base b
  JOIN lens l ON l.doc_id = b.doc_id,
  LATERAL (SELECT unnest(list_filter(b.toks, x -> x IN ('spark', 'join', 'window'))) AS term) t
  GROUP BY b.doc_id, l.dl, t.term
),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY term),
bm_scored AS (
  SELECT h.doc_id,
         ROUND(SUM(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (h.tf * (1.2 + 1)) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / s.avg_len))
         ), 4) AS score
  FROM hits h JOIN dfreq d ON d.term = h.term, stats s
  GROUP BY h.doc_id
),
bm AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM bm_scored QUALIFY rank <= 10
),
dcg AS (
  SELECT SUM(rel.rel / (ln(bm.rank + 1.0) / ln(2.0))) AS dcg
  FROM bm JOIN rel ON rel.doc_id = bm.doc_id
),
ideal AS (
  SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rank
  FROM rel QUALIFY rank <= 10
),
idcg AS (SELECT SUM(rel / (ln(rank + 1.0) / ln(2.0))) AS idcg FROM ideal)
SELECT ROUND(dcg.dcg, 4) AS dcg, ROUND(idcg.idcg, 4) AS idcg,
       ROUND(dcg.dcg / idcg.idcg, 4) AS ndcg
FROM dcg CROSS JOIN idcg
""",
)
def eval_dcg_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    Q = ["spark", "join", "window"]
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = textstats.tokens(F.col("text"))
    rel_expr = sum(F.array_contains(toks, t).cast("int") for t in Q)
    rel = docs.select("doc_id", rel_expr.alias("rel"))
    bm = postings.bm25_topk(docs, "doc_id", toks, Q, k=10).select("doc_id", "rank")
    ln2 = F.log(F.lit(2.0))
    dcg = (
        bm.join(rel, "doc_id")
        .agg(F.sum(F.col("rel") / (F.log(F.col("rank") + 1.0) / ln2)).alias("dcg"))
    )
    ideal = (
        rel.orderBy(F.desc("rel"), "doc_id")
        .limit(10)
        .withColumn("rank", F.row_number().over(Window.orderBy(F.desc("rel"), "doc_id")))
    )
    idcg = ideal.agg(
        F.sum(F.col("rel") / (F.log(F.col("rank") + 1.0) / ln2)).alias("idcg")
    )
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .select(
            F.round("dcg", 4).alias("dcg"),
            F.round("idcg", 4).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 4).alias("ndcg"),
        )
    )


@register(
    "index_trigram_search",
    doc="substring search ('hash value') via a character-TRIGRAM "
    "posting prefilter (the pg_trgm pattern): a doc containing the "
    "query substring necessarily contains EVERY query trigram, so "
    "candidates = docs matching all 8 distinct query trigrams "
    "(distinct (doc, trigram) semi-join against the broadcast query "
    "set, count == 8), then the exact contains() verify runs on "
    "candidates only -- the prefilter is LOSSLESS by the pigeonhole "
    "argument and the oracle is the direct full-scan contains(), so "
    "the driver hash proves losslessness. Occurrence counts via the "
    "length-difference identity. The trigram index build is the "
    "1-row-per-char explode an indexer pays ONCE, not per query.",
    oracle="""
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'hash value', '')))
            / length('hash value') AS BIGINT) AS n_occurrences
FROM documents
WHERE contains(text, 'hash value')
ORDER BY doc_id
""",
)
def index_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = "hash value"
    qtris = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tris = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(0)))
            ).alias("i"),
            "text",
        )
        .select("doc_id", F.substring("text", F.col("i"), 3).alias("tri"))
        .distinct()
    )
    qdf = F.broadcast(
        docs.sparkSession.createDataFrame([(t,) for t in qtris], "tri string")
    )
    cand = (
        tris.join(qdf, "tri", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nt"))
        .filter(F.col("nt") == len(qtris))
        .select("doc_id")
    )
    return (
        docs.join(cand, "doc_id", "left_semi")
        .filter(F.col("text").contains(q))
        .select(
            "doc_id",
            (
                (F.length("text") - F.length(F.replace(F.col("text"), F.lit(q), F.lit(""))))
                / F.length(F.lit(q))
            )
            .cast("long")
            .alias("n_occurrences"),
        )
        .orderBy("doc_id")
    )


@register(
    "index_proximity_search",
    doc="proximity retrieval: docs where 'hash' and 'merge' occur "
    "within 3 whitespace tokens of each other IN EITHER ORDER -- the "
    "NEAR operator beside exact-phrase (aligned anchors) and boolean "
    "(term flags): each term's positions reduce to per-doc posting "
    "rows, the pair join keys on doc and filters |pa - pb| <= 3, "
    "match COUNT = qualifying position pairs. Join inputs are "
    "term-selectivity-sized.",
    oracle="""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(w) AS term, unnest(range(0, len(w))) AS p FROM tok
),
a AS (SELECT doc_id, p FROM pos WHERE term = 'hash'),
b AS (SELECT doc_id, p FROM pos WHERE term = 'merge')
SELECT a.doc_id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(MIN(abs(a.p - b.p)) AS BIGINT) AS min_distance
FROM a JOIN b ON b.doc_id = a.doc_id AND abs(a.p - b.p) <= 3
GROUP BY a.doc_id
ORDER BY doc_id
""",
)
def index_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.trim("text"), " "), lambda x: x != "")
        ).alias("p", "term"),
    )
    a = pos.filter(F.col("term") == "hash").select("doc_id", F.col("p").alias("pa"))
    b = pos.filter(F.col("term") == "merge").select(
        F.col("doc_id").alias("doc_b"), F.col("p").alias("pb")
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_b"))
            & (F.abs(F.col("pa") - F.col("pb")) <= 3),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long").alias("min_distance"),
        )
        .orderBy("doc_id")
    )

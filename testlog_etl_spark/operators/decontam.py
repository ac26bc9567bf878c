"""Train/eval decontamination: flag corpus documents sharing word
n-grams with a benchmark (eval) set.

The standard contamination check for LLM training data (n-gram overlap,
as popularized by GPT-3/PaLM data cards): a training document is
contaminated if it shares >= min_shared distinct n-grams with any eval
document. At 100 TB this must NOT compare documents pairwise; the
scalable shape is the same as MinHash banding:

 1. each side explodes to DISTINCT word n-grams (dedup before the join
    so a repeated phrase inside one doc can't multiply pairs);
 2. n-grams meet via an equi-join on a 64-bit hash of the n-gram --
    the shuffle carries (hash, id) pairs, never document text;
 3. the benchmark side is tiny by construction (eval sets are fixed
    size) and is broadcast, so the corpus is scanned once with NO
    corpus-side shuffle before the match;
 4. matched pairs aggregate to distinct-shared-n-gram counts.

Pair volume is bounded by actual n-gram collisions (true overlap +
negligible 64-bit hash collisions), never |corpus| x |eval|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, ngram_hash) pairs, one row per DISTINCT n-gram of the
    lowercased whitespace-tokenized text. Docs shorter than n tokens
    yield no rows (they cannot carry an n-gram)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, n), " ")),
    )
    return (
        df.filter(F.size(toks) >= n)
        .select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("_ng"))
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
) -> DataFrame:
    """(corpus_id, bench_id, n_shared) for every corpus/benchmark pair
    sharing >= min_shared distinct n-grams. Column names of the two id
    cols must differ (alias upstream)."""
    c = word_ngrams(corpus, corpus_id, text_col, n)
    b = word_ngrams(benchmark, bench_id, text_col, n)
    return (
        c.join(F.broadcast(b), "_ng")
        .groupBy(corpus_id, bench_id)
        .agg(F.count(F.lit(1)).alias("n_shared"))  # inputs distinct per side
        .filter(F.col("n_shared") >= min_shared)
    )

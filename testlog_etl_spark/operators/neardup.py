"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these over exact O(n^2) comparison):

- MinHash signatures are computed per-row with array intrinsics (no
  shuffle, no UDF): hash every shingle under H seeded hash functions and
  take array_min per seed.
- LSH banding turns signature similarity into equi-join keys: b bands of
  r rows; docs sharing any band key become candidates. The only shuffles
  are the band-key self-join and the final distinct -- both proportional
  to candidate volume, not n^2. With b=64, r=2 a pair at Jaccard 0.8 is
  missed with probability (1-0.8^2)^64 ~ 4e-29.
- Candidates are verified with EXACT shingle-set Jaccard (array
  intersect/union), so false positives cost only the verify compute.
- SimHash: 64-bit sign-of-weighted-sum signature; pairs within Hamming
  distance d are found by pigeonhole blocking: split the signature into
  d+1 chunks -- any pair within d shares at least one exact chunk, which
  is again an equi-join, then verify with popcount.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from testlog_etl_spark.operators.textstats import tokens

N_HASHES = 128
BAND_R = 2  # rows per band -> N_HASHES // BAND_R bands


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (k consecutive tokens joined by a space)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter.cast("double") / F.greatest(union, F.lit(1))


def minhash_signature(shingle_col: Column, n_hashes: int = N_HASHES) -> Column:
    """H-element MinHash signature; each component is the min of a
    seeded 64-bit hash over the shingle set. Pure array math per row."""
    # factory, not a default-arg lambda: a second parameter would be
    # bound by F.transform as the element INDEX, replacing the seed
    def seeded(i):
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(*[F.array_min(F.transform(shingle_col, seeded(i))) for i in range(n_hashes)])


def band_keys(sig_col: Column, band_r: int = BAND_R, n_hashes: int = N_HASHES) -> Column:
    """One 64-bit key per band = hash of the band's signature rows."""
    return F.array(
        *[
            F.xxhash64(*[sig_col[band_r * b + r] for r in range(band_r)], F.lit(b))
            for b in range(n_hashes // band_r)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    k_shingle: int = 3,
    n_hashes: int = N_HASHES,
    band_r: int = BAND_R,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with exact shingle Jaccard >=
    threshold, found via LSH candidates + exact verify."""
    base = df.select(F.col(id_col).alias("_id"), word_shingles(F.col(text_col), k_shingle).alias("_sh"))
    sigs = base.withColumn("_bands", band_keys(minhash_signature(F.col("_sh"), n_hashes), band_r, n_hashes))
    bands = sigs.select("_id", "_sh", F.posexplode("_bands").alias("_band_idx", "_band_key"))

    left = bands.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "_band_idx", "_band_key"
    )
    right = bands.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "_band_idx", "_band_key"
    )
    cand = (
        left.join(right, ["_band_idx", "_band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(token_col: Column) -> Column:
    """64-bit SimHash: bit k is 1 iff the sum over tokens of
    (+1 if bit k of hash(token) else -1) is positive."""
    hashes = F.transform(token_col, lambda t: F.xxhash64(t))

    def bit_vote(k):  # factory: F.aggregate's merge lambda must be binary
        return lambda acc, h: acc + F.when(F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    sig = F.lit(0).cast("long")
    for k in range(64):
        bit_sum = F.aggregate(hashes, F.lit(0), bit_vote(k))
        bit_value = (1 << k) if k < 63 else -(1 << 63)  # two's-complement top bit
        sig = sig + F.when(bit_sum > 0, F.lit(bit_value).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """(id_a, id_b, hamming) for pairs within `max_hamming` bits.
    Pigeonhole blocking: any such pair agrees exactly on >= 1 of the
    (max_hamming+1) signature chunks -> equi-join per chunk."""
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    sig = df.select(F.col(id_col).alias("_id"), simhash64(tokens(F.col(text_col))).alias("_sig"))
    chunks = sig.select(
        "_id",
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_sig"), i * bits).bitwiseAND(F.lit((1 << bits) - 1))
                    for i in range(n_chunks)
                ]
            )
        ).alias("_chunk_idx", "_chunk"),
    )
    left = chunks.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"), "_chunk_idx", "_chunk")
    right = chunks.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"), "_chunk_idx", "_chunk")
    return (
        left.join(right, ["_chunk_idx", "_chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

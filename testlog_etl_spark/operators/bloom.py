"""Bloom-filter semi-prefilter for big-big joins: prune the probe side
BEFORE its exchange.

A big-big equi-join shuffles BOTH sides in full, even when the build
side is selective and most probe rows can never match. Spark's own
runtime row-level filtering covers some shapes; this operator is the
explicit, engine-portable form: build a Bloom filter over the build
side's join keys (one tiny aggregate -> m/64 longs on the driver),
render it as a LITERAL bitset array, and apply `might_contain` as a
pure-codegen predicate on the probe side's scan stage -- rows that
cannot match are dropped before they ever reach the shuffle write.

Correctness: a Bloom filter has false POSITIVES only -- the subsequent
real join re-verifies every surviving row, so results are IDENTICAL to
the unfiltered join (no-false-negative property is load-bearing and
property-tested). The payoff is shuffle volume: at default sizing
(2^20 bits, 3 hashes) a 5%-selective build side prunes ~95% of probe
shuffle bytes for ~128 KiB of broadcast-as-literal bitset.

Scale shape: the bitset must stay driver/plan-friendly -- n_bits_log2
<= ~24 (2 MiB). Beyond that, fall back to AQE runtime filtering or a
semi-join. The build aggregate shuffles (word_index, partial_or) pairs
only: at most m/64 rows regardless of build-side row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from testlog_etl_spark.util import const_array

_POW2 = [1 << b for b in range(63)] + [-(1 << 63)]  # two's-complement top bit


def _hashes(key: Column, n_hashes: int, n_bits_log2: int) -> list[Column]:
    m = 1 << n_bits_log2
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(n_hashes)]


def build_bloom_bits(
    df: DataFrame, key: Column, n_bits_log2: int = 20, n_hashes: int = 3
) -> list[int]:
    """Collect the filter's 64-bit words (len = 2^n_bits_log2 / 64).
    One explode + one (word -> bit_or) aggregate; the shuffle carries at
    most m/64 partial rows however large the build side is."""
    m_words = (1 << n_bits_log2) // 64
    pow2 = const_array(_POW2)
    masks = F.array(
        *[
            F.struct(
                (h / 64).cast("int").alias("w"),
                F.element_at(pow2, F.pmod(h, F.lit(64)).cast("int") + 1).alias("b"),
            )
            for h in _hashes(key, n_hashes, n_bits_log2)
        ]
    )
    rows = (
        df.select(F.explode(masks).alias("m"))
        .groupBy(F.col("m.w").alias("w"))
        .agg(F.bit_or("m.b").alias("bits"))
        .collect()
    )
    words = [0] * m_words
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def might_contain(
    key: Column, words: list[int], n_bits_log2: int = 20, n_hashes: int = 3
) -> Column:
    """Pure-codegen Bloom membership probe against the literal bitset:
    k hash probes, each an element_at + bitwise AND -- no Python, no
    broadcast variable, constant-folded into the probe side's scan
    stage (so it applies BEFORE the join exchange)."""
    arr = const_array(words)
    pow2 = const_array(_POW2)
    cond = None
    for h in _hashes(key, n_hashes, n_bits_log2):
        word = F.element_at(arr, (h / 64).cast("int") + 1)
        bit = F.element_at(pow2, F.pmod(h, F.lit(64)).cast("int") + 1)
        c = word.bitwiseAND(bit) != 0
        cond = c if cond is None else cond & c
    return cond


def bloom_prefiltered_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    n_bits_log2: int = 20,
    n_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side Bloom-pruned before its exchange.
    Single-key joins probe the key directly; composite keys hash their
    concatenation. The join itself is unchanged (sort-merge/AQE as
    planned); results are identical to ``probe.join(build, keys, how)``.

    ``how`` is restricted to probe-match-preserving join types: the
    filter drops probe rows that cannot match, which is only sound when
    unmatched probe rows are absent from the result anyway. With
    ``left``/``full`` an unmatched probe row should surface
    null-extended but is silently dropped; with ``left_anti`` the
    filter drops exactly the rows the anti join should RETURN. A
    ``right`` outer join would be sound (pruned probe rows cannot
    null-extend the build side) but is rejected too -- prune the other
    side instead, it is the cheap one by construction."""
    allowed = {"inner", "left_semi", "leftsemi", "semi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"bloom_prefiltered_join: how={how!r} unsupported -- the Bloom "
            f"filter drops non-matching probe rows before the join, which "
            f"changes left/right/full/anti results. Use inner or left_semi, "
            f"or apply might_contain() yourself where semantics allow."
        )
    key_col = F.xxhash64(*[F.col(k) for k in keys]) if len(keys) > 1 else F.col(keys[0])
    build_key = (
        F.xxhash64(*[F.col(k) for k in keys]) if len(keys) > 1 else F.col(keys[0])
    )
    words = build_bloom_bits(build, build_key, n_bits_log2, n_hashes)
    pruned = probe.filter(might_contain(key_col, words, n_bits_log2, n_hashes))
    return pruned.join(build, keys, how)

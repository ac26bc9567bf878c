"""DuckDB-SQL twins of engine-specific Spark functions, for oracle use.

The driver's correctness gate runs each Spark query against an ANSI-SQL
oracle in DuckDB. Queries built on ``F.xxhash64`` (SimHash, fingerprint
variants) had no oracle before r04 because DuckDB ships no xxHash64.
This module GENERATES one: ``xxh64_sql`` emits a single self-contained
SQL *expression* (no macros, no multi-statement -- the driver may not
support either) computing standard XXH64 with Spark's seed, validated
bit-exact against ``F.xxhash64`` for lengths 0..100 incl. all tail-path
boundaries (tests/test_llm_ops.py::test_xxh64_sql_matches_spark).

Expansion happens here in Python at oracle-build time, so the emitted
SQL stays one statement. Expression-size discipline: helpers that would
duplicate a large subexpression bind it once via the single-element
``list_transform([expr], v -> body)[1]`` idiom (DuckDB lambdas close
over outer lambda variables, verified), and the three variable-length
loops of XXH64 (32-byte stripes, 8-byte tail words, tail bytes) are
``reduce`` folds seeded by ``list_prepend(init, elems)`` -- a fold1, so
an empty loop yields init with no empty-reduce error.

Input caveat: bytes are recovered as ``ord(substr(s, i, 1))``, i.e.
CODEPOINTS -- exact for ASCII (the synthetic corpus; asserted by the
paired tests), divergent for multi-byte UTF-8. A production oracle
would read blob bytes instead; DuckDB's blob indexing cannot express
that in one expression today.

All arithmetic runs in HUGEINT kept within [0, 2**64): 64x64-bit
products are split hi/lo so nothing exceeds 2**97 < HUGEINT max, and
every add/mul is reduced mod 2**64.
"""

from __future__ import annotations

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M = 1 << 64
_MASK = _M - 1

SPARK_SEED = 42


class _Names:
    """Unique bind-variable names within one generated expression."""

    def __init__(self) -> None:
        self.i = 0

    def __call__(self) -> str:
        self.i += 1
        return f"__x{self.i}"


def _bind(names: _Names, expr: str, body) -> str:
    """Evaluate ``expr`` once, reference it many times in ``body``."""
    v = names()
    return f"list_transform([({expr})], {v} -> ({body(v)}))[1]"


def _mod(x: str) -> str:
    return f"(({x}) % {_M})"


def _mul64(names: _Names, a: str, b: str) -> str:
    """(a*b) mod 2**64 without exceeding HUGEINT: split a into 32-bit
    halves; hi*b < 2**96 and lo*b < 2**96 both fit."""
    v = names()
    return (
        f"list_transform([{{'h': ({a}), 'l': ({b})}}], "
        f"{v} -> (({v}.h // 4294967296 * {v}.l) % 4294967296 * 4294967296 "
        f"+ ({v}.h % 4294967296 * {v}.l)) % {_M})[1]"
    )


def _rotl(names: _Names, x: str, r: int) -> str:
    return _bind(names, x, lambda v: f"({v} * {1 << r} + {v} // {1 << (64 - r)}) % {_M}")


def _rnd(names: _Names, acc: str, lane: str) -> str:
    """XXH64 round: rotl31(acc + lane*P2) * P1  (mod 2**64)."""
    s = _mod(f"({acc}) + {_mul64(names, lane, f'{_P2}::HUGEINT')}")
    return _mul64(names, _rotl(names, s, 31), f"{_P1}::HUGEINT")


def _u_le(bs: str, off: str, nbytes: int) -> str:
    """Little-endian unsigned read of ``nbytes`` from 1-indexed byte list
    ``bs`` at 0-based offset expression ``off`` (each byte cast HUGEINT
    before scaling: 255*2**56 overflows BIGINT)."""
    terms = [f"{bs}[({off}) + {j + 1}]::HUGEINT * {1 << (8 * j)}" for j in range(nbytes)]
    return "(" + " + ".join(terms) + ")"


def xxh64_unsigned_sql(s_expr: str, seed: int = SPARK_SEED) -> str:
    """SQL expression: standard XXH64 of ASCII string ``s_expr`` as
    HUGEINT in [0, 2**64)."""
    n = _Names()
    outer = n()

    bs, ln = f"{outer}.bs", f"{outer}.n"

    # ---- n >= 32 branch: 32-byte stripe fold + merge -------------------
    stripe_elem = (
        "{'a1': " + _u_le(bs, "__s * 32", 8)
        + ", 'a2': " + _u_le(bs, "__s * 32 + 8", 8)
        + ", 'a3': " + _u_le(bs, "__s * 32 + 16", 8)
        + ", 'a4': " + _u_le(bs, "__s * 32 + 24", 8)
        + "}"
    )
    init_acc = (
        f"{{'a1': {(seed + _P1 + _P2) & _MASK}::HUGEINT, 'a2': {(seed + _P2) & _MASK}::HUGEINT, "
        f"'a3': {seed & _MASK}::HUGEINT, 'a4': {(seed - _P1) & _MASK}::HUGEINT}}"
    )
    stripe_fold = (
        f"reduce(list_prepend({init_acc}, "
        f"list_transform(range(0, {ln} // 32), __s -> {stripe_elem})), "
        f"(__acc, __e) -> {{"
        f"'a1': {_rnd(n, '__acc.a1', '__e.a1')}, "
        f"'a2': {_rnd(n, '__acc.a2', '__e.a2')}, "
        f"'a3': {_rnd(n, '__acc.a3', '__e.a3')}, "
        f"'a4': {_rnd(n, '__acc.a4', '__e.a4')}}})"
    )

    def merged(v: str) -> str:
        h = _mod(
            f"{_rotl(n, f'{v}.a1', 1)} + {_rotl(n, f'{v}.a2', 7)} + "
            f"{_rotl(n, f'{v}.a3', 12)} + {_rotl(n, f'{v}.a4', 18)}"
        )
        for lane in ("a1", "a2", "a3", "a4"):
            rnd0 = _mul64(n, _rotl(n, _mul64(n, f"{v}.{lane}", f"{_P2}::HUGEINT"), 31), f"{_P1}::HUGEINT")
            h = _mod(f"{_mul64(n, f'xor(({h}), {rnd0})', f'{_P1}::HUGEINT')} + {_P4}")
        return h

    big_branch = _bind(n, stripe_fold, merged)
    h_len = _mod(
        f"(CASE WHEN {ln} >= 32 THEN {big_branch} ELSE {(seed + _P5) & _MASK}::HUGEINT END) + {ln}"
    )

    # ---- 8-byte tail words --------------------------------------------
    tail8_elems = (
        f"list_transform(range(0, ({ln} % 32) // 8), "
        f"__j -> {_u_le(bs, f'{ln} // 32 * 32 + __j * 8', 8)})"
    )
    rnd0_x = _mul64(n, _rotl(n, _mul64(n, "__w", f"{_P2}::HUGEINT"), 31), f"{_P1}::HUGEINT")
    tail8_fold = (
        f"reduce(list_prepend(({h_len}), {tail8_elems}), "
        f"(__h8, __w) -> {_mod(_mul64(n, _rotl(n, f'xor(__h8, {rnd0_x})', 27), f'{_P1}::HUGEINT') + f' + {_P4}')})"
    )

    # ---- optional 4-byte word -----------------------------------------
    def four_byte(v: str) -> str:
        lane = _mod(_mul64(n, _u_le(bs, f"{ln} - ({ln} % 8)", 4), f"{_P1}::HUGEINT"))
        step = _mod(
            _mul64(n, _rotl(n, f"xor({v}, {lane})", 23), f"{_P2}::HUGEINT") + f" + {_P3}"
        )
        return f"CASE WHEN ({ln} % 8) >= 4 THEN {step} ELSE {v} END"

    h4 = _bind(n, tail8_fold, four_byte)

    # ---- tail bytes ----------------------------------------------------
    byte_elems = (
        f"list_transform(range({ln} - ({ln} % 4), {ln}), "
        f"__o -> ({bs}[__o + 1]::HUGEINT * {_P5}) % {_M})"
    )
    byte_fold = (
        f"reduce(list_prepend(({h4}), {byte_elems}), "
        f"(__hb, __c) -> {_mul64(n, _rotl(n, 'xor(__hb, __c)', 11), f'{_P1}::HUGEINT')})"
    )

    # ---- avalanche -----------------------------------------------------
    def avalanche(v: str) -> str:
        a = _mul64(n, f"xor({v}, {v} // {1 << 33})", f"{_P2}::HUGEINT")
        b = _bind(n, a, lambda w: _mul64(n, f"xor({w}, {w} // {1 << 29})", f"{_P3}::HUGEINT"))
        return _bind(n, b, lambda w: f"xor({w}, {w} // {1 << 32})")

    body = _bind(n, byte_fold, avalanche)

    bytes_list = f"[ord(substr(({s_expr}), __i, 1)) for __i in range(1, length({s_expr}) + 1)]"
    return (
        f"list_transform([{{'bs': {bytes_list}, 'n': length({s_expr})::BIGINT}}], "
        f"{outer} -> ({body}))[1]"
    )


def xxh64_sql(s_expr: str, seed: int = SPARK_SEED) -> str:
    """SQL expression equal to Spark's ``F.xxhash64(s_expr)`` (signed
    BIGINT two's-complement wrap of the unsigned hash)."""
    n = _Names()
    return _bind(
        n,
        xxh64_unsigned_sql(s_expr, seed),
        lambda v: f"CASE WHEN {v} >= {1 << 63} THEN ({v} - {_M})::BIGINT ELSE ({v})::BIGINT END",
    )


def quality_z_sql() -> str:
    """The ONE DuckDB spelling of filtering.linear_quality_score's
    logistic input z (same weight literals, imported; same \\s+ trimmed
    empty-free tokenization as textstats.tokens). Shared by the
    model-score, corpus-v2, and AUC oracles so a feature change cannot
    silently diverge one of them."""
    from testlog_etl_spark.operators.filtering import MODEL_WEIGHTS as W
    from testlog_etl_spark.operators.textstats import STOPWORDS

    stop = "[" + ",".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    toks = "list_filter(regexp_split_to_array(trim(text), '\\s+'), __t -> __t != '')"
    ltoks = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), __t -> __t != '')"
    return f"""{W['bias']}
    + {W['log_tokens']} * ln(1.0 + len({toks}))
    + {W['type_token_ratio']} * (len(list_distinct({toks}))::DOUBLE / greatest(len({toks}), 1))
    + {W['stopword_ratio']} * (len(list_filter({ltoks}, __t -> list_contains({stop}, __t)))::DOUBLE
                               / greatest(len({ltoks}), 1))
    + {W['mean_token_len']} * (COALESCE(list_sum(list_transform({toks}, __t -> length(__t))), 0)::DOUBLE
                               / greatest(len({toks}), 1))"""

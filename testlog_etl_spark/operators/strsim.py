"""String-similarity operators for fuzzy matching / entity resolution.

Jaro-Winkler runs as an Arrow-batched pandas UDF (short strings, pure
Python per pair inside a vectorized batch) implementing the STANDARD
definition -- Winkler prefix bonus p=0.1 capped at 4 chars, applied
only when jaro > 0.7 -- which is bit-compatible with DuckDB's
jaro_winkler_similarity ON ASCII INPUT (verified pairwise over the
part-name corpus in tests/test_r07_ops.py, including the ('','') ->
0.0 edge DuckDB chooses over the identity shortcut, and fuzzed over
the printable-ASCII long tail in tests/test_properties.py).

Unicode caveat (found by the r08 fuzz, pinned in test_properties):
DuckDB computes JW and Damerau-Levenshtein over UTF-8 BYTES, so
multi-byte codepoints sharing lead bytes inflate its similarity
(jaro_winkler_similarity('\\x80', '\\x800') = 0.911... because '\\x80'
is the two bytes C2 80). These kernels are CODEPOINT-level -- the
linguistically meaningful unit -- and byte-equal to DuckDB exactly
when input is ASCII, which every registered fuzzy-join query's data
is (TPC-H part/customer names).

Scale shape for joins: NEVER score the crossjoin. Block first (equal
first-2-chars here -- any corruption model that preserves the block key
keeps the join lossless), score only within blocks; the UDF sees
block-join candidates, linear-ish in data for selective blocks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


def _jw(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    md = max(max(l1, l2) // 2 - 1, 0)
    f1 = [False] * l1
    f2 = [False] * l2
    m = 0
    for i, ch in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not f2[j] and s2[j] == ch:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3
    if jaro > boost:
        pl = 0
        for a, b in zip(s1, s2):
            if a == b and pl < 4:
                pl += 1
            else:
                break
        jaro += pl * p * (1 - jaro)
    return jaro


@F.pandas_udf(DoubleType())
def jaro_winkler(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            _jw(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


def _dl(a: str, b: str) -> int:
    """TRUE (unrestricted) Damerau-Levenshtein -- the alphabet-indexed
    DP, matching DuckDB's damerau_levenshtein (probe: CA->ABC = 2, the
    case the restricted/OSA variant scores 3)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            left = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][left] + (i - 1 - k) + 1 + (j - 1 - left),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


@F.pandas_udf(LongType())
def damerau_levenshtein(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            _dl(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ],
        dtype="int64",
    )

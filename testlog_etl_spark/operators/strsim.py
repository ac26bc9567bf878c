"""String-similarity operators for fuzzy matching / entity resolution.

Jaro-Winkler runs as an Arrow-batched pandas UDF (short strings, pure
Python per pair inside a vectorized batch) implementing the STANDARD
definition -- Winkler prefix bonus p=0.1 capped at 4 chars, applied
only when jaro > 0.7 -- which is bit-compatible with DuckDB's
jaro_winkler_similarity (verified pairwise over the part-name corpus in
tests/test_r07_ops.py, including the ('','') -> 0.0 edge DuckDB
chooses over the identity shortcut).

Scale shape for joins: NEVER score the crossjoin. Block first (equal
first-2-chars here -- any corruption model that preserves the block key
keeps the join lossless), score only within blocks; the UDF sees
block-join candidates, linear-ish in data for selective blocks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


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

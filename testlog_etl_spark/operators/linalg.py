"""Iterative linear algebra on DataFrames: power iteration for the top
principal direction of the (uncentered) second-moment matrix X'X.

Scale shape per iteration: ONE pass over the vectors computing each
row's projection x.v (array fold -- the vector never leaves its row)
and the elementwise contribution (x.v) * x, partial-aggregated to dim
rows before the only exchange (dim-keyed, 64 rows here). The driver
sees one dim-length array per iteration (the kmeans_fit contract:
codebook-sized state, never the corpus).

Engine-portability is the kmeans/pagerank playbook: after every
normalize, each component snaps to the 2^-qbits binary grid, absorbing
the one engine-specific quantity (addition order of the per-dim row
sums, ~1e-12 relative) so a sequential SQL replay lands on
bit-identical iterates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from testlog_etl_spark.util import const_array


def power_iteration_top_pc(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_iter: int = 4,
    qbits: int = 20,
) -> tuple[list[float], float]:
    """Returns (unit direction v snapped to the 2^-qbits grid, final
    ||X'Xv|| -- the eigenvalue estimate). Init is the exact-binary
    uniform unit vector [1/sqrt(dim)] when dim is a power of 4 (1/8 for
    dim=64), so iteration 0 needs no snap."""
    g = float(1 << qbits)

    def snap(x: float) -> float:
        return math.floor(x * g + 0.5) / g

    v = [1.0 / math.sqrt(dim)] * dim
    lam = 0.0
    x = F.col(vec_col).cast("array<double>")
    for _ in range(n_iter):
        vlit = const_array([float(c) for c in v])
        dot = F.aggregate(
            F.zip_with(x, vlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
        # dot materialized as a COLUMN before the contribution transform
        # (r13): embedded in the lambda body, the whole dim-length fold
        # re-evaluated once PER ELEMENT (dim x per row -- interpreted
        # HOFs have no CSE). Same fold, same value, evaluated once per
        # row; embed_top_principal measured 14.7 -> 2.9 s at sf0.1.
        proj = df.select(x.alias("_x"), dot.alias("_dot"))
        contrib = F.transform(F.col("_x"), lambda e: e * F.col("_dot"))
        sums = (
            proj.select(F.posexplode(contrib).alias("_d", "_c"))
            .groupBy("_d")
            .agg(F.sum("_c").alias("_s"))
            .collect()
        )
        w = [0.0] * dim
        for r in sums:
            w[r["_d"]] = r["_s"]
        lam = 0.0
        for c in w:  # fixed dim order on BOTH engines -- not math.fsum
            lam += c * c
        lam = math.sqrt(lam)
        v = [snap(c / lam) for c in w]
    return v, lam

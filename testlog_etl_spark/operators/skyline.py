"""Skyline / Pareto-frontier operator (Borzsonyi et al., ICDE 2001):
the rows not dominated in a (minimize x, maximize y) trade-off -- the
"best price for at least this quality" readout every catalog/offer
analysis wants and SQL can only state as an O(n^2) NOT EXISTS.

Spark-first restatement: LOCAL-PRUNE THEN MERGE, the same shape as
``operators/topk.py``'s grouped top-k. Dominance is closed under
subsets -- a row dominated inside one partition is dominated globally,
and a globally-undominated row is undominated in every subset that
contains it -- so each partition can drop its locally-dominated rows
with a tiny Arrow-batched sort+cummax pass, and the frontier of the
surviving candidates (computed the same way on one coalesced
partition) is EXACTLY the global frontier. No global sort, no
single-partition window over the full input, no O(n^2) join: the only
data that crosses the wire is the per-partition frontiers.

Scale shape: local frontiers are tiny for real distributions (the
frontier of n uniform 2-d points has ~H(n) = O(log n) expected size);
the merge stage sees at most sum(local frontier sizes) ~ parts *
O(log rows-per-part). Adversarial inputs (all points on one diagonal)
degrade the MERGE input toward n -- same caveat every skyline
algorithm carries; the local pass still runs distributed.

Tie semantics (pinned by tests + the NOT-EXISTS oracle): dominance
requires (x <= , y >=) with at least ONE strict inequality, so exact
duplicates do not dominate each other -- duplicate frontier points all
survive.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _local_frontier(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Frontier of one in-memory chunk: minimize x, maximize y.
    Sort by x; within an x-group only the max-y rows can survive
    (an equal-x higher-y row dominates); across ascending x a group
    survives iff its ymax STRICTLY exceeds every cheaper group's ymax
    (an equal-y cheaper row dominates)."""
    gmax = pdf.groupby(x)[y].transform("max")
    best = pdf[pdf[y] == gmax]
    ymax_per_x = best.groupby(x)[y].first().sort_index()
    prev_best = ymax_per_x.cummax().shift(1)
    keep_x = ymax_per_x.index[prev_best.isna() | (ymax_per_x > prev_best)]
    return best[best[x].isin(keep_x)]


def pareto_frontier_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` on the (min ``x``, max ``y``) Pareto frontier,
    all columns preserved. Two Arrow passes: per-partition local
    frontier, then the exact frontier of the gathered candidates on a
    single (small) partition."""
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [p for p in batches if not p.empty]
        if chunks:
            yield _local_frontier(pd.concat(chunks, ignore_index=True), x, y)

    candidates = df.mapInPandas(local, schema)
    return candidates.coalesce(1).mapInPandas(local, schema)

"""Hierarchical / recursive closure: ancestor sets and subtree rollups
over parent-pointer hierarchies (BOM explosion, org charts, category
trees) -- the recursive-CTE workload Spark SQL lacks natively.

Spark-first restatement: POINTER DOUBLING. Each round self-joins the
closure-so-far with itself, so after k rounds every path of length
<= 2^k is present -- log2(depth) joins instead of depth iterations
(a depth-64 hierarchy closes in 6 rounds; the naive parent-at-a-time
loop would run 64 dependent jobs). The same doubling trick drives
``operators/dupgroups.py``'s connected components; here the closure
itself is the output, feeding subtree aggregation.

Scale shape: each round shuffles the closure frame (16-byte id pairs,
O(n * depth) rows for a single-parent hierarchy) through one equi-join
+ one distinct. No vertex ever holds its whole subtree in one task;
the rollup at the end is an ordinary hash aggregate on ancestor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ancestor_closure(
    edges: DataFrame,
    node_col: str = "node",
    parent_col: str = "anc",
    rounds: int = 5,
) -> DataFrame:
    """Transitive (node, proper-ancestor) closure of a parent-pointer
    edge set by pointer doubling: ``rounds`` = ceil(log2(max depth))
    (5 covers depth 32). Single-parent hierarchies produce each
    (node, ancestor) pair along one path, but doubling regenerates a
    pair once per split point -- the per-round distinct both dedups and
    keeps the frame minimal."""
    c = edges.select(node_col, parent_col)
    for _ in range(rounds):
        hop = (
            c.alias("a")
            .join(c.alias("b"), F.col(f"a.{parent_col}") == F.col(f"b.{node_col}"))
            .select(
                F.col(f"a.{node_col}").alias(node_col),
                F.col(f"b.{parent_col}").alias(parent_col),
            )
        )
        c = c.unionByName(hop).distinct()
    return c


def subtree_rollup(
    nodes: DataFrame,
    id_col: str,
    parent: Column,
    value: Column,
    rounds: int = 5,
) -> DataFrame:
    """Per-ancestor rollup over the closure: for every node that is an
    ancestor, the count of its PROPER descendants and the sum of
    ``value`` over them. ``parent`` maps each node id to its parent id
    (root rows excluded from the edge set by the caller's convention:
    only rows where parent differs from the node feed edges)."""
    edges = nodes.select(
        F.col(id_col).alias("node"), parent.alias("anc")
    ).filter(F.col("node") != F.col("anc"))
    closure = ancestor_closure(edges, "node", "anc", rounds=rounds)
    vals = nodes.select(F.col(id_col).alias("node"), value.alias("_val"))
    return (
        closure.join(vals, "node")
        .groupBy(F.col("anc").alias("ancestor"))
        .agg(
            F.count(F.lit(1)).alias("n_desc"),
            F.sum("_val").cast("long").alias("subtree_value"),
        )
    )

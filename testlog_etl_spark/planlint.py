"""Plan lints that walk the optimized logical plan via py4j.

The one implemented so far is the scale lint VERDICT r04 asked for:
find every Window node with an EMPTY partitionSpec. Spark executes such
a window in one task holding its whole input, which is fine only when
the input frame is bounded by construction (histogram buckets, top-k
lists, per-group rollups with a fixed domain) and fatal when the frame
scales with the data (customer/part grains). `tools/window_lint.py`
runs this over every registered query against a per-query whitelist of
justified bounded frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))
    # ADVICE r05: children() alone never descends into subquery-expression
    # plans, so a Window introduced via a scalar/IN/EXISTS subquery was
    # invisible to the lint. QueryPlan.subqueries returns each subquery
    # expression's plan; recursing through _walk also covers nested
    # subqueries-inside-subqueries.
    subs = node.subqueries()
    for i in range(subs.size()):
        yield from _walk(subs.apply(i))


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Order-spec strings (one per distinct Window node) of every Window
    in ``df``'s optimized logical plan whose partitionSpec is empty --
    i.e. every window Spark will execute as a single task over its whole
    input frame."""
    out = []
    for n in _walk(df._jdf.queryExecution().optimizedPlan()):
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            out.append(str(n.orderSpec()))
    return out

"""Grouped top-k that survives giant groups.

The standard `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`
formulation shuffles EVERY row to its group's partition and sorts the
whole group in ONE task just to keep k rows: at 100 TB a hot group is a
straggler or an OOM, and the exchange moves the corpus. A single-shot
aggregate (`slice(sort_array(collect_list(..)), 1, k)`) is no better at
scale: Spark does not truncate collect_list partial state, so the
map-side partials carry every row (as lists) through the exchange and
the final state materializes the whole group on one reducer.

The scalable shape is prune-then-merge:

1. **Local prune, zero shuffle**: an Arrow-batched `mapInPandas` keeps
   each batch's top-k per group (vectorized sort_values/groupby/head).
   Output per batch is <= k rows per group seen in that batch -- the
   only Python in the operator, O(batch log batch), and exact: a row
   outside its batch's local top-k cannot be in the global top-k.
2. **Bounded merge, one shuffle**: groupBy(g) with
   slice(sort_array(collect_list), 1, k) over the pruned stream. The
   exchange now carries <= k x partitions rows per group, and the final
   per-group state is <= k x partitions structs -- bounded by the
   CLUSTER, not the data.

Determinism: both stages order by (value, id), so the kept set and its
ranks are unique under ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Top ``k`` rows per group by ``order_col`` (ties broken by
    ``id_col`` ascending; null order values sort LAST in either
    direction, matching the window form's desc-nulls-last). Null group
    keys form their own group, as in Spark's groupBy."""
    import pandas as pd  # noqa: F401 -- executors need it; fail fast on driver

    cols = [*group_cols, id_col, order_col]
    slim = df.select(*cols)
    schema = slim.schema
    kk = int(k)
    asc = not descending

    def prune(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                # na_position='last' is the pandas default, mirrored
                # explicitly: the merge stage also sorts nulls last
                pdf.sort_values([order_col, id_col], ascending=[asc, True], na_position="last")
                # dropna=False: a null group key is a group (Spark
                # groupBy semantics), not a row to discard
                .groupby(list(group_cols), sort=False, dropna=False)
                .head(kk)
            )

    pruned = slim.mapInPandas(prune, schema)
    sort_key = (-F.col(order_col)).alias("_neg") if descending else F.col(order_col).alias("_neg")
    # leading null flag: NULL order values must lose to every real value
    # (sort_array would otherwise place null-first-field structs FIRST)
    item = F.struct(
        F.col(order_col).isNull().cast("int").alias("_isnull"),
        sort_key,
        F.col(id_col).alias("_id"),
        F.col(order_col).alias("_v"),
    )
    topk = F.slice(F.sort_array(F.collect_list(item)), 1, kk)
    return (
        pruned.groupBy(*group_cols)
        .agg(topk.alias("_top"))
        .select(*group_cols, F.posexplode("_top").alias("_rank0", "_row"))
        .select(
            *group_cols,
            (F.col("_rank0") + 1).cast("int").alias("rank"),
            F.col("_row._id").alias(id_col),
            F.col("_row._v").alias(order_col),
        )
    )

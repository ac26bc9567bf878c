"""Single-pass table profiler: per-column null counts, distinct counts,
min/max, and a mean metric (value mean for numerics, length mean for
strings) -- the "data quality report" every training-data pipeline runs
before and after each transform stage.

Scale shape: ALL metrics for ALL columns are computed in ONE aggregate
over ONE scan. Spark plans it as a partial (map-side) aggregate per
partition followed by a single-row final combine -- no shuffle of data
rows at any size; only one tiny partial-agg row per task moves. The
wide single-row result is reshaped to long (one row per column) with an
exploded array of structs, still JVM-side.

Distinct counts: ``exact=True`` uses count_distinct, which Spark plans
as an expand + two-phase aggregate -- exact, oracle-comparable, and the
right default up to high cardinality. ``exact=False`` swaps in
approx_count_distinct (HyperLogLog++, relativeSD 0.05), the 100 TB path:
constant memory per column, same single-scan plan, no expand.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

R = 4


def profile(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in a single scan.

    Returns one row per column:
      column, n_rows, n_null, null_frac, n_distinct, min_value,
      max_value, avg_metric
    min/max are cast to string so heterogeneous column types fit one
    schema; avg_metric is mean(value) for numeric columns, mean(length)
    for strings, NULL otherwise. All floats rounded to 4 places so the
    result is deterministic under partition-parallel summation.
    """
    cols = columns or df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise KeyError(f"profile: no such columns {missing}")

    n_distinct = F.count_distinct if exact else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        dt = by_name[c]
        if isinstance(dt, NumericType):
            avg_metric = F.round(F.avg(col), R)
        elif isinstance(dt, StringType):
            avg_metric = F.round(F.avg(F.length(col)), R)
        else:
            avg_metric = F.lit(None).cast("double")
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            n_distinct(col).alias(f"_nd_{c}"),
            F.min(col).cast("string").alias(f"_min_{c}"),
            F.max(col).cast("string").alias(f"_max_{c}"),
            avg_metric.alias(f"_avg_{c}"),
        ]
    wide = df.agg(*aggs)

    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
            F.round((F.col("_n") - F.col(f"_nn_{c}")) / F.col("_n"), R).alias("null_frac"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
            F.col(f"_avg_{c}").alias("avg_metric"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*").orderBy("column")


def psi_report(
    df: DataFrame,
    split_col: Column,
    value_col: Column,
    bucket_width: float,
    n_buckets: int,
    base_label: str,
    cmp_label: str,
    eps: float = 1e-4,
) -> DataFrame:
    """Population-stability-index drift report between two named slices
    of one table: fixed-width value buckets (top bucket open-ended), the
    per-slice bucket shares p and q, and PSI = sum((p-q) * ln(p/q)) with
    eps-smoothing so empty buckets don't blow up the log.

    Fixed bucket EDGES (not quantiles) are the operative choice: counts
    become integers, shares become exact ratios of integers, and the PSI
    is deterministic across engines up to ln() ulps -- a quantile-edged
    PSI would inherit the estimator's engine specifics. One scan, one
    tiny (slice, bucket) aggregate, a pivot of 2 columns, one output
    row per bucket plus the PSI total riding a 1-row aggregate.
    """
    bucket = F.least(F.floor(value_col / bucket_width), F.lit(n_buckets - 1)).cast("int")
    counts = (
        df.select(split_col.alias("_slice"), bucket.alias("bucket"))
        .filter(F.col("_slice").isin(base_label, cmp_label))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_slice") == base_label, 1).otherwise(0)).alias("_nb"),
            F.sum(F.when(F.col("_slice") == cmp_label, 1).otherwise(0)).alias("_nc"),
        )
    )
    totals = counts.agg(F.sum("_nb").alias("_tb"), F.sum("_nc").alias("_tc"))
    p = F.col("_nb") / F.col("_tb") + eps
    q = F.col("_nc") / F.col("_tc") + eps
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.col("_nb").alias("n_base"),
            F.col("_nc").alias("n_cmp"),
            ((p - q) * F.log(p / q)).alias("_psi_term"),
        )
        .withColumn("psi_term", F.round("_psi_term", 6))
        .drop("_psi_term")
    )


def k_anonymity(df: DataFrame, qi_cols: list[str | Column], k: int) -> DataFrame:
    """Per-equivalence-class k-anonymity accounting: group the table by
    its quasi-identifier columns and flag every class smaller than
    ``k`` (re-identification risk -- a class of size 1 pins a row to an
    individual). Returns one row per class: the QI values, ``class_size``
    and ``risky`` (class_size < k).

    Scale shape: one hash aggregate on the QI key -- the same shuffle
    any rollup pays, partial map-side combine included; no window, no
    self-join. Callers roll the classes up into a risk report (see
    queries/profile_queries.py::dq_k_anonymity) -- that second rollup
    runs over the already-reduced class frame, which is <= |distinct QI
    combinations| rows, typically orders of magnitude below the row
    count."""
    cols = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("risky", F.col("class_size") < F.lit(k))
    )

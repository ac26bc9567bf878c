"""Pipeline instrumentation via DataFrame.observe: named metrics that
piggyback on whatever action the caller already runs -- row counts,
null counts, value sums collected DURING the write/collect, not by a
second scan of the input.

Why this matters at 100 TB: the naive quality gate (`df.count()`, then
`df.filter(bad).count()`, then the real write) scans the table three
times. ``observe`` attaches aggregate expressions to the plan itself;
Spark accumulates them on the executors while the single real action
runs, and the driver reads them afterwards for free. This is the
engine-native form of the reference ETL's per-batch counters (rows in /
rows dropped / bytes out stamped into its lineage records) -- here the
counters ride the job instead of extra jobs.

Batch path uses ``pyspark.sql.Observation`` (blocking get after the
action); the metrics are ordinary Column aggregates, so everything
stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame,
    value_col: str,
    name: str = "quality",
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach the standard quality counters (n_rows, n_null, sum) for
    ``value_col`` plus any ``extra`` named aggregates. Returns the
    instrumented frame (plan otherwise unchanged) and the Observation;
    read ``obs.get`` AFTER running exactly one action on the result.
    The metrics see rows AT THIS POINT of the plan -- attach before a
    filter to count its input, after to count its output."""
    obs = Observation(name)
    metrics: dict[str, Column] = {
        "n_rows": F.count(F.lit(1)),
        "n_null": F.sum(F.col(value_col).isNull().cast("long")),
        "sum_value": F.sum(F.coalesce(F.col(value_col), F.lit(0.0))),
    }
    if extra:
        metrics.update(extra)
    first, *rest = [c.alias(k) for k, c in metrics.items()]
    return df.observe(obs, first, *rest), obs


def drop_audit(df: DataFrame, keep: Column, name: str = "drop_audit"):
    """Filter with built-in accounting: returns (kept_rows, obs) where
    the observation carries n_in / n_kept / n_dropped for the SAME
    action -- the three numbers a quarantine stage logs, at zero extra
    scans. n_kept is observed downstream of the filter (its own
    observation), n_in upstream; both ride one job."""
    obs_in = Observation(f"{name}_in")
    instrumented = df.observe(obs_in, F.count(F.lit(1)).alias("n_in"))
    kept = instrumented.filter(keep)
    obs_kept = Observation(f"{name}_kept")
    kept = kept.observe(obs_kept, F.count(F.lit(1)).alias("n_kept"))

    class _Audit:
        """Blocking reader over the two observations."""

        def get(self) -> dict[str, int]:
            n_in = int(obs_in.get["n_in"])
            n_kept = int(obs_kept.get["n_kept"])
            return {"n_in": n_in, "n_kept": n_kept, "n_dropped": n_in - n_kept}

    return kept, _Audit()

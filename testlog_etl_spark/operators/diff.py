"""Snapshot diff (CDC extraction): given two versions of a keyed table,
emit one row per changed key labeled insert / delete / update.

Incremental pipelines (the reference's backfill/reprocess surface,
SURVEY §2.8 T10, and any 100-TB corpus that re-crawls) need to know WHAT
changed between snapshot N and N+1 without re-processing either: the
diff is the input to incremental dedup, MV maintenance
(`operators/incremental.py`), and downstream sink upserts
(`streaming/jobs.py::foreach_batch_upsert`).

Design (Spark-first):

- ONE full-outer shuffle join on the key columns — the minimal possible
  data movement for a diff (every row's fate depends on exactly its key
  twin). Both sides project to key + compared columns BEFORE the join,
  so wide payloads the caller doesn't compare never ride the exchange.
- change detection is a null-safe column-by-column compare compiled into
  whole-stage codegen (`eqNullSafe`), not a serialized row compare — no
  Python, no struct packing.
- at rest, snapshots of the same table are typically partitioned/
  bucketed the same way; with both sides bucketed by key (layout.py)
  AQE elides the exchanges entirely and the diff is a zero-shuffle
  zip of co-located buckets.

Output schema: key columns (coalesced), ``op`` ∈ {insert, delete,
update}, and for updates a ``changed_cols`` array naming the differing
columns (empty for insert/delete) — the minimal CDC record.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OLD = "_diff_old_"
_NEW = "_diff_new_"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_payload: bool = False,
) -> DataFrame:
    """Diff two snapshots on ``keys``; compare ``compare_cols`` (default:
    all shared non-key columns). Unchanged keys are dropped.

    With ``include_payload=True`` each insert/update row also carries the
    NEW side's compared-column values (null on deletes) -- the complete
    CDC record a consumer needs to apply the change WITHOUT access to
    the new snapshot (see ``apply_diff``)."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    missing = [c for c in [*keys, *compare_cols] if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"columns absent from a snapshot: {missing}")

    o = old.select(
        *[F.col(k).alias(_OLD + k) for k in keys],
        *[F.col(c).alias(_OLD + c) for c in compare_cols],
        F.lit(True).alias(_OLD + "present"),
    )
    n = new.select(
        *[F.col(k).alias(_NEW + k) for k in keys],
        *[F.col(c).alias(_NEW + c) for c in compare_cols],
        F.lit(True).alias(_NEW + "present"),
    )
    cond = None
    for k in keys:
        eq = F.col(_OLD + k) == F.col(_NEW + k)
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    # presence via explicit marker columns, NOT key nullness: a row whose
    # key VALUE is null still carries its marker, so it classifies as a
    # delete/insert on its own side instead of being mislabeled. (Null
    # keys never equi-join -- SQL semantics -- so a null-keyed row can
    # pair with nothing; each side's null-keyed rows surface separately.)
    in_old = F.col(_OLD + "present").isNotNull()
    in_new = F.col(_NEW + "present").isNotNull()
    # per-column differ flags; collected once, reused for op + changed_cols
    differs = {c: ~F.col(_OLD + c).eqNullSafe(F.col(_NEW + c)) for c in compare_cols}
    any_diff = None
    for d in differs.values():
        any_diff = d if any_diff is None else any_diff | d
    if any_diff is None:  # no compared columns: only inserts/deletes exist
        any_diff = F.lit(False)

    op = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(any_diff, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    changed = F.array_compact(
        F.array(
            *[
                F.when(in_old & in_new & d, F.lit(c))
                for c, d in differs.items()
            ]
        )
    ) if compare_cols else F.array().cast("array<string>")

    payload = (
        [F.col(_NEW + c).alias(c) for c in compare_cols] if include_payload else []
    )
    return (
        j.select(
            *[F.coalesce(F.col(_OLD + k), F.col(_NEW + k)).alias(k) for k in keys],
            op.alias("op"),
            changed.alias("changed_cols"),
            *payload,
        )
        .filter(F.col("op") != "unchanged")
    )


def apply_diff(old: DataFrame, diff: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Apply a payload-carrying ``snapshot_diff`` result to ``old``,
    reconstructing the new snapshot from (old, diff) ALONE -- the
    position a real CDC consumer (replication target, downstream sink)
    is in. Requires the diff to have been built with
    ``include_payload=True`` and with ``compare_cols`` covering every
    non-key column of ``old`` (otherwise uncompared columns cannot be
    reconstructed and this raises). `test_snapshot_diff_roundtrip*`
    pins apply(old, diff(old, new)) == new exactly. Shuffle cost: one
    anti join against the diff keys plus the diff's own rows. The join
    strategy is deliberately left to Catalyst/AQE: a typical CDC diff is
    small and auto-broadcasts under autoBroadcastJoinThreshold, but a
    high-churn pair (full re-crawl where most keys changed) produces a
    diff the size of the table, and a forced broadcast hint there would
    bypass the threshold and OOM executors."""
    payload_cols = [c for c in old.columns if c not in set(keys)]
    missing = [c for c in payload_cols if c not in diff.columns]
    if missing:
        raise ValueError(
            f"diff lacks payload columns {missing}: build it with "
            "include_payload=True and compare_cols covering every "
            "non-key column"
        )
    touched = diff.select(*keys)
    upserts = diff.filter(F.col("op") != "delete").select(*keys, *payload_cols)
    return old.join(touched, list(keys), "left_anti").unionByName(upserts)

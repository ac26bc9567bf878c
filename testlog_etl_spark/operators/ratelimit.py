"""Per-key event-time rate limiting as a custom stateful streaming
operator (applyInPandasWithState) -- the quota/throttle shape: admit at
most ``quota`` events per (key, window), drop the rest, with the admit
counts carried ACROSS micro-batches in keyed state.

Why stateful: a quota is a property of the (key, window) HISTORY, not of
any one batch -- admitting "first k per hour" requires remembering how
many the earlier batches already admitted. State per key is the
(window_start -> admitted_count) map; production deployments prune
entries older than the watermark (the map is bounded by windows-per-
retention, not stream length). Admission order is event-time order
within each batch (sorted) and batch arrival order across batches, so
with a chronologically-arriving stream the admitted set equals the batch
answer ``row_number() OVER (key, window ORDER BY ts, id) <= quota`` --
which is how the oracle states it.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

ADMIT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

_STATE_SCHEMA = "hours array<long>, counts array<long>"


def rate_limit_stateful(
    events_stream: DataFrame,
    quota: int,
    window_sec: int = 3600,
) -> DataFrame:
    """Admit the first ``quota`` events per (user, event-time window);
    state is the per-user window->count map. Input needs event_id,
    user_id, ts, value."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    q = int(quota)
    wsec = int(window_sec)

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.exists:
            hours, counts = state.get
            admitted = dict(zip(hours, counts))
        else:
            admitted = {}
        # the runtime hands a group's batch as MULTIPLE Arrow chunks in
        # arrival order; admission order must be event time across the
        # whole batch, so concatenate before the single sort (chunk-local
        # sorts would admit later-chunk rows out of order)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            keep = []
            for eid, ts, value in zip(batch["event_id"], batch["ts"], batch["value"]):
                h = int(ts.value // 1_000_000_000) // wsec
                c = admitted.get(h, 0)
                if c < q:
                    admitted[h] = c + 1
                    keep.append((int(eid), int(user_id), ts, float(value)))
            if keep:
                yield pd.DataFrame(keep, columns=["event_id", "user_id", "ts", "value"])
        state.update((list(admitted.keys()), list(admitted.values())))

    return (
        events_stream.select("event_id", "user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=ADMIT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Per-key running high-water-mark detection ("record breakers") -- the
third custom stateful streaming operator.

Shape: monitoring record highs (peak bid, max latency, ATH price). An
event is emitted iff its value STRICTLY exceeds every earlier value for
its key -- a property of the key's whole history, so the running max
must live in keyed state across micro-batches. State per key is ONE
double (constant memory per key however long the stream runs -- no
watermark pruning needed, unlike map-valued session/quota state).

Two implementations:

- ``record_breakers`` -- ``applyInPandasWithState`` (the API the other
  two custom stateful operators use); this is the path the registered
  query runs.
- ``record_breakers_tws`` -- Spark 4's ``transformWithStateInPandas``
  (StatefulProcessor + typed ValueState), the successor API: typed
  per-key state handles, timers, and RocksDB-backed stores
  (``spark.sql.streaming.stateStore.providerClass`` must be the
  RocksDBStateStoreProvider). Its driver worker imports
  ``google.protobuf``, which this sandbox does not ship, so the TWS
  path raises a clear environment error here (same honesty rule as the
  multimodal codec stub) -- the processor itself is complete and the
  on-cluster call is one method swap.

Determinism contract (both paths): with a chronologically-arriving
stream (batch arrival order + event-time sort within each batch) the
emitted set equals the batch answer
``value > MAX(value) OVER (key ORDER BY ts, id ROWS .. 1 PRECEDING)``
-- pure comparisons, no arithmetic, so the oracle is exact on any
engine.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

_STATE_SCHEMA = "m double"


def record_breakers(events_stream: DataFrame) -> DataFrame:
    """Emit each user's strictly-record-setting events; state = one
    running-max double per user. Input needs event_id, user_id, ts,
    value."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        m = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            # multiple Arrow chunks arrive per group; record semantics
            # need ONE event-time order across the whole batch (same
            # concat-then-sort discipline as ratelimit)
            batch = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
            keep = []
            for eid, ts, value in zip(batch["event_id"], batch["ts"], batch["value"]):
                v = float(value)
                if m is None or v > m:
                    m = v
                    keep.append((int(eid), int(user_id), ts, v))
            if keep:
                yield pd.DataFrame(keep, columns=["event_id", "user_id", "ts", "value"])
        if m is not None:
            state.update((float(m),))

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RECORD_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class RecordBreakersProcessor(StatefulProcessor):
    """transformWithStateInPandas form: typed ValueState holds the
    running max; semantics identical to ``record_breakers``."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._max = handle.getValueState(
            "running_max", StructType([StructField("m", DoubleType())])
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        cur = self._max.get()
        m = cur[0] if cur is not None else None
        chunks = [pdf for pdf in rows if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        keep = []
        for eid, ts, value in zip(batch["event_id"], batch["ts"], batch["value"]):
            v = float(value)
            if m is None or v > m:
                m = v
                keep.append((int(eid), int(user_id), ts, v))
        if m is not None:
            self._max.update((m,))
        if keep:
            yield pd.DataFrame(keep, columns=["event_id", "user_id", "ts", "value"])

    def close(self) -> None:
        pass


def record_breakers_tws(events_stream: DataFrame) -> DataFrame:
    """Spark-4 transformWithStateInPandas form. Requires the RocksDB
    state store provider AND a python environment with google.protobuf
    (the TWS driver worker imports it); this sandbox ships neither, so
    call sites here use ``record_breakers``. On a real cluster this is
    the preferred API (typed state, timers, state schema evolution)."""
    try:
        import google.protobuf.descriptor  # noqa: F401 -- availability probe
    except ImportError as ex:  # pragma: no cover -- environment-dependent
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf in the "
            "python environment (absent in this sandbox); use "
            "record_breakers() -- identical semantics on "
            "applyInPandasWithState"
        ) from ex
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RecordBreakersProcessor(),
        outputStructType=RECORD_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )

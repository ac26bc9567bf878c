"""Gap-based sessionization -- batch (window cumsum) and streaming
(applyInPandasWithState custom stateful operator, SURVEY SS2.9).

Batch: a session breaks when the gap to the previous event (per user)
exceeds `gap_sec`; session index = running count of breaks. Exactly two
window passes over one partitioning -> one shuffle.

Streaming: the same semantics as an explicit state machine per user.
A session is EMITTED only once it is CLOSED by a later event's gap --
the trailing (still-open) session stays in state. This is the honest
streaming contract (a session isn't final until silence follows), and
it is what the DuckDB oracle mirrors (all sessions minus each user's
last).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_sec: float = 3600.0,
) -> DataFrame:
    """One row per session: (user, start, end, n_events, sum_value)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id") if "event_id" in df.columns else F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    is_break = (
        prev.isNull() | ((F.col(ts_col).cast("double") - prev.cast("double")) > gap_sec)
    ).cast("long")
    with_sess = df.withColumn("_sess", F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_sess.groupBy(F.col(user_col).alias("user_id"), F.col("_sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .drop("_sess")
    )


def sessionize_stateful(
    events_stream: DataFrame,
    gap_sec: float = 3600.0,
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState: per-user
    state holds the open session; closed sessions are emitted as the
    stream progresses. Input needs user_id, ts, value columns."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        # state tuple: (start_us, end_us, n, total)
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us = end_us = None
            n, total = 0, 0.0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t_us = int(ts.value // 1000)  # pandas ns -> us
                if start_us is not None and (t_us - end_us) / 1e6 > gap_sec:
                    out.append((user_id, start_us, end_us, n, total))
                    start_us, n, total = t_us, 0, 0.0
                if start_us is None:
                    start_us = t_us
                end_us = t_us
                n += 1
                total += float(value) if value == value else 0.0
        state.update((start_us, end_us, n, total))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "sum_value": [o[4] for o in out],
                }
            )

    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    return events_stream.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Stateful streaming sessionization via applyInPandasWithState.

The custom-stateful-operator pattern for Structured Streaming: per-user
session state (start, last-seen, counts) lives in the state store across
micro-batches; a session CLOSES when a later event arrives more than
``gap_minutes`` after the last one, and the closed session is emitted
(append mode). The still-open session per user stays in state, surviving
restarts through the stream checkpoint.

Semantics match operators/events.sessionize (gaps-and-islands) restricted
to CLOSED sessions -- gated by a test that runs both over the same events.

Ordering contract: events within a micro-batch are sorted by event time
before folding; ACROSS micro-batches delivery is assumed in-order (no
watermark). A straggler that violates this never corrupts state: an open
session's end is monotone (max), and an event older than the open session's
start is folded into it rather than resurrecting an already-emitted session.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.IntegerType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        events = pd.concat(list(pdfs), ignore_index=True)
        if len(events) == 0:
            return
        ts_us = (
            events["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        vals = events["value"].astype(float).to_numpy()
        order = ts_us.argsort(kind="mergesort")
        ts_us, vals = ts_us[order], vals[order]

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = None
            n, sv = 0, 0.0

        closed = []
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if last_us is not None and t - last_us > gap_us:
                closed.append((int(user_id), start_us, last_us, n, sv))
                start_us, n, sv = t, 0, 0.0
            if start_us is None:
                start_us = t
            # events within a micro-batch are sorted above, but a LATER
            # micro-batch can deliver an event older than state's last_us
            # (cross-batch out-of-order; there is no watermark here). Never
            # move the open session's end backwards -- a late event inside
            # the open window extends counts only. A late event older than
            # the open session's START would belong to an earlier (possibly
            # already-emitted) session; it is folded into the open one --
            # the documented in-order-delivery assumption of this operator.
            last_us = t if last_us is None else max(last_us, t)
            start_us = min(start_us, t)
            n += 1
            sv += v
        state.update((start_us, last_us, n, sv))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start_us", "session_end_us",
                    "n_events", "sum_value",
                ],
            )

    return fn


def streaming_sessionize(
    events_stream: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """(streaming) events -> stream of CLOSED sessions. Input needs columns
    (user_id, ts, value)."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

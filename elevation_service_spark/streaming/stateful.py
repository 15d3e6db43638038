"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the arbitrary-stateful-processing API).

State per user: (session_start_us, last_ts_us, n_events).  A session CLOSES
when an event arrives more than ``gap`` after the previous one (the closed
session is emitted and a new one opens) or when the event-time timeout
fires (watermark passed the gap with no new events).  Output rows are
closed sessions: (user_id, session_start_us, session_end_us, n_events).

The batch twin of this operator is queries_training.q_sessionize (lag +
cumulative flag); this is the incremental form with bounded state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start_us", T.LongType(), False),
    T.StructField("session_end_us", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_start_us", T.LongType(), True),
    T.StructField("last_ts_us", T.LongType(), True),
    T.StructField("n_events", T.LongType(), True),
])

GAP_US = 30 * 60 * 1_000_000  # 30 min


def _sessionize_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [user_id], "session_start_us": [start],
                            "session_end_us": [last], "n_events": [n]})
        return
    start, last, n = state.get if state.exists else (None, None, 0)
    closed = {"user_id": [], "session_start_us": [], "session_end_us": [],
              "n_events": []}

    def emit(s, e, cnt):
        closed["user_id"].append(user_id)
        closed["session_start_us"].append(s)
        closed["session_end_us"].append(e)
        closed["n_events"].append(cnt)

    ts_all = []
    for pdf in pdfs:
        ts_all.extend(int(t) for t in pdf["ts_us"])
    # straggler session accumulator: events more than a gap BEFORE the open
    # session's start split into their own session(s) — matching the batch
    # twin q_sessionize, which orders by ts and would never merge them —
    # instead of being folded in via min(start, ts)
    sg_start = sg_last = None
    sg_n = 0
    for ts in sorted(ts_all):
        if last is not None and ts - last > GAP_US:
            emit(start, last, n)
            start, last, n = ts, ts, 1
        elif start is not None and start - ts > GAP_US:
            if sg_last is not None and ts - sg_last > GAP_US:
                emit(sg_start, sg_last, sg_n)
                sg_start = sg_last = None
                sg_n = 0
            sg_start = ts if sg_start is None else sg_start
            sg_last = ts
            sg_n += 1
        else:
            # late/out-of-order events within the gap fold into the session
            start = ts if start is None else min(start, ts)
            last = ts if last is None else max(last, ts)
            n += 1
    if sg_start is not None:
        if start is not None and start - sg_last <= GAP_US:
            # the open session's start moved back (folded events) to within
            # a gap of the stragglers — they are one session after all
            start = sg_start
            n += sg_n
        else:
            # stragglers are older than the open session by > gap (and far
            # behind the watermark) — close them now, not via state
            emit(sg_start, sg_last, sg_n)
    state.update((start, last, n))
    # close the open session via event-time timeout once the watermark has
    # moved a full gap past its last event; the timeout must never be set
    # behind the current watermark (late-arriving groups)
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last // 1000 + GAP_US // 1000, wm_ms + 1))
    if closed["user_id"]:
        yield pd.DataFrame(closed)


def sessionize_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events stream (user_id:long, ts:timestamp) -> closed-session rows.

    Stateful shuffle on user_id; state size is O(active users)."""
    base = (events
            .withWatermark("ts", watermark)
            .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
            .select("user_id", "ts", "ts_us"))
    return (base.groupBy("user_id")
            .applyInPandasWithState(_sessionize_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.EventTimeTimeout))

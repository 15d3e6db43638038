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

# state = the user's OPEN sessions as parallel arrays, sorted by start and
# pairwise separated by > gap.  Multiple sessions coexist only while
# out-of-order (straggler) events are still admissible — the count is
# bounded by (allowed lateness / gap) + 1, so the state stays small.
STATE_SCHEMA = T.StructType([
    T.StructField("starts_us", T.ArrayType(T.LongType()), True),
    T.StructField("lasts_us", T.ArrayType(T.LongType()), True),
    T.StructField("n_events", T.ArrayType(T.LongType()), True),
])

GAP_US = 30 * 60 * 1_000_000  # 30 min


def _merge_events(sessions: list[list[int]], ts_list: list[int]) -> list[list[int]]:
    """Fold events into a sorted disjoint session list (gap connectivity):
    exactly the partition the batch twin's order-by-ts + split-on-gap
    produces, independent of arrival order or batch slicing."""
    for ts in sorted(ts_list):
        placed = False
        for i, s in enumerate(sessions):
            if ts < s[0] - GAP_US:
                sessions.insert(i, [ts, ts, 1])
                placed = True
                break
            if ts <= s[1] + GAP_US:
                s[0] = min(s[0], ts)
                s[1] = max(s[1], ts)
                s[2] += 1
                # the extension may bridge into the following session(s)
                while i + 1 < len(sessions) and sessions[i + 1][0] - s[1] <= GAP_US:
                    nxt = sessions.pop(i + 1)
                    s[1] = max(s[1], nxt[1])
                    s[2] += nxt[2]
                placed = True
                break
        if not placed:
            sessions.append([ts, ts, 1])
    return sessions


def _sessionize_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        starts, lasts, ns = state.get
        sessions = [list(t) for t in zip(starts, lasts, ns)]
    else:
        sessions = []
    if not state.hasTimedOut:
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(int(t) for t in pdf["ts_us"])
        sessions = _merge_events(sessions, ts_all)
    # A session is CLOSED only once the watermark is strictly past
    # last + gap: no admissible event (ts >= watermark) can merge into it
    # any more.  This is what makes the emitted set independent of
    # file->batch slicing (ADVICE r2): a gap-split or straggler session is
    # parked in state, not emitted early, until the watermark seals it.
    done = [s for s in sessions if s[1] + GAP_US < wm_us]
    keep = [s for s in sessions if s[1] + GAP_US >= wm_us]
    if keep:
        state.update(([s[0] for s in keep], [s[1] for s in keep],
                      [s[2] for s in keep]))
        # wake when the earliest open session becomes sealable; never set a
        # timeout at/behind the current watermark (late-arriving groups)
        wm_ms = wm_us // 1000
        next_close_ms = min(s[1] + GAP_US for s in keep) // 1000 + 1
        state.setTimeoutTimestamp(max(next_close_ms, wm_ms + 1))
    elif state.exists:
        state.remove()
    if done:
        yield pd.DataFrame({
            "user_id": [user_id] * len(done),
            "session_start_us": [s[0] for s in done],
            "session_end_us": [s[1] for s in done],
            "n_events": [s[2] for s in done]})


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


# --- stateful streaming funnel (r6) ------------------------------------------

FUNNEL_TYPES = ("view", "click", "purchase")
FUNNEL_QUIET_US = 86_400 * 1_000_000  # finalize after 1 day of event-time quiet

FUNNEL_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("t1_us", T.LongType(), True),
    T.StructField("t2_us", T.LongType(), True),
    T.StructField("t3_us", T.LongType(), True),
    T.StructField("steps_reached", T.IntegerType(), False),
])

# acc = achieved stage times (the batch fold's accumulator, folded over
# SEALED events only — events the watermark has passed, which are totally
# known); buf = unsealed (ts, type-code) step events, bounded by the
# watermark lateness window, NOT by user history; last_ts = latest step
# event seen (drives the quiet-period finalization timeout).
FUNNEL_STATE_SCHEMA = T.StructType([
    T.StructField("acc", T.ArrayType(T.LongType()), True),
    T.StructField("buf_ts", T.ArrayType(T.LongType()), True),
    T.StructField("buf_tp", T.ArrayType(T.IntegerType()), True),
    T.StructField("last_ts", T.LongType(), True),
])


def _funnel_fold(acc: list[int], events: list[tuple[int, int]]) -> list[int]:
    """The batch automaton: append ts iff it is the next expected type
    and strictly later than the last achieved stage.  Tie order across
    equal timestamps is irrelevant (strict > blocks equal-ts chains)."""
    k = len(FUNNEL_TYPES)
    for ts, code in sorted(events):
        if len(acc) < k and code == len(acc) and (not acc or ts > acc[-1]):
            acc.append(ts)
    return acc


def _funnel_fn(key, pdfs, state: GroupState):
    user_id = int(key[0])
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        acc, buf_ts, buf_tp, last_ts = state.get
        acc = list(acc or [])
        buf = [(int(t), int(c)) for t, c in zip(buf_ts or [], buf_tp or [])]
        last_ts = int(last_ts or 0)
    else:
        acc, buf, last_ts = [], [], 0
    if not state.hasTimedOut:
        for pdf in pdfs:
            for ts, code in zip(pdf["ts_us"], pdf["tp_code"]):
                if code >= 0:  # non-step events only create/keep the group
                    buf.append((int(ts), int(code)))
                    last_ts = max(last_ts, int(ts))
    # seal: the watermark guarantees every event with ts < wm has arrived
    # (older rows are dropped by the engine), so the fold over them is
    # final — collapse into acc and shrink the buffer
    sealed = [e for e in buf if e[0] < wm_us]
    buf = [e for e in buf if e[0] >= wm_us]
    acc = _funnel_fold(acc, sealed)
    done = not buf and wm_us > last_ts + FUNNEL_QUIET_US
    if done:
        row = {"user_id": [user_id], "steps_reached": [len(acc)]}
        for i in range(len(FUNNEL_TYPES)):
            row[f"t{i + 1}_us"] = [acc[i] if i < len(acc) else None]
        if state.exists:
            state.remove()
        yield pd.DataFrame(row)[[f.name for f in FUNNEL_OUTPUT_SCHEMA.fields]]
        return
    state.update((acc, [e[0] for e in buf], [e[1] for e in buf], last_ts))
    wm_ms = wm_us // 1000
    # wake when the quiet period can have elapsed (or immediately after
    # the watermark moves, for users still holding unsealed events)
    target_ms = max((last_ts + FUNNEL_QUIET_US) // 1000 + 1, wm_ms + 1)
    state.setTimeoutTimestamp(target_ms)
    return
    yield  # pragma: no cover — make the function a generator


def funnel_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events stream (user_id:long, ts:timestamp, event_type:string) ->
    one FINAL funnel row per user (the batch funnel_steps result),
    emitted once the event-time watermark has passed the user's last
    step event by FUNNEL_QUIET_US with nothing buffered.  Incremental
    form with bounded state: sealed events collapse into the ≤3-slot
    accumulator, the buffer holds only watermark-unsealed events."""
    code = F.when(F.col("event_type") == FUNNEL_TYPES[0], 0)
    for i, t in enumerate(FUNNEL_TYPES[1:], start=1):
        code = code.when(F.col("event_type") == t, i)
    base = (events
            .withWatermark("ts", watermark)
            .select("user_id", "ts",
                    F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                    code.otherwise(F.lit(-1)).cast("int").alias("tp_code")))
    return (base.groupBy("user_id")
            .applyInPandasWithState(_funnel_fn, FUNNEL_OUTPUT_SCHEMA,
                                    FUNNEL_STATE_SCHEMA, "append",
                                    GroupStateTimeout.EventTimeTimeout))

"""Custom stateful streaming operator (applyInPandasWithState):
gap sessionization with cross-batch state and event-time timeout."""

import json
import os

import pytest
from pyspark.sql import types as T

from elevation_service_spark.streaming.stateful import sessionize_stream

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
])


def _write_batch(path, rows):
    with open(path, "w") as f:
        for uid, ts in rows:
            f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")


def test_stateful_sessionize_across_batches(spark, tmp_path):
    src = tmp_path / "ev"
    src.mkdir()
    # user 1: two events 10 min apart (one session), then after a 2h gap a
    # second session SPLIT ACROSS the two input files (state must carry);
    # user 2: single event.
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (sessionize_stream(stream).writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    # two sequential availableNow runs over the same checkpoint force a
    # deterministic batch order and exercise state persistence across runs
    _write_batch(src / "b0.json", [
        (1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:10:00"),
        (1, "2024-01-01T12:30:00"),
        (2, "2024-01-01T10:05:00"),
    ])
    run_once()
    _write_batch(src / "b1.json", [
        (1, "2024-01-01T12:40:00"),   # continues user 1's second session
        (1, "2024-01-01T18:00:00"),   # far future -> closes second session,
                                      # advances watermark to time out others
        (2, "2024-01-01T18:00:00"),
    ])
    run_once()
    got = {(r["user_id"], r["session_start_us"]): r
           for r in spark.read.parquet(out_dir).collect()}

    def us(s):
        import datetime
        return int(datetime.datetime.fromisoformat(s + "+00:00").timestamp() * 1_000_000)

    # user 1 session A: 10:00-10:10 with 2 events (closed by the 12:30 event)
    a = got[(1, us("2024-01-01T10:00:00"))]
    assert a["session_end_us"] == us("2024-01-01T10:10:00") and a["n_events"] == 2
    # user 1 session B: 12:30-12:40 spanning the batch boundary (closed by 18:00)
    b = got[(1, us("2024-01-01T12:30:00"))]
    assert b["session_end_us"] == us("2024-01-01T12:40:00") and b["n_events"] == 2
    # user 2's 10:05 single-event session closed by its second event
    c = got[(2, us("2024-01-01T10:05:00"))]
    assert c["session_end_us"] == us("2024-01-01T10:05:00") and c["n_events"] == 1


def test_stateful_sessionize_splits_far_stragglers(spark, tmp_path):
    """An out-of-order event more than a gap BEFORE the open session's
    start must become its own closed session (batch-twin semantics), not
    be folded in via min(start, ts)."""
    src = tmp_path / "ev2"
    src.mkdir()
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out_dir = str(tmp_path / "out2")

    def run_once():
        q = (sessionize_stream(stream, watermark="10 hours")
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "ckpt2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    _write_batch(src / "b0.json", [(1, "2024-01-01T12:00:00"),
                                   (1, "2024-01-01T12:10:00")])
    run_once()
    # straggler 3h before the open session (watermark 10h keeps it un-dropped)
    _write_batch(src / "b1.json", [(1, "2024-01-01T09:00:00")])
    run_once()
    # close the main session via a far-future event
    _write_batch(src / "b2.json", [(1, "2024-01-02T12:00:00")])
    run_once()
    got = {r["session_start_us"]: r for r in spark.read.parquet(out_dir).collect()}

    def us(s):
        import datetime
        return int(datetime.datetime.fromisoformat(s + "+00:00").timestamp() * 1_000_000)

    sg = got[us("2024-01-01T09:00:00")]
    assert sg["session_end_us"] == us("2024-01-01T09:00:00") and sg["n_events"] == 1
    main = got[us("2024-01-01T12:00:00")]
    assert main["session_end_us"] == us("2024-01-01T12:10:00") and main["n_events"] == 2


def test_straggler_merges_with_later_batch_event(spark, tmp_path):
    """ADVICE r2: an out-of-order session older than the open one must NOT
    be emitted inside its arrival micro-batch — a later batch can deliver
    an event within the gap of it, and the batch twin would merge them.
    The session-list state parks it until the watermark seals it."""
    import datetime

    def us(s):
        return int(datetime.datetime.fromisoformat(s + "+00:00").timestamp()
                   * 1_000_000)

    src = tmp_path / "ev"
    src.mkdir()
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (sessionize_stream(stream).writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    # batch 0: open session at 11:35 + a straggler at 11:00 (35 min > gap
    # older; admitted because the watermark is still unset).  After the
    # batch, watermark = 11:35 - 10 min = 11:25.
    _write_batch(src / "b0.json", [
        (7, "2024-01-01T11:35:00"),
        (7, "2024-01-01T11:00:00"),
    ])
    run_once()
    # batch 1: 11:28 is still admissible (> watermark) and sits within the
    # gap of BOTH the straggler and the open session — the batch twin makes
    # ONE session of all three events.  The old behavior had already
    # emitted (11:00, 11:00, 1) and can never merge; the session-list state
    # must bridge to (11:00, 11:35, 3).
    _write_batch(src / "b1.json", [
        (7, "2024-01-01T11:28:00"),
        (7, "2024-01-02T12:00:00"),
    ])
    run_once()
    _write_batch(src / "b2.json", [
        (7, "2024-01-03T12:00:00"),  # advances watermark; seals day-2 session
    ])
    run_once()
    got = {(r["session_start_us"], r["session_end_us"]): r["n_events"]
           for r in spark.read.parquet(out_dir).collect()}
    assert got == {
        (us("2024-01-01T11:00:00"), us("2024-01-01T11:35:00")): 3,
        (us("2024-01-02T12:00:00"), us("2024-01-02T12:00:00")): 1,
    }, got


# The exact r2-ADVICE interleaving (a straggler session that the old code
# emitted early, then a later-batch event that must merge into it), sliced
# into files four different ways.  Every layout keeps each event admissible
# (>= the watermark at its arrival batch) — slicing-independence is only
# promised for non-dropped events — and every layout must emit the
# identical closed-session set (VERDICT r3 #8 regression pin).
_E1100, _E1128, _E1135 = ("2024-01-01T11:00:00", "2024-01-01T11:28:00",
                          "2024-01-01T11:35:00")
_ED2, _ED3 = "2024-01-02T12:00:00", "2024-01-03T12:00:00"
_SLICINGS = [
    [[_E1135, _E1100, _E1128, _ED2, _ED3]],            # one batch
    [[_E1135, _E1100], [_E1128, _ED2], [_ED3]],        # the ADVICE replay
    [[_E1100], [_E1135], [_E1128], [_ED2], [_ED3]],    # one event per batch
    [[_E1100, _E1135], [_E1128], [_ED2, _ED3]],        # straggler-first pair
]


@pytest.mark.parametrize("slicing", _SLICINGS,
                         ids=["1batch", "advice", "perevent", "pairs"])
def test_straggler_emitted_set_is_slicing_invariant(spark, tmp_path, slicing):
    import datetime

    def us(s):
        return int(datetime.datetime.fromisoformat(s + "+00:00").timestamp()
                   * 1_000_000)

    src = tmp_path / "ev"
    src.mkdir()
    for i, batch in enumerate(slicing):
        path = src / f"b{i}.json"
        _write_batch(path, [(7, ts) for ts in batch])
        # file order = batch order: pin with strictly increasing mtimes
        os.utime(path, (1_000_000 + i, 1_000_000 + i))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    q = (sessionize_stream(stream).writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    got = {(r["session_start_us"], r["session_end_us"]): r["n_events"]
           for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {
        (us(_E1100), us(_E1135)): 3,  # straggler bridged, never emitted early
        (us(_ED2), us(_ED2)): 1,      # sealed by the day-3 watermark advance
    }, got


def test_stateful_funnel_multibatch_out_of_order(spark, tmp_path):
    """r6 streaming funnel: three files drained one-per-micro-batch with
    out-of-order arrivals ACROSS batches — the final rows must equal the
    batch funnel_steps fold exactly (sealing via watermark, not batch
    slicing, defines the result)."""
    import json as _json

    from pyspark.sql import functions as F

    from elevation_service_spark.operators.web import funnel_steps
    from elevation_service_spark.streaming.stateful import funnel_stream

    schema = T.StructType([
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
    ])
    src = tmp_path / "fev"
    src.mkdir()
    t0 = "2024-01-01T0{h}:{m:02d}:00.000Z"

    def ev(uid, h, m, tp):
        return {"user_id": uid, "ts": t0.format(h=h, m=m),
                "event_type": tp}

    # u1 converts but the view arrives LAST (out of order); u2's click is
    # blocked (same-ts as view) then a later one chains; u3 non-step only
    f1 = [ev(1, 1, 30, "click"), ev(2, 1, 0, "view"),
          ev(2, 1, 0, "click"), ev(3, 1, 5, "error")]
    f2 = [ev(1, 2, 0, "purchase"), ev(2, 1, 10, "click")]
    f3 = [ev(1, 1, 0, "view")]
    # sentinels: far-future non-step rows push the watermark past the
    # quiet period for every user
    sent = [{"user_id": u, "ts": "2024-02-20T00:00:00.000Z",
             "event_type": "sentinel"} for u in (1, 2, 3)]
    for i, rows in enumerate((f1, f2, f3, sent)):
        fp = src / f"b{i}.json"
        with open(fp, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        # the file source picks oldest-mtime first: pin the batch order
        # explicitly or the sentinel file can run FIRST and its watermark
        # drops every real event
        os.utime(fp, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(str(src)))
    out = str(tmp_path / "fout")
    # 3h allowed lateness: the cross-batch straggler (u1's view arrives
    # two files after its click) must stay INSIDE the watermark window —
    # the engine drops older rows before the operator (observed via
    # numRowsDroppedByWatermark), which is the documented lateness
    # contract, not a bug
    q = (funnel_stream(stream, watermark="3 hours")
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "fckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    got = {r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"],
                          r["steps_reached"])
           for r in spark.read.parquet(out).collect()}

    batch = spark.createDataFrame(
        [(r["user_id"], r["ts"], r["event_type"])
         for r in (x for fl in (f1, f2, f3) for x in fl)],
        "user_id long, ts string, event_type string").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type")
    exp = {r["user_id"]: (r["t1_us"], r["t2_us"], r["t3_us"],
                          r["steps_reached"])
           for r in funnel_steps(batch, ("view", "click", "purchase"),
                                 ts_col="ts_us").collect()}
    assert got == exp and len(got) == 3
    assert got[1][3] == 3 and got[3][3] == 0

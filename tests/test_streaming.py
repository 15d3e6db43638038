"""Structured Streaming: file-source pages stream → stateless enrichment
(append) and watermarked windowed rollup, verified against the batch
pipeline on the same data."""

import json

import pytest
from pyspark.sql import functions as F

from elevation_service_spark import fixtures
from elevation_service_spark.operators.extract import extract_coords
from elevation_service_spark.operators.lookup import enrich_points
from elevation_service_spark.sources.tiles import fixture_tiles_df
from elevation_service_spark.streaming.enrich_stream import (
    enrich_pages_stream, pages_stream, tile_stats_stream)


def _write_pages_json(tmp_path, n=60):
    pages, golden = fixtures.pages_rows(n)
    src = tmp_path / "pages_in"
    src.mkdir()
    # two files -> two micro-batch inputs
    for part in (0, 1):
        with open(src / f"part-{part}.json", "w") as f:
            for p in pages[part * n // 2:(part + 1) * n // 2]:
                f.write(json.dumps({
                    "url": p["url"],
                    "warc_ts": "2024-01-01T{:02d}:00:00".format(p["warc_ts"] % 24),
                    "text": p["text"], "lang": p["lang"]}) + "\n")
    return src, pages


def test_streaming_enrich_matches_batch(spark, tmp_path):
    src, pages = _write_pages_json(tmp_path)
    tiles = fixture_tiles_df(spark)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = pages_stream(spark, str(src), max_files_per_trigger=1)
    enriched = enrich_pages_stream(stream, tiles)
    q = (enriched.writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    # batch reference on the same input
    batch_pages = spark.createDataFrame(
        [(p["url"], p["text"]) for p in pages], ["url", "text"])
    exp = enrich_points(extract_coords(batch_pages, keep_cols=("url",)),
                        tiles, strategy="broadcast")
    g = {(r["url"], r["point_idx"]): (r["elevation"], r["status"]) for r in got.collect()}
    e = {(r["url"], r["point_idx"]): (r["elevation"], r["status"]) for r in exp.collect()}
    assert g == e
    assert len(g) > 0


def test_streaming_windowed_tile_stats(spark, tmp_path):
    src, _pages = _write_pages_json(tmp_path)
    tiles = fixture_tiles_df(spark)
    # one file per micro-batch: the watermark advances between batches, so
    # windows matured by batch 1 are emitted during batch 2 (append mode
    # never emits windows newer than the final watermark — that tail is
    # flushed when the next file arrives in production)
    stream = pages_stream(spark, str(src), max_files_per_trigger=1)
    stats = tile_stats_stream(enrich_pages_stream(stream, tiles),
                              window="1 hour", watermark="1 minute")
    out_dir = str(tmp_path / "stats_out")

    def run_once():
        q = (stats.writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "ckpt2"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    run_once()
    # append mode emits a window only once the watermark passes it; the
    # watermark is persisted in the checkpoint, so the arrival of the next
    # file (a later run over the same checkpoint) flushes matured windows —
    # this also exercises streaming checkpoint resume.
    with open(src / "part-late.json", "w") as f:
        f.write(json.dumps({"url": "late", "warc_ts": "2024-01-02T12:00:00",
                            "text": "geo:57.5000,11.5000", "lang": "en"}) + "\n")
    run_once()
    got = spark.read.parquet(out_dir)
    assert set(got.columns) == {"window_start", "tile_key", "n_points", "n_ok"}
    # append mode + availableNow: windows older than the final watermark are
    # emitted; at least the early-hour windows must be present and consistent
    rows = got.collect()
    assert all(r["n_ok"] <= r["n_points"] for r in rows)
    assert len(rows) > 0


def test_ssj_outer_watermark_boundary(spark, tmp_path):
    """VERDICT r4 #5: pin Spark's left-outer stream-stream eviction
    inequality at the +-1ms boundary.  The gate oracle encodes
    wm = (ms-floor of min(max_a, max_b)) - delay and emits an unmatched
    left iff a.ts + window < wm (STRICT).  Synthesize unmatched lefts
    whose (a.ts + window) lands at wm-1ms / wm / wm+1ms and assert only
    the first emits a null row; the max timestamps carry +500us so a
    non-floored watermark would ALSO emit the wm case — catching both an
    off-by-one in the inequality and a drift in the ms-floor across Spark
    upgrades."""
    import datetime

    from pyspark.sql import types as T

    def ts(h, m, s, us=0):
        return datetime.datetime(2024, 1, 1, h, m, s, us)

    schema = T.StructType([
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False)])
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # delay 10 min, window 1 h; both sides' max ts = 12:00:00.000500
    # -> wm = floor_ms(12:00:00.000500) - 10 min = 11:50:00.000
    left_rows = [
        (1, 101, ts(10, 49, 59, 999_000)),   # a+1h = 11:49:59.999 < wm  -> emit
        (2, 102, ts(10, 50, 0, 0)),          # a+1h = 11:50:00.000 == wm -> hold
        (3, 103, ts(10, 50, 0, 1_000)),      # a+1h = 11:50:00.001 > wm  -> hold
        (4, 5, ts(11, 0, 0)),                # matched pair control
        (5, 998, ts(12, 0, 0, 500)),         # left max pad (unmatched, > wm)
    ]
    right_rows = [
        (11, 5, ts(11, 30, 0)),              # matches event 4
        (12, 999, ts(12, 0, 0, 500)),        # right max pad (no left partner)
    ]
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame(left_rows, schema).write.parquet(src_a)
    spark.createDataFrame(right_rows, schema).write.parquet(src_b)
    sa = (spark.readStream.schema(schema).parquet(src_a)
          .withWatermark("ts", "10 minutes").alias("a"))
    sb = (spark.readStream.schema(schema).parquet(src_b)
          .withWatermark("ts", "10 minutes").alias("b"))
    j = sa.join(sb, F.expr(
        "a.user_id = b.user_id AND b.ts >= a.ts "
        "AND b.ts <= a.ts + interval 1 hours"), "left_outer")
    out_df = j.select(F.col("a.event_id").alias("a_id"),
                      F.col("b.event_id").alias("b_id"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (out_df.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    got = spark.read.parquet(out).collect()
    nulls = sorted(r["a_id"] for r in got if r["b_id"] is None)
    matched = sorted((r["a_id"], r["b_id"]) for r in got if r["b_id"] is not None)
    assert matched == [(4, 11)]
    # ONLY the strictly-below-boundary left emits; == wm held in state
    # proves the inequality is strict AND the watermark is ms-floored
    assert nulls == [1], f"eviction boundary drifted: null a_ids = {nulls}"


def test_dedup_stream_reemits_exactly_after_watermark_expiry(spark, tmp_path):
    """VERDICT r4 #9: the documented multi-batch dropDuplicatesWithinWatermark
    contract, as a test — a duplicate arriving in a LATER batch re-emits
    exactly when the watermark already expired its key (event_ts + delay <
    watermark), and stays suppressed while the key is still in state.
    Batch boundaries are forced by two sequential availableNow runs over
    one checkpoint.  Run 1 (X@t0, Z@t0+90m, W@t0+3h) leaves the watermark
    at max_ts - delay = t0+2h: X's state (expires t0+1h) is evicted, Z's
    (expires t0+2h30m) survives.  Run 2 re-sends X and Z at t0+3h: X
    re-emits, Z stays suppressed."""
    import datetime
    import json as _json

    from pyspark.sql import types as T

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def iso(minutes):
        return (t0 + datetime.timedelta(minutes=minutes)).strftime(
            "%Y-%m-%dT%H:%M:%S")

    schema = T.StructType([
        T.StructField("fingerprint", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False)])
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "docs"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for fp, mins in rows:
                f.write(_json.dumps({"fingerprint": fp, "ts": iso(mins)}) + "\n")

    def run_once():
        stream = (spark.readStream.schema(schema).json(str(src))
                  .withWatermark("ts", "1 hour"))
        q = (stream.dropDuplicatesWithinWatermark(["fingerprint"])
             .select("fingerprint", F.unix_micros("ts").alias("ts_us"))
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(300)

    write_batch("b0.json", [("X", 0), ("Z", 90), ("W", 180)])
    run_once()
    write_batch("b1.json", [("X", 180), ("Z", 180)])
    run_once()
    got = sorted((r["fingerprint"], r["ts_us"])
                 for r in spark.read.parquet(out).collect())
    us = lambda mins: (1_704_067_200 + mins * 60) * 1_000_000  # noqa: E731
    assert got == [
        ("W", us(180)),            # first sight
        ("X", us(0)),              # first sight in run 1
        ("X", us(180)),            # RE-EMITTED: key expired before run 2
        ("Z", us(90)),             # first sight; run-2 dup suppressed
    ], got


def test_upsert_stream_merge_chain_multibatch_one_drain(spark, tmp_path):
    """VERDICT r5 #8: the gate's upsert_stream forces batch order with two
    sequential availableNow drains; this test lands THREE version batches
    under maxFilesPerTrigger=1 and drains them in ONE availableNow run —
    pinning that the foreachBatch MERGE CHAIN (batch N reads batch N-1's
    merged target), not the drain boundary, defines the result.  The
    merged target must equal the closed-form highest-version-wins oracle,
    and the single run must have processed >= 3 micro-batches."""
    import os
    import shutil

    from elevation_service_spark.operators.merge import upsert_latest

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    base = spark.createDataFrame(
        [(i, f"text {i}", 0) for i in range(20)],
        ["doc_id", "text", "version"])
    base.write.mode("overwrite").parquet(target)
    schema = spark.read.parquet(target).schema

    def land(name, rows):
        df = spark.createDataFrame(rows, ["doc_id", "text", "version"])
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(tmp)
        import glob
        parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
        assert len(parts) == 1  # one file per batch -> one micro-batch each
        os.rename(parts[0], str(src / f"{name}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    # v1 updates evens; v2 updates multiples of 3 + adds new keys;
    # v3 updates multiples of 5 (overlapping all earlier batches)
    land("b1", [(i, f"v1 {i}", 1) for i in range(0, 20, 2)])
    land("b2", [(i, f"v2 {i}", 2) for i in range(0, 20, 3)]
         + [(100 + i, f"new {i}", 2) for i in range(4)])
    land("b3", [(i, f"v3 {i}", 3) for i in range(0, 20, 5)])

    def merge_batch(batch_df, _bid):
        cur = batch_df.sparkSession.read.parquet(target)
        merged = upsert_latest(cur, batch_df)
        tmp = target + "_next"
        merged.write.mode("overwrite").parquet(tmp)
        old = target + "_old"
        os.rename(target, old)
        os.rename(tmp, target)
        shutil.rmtree(old, ignore_errors=True)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream.writeStream.foreachBatch(merge_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 micro-batches, saw {n_batches}"

    # closed-form highest-version-wins
    want = {i: (0, f"text {i}") for i in range(20)}
    for i in range(0, 20, 2):
        want[i] = (1, f"v1 {i}")
    for i in range(0, 20, 3):
        want[i] = (2, f"v2 {i}")
    for i in range(4):
        want[100 + i] = (2, f"new {i}")
    for i in range(0, 20, 5):
        want[i] = (3, f"v3 {i}")
    got = {r["doc_id"]: (r["version"], r["text"])
           for r in spark.read.parquet(target).collect()}
    assert got == want


def test_versioned_merge_sink_commit_log(spark, tmp_path):
    """Commit-log invariants without a stream: empty start, snapshot
    retention GC, replay no-op, orphan invisibility, and the merge chain
    reading only COMMITTED snapshots."""
    from elevation_service_spark.operators.merge import versioned_merge_sink

    base = str(tmp_path / "target")
    apply_fn, read_latest, _seed = versioned_merge_sink(base, retain=2)
    assert read_latest(spark) is None  # empty start

    def batch(ids, version):
        return spark.createDataFrame(
            [(i, f"t{i}", version) for i in ids],
            ["doc_id", "text", "version"])

    apply_fn(batch([1, 2, 3], 0), 0)   # first batch merges into nothing
    assert read_latest(spark).count() == 3
    apply_fn(batch([2, 9], 1), 1)      # update 2, insert 9
    got = {r["doc_id"]: r["version"] for r in read_latest(spark).collect()}
    assert got == {1: 0, 2: 1, 3: 0, 9: 1}
    # replay of batch 1 after commit: no-op even with different data
    apply_fn(batch([777], 1), 1)
    assert 777 not in {r["doc_id"] for r in read_latest(spark).collect()}
    # orphan snapshot (crash between write and commit) is invisible
    batch([555], 9).write.mode("overwrite").parquet(base + "/v9")
    assert 555 not in {r["doc_id"] for r in read_latest(spark).collect()}
    # retention: after a third commit only the last 2 snapshots remain
    apply_fn(batch([4], 2), 2)
    import os
    vdirs = sorted(d for d in os.listdir(base)
                   if d.startswith("v") and d != "v9")
    assert vdirs == ["v1", "v2"]
    got = {r["doc_id"]: r["version"] for r in read_latest(spark).collect()}
    assert got == {1: 0, 2: 1, 3: 0, 9: 1, 4: 2}

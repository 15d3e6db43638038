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

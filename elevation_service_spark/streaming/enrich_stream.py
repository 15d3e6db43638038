"""Structured Streaming surface.

The reference is request/response and the graft is batch (SURVEY.md §2.B:
streaming N/A), but the engine's operators are stream-composable, so the
incremental-ingest story ("new WARC dumps arrive as files") is covered:

- ``pages_stream``: file-source stream of JSON-lines pages
  (url, warc_ts, text, lang — the input_hint shape minus html).
- ``enrich_pages_stream``: extraction + tile lookup on the stream — both
  are stateless projections (the broadcast-tile pandas_udf included), so
  the whole pipeline runs in append mode with no state store.
- ``tile_stats_stream``: event-time windowed per-tile counts with a
  watermark on warc_ts — the standard late-data-tolerant rollup.

Checkpointing uses Spark's own streaming checkpoint; batch-side
exactly-once re-runs are the manifest's job (sources/manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_STREAM_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def pages_stream(spark: SparkSession, path: str,
                 max_files_per_trigger: int = 16) -> DataFrame:
    return (spark.readStream.schema(PAGES_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .json(path))


def enrich_pages_stream(pages: DataFrame, tiles: DataFrame) -> DataFrame:
    """Streaming flagship: extract → tile join → bilinear, fully stateless
    (append mode).  ``tiles`` is a static batch DataFrame (stream-static
    pattern: the tile bytes are collected and broadcast at plan time)."""
    from ..operators.extract import extract_coords
    from ..operators.lookup import enrich_points
    pts = extract_coords(pages, keep_cols=("url", "warc_ts"))
    return enrich_points(pts, tiles, strategy="broadcast")


def tile_stats_stream(enriched: DataFrame, window: str = "1 hour",
                      watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed per-tile counts with late-data watermark —
    append-mode-safe aggregation."""
    return (enriched
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), F.col("tile_key"))
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.sum(F.when(F.col("status") == "OK", 1).otherwise(0)).alias("n_ok"))
            .select(F.col("w.start").alias("window_start"), "tile_key",
                    "n_points", "n_ok"))

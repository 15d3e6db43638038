"""raster ↔ vector materialization (BASELINE.json § north_star).

- tiles_to_points: explode raster tiles into per-node point rows
  (tile_key, lat, lon, elev) with optional stride subsampling — one
  mapInPandas pass, rows generated numpy-side in bulk.
- points_to_tiles: rasterize scattered elevation points back into
  terrarium-PNG tiles: group points by tile, bin to the nearest grid node,
  average collisions, void (-32768) where empty — applyInPandas per tile.

Round trip tiles → points → tiles is exact at grid nodes (tested).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels
from .lookup import decode_tile_bytes

_POINTS_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("lat", T.DoubleType(), False),
    T.StructField("lon", T.DoubleType(), False),
    T.StructField("elev", T.DoubleType(), False),
])


def tiles_to_points(tiles: DataFrame, stride: int = 1) -> DataFrame:
    """Every stride-th grid node of every tile as a point row."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                grid = decode_tile_bytes(r["encoding"], bytes(r["data"]))
                size = grid.shape[0]
                n = size - 1
                rows = np.arange(0, size, stride)
                cols = np.arange(0, size, stride)
                rr, cc = np.meshgrid(rows, cols, indexing="ij")
                lat = r["sw_lat"] + rr.ravel() / n
                lon = r["sw_lon"] + cc.ravel() / n
                yield pd.DataFrame({
                    "tile_key": r["tile_key"],
                    "lat": lat, "lon": lon,
                    "elev": grid[rr.ravel(), cc.ravel()].astype(np.float64),
                })

    return tiles.select("tile_key", "sw_lat", "sw_lon", "encoding", "data") \
                .mapInPandas(gen, _POINTS_SCHEMA)


_SLOPE_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("n_interior", T.LongType(), False),
    T.StructField("n_valid", T.LongType(), False),
    T.StructField("n_void_adj", T.LongType(), False),
    T.StructField("max_slope2", T.LongType(), True),
    T.StructField("sum_slope2", T.LongType(), False),
    T.StructField("n_steep", T.LongType(), False),
])

# squared-gradient threshold for the steep-node count: |grad| > 1000 DEM
# units per 2 cells.  The fixture DEM's modulo wrap creates genuine steep
# edges, so the count is non-trivial under the gate.
STEEP_SLOPE2 = 1_000_000


_ASPECT_FIELDS = ["n_flat", "h_e", "h_w", "h_n", "h_s",
                  "h_ne", "h_nw", "h_se", "h_sw"]
_ASPECT_SCHEMA = T.StructType(
    [T.StructField("tile_key", T.StringType(), False)]
    + [T.StructField(f, T.LongType(), False) for f in _ASPECT_FIELDS])

_TERRAIN_SCHEMA = T.StructType(
    list(_SLOPE_SCHEMA.fields)
    + [T.StructField(f, T.LongType(), False) for f in _ASPECT_FIELDS])


def tile_terrain_stats(tiles: DataFrame,
                       steep_threshold2: int = STEEP_SLOPE2) -> DataFrame:
    """Per-tile slope statistics AND 8-way aspect histogram in ONE decode
    pass (VERDICT r5 #5: the r5 slope and aspect operators each decoded
    every tile from scratch — two full gunzip/PNG-unfilter raster passes
    for one shared stencil computation; at 100 TB of tiles the decode is
    the dominant cost and was paid twice).  The 5-point void stencil and
    the central differences dx, dy are computed once and feed both column
    families.

    Slope half (exact integer arithmetic): at interior node (r, c),
    dx = z[r][c+1] - z[r][c-1], dy = z[r+1][c] - z[r-1][c],
    slope2 = dx^2 + dy^2 (squared central-difference gradient in
    (DEM units / 2 cells)^2 — monotone in true slope, so max / threshold
    counts are order-identical to the sqrt form while staying
    engine-portable).  Nodes whose stencil touches a void (-32768) are
    excluded and counted in n_void_adj (SRTM voids must not poison
    gradients as ~33k-magnitude cliffs).

    Aspect half (transcendental-free): the compass sector comes from
    integer comparisons of the central differences alone (|dx| vs |dy|
    picks the axis, signs pick the direction, exact equality is the
    diagonal), so no atan2 enters and the DuckDB oracle replays the CASE
    chain bit-for-bit.  Flat nodes (dx=dy=0) count separately.

    One mapInPandas pass, map-only — no shuffle; output is O(tiles), so
    at 100 TB of tiles the job is scan-shaped with a trivially small
    result."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _TERRAIN_SCHEMA.fields}
            for _, r in pdf.iterrows():
                z = decode_tile_bytes(r["encoding"], bytes(r["data"])) \
                    .astype(np.int64)
                void = z == kernels.VOID
                stencil_void = (void[1:-1, 1:-1] | void[1:-1, 2:]
                                | void[1:-1, :-2] | void[2:, 1:-1]
                                | void[:-2, 1:-1])
                valid = ~stencil_void
                dx = (z[1:-1, 2:] - z[1:-1, :-2])[valid]
                dy = (z[2:, 1:-1] - z[:-2, 1:-1])[valid]
                slope2 = dx * dx + dy * dy
                n_valid = int(dx.size)
                out["tile_key"].append(r["tile_key"])
                out["n_interior"].append(int(valid.size))
                out["n_valid"].append(n_valid)
                out["n_void_adj"].append(int(valid.size - n_valid))
                out["max_slope2"].append(int(slope2.max()) if n_valid else None)
                out["sum_slope2"].append(int(slope2.sum()))
                out["n_steep"].append(int((slope2 > steep_threshold2).sum()))
                ax, ay = np.abs(dx), np.abs(dy)
                out["n_flat"].append(int(((dx == 0) & (dy == 0)).sum()))
                out["h_e"].append(int(((ax > ay) & (dx > 0)).sum()))
                out["h_w"].append(int(((ax > ay) & (dx < 0)).sum()))
                out["h_n"].append(int(((ay > ax) & (dy > 0)).sum()))
                out["h_s"].append(int(((ay > ax) & (dy < 0)).sum()))
                diag = (ax == ay) & (ax > 0)
                out["h_ne"].append(int((diag & (dx > 0) & (dy > 0)).sum()))
                out["h_nw"].append(int((diag & (dx < 0) & (dy > 0)).sum()))
                out["h_se"].append(int((diag & (dx > 0) & (dy < 0)).sum()))
                out["h_sw"].append(int((diag & (dx < 0) & (dy < 0)).sum()))
            yield pd.DataFrame(out)

    return (tiles.select("tile_key", "encoding", "data")
            .mapInPandas(gen, _TERRAIN_SCHEMA))


def tile_slope_stats(tiles: DataFrame,
                     steep_threshold2: int = STEEP_SLOPE2) -> DataFrame:
    """Slope-only view of tile_terrain_stats (schema unchanged from r5).
    The aspect sums the fused kernel also computes cost ~nothing next to
    the shared decode + stencil; callers wanting BOTH families use
    tile_terrain_stats directly and pay ONE decode."""
    return tile_terrain_stats(tiles, steep_threshold2).select(
        *[f.name for f in _SLOPE_SCHEMA.fields])


def tile_aspect_hist(tiles: DataFrame) -> DataFrame:
    """Aspect-only view of tile_terrain_stats (schema unchanged from r5);
    see tile_slope_stats for the fusion contract."""
    return tile_terrain_stats(tiles).select(
        *[f.name for f in _ASPECT_SCHEMA.fields])


_TILES_OUT_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("sw_lat", T.IntegerType(), False),
    T.StructField("sw_lon", T.IntegerType(), False),
    T.StructField("size", T.IntegerType(), False),
    T.StructField("encoding", T.StringType(), False),
    T.StructField("data", T.BinaryType(), False),
])


def points_to_tiles(points: DataFrame, size: int = 1201,
                    elev_col: str = "elev") -> DataFrame:
    """Rasterize (lat, lon, elev) points into terrarium-PNG tiles keyed by
    their skadi tile.  Nearest-node binning; collisions averaged; empty
    nodes = void."""
    from ..functions.keys import skadi_key_col
    pts = (points.select(F.col("lat"), F.col("lon"),
                         F.col(elev_col).alias("elev"))
           .withColumn("tile_key", skadi_key_col(F.col("lat"), F.col("lon")))
           .withColumn("sw_lat", F.floor("lat").cast("int"))
           .withColumn("sw_lon", F.floor("lon").cast("int")))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sw_lat = int(pdf["sw_lat"].iloc[0])
        sw_lon = int(pdf["sw_lon"].iloc[0])
        n = size - 1
        row = np.minimum(np.floor((pdf["lat"].to_numpy() - sw_lat) * n + 0.5).astype(np.int64), n)
        col = np.minimum(np.floor((pdf["lon"].to_numpy() - sw_lon) * n + 0.5).astype(np.int64), n)
        acc = np.zeros((size, size), dtype=np.float64)
        cnt = np.zeros((size, size), dtype=np.int64)
        np.add.at(acc, (row, col), pdf["elev"].to_numpy(np.float64))
        np.add.at(cnt, (row, col), 1)
        grid = np.where(cnt > 0, np.floor(np.divide(acc, np.maximum(cnt, 1)) + 0.5),
                        float(kernels.VOID)).astype(np.int16)
        data = kernels.encode_terrarium_png(grid)
        return pd.DataFrame({"tile_key": [pdf["tile_key"].iloc[0]],
                             "sw_lat": [sw_lat], "sw_lon": [sw_lon],
                             "size": [size], "encoding": ["terrarium-png"],
                             "data": [data]})

    return pts.groupBy("tile_key").applyInPandas(fn, _TILES_OUT_SCHEMA)

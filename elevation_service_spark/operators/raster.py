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
                grid = decode_tile_bytes(r["encoding"], bytes(r["data"]), allow_overview=True)
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

# Terrain Ruggedness Index (Riley): per interior node the sum of |dz| to
# all 8 neighbours — exact integers, 3x3 void exclusion.  The rough-node
# threshold is set so only the DEM's modulo-wrap cliffs qualify.
ROUGH_TRI = 4000
_TRI_FIELDS = ["n_valid8", "n_void_adj8", "sum_tri", "n_rough"]
_TRI_SCHEMA = T.StructType(
    [T.StructField("tile_key", T.StringType(), False),
     T.StructField("n_valid8", T.LongType(), False),
     T.StructField("n_void_adj8", T.LongType(), False),
     T.StructField("sum_tri", T.LongType(), False),
     T.StructField("max_tri", T.LongType(), True),
     T.StructField("n_rough", T.LongType(), False)])


# D8 flow direction (r6): per interior node the steepest-descent neighbour
# among all 8, unweighted drops (the exact-integer D8 variant: no 1/sqrt(2)
# diagonal scaling, so every compare is int64 and the oracle replays it),
# ties broken by a FIXED clockwise priority from East; a node whose best
# drop is <= 0 is a pit/flat.  Array orientation matches the aspect half:
# row+1 is North, col+1 is East.
_FLOW_DIRS = (  # (name, dr, dc) in priority order — clockwise from East
    ("f_e", 0, 1), ("f_se", -1, 1), ("f_s", -1, 0), ("f_sw", -1, -1),
    ("f_w", 0, -1), ("f_nw", 1, -1), ("f_n", 1, 0), ("f_ne", 1, 1))
_FLOW_FIELDS = ["n_pit"] + [d[0] for d in _FLOW_DIRS]
_FLOW_SCHEMA = T.StructType(
    [T.StructField("tile_key", T.StringType(), False)]
    + [T.StructField(f, T.LongType(), False) for f in _FLOW_FIELDS])


# D8 flow accumulation (r6): k-round partial upstream contributing area.
# acc_0 = 1 everywhere; acc_t(v) = 1 + sum of acc_{t-1} over the D8 edges
# into v — after k rounds acc_k(v) counts the upstream nodes within k
# steps (itself included), the bounded-depth form of hydrology flow
# accumulation whose whole trajectory an oracle can replay as k chained
# joins.  Edges leave non-pit valid8 nodes toward their steepest-descent
# neighbour; a target outside the valid8 interior set drains out of the
# accounting.  All-integer arithmetic.
ACC_ROUNDS = 3
CHANNEL_ACC = 8  # acc_k at/above this marks a channel cell
_ACC_SCHEMA = T.StructType(
    [T.StructField("tile_key", T.StringType(), False),
     T.StructField("sum_acc", T.LongType(), False),
     T.StructField("max_acc", T.LongType(), True),
     T.StructField("n_channel", T.LongType(), False)])


def tile_terrain_stats(tiles: DataFrame,
                       steep_threshold2: int = STEEP_SLOPE2,
                       aspect: bool = True, tri: bool = False,
                       flow: bool = False, acc: bool = False) -> DataFrame:
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
    result.

    ``aspect=False`` skips the aspect sums entirely (schema shrinks to
    the slope fields): the single-family views must not pay the other
    family's reductions — the r6 bench measured the aspect half at
    roughly the slope half's cost (~12 extra 13M-element boolean
    reductions per SRTM1 tile), so "costs ~nothing" held only for the
    decode+stencil, not the sums.

    ``tri=True`` (r6) adds the Terrain Ruggedness Index family under the
    SAME decode: per interior node TRI = sum of |z_neighbour - z_centre|
    over all 8 neighbours, excluded when ANY of the 3x3 cells is void
    (the 8-neighbour stencil sees more voids than the 5-point one, hence
    the separate n_valid8/n_void_adj8 counts).  Gated off by default for
    the same reason as aspect: eight |diff| reductions per tile.

    ``flow=True`` (r6) adds the D8 flow-direction histogram under the
    same decode: per interior node the steepest-descent direction among
    the 8 unweighted drops (ties to the first clockwise from East —
    np.argmax's first-max contract IS the priority rule), pits/flats
    (best drop <= 0) counted separately; 3x3 void exclusion shared with
    TRI.  The hydrology-routing primitive.

    ``acc=True`` (r6) adds ACC_ROUNDS-round D8 flow ACCUMULATION under
    the same decode: the steepest-descent edges (shared with the flow
    histogram) scatter-add upstream counts for k exact-integer rounds —
    acc_k(v) = upstream nodes within k steps, itself included; edges
    whose target leaves the valid8 interior drain out.  Per-tile
    sum/max/channel-count outputs; the oracle replays every round as a
    chained edge join."""

    def gen_factory(aspect_on: bool, tri_on: bool, flow_on: bool,
                    acc_on: bool):
        fields = list(_SLOPE_SCHEMA.fields)
        if aspect_on:
            fields += [f for f in _TERRAIN_SCHEMA.fields
                       if f.name in _ASPECT_FIELDS]
        if tri_on:
            fields += _TRI_SCHEMA.fields[1:]
        if flow_on:
            fields += _FLOW_SCHEMA.fields[1:]
        if acc_on:
            fields += _ACC_SCHEMA.fields[1:]
        schema = T.StructType(fields)

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {k.name: [] for k in schema.fields}
                for _, r in pdf.iterrows():
                    z = decode_tile_bytes(r["encoding"], bytes(r["data"]), allow_overview=True) \
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
                    out["max_slope2"].append(
                        int(slope2.max()) if n_valid else None)
                    out["sum_slope2"].append(int(slope2.sum()))
                    out["n_steep"].append(
                        int((slope2 > steep_threshold2).sum()))
                    if aspect_on:
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
                    if tri_on or flow_on or acc_on:
                        h, w_ = valid.shape
                        void8 = np.zeros_like(valid)
                        for dr in (0, 1, 2):
                            for dc in (0, 1, 2):
                                void8 |= void[dr:dr + h, dc:dc + w_]
                        valid8 = ~void8
                        # int32 halves memory traffic for the 8-neighbour
                        # passes; safe: |z| <= 32768 so drops/|dz| <= 7e4
                        # and TRI <= 8*7e4 fit easily, and acc_k <= 585
                        # (1+8+64+512); per-tile SUMS go through explicit
                        # int64 accumulators
                        z32 = z.astype(np.int32)
                        zin = z32[1:-1, 1:-1]
                    if tri_on:
                        # 2D accumulation, ONE mask gather at the end —
                        # measured ~6x less memory traffic than gathering
                        # each of the 8 shifted planes through the mask
                        tri2 = np.zeros(valid.shape, dtype=np.int32)
                        for dr in (0, 1, 2):
                            for dc in (0, 1, 2):
                                if dr == 1 and dc == 1:
                                    continue
                                tri2 += np.abs(z32[dr:dr + h, dc:dc + w_]
                                               - zin)
                        tri8 = tri2[valid8]
                        n_valid8 = int(tri8.size)
                        out["n_valid8"].append(n_valid8)
                        out["n_void_adj8"].append(int(valid.size - n_valid8))
                        out["sum_tri"].append(int(tri8.sum(dtype=np.int64)))
                        out["max_tri"].append(
                            int(tri8.max()) if n_valid8 else None)
                        out["n_rough"].append(int((tri8 > ROUGH_TRI).sum()))
                    if flow_on or acc_on:
                        # incremental 2D max/argmax over the 8 drops:
                        # strict > keeps the FIRST max — exactly the
                        # clockwise-from-East tie rule (and ~10x cheaper
                        # than stacking 8 mask-gathered planes)
                        best2 = code2 = None
                        for k, (_, dr, dc) in enumerate(_FLOW_DIRS):
                            d = zin - z32[1 + dr:1 + dr + h,
                                          1 + dc:1 + dc + w_]
                            if best2 is None:
                                best2 = d  # fresh temp — safely owned
                                code2 = np.zeros(d.shape, dtype=np.int8)
                            else:
                                m = d > best2
                                best2[m] = d[m]
                                code2[m] = k
                        pit2 = best2 <= 0
                    if flow_on:
                        live = valid8 & ~pit2
                        out["n_pit"].append(int((pit2 & valid8).sum()))
                        for k, (name, _, _) in enumerate(_FLOW_DIRS):
                            out[name].append(int((live & (code2 == k)).sum()))
                    if acc_on:
                        # slice-scatter accumulation: nodes live on a
                        # zero-padded (h+2, w_+2) frame, so every D8
                        # target is a plain shifted-slice += — no edge
                        # list, no fancy indexing (the compacted-id +
                        # np.add.at form was measured 2.5x slower on an
                        # SRTM1 tile, dominated by 12.9M-element index
                        # gathers).  Drained contributions (targets off
                        # the valid8 interior) land in dead cells that
                        # never send (send masks are valid8-scoped) and
                        # are never read back.
                        base_p = np.zeros((h + 2, w_ + 2), dtype=np.int32)
                        base_p[1:-1, 1:-1] = valid8
                        sends = [(dr, dc, (valid8 & ~pit2) & (code2 == k))
                                 for k, (_, dr, dc) in enumerate(_FLOW_DIRS)]
                        acc_p = base_p.copy()
                        for _r in range(ACC_ROUNDS):
                            nxt_p = base_p.copy()
                            core = acc_p[1:-1, 1:-1]
                            for dr, dc, sk in sends:
                                nxt_p[1 + dr:1 + dr + h,
                                      1 + dc:1 + dc + w_] += core * sk
                            acc_p = nxt_p
                        acc_v = acc_p[1:-1, 1:-1][valid8]
                        n_nodes = int(acc_v.size)
                        out["sum_acc"].append(int(acc_v.sum(dtype=np.int64)))
                        out["max_acc"].append(
                            int(acc_v.max()) if n_nodes else None)
                        out["n_channel"].append(
                            int((acc_v >= CHANNEL_ACC).sum()))
                yield pd.DataFrame(out)

        return gen, schema

    gen, schema = gen_factory(aspect, tri, flow, acc)
    return (tiles.select("tile_key", "encoding", "data")
            .mapInPandas(gen, schema))


def tile_slope_stats(tiles: DataFrame,
                     steep_threshold2: int = STEEP_SLOPE2) -> DataFrame:
    """Slope-only view (schema unchanged from r5) — runs the shared
    decode+stencil kernel with the aspect sums GATED OFF; callers wanting
    BOTH families use tile_terrain_stats directly and pay ONE decode."""
    return tile_terrain_stats(tiles, steep_threshold2, aspect=False)


def tile_tri_stats(tiles: DataFrame) -> DataFrame:
    """Terrain-Ruggedness-Index view of the fused kernel (r6): slope
    fields + the 8-neighbour |dz| sums in one decode pass, aspect sums
    gated off.  TRI excludes a node when ANY 3x3 cell is void, so its
    valid/void counts differ from the 5-point slope stencil's on the
    same tile — both are emitted for exactly that contrast."""
    return tile_terrain_stats(tiles, aspect=False, tri=True)


CONTOUR_LEVELS = (0, 500)  # DEM units; fixture z spans [-1000, 1000)
_CONTOUR_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("n_hcross", T.LongType(), False),
    T.StructField("n_vcross", T.LongType(), False),
    T.StructField("n_cells_cut", T.LongType(), False),
    T.StructField("n_saddle", T.LongType(), False)])


def tile_contour_stats(tiles: DataFrame,
                       levels: tuple[int, ...] = CONTOUR_LEVELS) -> DataFrame:
    """Marching-squares contour census (r6): per (tile, level) the exact
    counts a contour extractor needs before emitting geometry — lattice
    edges the level crosses (horizontal / vertical separately: a
    crossing is (z1 < L) != (z2 < L), the open/closed convention fixed
    so both engines agree on exact-level nodes), cells the level cuts,
    and AMBIGUOUS (saddle) cells where marching squares must
    disambiguate (diagonal corners agree, adjacent ones differ).  Void
    nodes knock out every edge/cell that touches them.  All boolean
    integer compares — the oracle replays each count closed-form from
    the lattice DEM.

    One decode, map-only, O(tiles x levels) output — the cartography
    primitive (real contour GEOMETRY emission would follow the same
    per-cell dispatch; the census is the hash-gateable core)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _CONTOUR_SCHEMA.fields}
            for _, r in pdf.iterrows():
                z = decode_tile_bytes(r["encoding"], bytes(r["data"]), allow_overview=True) \
                    .astype(np.int32)
                vm = z != kernels.VOID
                hvalid = vm[:, :-1] & vm[:, 1:]
                vvalid = vm[:-1, :] & vm[1:, :]
                cvalid = (vm[:-1, :-1] & vm[:-1, 1:]
                          & vm[1:, :-1] & vm[1:, 1:])
                for lv in levels:
                    b = z < lv
                    c00, c01 = b[:-1, :-1], b[:-1, 1:]
                    c10, c11 = b[1:, :-1], b[1:, 1:]
                    uniform = (c00 == c01) & (c01 == c10) & (c10 == c11)
                    saddle = (c00 == c11) & (c01 == c10) & (c00 != c01)
                    out["tile_key"].append(r["tile_key"])
                    out["level"].append(int(lv))
                    out["n_hcross"].append(
                        int(((b[:, :-1] != b[:, 1:]) & hvalid).sum()))
                    out["n_vcross"].append(
                        int(((b[:-1, :] != b[1:, :]) & vvalid).sum()))
                    out["n_cells_cut"].append(int((cvalid & ~uniform).sum()))
                    out["n_saddle"].append(int((cvalid & saddle).sum()))
            yield pd.DataFrame(out)

    return (tiles.select("tile_key", "encoding", "data")
            .mapInPandas(gen, _CONTOUR_SCHEMA))


_VIEW_RAYS = (  # (name, dr, dc) — 8 compass rays from the tile centre
    ("e", 0, 1), ("ne", 1, 1), ("n", 1, 0), ("nw", 1, -1),
    ("w", 0, -1), ("sw", -1, -1), ("s", -1, 0), ("se", -1, 1))
_VIEW_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("ray", T.StringType(), False),
    T.StructField("n_nodes", T.LongType(), False),
    T.StructField("n_visible", T.LongType(), False),
    T.StructField("max_ms", T.LongType(), True)])


def tile_viewshed_stats(tiles: DataFrame) -> DataFrame:
    """Line-of-sight visibility census (r6): from the tile-centre
    observer, walk the 8 compass rays to the tile edge; node at distance
    d is VISIBLE iff its quantized elevation slope
    ms = floor((z_d - z_0) * 1e6 / d) STRICTLY exceeds every earlier
    node's ms on the ray (the classic viewshed running-horizon test).
    The micro-slope quantization is the spec: it keeps the whole
    computation in int64 (|dz| < 2^15 so |ms| < 2^45) and floor division
    is replayed exactly by the oracle (negative dz handled by the
    explicit floor identity -((-dz*1e6 + d - 1) div d), so DuckDB's
    truncating // never sees a negative operand).  Void nodes on a ray
    are SKIPPED — neither visible nor blocking.

    Per (tile, ray): n_nodes (non-void on the ray), n_visible, max_ms.
    One decode, map-only, O(tiles x 8) output; each ray is O(size)
    numpy (gather + cummax) — the terrain analysis primitive behind
    visibility maps and radio/solar exposure."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _VIEW_SCHEMA.fields}
            for _, r in pdf.iterrows():
                z = decode_tile_bytes(r["encoding"], bytes(r["data"]), allow_overview=True) \
                    .astype(np.int64)
                size = z.shape[0]
                r0 = c0 = (size - 1) // 2
                z0 = int(z[r0, c0])
                L = (size - 1) // 2
                d = np.arange(1, L + 1, dtype=np.int64)
                for name, dr, dc in _VIEW_RAYS:
                    zv = z[r0 + d * dr, c0 + d * dc]
                    keep = zv != kernels.VOID
                    dk, zk = d[keep], zv[keep]
                    # numpy // IS floor division for negatives — the
                    # exact identity the oracle replays by CASE
                    ms = (zk - z0) * 1_000_000 // dk
                    prior = np.concatenate((
                        [np.int64(-(2 ** 62))],
                        np.maximum.accumulate(ms)[:-1]))
                    vis = ms > prior
                    out["tile_key"].append(r["tile_key"])
                    out["ray"].append(name)
                    out["n_nodes"].append(int(dk.size))
                    out["n_visible"].append(int(vis.sum()))
                    out["max_ms"].append(
                        int(ms.max()) if dk.size else None)
            yield pd.DataFrame(out)

    return (tiles.select("tile_key", "encoding", "data")
            .mapInPandas(gen, _VIEW_SCHEMA))


def tile_flowacc_stats(tiles: DataFrame) -> DataFrame:
    """D8 flow-accumulation view of the fused kernel (r6): slope fields
    + ACC_ROUNDS-round upstream contributing area (sum / max / channel
    count) in one decode pass.  Exact int64 throughout; the oracle
    replays the edge list and every accumulation round closed-form."""
    return tile_terrain_stats(tiles, aspect=False, acc=True)


def tile_flowdir_stats(tiles: DataFrame) -> DataFrame:
    """D8 flow-direction view of the fused kernel (r6): slope fields +
    the 8-direction steepest-descent histogram and pit count in one
    decode pass (aspect and TRI sums gated off).  Unweighted integer
    drops, first-clockwise-from-East tie rule, 3x3 void exclusion —
    every count replayable closed-form by the oracle."""
    return tile_terrain_stats(tiles, aspect=False, flow=True)


WATERSHED_ROUNDS = 8  # pointer-doubling rounds: labels follow <= 2^8 = 256
# D8 steps — the bounded-depth contract (the ACC_ROUNDS precedent): the
# census is DEFINED on the 2^R-step ancestor labels, so both engines
# replay it exactly whether or not every path has terminated; roots that
# are still mid-path surface as n_open_basins instead of being dropped.

_WATERSHED_SCHEMA = T.StructType(
    [T.StructField("tile_key", T.StringType(), False)]
    + [T.StructField(f, T.LongType(), False)
       for f in ("n_nodes", "n_basins", "n_pit_basins",
                 "n_outlet_basins", "n_open_basins", "largest_basin")])


def tile_watershed_stats(tiles: DataFrame,
                         rounds: int = WATERSHED_ROUNDS) -> DataFrame:
    """(tile_key, n_nodes, n_basins, n_pit_basins, n_outlet_basins,
    n_open_basins, largest_basin) — D8 drainage-basin (watershed)
    delineation census: every valid interior node follows its
    steepest-descent pointer (same drops / first-clockwise-from-East tie
    rule as the flow kernel) to its 2^rounds-step ancestor via pointer
    doubling; nodes sharing an ancestor form one basin.  Terminals are
    pits (best drop <= 0) or outlets (target off the valid interior) —
    both point to themselves; basins rooted at a non-terminal after
    2^rounds steps are counted as n_open_basins (zero when every path
    terminates, as on the gate tile where strict integer descent bounds
    paths well under 256 steps).

    Scale shape: map-only (one decode, O(size²·rounds) numpy pointer
    gathers per tile, zero shuffle, O(tiles) output) — the per-tile
    mirror of the distributed connected-components contract, with the
    doubling rounds replacing per-round Spark jobs because a tile's
    graph fits one task.  The DuckDB oracle replays the drops, the tie
    CASE chain, and every doubling round as self-joins."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _WATERSHED_SCHEMA.fields}
            for _, row in pdf.iterrows():
                z = decode_tile_bytes(row["encoding"], bytes(row["data"]),
                                      allow_overview=True).astype(np.int32)
                size = z.shape[0]
                h = w_ = size - 2
                void = z == kernels.VOID
                void8 = np.zeros((h, w_), dtype=bool)
                for dr in (0, 1, 2):
                    for dc in (0, 1, 2):
                        void8 |= void[dr:dr + h, dc:dc + w_]
                valid8 = ~void8
                zin = z[1:-1, 1:-1]
                best = code = None
                for k, (_, dr, dc) in enumerate(_FLOW_DIRS):
                    d = zin - z[1 + dr:1 + dr + h, 1 + dc:1 + dc + w_]
                    if best is None:
                        best = d.copy()
                        code = np.zeros(d.shape, dtype=np.int8)
                    else:
                        m = d > best
                        best[m] = d[m]
                        code[m] = k
                pit = best <= 0
                rr, cc = np.meshgrid(np.arange(1, size - 1),
                                     np.arange(1, size - 1), indexing="ij")
                flat = rr * size + cc
                node_mask = np.zeros(size * size, dtype=bool)
                node_mask[flat[valid8]] = True
                ptr = np.arange(size * size, dtype=np.int64)
                live = valid8 & ~pit
                for k, (_, dr, dc) in enumerate(_FLOW_DIRS):
                    sel = live & (code == k)
                    if not sel.any():
                        continue
                    tf = (rr + dr) * size + (cc + dc)
                    ok = sel & node_mask[tf]  # drains point to themselves
                    ptr[flat[ok]] = tf[ok]
                ptr1 = ptr.copy()  # one-step pointers, for root classes
                for _r in range(int(rounds)):
                    ptr = ptr[ptr]
                labels = ptr[flat[valid8]]
                roots, counts = np.unique(labels, return_counts=True)
                pit_flat = np.zeros(size * size, dtype=bool)
                pit_flat[flat[valid8 & pit]] = True
                self_flat = ptr1 == np.arange(size * size, dtype=np.int64)
                r_pit = pit_flat[roots]
                r_drain = self_flat[roots] & ~r_pit
                r_open = ~self_flat[roots]
                out["tile_key"].append(row["tile_key"])
                out["n_nodes"].append(int(labels.size))
                out["n_basins"].append(int(roots.size))
                out["n_pit_basins"].append(int(r_pit.sum()))
                out["n_outlet_basins"].append(int(r_drain.sum()))
                out["n_open_basins"].append(int(r_open.sum()))
                out["largest_basin"].append(
                    int(counts.max()) if counts.size else 0)
            yield pd.DataFrame(out)

    return (tiles.select("tile_key", "encoding", "data")
            .mapInPandas(gen, _WATERSHED_SCHEMA))


def tile_aspect_hist(tiles: DataFrame) -> DataFrame:
    """Aspect-only view of tile_terrain_stats (schema unchanged from r5);
    see tile_slope_stats for the fusion contract.  The slope stats it
    also computes genuinely ARE cheap next to the aspect masks (three
    reductions on an already-materialized array), so no slope gate."""
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


# --- tile pyramid (r6) -------------------------------------------------------

_PYR_STATS_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("n_void", T.LongType(), False),
    T.StructField("sum_elev", T.LongType(), False),
    T.StructField("min_elev", T.LongType(), True),
    T.StructField("max_elev", T.LongType(), True),
])

_PYR_TILES_SCHEMA = T.StructType([
    T.StructField("tile_key", T.StringType(), False),
    T.StructField("sw_lat", T.IntegerType(), False),
    T.StructField("sw_lon", T.IntegerType(), False),
    T.StructField("size", T.IntegerType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("encoding", T.StringType(), False),
    T.StructField("data", T.BinaryType(), False),
])


def _blockmax(z: np.ndarray) -> np.ndarray:
    """2x2 block-max downsample; odd sizes pad the last row/col with VOID.
    VOID (int16 min) is absorbing-min, so a coarse cell is VOID iff every
    base cell under it is void — the overview semantics GDAL calls
    nearest-max, exact in integers."""
    n = z.shape[0]
    m = (n + 1) // 2
    if n % 2:
        pad = np.full((2 * m, 2 * m), kernels.VOID, dtype=z.dtype)
        pad[:n, :n] = z
        z = pad
    return z.reshape(m, 2, m, 2).max(axis=(1, 3))


def tile_pyramid_stats(tiles: DataFrame, levels: int = 3) -> DataFrame:
    """Per-(tile, level) integer stats of the block-max overview pyramid:
    width = ceil-halved grid dimension, n_void = all-void coarse cells,
    sum/min/max over the non-void coarse values.  ONE decode per tile
    feeds all levels (the level-k grid is halved in place from level k-1,
    so the whole pyramid costs ~4/3 of one pass over the base grid).
    Map-only, zero shuffle, O(tiles x levels) output — scan-shaped at
    100 TB.  Because block-max is associative, the DuckDB oracle replays
    level k directly as a GROUP BY (r // 2^k, c // 2^k) over the
    closed-form lattice DEM — an independent non-iterative derivation."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in _PYR_STATS_SCHEMA.fields}
            for _, r in pdf.iterrows():
                z = decode_tile_bytes(r["encoding"], bytes(r["data"]), allow_overview=True) \
                    .astype(np.int64)
                for lvl in range(1, levels + 1):
                    z = _blockmax(z)
                    live = z[z != kernels.VOID]
                    out["tile_key"].append(r["tile_key"])
                    out["level"].append(lvl)
                    out["width"].append(int(z.shape[0]))
                    out["n_void"].append(int(z.size - live.size))
                    out["sum_elev"].append(int(live.sum()))
                    out["min_elev"].append(
                        int(live.min()) if live.size else None)
                    out["max_elev"].append(
                        int(live.max()) if live.size else None)
            yield pd.DataFrame(out)

    return (tiles.select("tile_key", "encoding", "data")
            .mapInPandas(gen, _PYR_STATS_SCHEMA))


def tile_pyramid(tiles: DataFrame, levels: int = 3) -> DataFrame:
    """Materialized overview tiles: every level re-encoded as HGT so the
    output composes with every other tile operator (decode round-trip is
    pinned by pytest).  Same one-decode-per-tile loop as the stats view;
    at 100 TB this is the COG-overview build job — map-only, output
    ~1/3 the input bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, r in pdf.iterrows():
                z = decode_tile_bytes(r["encoding"], bytes(r["data"]), allow_overview=True)
                rows = []
                for lvl in range(1, levels + 1):
                    z = _blockmax(z)
                    rows.append({
                        "tile_key": r["tile_key"],
                        "sw_lat": int(r["sw_lat"]),
                        "sw_lon": int(r["sw_lon"]),
                        "size": int(z.shape[0]), "level": lvl,
                        "encoding": "hgt",
                        "data": kernels.encode_hgt(z.astype(np.int16)),
                    })
                yield pd.DataFrame(rows)

    return (tiles.select("tile_key", "sw_lat", "sw_lon", "encoding", "data")
            .mapInPandas(gen, _PYR_TILES_SCHEMA))


# --- cross-tile mosaic: the parent pyramid level (r6) ------------------------

_MOSAIC_STATS_SCHEMA = T.StructType([
    T.StructField("parent_key", T.StringType(), False),
    T.StructField("n_children", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("n_void", T.LongType(), False),
    T.StructField("sum_elev", T.LongType(), False),
    T.StructField("min_elev", T.LongType(), True),
    T.StructField("max_elev", T.LongType(), True),
])

_MOSAIC_TILES_SCHEMA = T.StructType([
    T.StructField("parent_key", T.StringType(), False),
    T.StructField("sw_lat", T.IntegerType(), False),
    T.StructField("sw_lon", T.IntegerType(), False),
    T.StructField("size", T.IntegerType(), False),
    T.StructField("n_children", T.IntegerType(), False),
    T.StructField("encoding", T.StringType(), False),
    T.StructField("data", T.BinaryType(), False),
])


def _skadi_key(lat: int, lon: int) -> str:
    return (f"{'S' if lat < 0 else 'N'}{abs(lat):02d}"
            f"{'W' if lon < 0 else 'E'}{abs(lon):03d}")


def _mosaic_groups(tiles: DataFrame):
    """Tiles keyed by their 2-degree parent cell (floor-to-even on both
    axes) plus the child offset inside it."""
    plat = (F.floor(F.col("sw_lat") / F.lit(2)) * 2).cast("int")
    plon = (F.floor(F.col("sw_lon") / F.lit(2)) * 2).cast("int")
    return (tiles.select("sw_lat", "sw_lon", "size", "encoding", "data")
            .withColumn("plat", plat).withColumn("plon", plon)
            .withColumn("dlat", (F.col("sw_lat") - F.col("plat")).cast("int"))
            .withColumn("dlon", (F.col("sw_lon") - F.col("plon")).cast("int")))


def _assemble_parent(pdf: pd.DataFrame):
    """(parent sw, assembled-and-halved grid, n_children) for one group.
    SRTM neighbors SHARE their edge row/column, so a 2x2 mosaic is
    (2s-1)^2 cells; pasting order is irrelevant because shared-edge
    values are identical by the SRTM contract.  Missing quadrants stay
    VOID — block-max then propagates exactly like the in-tile pyramid."""
    sizes = set(int(s) for s in pdf["size"])
    if len(sizes) != 1:
        raise ValueError(f"mosaic group mixes tile sizes {sorted(sizes)}: "
                         "resample to a uniform size first")
    s = sizes.pop()
    m = np.full((2 * s - 1, 2 * s - 1), kernels.VOID, dtype=np.int64)
    for _, r in pdf.iterrows():
        z = decode_tile_bytes(r["encoding"], bytes(r["data"]), allow_overview=True)
        o_r, o_c = int(r["dlat"]) * (s - 1), int(r["dlon"]) * (s - 1)
        m[o_r:o_r + s, o_c:o_c + s] = z
    return _blockmax(m), len(pdf)


def tile_mosaic_stats(tiles: DataFrame) -> DataFrame:
    """Per-parent integer stats of the 2x2 cross-tile mosaic level: four
    1-degree neighbors assemble into one 2-degree grid (shared edges
    overlap by the SRTM contract) and block-max-halve back to the child
    resolution — the z-1 pyramid level the in-tile pyramid cannot build.
    This is the one raster operator that MUST shuffle (tile blobs group
    by parent cell: ~4 blobs per group, the minimum possible data
    motion for the semantics); everything after the grouping is local
    numpy.  Missing quadrants surface as VOID coarse cells, gated."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g, n = _assemble_parent(pdf)
        live = g[g != kernels.VOID]
        return pd.DataFrame({
            "parent_key": [_skadi_key(int(key[0]), int(key[1]))],
            "n_children": [n], "width": [int(g.shape[0])],
            "n_void": [int(g.size - live.size)],
            "sum_elev": [int(live.sum())],
            "min_elev": [int(live.min()) if live.size else None],
            "max_elev": [int(live.max()) if live.size else None]})

    return (_mosaic_groups(tiles).groupBy("plat", "plon")
            .applyInPandas(fn, _MOSAIC_STATS_SCHEMA))


def tile_mosaic(tiles: DataFrame) -> DataFrame:
    """Materialized 2-degree parent tiles (HGT), composable with every
    tile operator; see tile_mosaic_stats for the shape contract."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g, n = _assemble_parent(pdf)
        plat, plon = int(key[0]), int(key[1])
        return pd.DataFrame({
            "parent_key": [_skadi_key(plat, plon)],
            "sw_lat": [plat], "sw_lon": [plon],
            "size": [int(g.shape[0])], "n_children": [n],
            "encoding": ["hgt"],
            "data": [kernels.encode_hgt(g.astype(np.int16))]})

    return (_mosaic_groups(tiles).groupBy("plat", "plon")
            .applyInPandas(fn, _MOSAIC_TILES_SCHEMA))

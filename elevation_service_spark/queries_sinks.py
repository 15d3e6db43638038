"""Driver-contract queries for the two components that were pytest-only in
round 1 (VERDICT: checkpoint sink, raster↔vector): both now produce
hash-gated results.

- ``raster_points``: raster→vector materialization — every stride-th grid
  node of every fixture tile as a point row.  The DuckDB oracle
  re-enumerates the nodes from the closed-form integer-lattice DEM
  (fixtures.dem_value), including the planted void node, with the same
  single-IEEE-division lat/lon derivation.
- ``resumable_enrich``: the full checkpoint/lineage sink — derived points
  are enriched through run_resumable TWICE into the same manifest (the
  second run must skip every bucket), and the parquet that landed on disk
  is read back and compared against the bilinear oracle.  Exactly-once
  semantics are thus part of the hash gate, not just pytest.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures
from .operators.lookup import enrich_points
from .operators.raster import tiles_to_points
from .sources.manifest import run_resumable
from .sources.tiles import fixture_tiles_df
from .queries import _derived_points, _BILINEAR_ORACLE

RASTER_STRIDE = 10  # hits the planted void node (10, 10) — gated, not dead


def q_raster_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiles_to_points(fixture_tiles_df(spark), stride=RASTER_STRIDE)


def _raster_points_oracle() -> str:
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    return f"""WITH t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
rr AS (SELECT *, unnest(range(0, size, {RASTER_STRIDE})) AS r FROM t),
rc AS (SELECT *, unnest(range(0, size, {RASTER_STRIDE})) AS c FROM rr)
SELECT tile_key,
  sw_lat + r / CAST(size - 1 AS DOUBLE) AS lat,
  sw_lon + c / CAST(size - 1 AS DOUBLE) AS lon,
  CASE WHEN r = {vr} AND c = {vc} THEN CAST(-32768 AS DOUBLE)
       ELSE CAST((((sw_lat + 90) * (size - 1) + r) * 31
                  + ((sw_lon + 180) * (size - 1) + c) * 17) % 2000 - 1000
                 AS DOUBLE) END AS elev
FROM rc"""


def q_tile_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster derivative (r5): per-tile slope statistics from exact
    central differences — distributed map-only gradient computation over
    the tile table, voids stencil-excluded.  The oracle re-derives every
    interior node's dx/dy from the closed-form lattice DEM (the -1000
    offsets cancel in differences) and reproduces all six integer stats."""
    from .operators.raster import tile_slope_stats
    return tile_slope_stats(fixture_tiles_df(spark))


def _tile_slope_oracle() -> str:
    from .operators.raster import STEEP_SLOPE2
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    return f"""WITH t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
rr AS (SELECT *, unnest(range(1, size - 1)) AS r FROM t),
rc AS (SELECT *, unnest(range(1, size - 1)) AS c FROM rr),
zz AS (SELECT tile_key, r, c,
  ((r = {vr} AND abs(c - {vc}) <= 1) OR (c = {vc} AND abs(r - {vr}) <= 1))
    AS void_adj,
  (sw_lat + 90) * (size - 1) AS gr0, (sw_lon + 180) * (size - 1) AS gc0
  FROM rc),
g AS (SELECT tile_key, void_adj,
  (((gr0 + r) * 31 + (gc0 + c + 1) * 17) % 2000)
    - (((gr0 + r) * 31 + (gc0 + c - 1) * 17) % 2000) AS dx,
  (((gr0 + r + 1) * 31 + (gc0 + c) * 17) % 2000)
    - (((gr0 + r - 1) * 31 + (gc0 + c) * 17) % 2000) AS dy
  FROM zz)
SELECT tile_key,
  CAST(count(*) AS BIGINT) AS n_interior,
  CAST(count(*) FILTER (WHERE NOT void_adj) AS BIGINT) AS n_valid,
  CAST(count(*) FILTER (WHERE void_adj) AS BIGINT) AS n_void_adj,
  CAST(max(dx * dx + dy * dy) FILTER (WHERE NOT void_adj) AS BIGINT)
    AS max_slope2,
  CAST(coalesce(sum(dx * dx + dy * dy) FILTER (WHERE NOT void_adj), 0)
    AS BIGINT) AS sum_slope2,
  CAST(count(*) FILTER (WHERE NOT void_adj
                        AND dx * dx + dy * dy > {STEEP_SLOPE2}) AS BIGINT)
    AS n_steep
FROM g GROUP BY tile_key"""


def q_tile_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-way aspect histogram per tile (r5): slope's companion raster
    derivative, transcendental-free (integer sign/|dx|-vs-|dy| compares),
    oracle-replayed from the closed-form lattice DEM."""
    from .operators.raster import tile_aspect_hist
    return tile_aspect_hist(fixture_tiles_df(spark))


def _tile_aspect_oracle() -> str:
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    return f"""WITH t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
rr AS (SELECT *, unnest(range(1, size - 1)) AS r FROM t),
rc AS (SELECT *, unnest(range(1, size - 1)) AS c FROM rr),
zz AS (SELECT tile_key, r, c,
  ((r = {vr} AND abs(c - {vc}) <= 1) OR (c = {vc} AND abs(r - {vr}) <= 1))
    AS void_adj,
  (sw_lat + 90) * (size - 1) AS gr0, (sw_lon + 180) * (size - 1) AS gc0
  FROM rc),
g AS (SELECT tile_key,
  (((gr0 + r) * 31 + (gc0 + c + 1) * 17) % 2000)
    - (((gr0 + r) * 31 + (gc0 + c - 1) * 17) % 2000) AS dx,
  (((gr0 + r + 1) * 31 + (gc0 + c) * 17) % 2000)
    - (((gr0 + r - 1) * 31 + (gc0 + c) * 17) % 2000) AS dy
  FROM zz WHERE NOT void_adj)
SELECT tile_key,
  CAST(count(*) FILTER (WHERE dx = 0 AND dy = 0) AS BIGINT) AS n_flat,
  CAST(count(*) FILTER (WHERE abs(dx) > abs(dy) AND dx > 0) AS BIGINT) AS h_e,
  CAST(count(*) FILTER (WHERE abs(dx) > abs(dy) AND dx < 0) AS BIGINT) AS h_w,
  CAST(count(*) FILTER (WHERE abs(dy) > abs(dx) AND dy > 0) AS BIGINT) AS h_n,
  CAST(count(*) FILTER (WHERE abs(dy) > abs(dx) AND dy < 0) AS BIGINT) AS h_s,
  CAST(count(*) FILTER (WHERE abs(dx) = abs(dy) AND abs(dx) > 0
                        AND dx > 0 AND dy > 0) AS BIGINT) AS h_ne,
  CAST(count(*) FILTER (WHERE abs(dx) = abs(dy) AND abs(dx) > 0
                        AND dx < 0 AND dy > 0) AS BIGINT) AS h_nw,
  CAST(count(*) FILTER (WHERE abs(dx) = abs(dy) AND abs(dx) > 0
                        AND dx > 0 AND dy < 0) AS BIGINT) AS h_se,
  CAST(count(*) FILTER (WHERE abs(dx) = abs(dy) AND abs(dx) > 0
                        AND dx < 0 AND dy < 0) AS BIGINT) AS h_sw
FROM g GROUP BY tile_key"""


def q_tile_tri(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain Ruggedness Index (r6): per-tile sums of the 8-neighbour
    |dz| stencil, fused into the SAME decode pass as the slope stats
    (aspect gated off).  TRI's 3x3 void exclusion is stricter than the
    slope's 5-point one, so the oracle derives a second, different
    valid/void split for the same planted void node — both splits land
    under one hash."""
    from .operators.raster import tile_tri_stats
    return tile_tri_stats(fixture_tiles_df(spark))


def _tile_tri_oracle() -> str:
    from .operators.raster import ROUGH_TRI
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    terms = " + ".join(
        f"abs((((gr0 + r + {dr}) * 31 + (gc0 + c + {dc}) * 17) % 2000) - zc)"
        for dr in (-1, 0, 1) for dc in (-1, 0, 1)
        if not (dr == 0 and dc == 0))
    return f"""WITH s AS ({_tile_slope_oracle()}),
t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
rr AS (SELECT *, unnest(range(1, size - 1)) AS r FROM t),
rc AS (SELECT *, unnest(range(1, size - 1)) AS c FROM rr),
zz AS (SELECT tile_key, r, c,
  (abs(r - {vr}) <= 1 AND abs(c - {vc}) <= 1) AS void_adj8,
  (sw_lat + 90) * (size - 1) AS gr0, (sw_lon + 180) * (size - 1) AS gc0,
  (((sw_lat + 90) * (size - 1) + r) * 31
   + ((sw_lon + 180) * (size - 1) + c) * 17) % 2000 AS zc
  FROM rc),
g AS (SELECT tile_key, void_adj8, {terms} AS tri FROM zz),
tr AS (SELECT tile_key,
  CAST(count(*) FILTER (WHERE NOT void_adj8) AS BIGINT) AS n_valid8,
  CAST(count(*) FILTER (WHERE void_adj8) AS BIGINT) AS n_void_adj8,
  CAST(coalesce(sum(tri) FILTER (WHERE NOT void_adj8), 0) AS BIGINT)
    AS sum_tri,
  CAST(max(tri) FILTER (WHERE NOT void_adj8) AS BIGINT) AS max_tri,
  CAST(count(*) FILTER (WHERE NOT void_adj8 AND tri > {ROUGH_TRI})
    AS BIGINT) AS n_rough
  FROM g GROUP BY tile_key)
SELECT s.*, tr.n_valid8, tr.n_void_adj8, tr.sum_tri, tr.max_tri, tr.n_rough
FROM s JOIN tr USING (tile_key)"""


def q_tile_flowdir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow-direction histogram (r6): per-tile counts of the
    steepest-descent direction (8 ways + pits) from unweighted integer
    drops, fused into the same one-decode terrain kernel.  The oracle
    replays every node's 8 drops closed-form, takes GREATEST, and applies
    the identical clockwise-from-East first-max tie rule as a CASE
    chain."""
    from .operators.raster import tile_flowdir_stats
    return tile_flowdir_stats(fixture_tiles_df(spark))


def _tile_flowdir_oracle() -> str:
    from .operators.raster import _FLOW_DIRS
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    drops = ",\n  ".join(
        f"zc - (((gr0 + r + {dr}) * 31 + (gc0 + c + {dc}) * 17) % 2000)"
        f" AS d_{name[2:]}" for name, dr, dc in _FLOW_DIRS)
    mx = "greatest(" + ", ".join(f"d_{n[2:]}" for n, _, _ in _FLOW_DIRS) + ")"
    dir_case = ("CASE WHEN mx <= 0 THEN 'pit' "
                + " ".join(f"WHEN d_{n[2:]} = mx THEN '{n}'"
                           for n, _, _ in _FLOW_DIRS) + " END")
    counts = ",\n  ".join(
        [f"CAST(count(*) FILTER (WHERE dir = 'pit') AS BIGINT) AS n_pit"]
        + [f"CAST(count(*) FILTER (WHERE dir = '{n}') AS BIGINT) AS {n}"
           for n, _, _ in _FLOW_DIRS])
    return f"""WITH s AS ({_tile_slope_oracle()}),
t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
rr AS (SELECT *, unnest(range(1, size - 1)) AS r FROM t),
rc AS (SELECT *, unnest(range(1, size - 1)) AS c FROM rr),
zz AS (SELECT tile_key, r, c,
  (abs(r - {vr}) <= 1 AND abs(c - {vc}) <= 1) AS void_adj8,
  (sw_lat + 90) * (size - 1) AS gr0, (sw_lon + 180) * (size - 1) AS gc0,
  (((sw_lat + 90) * (size - 1) + r) * 31
   + ((sw_lon + 180) * (size - 1) + c) * 17) % 2000 AS zc
  FROM rc),
g AS (SELECT tile_key,
  {drops}
  FROM zz WHERE NOT void_adj8),
m AS (SELECT *, {mx} AS mx FROM g),
f AS (SELECT tile_key, {dir_case} AS dir FROM m),
fr AS (SELECT tile_key,
  {counts}
  FROM f GROUP BY tile_key)
SELECT s.*, fr.n_pit, fr.f_e, fr.f_se, fr.f_s, fr.f_sw,
       fr.f_w, fr.f_nw, fr.f_n, fr.f_ne
FROM s JOIN fr USING (tile_key)"""


def q_tile_flowacc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow accumulation (r6): ACC_ROUNDS-round upstream contributing
    area over the steepest-descent edge graph, fused into the one-decode
    terrain kernel.  The oracle rebuilds the edge list closed-form
    (drops -> GREATEST -> the same clockwise-from-East CASE chain gives
    each node its target cell) and replays every accumulation round as a
    chained LEFT JOIN + sum — the full trajectory, not just the result,
    is what the hash pins."""
    from .operators.raster import tile_flowacc_stats
    return tile_flowacc_stats(fixture_tiles_df(spark))


def _tile_flowacc_oracle() -> str:
    from .operators.raster import ACC_ROUNDS, CHANNEL_ACC, _FLOW_DIRS
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    drops = ",\n  ".join(
        f"zc - (((gr0 + r + {dr}) * 31 + (gc0 + c + {dc}) * 17) % 2000)"
        f" AS d_{name[2:]}" for name, dr, dc in _FLOW_DIRS)
    mx = "greatest(" + ", ".join(f"d_{n[2:]}" for n, _, _ in _FLOW_DIRS) + ")"
    tr_case = ("CASE WHEN mx <= 0 THEN NULL "
               + " ".join(f"WHEN d_{n[2:]} = mx THEN r + ({dr})"
                          for n, dr, _ in _FLOW_DIRS) + " END")
    tc_case = ("CASE WHEN mx <= 0 THEN NULL "
               + " ".join(f"WHEN d_{n[2:]} = mx THEN c + ({dc})"
                          for n, _, dc in _FLOW_DIRS) + " END")
    rounds = ["""a1 AS (SELECT n.tile_key, n.r, n.c, 1 + count(e.tr) AS acc
  FROM nodes n LEFT JOIN e
    ON e.tile_key = n.tile_key AND e.tr = n.r AND e.tc = n.c
  GROUP BY 1, 2, 3)"""]
    for k in range(2, int(ACC_ROUNDS) + 1):
        rounds.append(f"""a{k} AS (SELECT n.tile_key, n.r, n.c,
  1 + coalesce(sum(p.acc), 0) AS acc
  FROM nodes n LEFT JOIN (
    SELECT e.tile_key, e.tr, e.tc, a.acc FROM e
    JOIN a{k - 1} a
      ON a.tile_key = e.tile_key AND a.r = e.r AND a.c = e.c) p
    ON p.tile_key = n.tile_key AND p.tr = n.r AND p.tc = n.c
  GROUP BY 1, 2, 3)""")
    last = f"a{int(ACC_ROUNDS)}"
    return f"""WITH s AS ({_tile_slope_oracle()}),
t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
rr AS (SELECT *, unnest(range(1, size - 1)) AS r FROM t),
rc AS (SELECT *, unnest(range(1, size - 1)) AS c FROM rr),
zz AS (SELECT tile_key, r, c, size,
  (abs(r - {vr}) <= 1 AND abs(c - {vc}) <= 1) AS void_adj8,
  (sw_lat + 90) * (size - 1) AS gr0, (sw_lon + 180) * (size - 1) AS gc0,
  (((sw_lat + 90) * (size - 1) + r) * 31
   + ((sw_lon + 180) * (size - 1) + c) * 17) % 2000 AS zc
  FROM rc),
nodes AS (SELECT tile_key, r, c FROM zz WHERE NOT void_adj8),
g AS (SELECT tile_key, r, c,
  {drops}
  FROM zz WHERE NOT void_adj8),
m AS (SELECT *, {mx} AS mx FROM g),
d AS (SELECT tile_key, r, c, {tr_case} AS tr, {tc_case} AS tc FROM m),
e AS (SELECT d.tile_key, d.r, d.c, d.tr, d.tc FROM d
  JOIN nodes n ON n.tile_key = d.tile_key AND n.r = d.tr AND n.c = d.tc),
{','.join(rounds)},
fr AS (SELECT tile_key,
  CAST(sum(acc) AS BIGINT) AS sum_acc,
  CAST(max(acc) AS BIGINT) AS max_acc,
  CAST(count(*) FILTER (WHERE acc >= {CHANNEL_ACC}) AS BIGINT) AS n_channel
  FROM {last} GROUP BY 1)
SELECT s.*, fr.sum_acc, fr.max_acc, fr.n_channel
FROM s JOIN fr USING (tile_key)"""


def q_tile_contour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour census (r6): per (tile, level) crossing /
    cut-cell / saddle counts — the cartography primitive's hash-gateable
    core.  The oracle enumerates every lattice edge and cell closed-form
    from the integer DEM with the identical (z < L) convention and void
    knock-outs."""
    from .operators.raster import tile_contour_stats
    return tile_contour_stats(fixture_tiles_df(spark))


def _tile_contour_oracle() -> str:
    from .operators.raster import CONTOUR_LEVELS
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    lvals = ", ".join(f"({lv})" for lv in CONTOUR_LEVELS)

    def zf(r: str, c: str) -> str:
        return (f"(((sw_lat + 90) * (size - 1) + ({r})) * 31"
                f" + ((sw_lon + 180) * (size - 1) + ({c})) * 17)"
                " % 2000 - 1000")

    return f"""WITH t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
lv(level) AS (VALUES {lvals}),
hr AS (SELECT *, unnest(range(0, size)) AS r FROM t),
hcc AS (SELECT *, unnest(range(0, size - 1)) AS c FROM hr),
hz AS (SELECT tile_key, {zf('r', 'c')} AS z1, {zf('r', 'c + 1')} AS z2
       FROM hcc WHERE NOT (r = {vr} AND (c = {vc} OR c + 1 = {vc}))),
he AS (SELECT tile_key, level,
  CAST(count(*) FILTER (WHERE (z1 < level) <> (z2 < level)) AS BIGINT) AS n_hcross
  FROM hz, lv GROUP BY 1, 2),
vrr AS (SELECT *, unnest(range(0, size - 1)) AS r FROM t),
vcc AS (SELECT *, unnest(range(0, size)) AS c FROM vrr),
vz AS (SELECT tile_key, {zf('r', 'c')} AS z1, {zf('r + 1', 'c')} AS z2
       FROM vcc WHERE NOT (c = {vc} AND (r = {vr} OR r + 1 = {vr}))),
ve AS (SELECT tile_key, level,
  CAST(count(*) FILTER (WHERE (z1 < level) <> (z2 < level)) AS BIGINT) AS n_vcross
  FROM vz, lv GROUP BY 1, 2),
cr AS (SELECT *, unnest(range(0, size - 1)) AS r FROM t),
cc AS (SELECT *, unnest(range(0, size - 1)) AS c FROM cr),
cz AS (SELECT tile_key,
  {zf('r', 'c')} AS z00, {zf('r', 'c + 1')} AS z01,
  {zf('r + 1', 'c')} AS z10, {zf('r + 1', 'c + 1')} AS z11
  FROM cc WHERE NOT ((r = {vr} OR r + 1 = {vr})
                     AND (c = {vc} OR c + 1 = {vc}))),
cb AS (SELECT tile_key, level,
  z00 < level AS c00, z01 < level AS c01,
  z10 < level AS c10, z11 < level AS c11 FROM cz, lv),
ce AS (SELECT tile_key, level,
  CAST(count(*) FILTER (WHERE NOT (c00 = c01 AND c01 = c10 AND c10 = c11))
    AS BIGINT) AS n_cells_cut,
  CAST(count(*) FILTER (WHERE c00 = c11 AND c01 = c10 AND c00 <> c01)
    AS BIGINT) AS n_saddle
  FROM cb GROUP BY 1, 2)
SELECT he.tile_key, CAST(he.level AS INTEGER) AS level,
       he.n_hcross, ve.n_vcross, ce.n_cells_cut, ce.n_saddle
FROM he JOIN ve ON ve.tile_key = he.tile_key AND ve.level = he.level
JOIN ce ON ce.tile_key = he.tile_key AND ce.level = he.level"""


def q_tile_viewshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-of-sight viewshed census (r6): per (tile, compass ray) the
    visible-node count under the running-horizon test with exact
    floor-division micro-slopes.  The oracle replays every ray
    closed-form — the floor identity keeps DuckDB's truncating division
    away from negative operands, and the horizon is a plain
    1-preceding window max."""
    from .operators.raster import tile_viewshed_stats
    return tile_viewshed_stats(fixture_tiles_df(spark))


def _tile_viewshed_oracle() -> str:
    from .operators.raster import _VIEW_RAYS
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]})"
                      for t in fixtures.FIXTURE_TILES)
    vr, vc = fixtures.VOID_NODE
    rays = ", ".join(f"('{n}', {dr}, {dc})" for n, dr, dc in _VIEW_RAYS)

    def zf(r: str, c: str) -> str:
        return (f"(((sw_lat + 90) * (size - 1) + ({r})) * 31"
                f" + ((sw_lon + 180) * (size - 1) + ({c})) * 17)"
                " % 2000 - 1000")

    return f"""WITH t(tile_key, sw_lat, sw_lon, size) AS (VALUES {tiles}),
ray(ray, dr, dc) AS (VALUES {rays}),
b AS (SELECT t.*, ray.*, (size - 1) // 2 AS r0 FROM t, ray),
dd AS (SELECT *, unnest(range(1, r0 + 1)) AS d FROM b),
n AS (SELECT tile_key, ray, d, sw_lat, sw_lon, size, r0,
      r0 + d * dr AS rr, r0 + d * dc AS cc FROM dd),
k AS (SELECT tile_key, ray, d,
      {zf('rr', 'cc')} AS zd, {zf('r0', 'r0')} AS z0
      FROM n WHERE NOT (rr = {vr} AND cc = {vc})),
m AS (SELECT tile_key, ray, d,
      CASE WHEN zd - z0 >= 0 THEN ((zd - z0) * 1000000) // d
           ELSE -(((z0 - zd) * 1000000 + d - 1) // d) END AS ms
      FROM k),
w AS (SELECT tile_key, ray, d, ms,
      coalesce(max(ms) OVER (PARTITION BY tile_key, ray ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        -4611686018427387904) AS prior FROM m)
SELECT tile_key, ray, CAST(count(*) AS BIGINT) AS n_nodes,
  CAST(count(*) FILTER (WHERE ms > prior) AS BIGINT) AS n_visible,
  CAST(max(ms) AS BIGINT) AS max_ms
FROM w GROUP BY 1, 2"""


def q_tile_terrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused slope + aspect in ONE decode pass (r6, VERDICT r5 #5): the
    combined schema a terrain pipeline actually wants — paying the
    gunzip/PNG-unfilter decode and the void stencil once for both column
    families.  The oracle joins the two closed-form per-tile derivations
    on tile_key (each tile appears exactly once in both)."""
    from .operators.raster import tile_terrain_stats
    return tile_terrain_stats(fixture_tiles_df(spark))


def _tile_terrain_oracle() -> str:
    return f"""WITH s AS ({_tile_slope_oracle()}), a AS ({_tile_aspect_oracle()})
SELECT s.*, a.n_flat, a.h_e, a.h_w, a.h_n, a.h_s,
       a.h_ne, a.h_nw, a.h_se, a.h_sw
FROM s JOIN a USING (tile_key)"""


# --- tile pyramid (r6) -------------------------------------------------------
# The fixture set's planted void node never yields an all-void 2x2 block, so
# the gate adds ONE crafted tile with a 4x4 void patch: its pyramid walks the
# n_void progression 4 -> 1 -> 0 (level-1 blocks inside the patch, the exact
# level-2 block, the half-covered level-3 block), keeping the void column live.
_PYR_LEVELS = 3
# size must pass the SRTM sniff (1201/3601); 1201 is odd -> ceil-halving
# + VOID pad still exercised on every level
_PYR_VOID_TILE = ("N01E001", 1, 1, 1201)
_PYR_PATCH = (8, 12)                     # rows/cols [8, 12) all void


def _pyramid_tiles_df(spark: SparkSession) -> DataFrame:
    from .sources.tiles import TILES_SCHEMA
    from . import kernels
    key, sw_lat, sw_lon, size = _PYR_VOID_TILE
    lo, hi = _PYR_PATCH
    grid = fixtures.tile_grid(sw_lat, sw_lon, size).copy()
    grid[lo:hi, lo:hi] = kernels.VOID
    extra = spark.createDataFrame(
        [(key, None, None, None, sw_lat, sw_lon, size, "hgt.gz",
          bytearray(fixtures.encode_tile(grid, "hgt.gz")))],
        schema=TILES_SCHEMA)
    return fixture_tiles_df(spark).unionByName(extra)


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max overview pyramid stats, levels 1..3, one decode per tile
    (r6).  Block-max is associative, so the oracle replays level k as a
    direct GROUP BY (r // 2^k, c // 2^k) over the closed-form lattice DEM
    — a non-iterative independent derivation of the same integers."""
    from .operators.raster import tile_pyramid_stats
    return tile_pyramid_stats(_pyramid_tiles_df(spark), levels=_PYR_LEVELS)


def _tile_pyramid_oracle() -> str:
    vr, vc = fixtures.VOID_NODE
    key, sw_lat, sw_lon, size = _PYR_VOID_TILE
    lo, hi = _PYR_PATCH
    tiles = ", ".join(f"('{t[0]}', {t[1]}, {t[2]}, {t[3]}, 0)"
                      for t in fixtures.FIXTURE_TILES)
    tiles += f", ('{key}', {sw_lat}, {sw_lon}, {size}, 1)"
    return f"""WITH t(tile_key, sw_lat, sw_lon, size, pv) AS (VALUES {tiles}),
lv(level, s) AS (VALUES {", ".join(f"({k}, {1 << k})"
                                   for k in range(1, _PYR_LEVELS + 1))}),
rr AS (SELECT *, unnest(range(0, size)) AS r FROM t),
rc AS (SELECT *, unnest(range(0, size)) AS c FROM rr),
base AS (SELECT tile_key, size, r, c,
  CASE WHEN (r = {vr} AND c = {vc})
         OR (pv = 1 AND r >= {lo} AND r < {hi} AND c >= {lo} AND c < {hi})
       THEN -32768
       ELSE (((sw_lat + 90) * (size - 1) + r) * 31
             + ((sw_lon + 180) * (size - 1) + c) * 17) % 2000 - 1000
  END AS v FROM rc),
coarse AS (
  SELECT tile_key, level, s, size, r // s AS cr, c // s AS cc, max(v) AS cv
  FROM base CROSS JOIN lv
  GROUP BY tile_key, level, s, size, cr, cc)
SELECT tile_key, CAST(level AS INT) AS level,
  CAST((size + s - 1) // s AS INT) AS width,
  CAST(count(*) FILTER (WHERE cv = -32768) AS BIGINT) AS n_void,
  CAST(coalesce(sum(cv) FILTER (WHERE cv <> -32768), 0) AS BIGINT)
    AS sum_elev,
  CAST(min(cv) FILTER (WHERE cv <> -32768) AS BIGINT) AS min_elev,
  CAST(max(cv) FILTER (WHERE cv <> -32768) AS BIGINT) AS max_elev
FROM coarse GROUP BY tile_key, level, s, size"""


# --- cross-tile mosaic (r6) --------------------------------------------------
# Six crafted 1-degree neighbors in two parent cells: (56,10) is a FULL
# 2x2 group; (58,10) holds only its SW and NE quadrants, so the missing
# quadrants' VOID propagation through the block-max is live under the
# gate.  Size 41 (any exact 2*s^2 decodes since the r6 sniff
# generalization) keeps the 11.5M-cell oracle down to ~13k cells.
_MOSAIC_CHILDREN = [(56, 10), (56, 11), (57, 10), (57, 11),
                    (58, 10), (59, 11)]
_MOSAIC_SIZE = 41


def _mosaic_tiles_df(spark: SparkSession) -> DataFrame:
    from .sources.tiles import TILES_SCHEMA
    rows = []
    for la, lo in _MOSAIC_CHILDREN:
        grid = fixtures.tile_grid(la, lo, _MOSAIC_SIZE)
        rows.append((f"N{la:02d}E{lo:03d}", None, None, None, la, lo,
                     _MOSAIC_SIZE, "hgt",
                     bytearray(fixtures.encode_tile(grid, "hgt"))))
    return spark.createDataFrame(rows, schema=TILES_SCHEMA)


def q_tile_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tile 2x2 mosaic level (r6): neighbors assemble by parent
    cell (shared SRTM edges overlap), block-max-halve to child
    resolution — the z-1 pyramid level that MUST shuffle (≤4 tile blobs
    per group, the minimum data motion for the semantics)."""
    from .operators.raster import tile_mosaic_stats
    return tile_mosaic_stats(_mosaic_tiles_df(spark))


def _tile_mosaic_oracle() -> str:
    n = _MOSAIC_SIZE - 1
    vr, vc = fixtures.VOID_NODE
    ch = ", ".join(
        f"({la - (la % 2)}, {lo - (lo % 2)}, {la % 2}, {lo % 2})"
        for la, lo in _MOSAIC_CHILDREN)
    return f"""WITH ch(plat, plon, dlat, dlon) AS (VALUES {ch}),
p AS (SELECT DISTINCT plat, plon FROM ch),
rr AS (SELECT plat, plon, unnest(range(0, {2 * n + 1})) AS r FROM p),
rc AS (SELECT plat, plon, r, unnest(range(0, {2 * n + 1})) AS c FROM rr),
cov AS (SELECT g.plat, g.plon, g.r, g.c,
    max(CASE WHEN ch.dlat IS NOT NULL THEN 1 ELSE 0 END) AS covered,
    max(CASE WHEN g.r = ch.dlat * {n} + {vr}
              AND g.c = ch.dlon * {n} + {vc} THEN 1 ELSE 0 END) AS voided
  FROM rc g LEFT JOIN ch ON g.plat = ch.plat AND g.plon = ch.plon
    AND g.r >= ch.dlat * {n} AND g.r <= ch.dlat * {n} + {n}
    AND g.c >= ch.dlon * {n} AND g.c <= ch.dlon * {n} + {n}
  GROUP BY g.plat, g.plon, g.r, g.c),
base AS (SELECT plat, plon, r, c,
    CASE WHEN covered = 0 OR voided = 1 THEN -32768
         ELSE (((plat + 90) * {n} + r) * 31
               + ((plon + 180) * {n} + c) * 17) % 2000 - 1000
    END AS v FROM cov),
coarse AS (SELECT plat, plon, r // 2 AS cr, c // 2 AS cc, max(v) AS cv
           FROM base GROUP BY plat, plon, cr, cc),
nch AS (SELECT plat, plon, CAST(count(*) AS INT) AS n_children
        FROM ch GROUP BY plat, plon)
SELECT 'N' || lpad(CAST(plat AS VARCHAR), 2, '0')
       || 'E' || lpad(CAST(plon AS VARCHAR), 3, '0') AS parent_key,
  n_children, CAST({_MOSAIC_SIZE} AS INT) AS width,
  CAST(count(*) FILTER (WHERE cv = -32768) AS BIGINT) AS n_void,
  CAST(coalesce(sum(cv) FILTER (WHERE cv <> -32768), 0) AS BIGINT)
    AS sum_elev,
  CAST(min(cv) FILTER (WHERE cv <> -32768) AS BIGINT) AS min_elev,
  CAST(max(cv) FILTER (WHERE cv <> -32768) AS BIGINT) AS max_elev
FROM coarse JOIN nch USING (plat, plon)
GROUP BY plat, plon, n_children"""


def q_resumable_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="sparkgraft_resume_")
    out, man = os.path.join(base, "out"), os.path.join(base, "manifest")
    pts = _derived_points(spark, sf_dir)
    tiles = fixture_tiles_df(spark)

    def job(pending: DataFrame) -> DataFrame:
        return enrich_points(pending, tiles, strategy="broadcast")

    # group_size exercises the incremental write+mark rounds under the gate
    first = run_resumable(job, pts, out, man, key_cols=["pid"], n_buckets=16,
                          group_size=8)
    second = run_resumable(job, pts, out, man, key_cols=["pid"], n_buckets=16,
                           group_size=8)
    # gate-critical invariants: raise (assert would vanish under python -O)
    if not first["processed"] or second["processed"]:
        raise RuntimeError(f"resume broken: first={first} second={second}")
    if len(second["skipped"]) != len(first["processed"]):
        raise RuntimeError(f"manifest incomplete: first={first} second={second}")
    return (spark.read.parquet(out)
            .select("pid", "tile_key", "lat", "lon", "elevation", "status"))


WATERSHED_SIZE = 241  # derived analysis tile: big enough for ~12k-node
# basin structure, small enough that the oracle's 8 doubling-round
# self-joins replay in seconds (the full 1201 fixture measured ~3 min)
WATERSHED_KEY = "N57E011"
WATERSHED_SW = (57, 11)


def q_tile_watershed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 watershed delineation census (r7): pointer-doubling basin
    labels over a derived 241² analysis tile of the closed-form lattice
    DEM (clean grid — void exclusion is pinned by the other raster rows
    and the operator's pytest).  The oracle rebuilds drops, the
    clockwise tie CASE, terminal/outlet pointers, and EVERY doubling
    round as self-joins — the full 256-step closure trajectory sits
    under the hash."""
    import numpy as np

    from . import kernels
    from .operators.raster import tile_watershed_stats
    sw_lat, sw_lon = WATERSHED_SW
    grid = fixtures.tile_grid(sw_lat, sw_lon, WATERSHED_SIZE,
                              plant_void=False)
    data = kernels.encode_hgt(grid.astype(np.int16))
    tiles = spark.createDataFrame(
        [(WATERSHED_KEY, "hgt", bytearray(data))],
        "tile_key string, encoding string, data binary")
    return tile_watershed_stats(tiles)


def _tile_watershed_oracle() -> str:
    from .operators.raster import WATERSHED_ROUNDS, _FLOW_DIRS
    size = WATERSHED_SIZE
    sw_lat, sw_lon = WATERSHED_SW
    drops = ",\n  ".join(
        f"zc - (((gr0 + r + {dr}) * 31 + (gc0 + c + {dc}) * 17) % 2000)"
        f" AS d_{n[2:]}" for n, dr, dc in _FLOW_DIRS)
    mx = "greatest(" + ", ".join(f"d_{n[2:]}" for n, _, _ in _FLOW_DIRS) + ")"
    tr_case = ("CASE WHEN mx <= 0 THEN NULL " + " ".join(
        f"WHEN d_{n[2:]} = mx THEN r + ({dr})"
        for n, dr, _ in _FLOW_DIRS) + " END")
    tc_case = ("CASE WHEN mx <= 0 THEN NULL " + " ".join(
        f"WHEN d_{n[2:]} = mx THEN c + ({dc})"
        for n, _, dc in _FLOW_DIRS) + " END")
    rounds = []
    for k in range(1, int(WATERSHED_ROUNDS) + 1):
        prev = "e0" if k == 1 else f"t{k - 1}"
        rounds.append(f"t{k} AS (SELECT a.id, b.ptr FROM {prev} a "
                      f"JOIN {prev} b ON b.id = a.ptr)")
    last = f"t{int(WATERSHED_ROUNDS)}"
    return f"""WITH t(tile_key, sw_lat, sw_lon, size) AS
  (VALUES ('{WATERSHED_KEY}', {sw_lat}, {sw_lon}, {size})),
rr AS (SELECT *, unnest(range(1, size - 1)) AS r FROM t),
rc AS (SELECT *, unnest(range(1, size - 1)) AS c FROM rr),
zz AS (SELECT tile_key, size, r, c,
  (sw_lat + 90) * (size - 1) AS gr0, (sw_lon + 180) * (size - 1) AS gc0,
  (((sw_lat + 90) * (size - 1) + r) * 31
   + ((sw_lon + 180) * (size - 1) + c) * 17) % 2000 AS zc
  FROM rc),
g AS (SELECT tile_key, size, r, c, {drops} FROM zz),
m AS (SELECT *, {mx} AS mx FROM g),
d AS (SELECT tile_key, size, r, c, r * size + c AS id, mx,
      {tr_case} AS tr, {tc_case} AS tc FROM m),
e0 AS (SELECT d.id,
       CASE WHEN nt.id IS NULL THEN d.id ELSE nt.id END AS ptr, d.mx
       FROM d LEFT JOIN d nt ON nt.r = d.tr AND nt.c = d.tc),
{','.join(rounds)},
basins AS (SELECT ptr AS root, count(*) AS bn FROM {last} GROUP BY ptr),
cls AS (SELECT e0.id AS root,
        CASE WHEN e0.mx <= 0 THEN 'pit'
             WHEN e0.ptr = e0.id THEN 'drain' ELSE 'open' END AS klass
        FROM e0)
SELECT '{WATERSHED_KEY}' AS tile_key,
  CAST(sum(bn) AS BIGINT) AS n_nodes,
  CAST(count(*) AS BIGINT) AS n_basins,
  CAST(count(*) FILTER (WHERE klass = 'pit') AS BIGINT) AS n_pit_basins,
  CAST(count(*) FILTER (WHERE klass = 'drain') AS BIGINT)
    AS n_outlet_basins,
  CAST(count(*) FILTER (WHERE klass = 'open') AS BIGINT) AS n_open_basins,
  CAST(max(bn) AS BIGINT) AS largest_basin
FROM basins JOIN cls USING (root)"""


SPARK_QUERIES = {
    "raster_points": q_raster_points,
    "tile_slope": q_tile_slope,
    "tile_aspect": q_tile_aspect,
    "tile_terrain": q_tile_terrain,
    "tile_tri": q_tile_tri,
    "tile_flowdir": q_tile_flowdir,
    "tile_flowacc": q_tile_flowacc,
    "tile_contour": q_tile_contour,
    "tile_viewshed": q_tile_viewshed,
    "tile_pyramid": q_tile_pyramid,
    "tile_mosaic": q_tile_mosaic,
    "tile_watershed": q_tile_watershed,
    "resumable_enrich": q_resumable_enrich,
}
ORACLES = {
    "raster_points": _raster_points_oracle(),
    "tile_slope": _tile_slope_oracle(),
    "tile_aspect": _tile_aspect_oracle(),
    "tile_terrain": _tile_terrain_oracle(),
    "tile_tri": _tile_tri_oracle(),
    "tile_flowdir": _tile_flowdir_oracle(),
    "tile_flowacc": _tile_flowacc_oracle(),
    "tile_contour": _tile_contour_oracle(),
    "tile_viewshed": _tile_viewshed_oracle(),
    "tile_pyramid": _tile_pyramid_oracle(),
    "tile_mosaic": _tile_mosaic_oracle(),
    "tile_watershed": _tile_watershed_oracle(),
    "resumable_enrich": _BILINEAR_ORACLE,
}

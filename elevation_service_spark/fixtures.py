"""Deterministic test fixtures (FIXTURES.md). Pure functions of (seed, sf).

No Spark imports — everything returns plain python/numpy; Spark DataFrame
construction lives in the operators/tests.

DEM ground truth (shared by fixtures, pytest goldens, and the DuckDB oracle
SQL in __spark_entry__.py):

    gi = (sw_lat + 90) * (size - 1) + row        # global lattice row
    gj = (sw_lon + 180) * (size - 1) + col       # global lattice col
    elev(gi, gj) = ((gi * 31 + gj * 17) % 2000) - 1000     # int16 meters

Pure integer arithmetic -> bit-identical in numpy, scalar python, Spark SQL
and DuckDB SQL (no libm involvement).  Adjacent same-size tiles share edge
values by construction.  One void sample (-32768) is planted at grid node
(row=10, col=10) of every tile to pin void pass-through semantics.
"""

from __future__ import annotations

import gzip
import json
import random

import numpy as np

from . import kernels

SEED = 42
VOID_NODE = (10, 10)

# (tile_key, sw_lat, sw_lon, size, encoding) — encoding used by tiles_rows().
# Edge cases per FIXTURES.md §2: S/W hemispheres, negative-fraction floor,
# antimeridian-adjacent, one SRTM1-size tile for size sniffing.
FIXTURE_TILES = [
    ("N57E011", 57, 11, 1201, "hgt"),        # the node-hgt fixture identity
    ("S34W071", -34, -71, 1201, "hgt.gz"),
    ("N00E000", 0, 0, 3601, "hgt"),          # exercises SRTM1 size sniff
    ("S01W001", -1, -1, 1201, "terrarium-png"),
    ("N59E179", 59, 179, 1201, "terrarium-png"),
]
# hot tile for skew fixtures (~50% of planted points land here)
HOT_TILE = "N57E011"
# deliberately missing from the tile table -> status TILE_MISSING
MISSING_TILE = ("N10E010", 10, 10)
# corrupt byte length -> status BAD_TILE
BAD_TILE = ("N20E020", 20, 20)


def dem_value(gi, gj):
    """Closed-form DEM sample at global lattice node (gi, gj). Int math only."""
    gi = np.asarray(gi, dtype=np.int64)
    gj = np.asarray(gj, dtype=np.int64)
    return ((gi * 31 + gj * 17) % 2000) - 1000


def tile_grid(sw_lat: int, sw_lon: int, size: int, plant_void: bool = True) -> np.ndarray:
    """South-origin int16 grid for one tile, sampled from the closed form."""
    n = size - 1
    rows = (np.int64(sw_lat) + 90) * n + np.arange(size, dtype=np.int64)
    cols = (np.int64(sw_lon) + 180) * n + np.arange(size, dtype=np.int64)
    grid = dem_value(rows[:, None], cols[None, :]).astype(np.int16)
    if plant_void:
        grid[VOID_NODE] = kernels.VOID
    return grid


def encode_tile(grid: np.ndarray, encoding: str) -> bytes:
    if encoding == "hgt":
        return kernels.encode_hgt(grid)
    if encoding == "hgt.gz":
        return gzip.compress(kernels.encode_hgt(grid), 6)
    if encoding == "terrarium-png":
        return kernels.encode_terrarium_png(grid)
    raise ValueError(encoding)


_TILES_ROWS_CACHE: dict = {}


def tiles_rows(encodings: dict[str, str] | None = None,
               include_bad: bool = False,
               mercator_z: int = 10) -> list[dict]:
    """Rows of the terrain_tiles table (FIXTURES.md §2).

    encodings: optional override {tile_key: encoding}; default per
    FIXTURE_TILES (mixed encodings so every decode path is exercised).
    Memoized — encoding a 3601^2 tile to PNG costs seconds.
    """
    ck = (tuple(sorted(encodings.items())) if encodings else None,
          include_bad, mercator_z)
    if ck in _TILES_ROWS_CACHE:
        return _TILES_ROWS_CACHE[ck]
    rows = []
    for key, sw_lat, sw_lon, size, enc in FIXTURE_TILES:
        enc = (encodings or {}).get(key, enc)
        grid = tile_grid(sw_lat, sw_lon, size)
        x, y = kernels.mercator_xy(np.array([sw_lat + 0.5]), np.array([sw_lon + 0.5]), mercator_z)
        rows.append({
            "tile_key": key, "z": mercator_z, "x": int(x[0]), "y": int(y[0]),
            "sw_lat": sw_lat, "sw_lon": sw_lon, "size": size,
            "encoding": enc, "data": encode_tile(grid, enc),
        })
    if include_bad:
        key, sw_lat, sw_lon = BAD_TILE
        x, y = kernels.mercator_xy(np.array([sw_lat + 0.5]), np.array([sw_lon + 0.5]), mercator_z)
        rows.append({
            "tile_key": key, "z": mercator_z, "x": int(x[0]), "y": int(y[0]),
            "sw_lat": sw_lat, "sw_lon": sw_lon, "size": 1201,
            "encoding": "hgt", "data": b"\x00" * 1000,  # Unknown tile format
        })
    _TILES_ROWS_CACHE[ck] = rows
    return rows


# ---------------------------------------------------------------------------
# web_pages — graft input table (BASELINE.json § input_hint shape, exact)
# ---------------------------------------------------------------------------

_VOCAB = ("the a hill valley river map survey terrain north south mountain "
          "pass trail elevation data old new near far stone lake ridge "
          "forest town road bridge peak").split()

# Decoys that must NOT yield coordinates (FIXTURES.md §1): version numbers,
# prices, out-of-range pairs (123.4, 567.8 also fails the >=3-decimals rule),
# and an out-of-range-lat 4-decimal pair that exercises the range filter.
_DECOYS = [
    "version 1.2, 3.4.5 released",
    "price $12.99 only",
    "dims 123.4, 567.8 mm",
    "bogus 91.1234, 12.3456 pair",
]


def _fmt_mentions(lat: float, lon: float) -> list[str]:
    """The four planted coordinate formats (these strings ARE the extractor
    regex spec)."""
    return [
        f"{lat:.4f}, {lon:.4f}",
        f"lat={lat:.4f};lon={lon:.4f}",
        f"geo:{lat:.4f},{lon:.4f}",
        '{"type":"Point","coordinates":[%.4f,%.4f]}' % (lon, lat),
    ]


def _rand_point(rng: random.Random, hot_share: float = 0.5) -> tuple[float, float]:
    """A point inside a fixture tile; HOT_TILE gets ~hot_share of them.
    Fractions kept in [0.02, 0.98] so the planted void node and tile edges
    never participate in interpolation (keeps goldens closed-form)."""
    if rng.random() < hot_share:
        key = HOT_TILE
    else:
        key = rng.choice([t[0] for t in FIXTURE_TILES if t[0] != HOT_TILE])
    sw = {t[0]: (t[1], t[2]) for t in FIXTURE_TILES}[key]
    lat = sw[0] + round(rng.uniform(0.02, 0.98), 4)
    lon = sw[1] + round(rng.uniform(0.02, 0.98), 4)
    return round(lat, 4), round(lon, 4)


def pages_rows(n_pages: int = 200, seed: int = SEED,
               missing_tile_every: int = 37) -> tuple[list[dict], list[dict]]:
    """(pages, expected_coords golden).

    pages: url, warc_ts (epoch seconds + i*3600), html, text, lang.
    expected_coords: url, point_idx, lat, lon, matched (byte-identical
    matched substring — the per-row invariant of BASELINE.json input_hint).
    """
    rng = random.Random(seed)
    langs = ["en", "de", "fr", "es", "zh"]
    pages, golden = [], []
    for i in range(n_pages):
        url = f"https://example.org/page/{i}"
        n_coords = rng.randint(0, 5)
        parts, mentions = [], []
        for j in range(n_coords):
            if missing_tile_every and i % missing_tile_every == 0 and j == 0:
                lat = MISSING_TILE[1] + round(rng.uniform(0.02, 0.98), 4)
                lon = MISSING_TILE[2] + round(rng.uniform(0.02, 0.98), 4)
                lat, lon = round(lat, 4), round(lon, 4)
            else:
                lat, lon = _rand_point(rng)
            m = _fmt_mentions(lat, lon)[rng.randrange(4)]
            mentions.append((m, lat, lon))
        n_decoys = rng.randint(0, 2)
        fragments = ([(" ".join(rng.choices(_VOCAB, k=rng.randint(3, 10))), None)
                      for _ in range(n_coords + n_decoys + 1)])
        for m in mentions:
            fragments.insert(rng.randrange(len(fragments) + 1), (m[0], m))
        for _ in range(n_decoys):
            fragments.insert(rng.randrange(len(fragments) + 1), (rng.choice(_DECOYS), None))
        text = " ".join(f[0] for f in fragments)
        # golden order = order of appearance in text (extraction contract)
        planted = sorted((text.index(f[0]), f[1]) for f in fragments if f[1])
        for idx, (_, (m, lat, lon)) in enumerate(planted):
            golden.append({"url": url, "point_idx": idx, "lat": lat, "lon": lon,
                           "matched": m})
        pages.append({
            "url": url,
            "warc_ts": 1700000000 + i * 3600,
            "html": f"<html><body>{text}</body></html>".encode(),
            "text": text,
            "lang": langs[i % len(langs)],
        })
    return pages, golden


# ---------------------------------------------------------------------------
# geojson_docs — coordinate-augmentation cases (FIXTURES.md §4)
# ---------------------------------------------------------------------------


def geojson_docs() -> list[dict]:
    p = [11.9123, 57.7456]          # [lon, lat] inside N57E011
    p2 = [11.5, 57.5]
    p3 = [-70.5, -33.5]             # S34W071
    line = [[11.1, 57.1], [11.2, 57.2], [11.3, 57.3]]
    ring = [[11.1, 57.1], [11.6, 57.1], [11.6, 57.6], [11.1, 57.6], [11.1, 57.1]]
    hole = [[11.2, 57.2], [11.4, 57.2], [11.4, 57.4], [11.2, 57.4], [11.2, 57.2]]
    docs = [
        ("point", {"type": "Point", "coordinates": p}),
        ("multipoint", {"type": "MultiPoint", "coordinates": [p, p2]}),
        ("linestring", {"type": "LineString", "coordinates": line}),
        ("multilinestring", {"type": "MultiLineString", "coordinates": [line, [p2, p3]]}),
        ("polygon_hole", {"type": "Polygon", "coordinates": [ring, hole]}),
        ("multipolygon", {"type": "MultiPolygon", "coordinates": [[ring], [[p3, [-70.4, -33.5], [-70.4, -33.4], p3]]]}),
        ("geometrycollection", {"type": "GeometryCollection",
                                "geometries": [{"type": "Point", "coordinates": p},
                                               {"type": "LineString", "coordinates": line}]}),
        ("feature", {"type": "Feature", "properties": {"name": "x", "keep": 1},
                     "geometry": {"type": "Point", "coordinates": p}}),
        ("featurecollection", {"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {}, "geometry": {"type": "Point", "coordinates": p2}},
            {"type": "Feature", "properties": {"a": "b"},
             "geometry": {"type": "Polygon", "coordinates": [ring]}},
        ]}),
        ("empty_fc", {"type": "FeatureCollection", "features": []}),
    ]
    rows = [{"url": f"geojson://{name}", "geojson": json.dumps(doc, separators=(",", ":"), sort_keys=True)}
            for name, doc in docs]
    rows.append({"url": "geojson://invalid_json", "geojson": "{not json"})
    rows.append({"url": "geojson://non_geojson", "geojson": '{"hello":"world"}'})
    return rows


# ---------------------------------------------------------------------------
# polygons — point-in-polygon fixtures (FIXTURES.md §5)
# ---------------------------------------------------------------------------


def polygons_rows() -> list[dict]:
    def poly(poly_id, rings):
        xs = [x for ring in rings for x, _ in ring]
        ys = [y for ring in rings for _, y in ring]
        return {"poly_id": poly_id,
                "geojson": json.dumps({"type": "Polygon", "coordinates": rings},
                                      separators=(",", ":")),
                "minx": min(xs), "miny": min(ys), "maxx": max(xs), "maxy": max(ys)}
    return [
        # contains the hot tile N57E011
        poly("hot_box", [[[10.9, 56.9], [12.1, 56.9], [12.1, 58.1], [10.9, 58.1], [10.9, 56.9]]]),
        # with a hole
        poly("holed", [[[11.0, 57.0], [12.0, 57.0], [12.0, 58.0], [11.0, 58.0], [11.0, 57.0]],
                       [[11.4, 57.4], [11.6, 57.4], [11.6, 57.6], [11.4, 57.6], [11.4, 57.4]]]),
        # crosses lon=0
        poly("greenwich", [[[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5]]]),
        # triangle (non-rectangular edges for the ray-cast)
        poly("tri", [[[-71.0, -34.0], [-70.0, -34.0], [-70.5, -33.0], [-71.0, -34.0]]]),
    ]

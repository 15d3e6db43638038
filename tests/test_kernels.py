"""M0 golden tests: pure-numpy kernels vs an independent scalar reference
implementation (math module, row-at-a-time — mirrors the JS code shape from
elevation-service/hgt.js; see SURVEY.md §5.2)."""

import gzip
import math

import numpy as np
import pytest

from elevation_service_spark import fixtures, kernels


# --- independent scalar reference (deliberately NOT numpy) -----------------

def ref_bilinear(grid, lat, lon, sw_lat, sw_lon):
    size = grid.shape[0]
    n = size - 1
    row = (lat - sw_lat) * n
    col = (lon - sw_lon) * n
    if row < 0 or col < 0 or row > n or col > n:
        raise ValueError("outside tile bounds")
    row_low, col_low = math.floor(row), math.floor(col)
    row_hi, col_hi = min(row_low + 1, n), min(col_low + 1, n)
    rf, cf = row - row_low, col - col_low
    def g(r, c):
        return float(grid[r, c])
    avg = lambda v1, v2, f: v1 + (v2 - v1) * f
    v1 = avg(g(row_low, col_low), g(row_low, col_hi), cf)
    v2 = avg(g(row_hi, col_low), g(row_hi, col_hi), cf)
    return avg(v1, v2, rf)


def ref_dem(sw_lat, sw_lon, size, r, c):
    gi = (sw_lat + 90) * (size - 1) + r
    gj = (sw_lon + 180) * (size - 1) + c
    return ((gi * 31 + gj * 17) % 2000) - 1000


# --- HGT codec --------------------------------------------------------------

def test_hgt_roundtrip_and_size_sniff():
    for size in (1201, 3601):
        grid = fixtures.tile_grid(57, 11, size)
        data = kernels.encode_hgt(grid)
        assert len(data) == size * size * 2
        assert kernels.hgt_size_for_bytes(len(data)) == size
        back = kernels.decode_hgt(data)
        np.testing.assert_array_equal(back, grid)
    with pytest.raises(ValueError, match="Unknown tile format"):
        kernels.hgt_size_for_bytes(1000)
    # ADVICE r6: ingest keeps the reference's strict two-size sniff — a
    # truncated blob landing on 2*s^2 bytes (800 = 2*20^2) must NOT decode
    # unless the caller opts in to overview sizes (pyramid/mosaic outputs)
    with pytest.raises(ValueError, match="Unknown tile format"):
        kernels.hgt_size_for_bytes(800)
    assert kernels.hgt_size_for_bytes(800, allow_overview=True) == 20
    with pytest.raises(ValueError, match="Unknown tile format"):
        kernels.hgt_size_for_bytes(802, allow_overview=True)


def test_hgt_row_flip_north_first_on_disk():
    # File stores rows north-first: first int16 of the file must be the NW
    # corner = south-origin grid[size-1, 0].
    grid = fixtures.tile_grid(0, 0, 1201)
    data = kernels.encode_hgt(grid)
    first = int.from_bytes(data[:2], "big", signed=True)
    assert first == int(grid[1200, 0])


# --- bilinear / nearest golden vs scalar reference ---------------------------

def test_bilinear_matches_scalar_reference_bit_exactly():
    grid = fixtures.tile_grid(57, 11, 1201)
    rng = np.random.default_rng(42)
    lat = 57 + rng.uniform(0.001, 0.999, 500)
    lon = 11 + rng.uniform(0.001, 0.999, 500)
    elev, ok = kernels.lookup_elevation(grid, 57, 11, lat, lon)
    assert ok.all()
    expected = [ref_bilinear(grid, la, lo, 57, 11) for la, lo in zip(lat, lon)]
    # bit-exact: same float64 op order
    np.testing.assert_array_equal(elev, np.array(expected))


def test_grid_node_lookup_equals_raw_sample():
    grid = fixtures.tile_grid(57, 11, 1201)
    n = 1200
    for r, c in [(0, 0), (5, 7), (600, 600), (1199, 3)]:
        lat, lon = 57 + r / n, 11 + c / n
        elev, ok = kernels.lookup_elevation(grid, 57, 11, np.array([lat]), np.array([lon]))
        # exact-node interpolation: fracs may be ~1e-13 from division, so
        # use exact rational nodes only when representable
    # exact representable nodes (r/n where division is exact in binary): use r multiples of 75 (1200 = 2^4*75)
    for r in (0, 300, 600, 900, 1200):
        for c in (0, 300, 600, 1200):
            lat, lon = 57 + r / n, 11 + c / n
            elev, ok = kernels.lookup_elevation(grid, 57, 11, np.array([lat]), np.array([lon]))
            assert ok[0]
            assert elev[0] == float(grid[r, c])


def test_bilinear_bounded_by_corners_property():
    grid = fixtures.tile_grid(-34, -71, 1201)
    rng = np.random.default_rng(7)
    lat = -34 + rng.uniform(0, 1, 1000)
    lon = -71 + rng.uniform(0, 1, 1000)
    elev, ok = kernels.lookup_elevation(grid, -34, -71, lat, lon)
    n = 1200
    row = (lat + 34) * n
    col = (lon + 71) * n
    rl, cl = np.floor(row).astype(int), np.floor(col).astype(int)
    rh, ch = np.minimum(rl + 1, n), np.minimum(cl + 1, n)
    corners = np.stack([grid[rl, cl], grid[rl, ch], grid[rh, cl], grid[rh, ch]]).astype(float)
    assert (elev >= corners.min(axis=0) - 1e-9).all()
    assert (elev <= corners.max(axis=0) + 1e-9).all()


def test_out_of_bounds_returns_nan_not_throw():
    grid = fixtures.tile_grid(57, 11, 1201)
    elev, ok = kernels.lookup_elevation(grid, 57, 11, np.array([58.5, 56.9]), np.array([11.5, 11.5]))
    assert not ok[0] and not ok[1]
    assert np.isnan(elev).all()


def test_nearest_neighbour_half_up_rounding():
    grid = fixtures.tile_grid(57, 11, 1201)
    # exact .5 frac -> JS Math.round is half-UP -> node 601 (np.rint would
    # give half-even 600; the kernel must match JS)
    elev = kernels.nearest_grid(grid, np.array([600.5]), np.array([300.0]))
    assert elev[0] == float(grid[601, 300])
    elev = kernels.nearest_grid(grid, np.array([600.4]), np.array([300.6]))
    assert elev[0] == float(grid[600, 301])


def test_void_passthrough():
    grid = fixtures.tile_grid(57, 11, 1201)
    assert grid[10, 10] == kernels.VOID
    n = 1200
    elev, _ = kernels.lookup_elevation(grid, 57, 11,
                                       np.array([57 + 10 / n]), np.array([11 + 10 / n]))
    # interpolation at/near the void node involves the raw -32768 value
    assert elev[0] < -30000


# --- tile keys ----------------------------------------------------------------

@pytest.mark.parametrize("lat,lon,key", [
    (57.7, 11.9, "N57E011"),
    (-33.5, -70.5, "S34W071"),
    (0.5, 0.5, "N00E000"),
    (-0.5, -0.5, "S01W001"),     # floor before sign test
    (-0.0001, -0.0001, "S01W001"),
    (59.9, 179.9, "N59E179"),
    (1.0, 11.0, "N01E011"),      # exact integer lat/lon belongs to its own SW tile
])
def test_skadi_key(lat, lon, key):
    assert kernels.skadi_key(lat, lon) == key


def test_skadi_path():
    assert kernels.skadi_path(57.7, 11.9) == "N57/N57E011.hgt.gz"


def test_mercator_xy_known_values():
    # z=0: everything in tile (0,0)
    x, y = kernels.mercator_xy(np.array([57.7]), np.array([11.9]), 0)
    assert (x[0], y[0]) == (0, 0)
    # z=1: NE quadrant
    x, y = kernels.mercator_xy(np.array([57.7]), np.array([11.9]), 1)
    assert (x[0], y[0]) == (1, 0)
    # Gothenburg at z=10 (known slippy-map values)
    x, y = kernels.mercator_xy(np.array([57.7]), np.array([11.9]), 10)
    assert (x[0], y[0]) == (545, 310)


def test_cell_id_pack_unpack_and_ring():
    cid = int(kernels.cell_id(10, np.int64(545), np.int64(311))[()] if isinstance(kernels.cell_id(10, np.int64(545), np.int64(311)), np.ndarray) else kernels.cell_id(10, np.int64(545), np.int64(311)))
    z, x, y = kernels.cell_unpack(cid)
    assert (z, x, y) == (10, 545, 311)
    ring = kernels.k_ring(cid, 1)
    assert len(ring) == 9
    assert cid in ring
    # parent relationship: z-1 cell via x>>1, y>>1
    parent = kernels.cell_id(9, np.int64(545 >> 1), np.int64(311 >> 1))
    assert kernels.cell_unpack(int(parent))[0] == 9


# --- terrarium PNG codec -------------------------------------------------------

def test_terrarium_rgb_roundtrip_int16():
    elev = np.array([[-32768, 0, 1], [8848, -100, 2000]], dtype=np.int16)
    rgb = kernels.terrarium_rgb(elev)
    back = kernels.terrarium_decode_rgb(rgb)
    np.testing.assert_array_equal(back, elev.astype(np.float64))


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    data = kernels.encode_png_rgb(img)
    back = kernels.decode_png_rgb(data)
    np.testing.assert_array_equal(back, img)
    # decode must handle filter types 1-4 too: build raws manually
    import struct as _s
    import zlib as _z
    h, w = 8, 5
    base = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
    # encode with per-row filter cycling 0..4 (reference encoder semantics)
    raw = bytearray()
    prev = np.zeros(w * 3, np.int32)
    for y in range(h):
        f = y % 5
        line = base[y].astype(np.int32)
        enc = line.copy()
        if f == 1:
            for i in range(w * 3 - 1, 2, -1):
                enc[i] = (line[i] - line[i - 3]) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            for i in range(w * 3):
                a = line[i - 3] if i >= 3 else 0
                enc[i] = (line[i] - ((a + prev[i]) >> 1)) % 256
        elif f == 4:
            for i in range(w * 3):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + kernels._chunk(b"IHDR", ihdr)
           + kernels._chunk(b"IDAT", _z.compress(bytes(raw)))
           + kernels._chunk(b"IEND", b""))
    back2 = kernels.decode_png_rgb(png)
    np.testing.assert_array_equal(back2.reshape(h, w * 3), base)


def test_terrarium_png_tile_roundtrip():
    grid = fixtures.tile_grid(-1, -1, 1201)
    png = kernels.encode_terrarium_png(grid)
    back = kernels.decode_terrarium_png(png)
    np.testing.assert_array_equal(back, grid.astype(np.float64))


def test_encode_tile_gz():
    grid = fixtures.tile_grid(57, 11, 1201)
    gz = fixtures.encode_tile(grid, "hgt.gz")
    np.testing.assert_array_equal(kernels.decode_hgt(gzip.decompress(gz)), grid)


# --- geometry -------------------------------------------------------------------

def test_haversine_known_distance():
    # Gothenburg -> Stockholm ~ 398 km
    d = kernels.haversine_m(np.array([57.7089]), np.array([11.9746]),
                            np.array([59.3293]), np.array([18.0686]))
    assert 390_000 < d[0] < 410_000
    assert kernels.haversine_m(np.array([1.0]), np.array([2.0]),
                               np.array([1.0]), np.array([2.0]))[0] == 0.0


def test_point_in_polygon_with_hole():
    rings = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]),
             np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]])]
    lat = np.array([0.5, 2.0, 3.5, 5.0, 0.5])
    lon = np.array([0.5, 2.0, 3.5, 5.0, 3.5])
    res = kernels.point_in_polygon(lat, lon, rings)
    assert res.tolist() == [True, False, True, False, True]


def test_point_in_triangle():
    tri = np.array([[-71.0, -34.0], [-70.0, -34.0], [-70.5, -33.0]])
    res = kernels.point_in_ring(np.array([-33.8, -33.1, -34.1]),
                                np.array([-70.5, -70.9, -70.5]), tri)
    assert res.tolist() == [True, False, False]


# --- fixtures sanity ---------------------------------------------------------------

def test_dem_adjacent_tiles_share_edges():
    a = fixtures.tile_grid(57, 11, 1201, plant_void=False)
    b = fixtures.tile_grid(58, 11, 1201, plant_void=False)   # tile to the north
    np.testing.assert_array_equal(a[1200, :], b[0, :])
    c = fixtures.tile_grid(57, 12, 1201, plant_void=False)   # tile to the east
    np.testing.assert_array_equal(a[:, 1200], c[:, 0])


def test_dem_matches_scalar_formula():
    g = fixtures.tile_grid(-34, -71, 1201, plant_void=False)
    for r, c in [(0, 0), (17, 1200), (1200, 1200), (599, 601)]:
        assert g[r, c] == ref_dem(-34, -71, 1201, r, c)


def test_pages_deterministic_and_golden_consistent():
    p1, g1 = fixtures.pages_rows(50)
    p2, g2 = fixtures.pages_rows(50)
    assert p1 == p2 and g1 == g2
    # every golden matched string is literally present in its page text
    texts = {p["url"]: p["text"] for p in p1}
    for g in g1:
        assert g["matched"] in texts[g["url"]]
    # point_idx is dense per url starting at 0
    from collections import defaultdict
    per = defaultdict(list)
    for g in g1:
        per[g["url"]].append(g["point_idx"])
    for idxs in per.values():
        assert idxs == list(range(len(idxs)))


def test_geohash_stages_vs_independent_impl():
    """Staged SQL geohash vs an independent pure-Python bit-twiddling
    encoder, plus the canonical public test vector and range boundaries
    (clamping at lat=90 / lon=180, negative coordinates)."""
    import duckdb

    from elevation_service_spark.functions.keys import (
        GEOHASH_BASE32, geohash_stages)

    def py_geohash(lat, lon, precision):
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        bits, out = [], []
        even = True
        while len(bits) < 5 * precision:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    bits.append(1); lon_lo = mid
                else:
                    bits.append(0); lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    bits.append(1); lat_lo = mid
                else:
                    bits.append(0); lat_hi = mid
            even = not even
        for c in range(precision):
            v = int("".join(map(str, bits[5 * c:5 * c + 5])), 2)
            out.append(GEOHASH_BASE32[v])
        return "".join(out)

    con = duckdb.connect()

    def sql_geohash(lat, lon, precision):
        st = geohash_stages(repr(lat), repr(lon), precision)
        q = f"""WITH a AS (SELECT {st['lonq']} AS _ghlon, {st['latq']} AS _ghlat),
b AS (SELECT {st['v']} AS _ghv FROM a)
SELECT {st['gh']} FROM b"""
        return con.execute(q).fetchone()[0]

    assert sql_geohash(57.64911, 10.40744, 7) == "u4pruyd"  # public vector
    cases = [(57.64911, 10.40744), (-33.8, 151.2), (0.0, 0.0),
             (-0.0001, -0.0001), (90.0, 180.0), (-90.0, -180.0),
             (89.999999, 179.999999), (-85.05, 12.3456)]
    for p in (1, 5, 7, 9):
        for lat, lon in cases:
            assert sql_geohash(lat, lon, p) == py_geohash(lat, lon, p), \
                (lat, lon, p)

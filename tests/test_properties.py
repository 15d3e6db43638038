"""Property-based tests (hypothesis) for the pure kernels — SURVEY.md §5.2
items: bilinear bounded by corners, node lookups exact, tile-key
containment, codec round trips, PIP vs bbox consistency."""

import gzip

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elevation_service_spark import fixtures, kernels

SMALL = fixtures.tile_grid(57, 11, 1201)

lat_st = st.floats(min_value=-89.999, max_value=89.999,
                   allow_nan=False, allow_infinity=False)
lon_st = st.floats(min_value=-179.999, max_value=179.999,
                   allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_tile_key_names_containing_tile(lat, lon):
    """skadi_key(p) must name the tile whose [sw, sw+1) cell contains p."""
    key = kernels.skadi_key(lat, lon)
    ns, alat, ew, alon = key[0], int(key[1:3]), key[3], int(key[4:7])
    sw_lat = -alat if ns == "S" else alat
    sw_lon = -alon if ew == "W" else alon
    assert sw_lat <= lat < sw_lat + 1
    assert sw_lon <= lon < sw_lon + 1


@settings(max_examples=100, deadline=None)
@given(frac_r=st.floats(0, 0.999999), frac_c=st.floats(0, 0.999999))
def test_bilinear_bounded_by_its_corners(frac_r, frac_c):
    row = np.array([frac_r * 1200.0])
    col = np.array([frac_c * 1200.0])
    out = kernels.bilinear_grid(SMALL, row, col)
    r0, c0 = int(row[0]), int(col[0])
    r1, c1 = min(r0 + 1, 1200), min(c0 + 1, 1200)
    corners = [float(SMALL[r0, c0]), float(SMALL[r0, c1]),
               float(SMALL[r1, c0]), float(SMALL[r1, c1])]
    assert min(corners) - 1e-9 <= out[0] <= max(corners) + 1e-9


@settings(max_examples=50, deadline=None)
@given(r=st.integers(0, 1200), c=st.integers(0, 1200))
def test_exact_node_lookup_equals_sample(r, c):
    out = kernels.bilinear_grid(SMALL, np.array([float(r)]), np.array([float(c)]))
    assert out[0] == float(SMALL[r, c])
    out = kernels.nearest_grid(SMALL, np.array([float(r)]), np.array([float(c)]))
    assert out[0] == float(SMALL[r, c])


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_terrarium_png_roundtrip_random_grids(seed):
    rng = np.random.default_rng(seed)
    grid = rng.integers(-32768, 32768, size=(48, 48), dtype=np.int16)
    # 48x48 is not a valid HGT size but terrarium PNG carries its own dims
    data = kernels.encode_terrarium_png(grid)
    out = kernels.decode_terrarium_png(data)
    np.testing.assert_array_equal(out, grid.astype(np.float64))


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_hgt_gz_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    grid = rng.integers(-32768, 32768, size=(1201, 1201), dtype=np.int16)
    data = gzip.compress(kernels.encode_hgt(grid), 1)
    np.testing.assert_array_equal(kernels.decode_hgt(gzip.decompress(data)), grid)


@settings(max_examples=100, deadline=None)
@given(lat=st.floats(-10, 10), lon=st.floats(-10, 10))
def test_pip_inside_implies_inside_bbox(lat, lon):
    ring = np.array([[-5.0, -3.0], [4.0, -6.0], [7.0, 2.0], [0.0, 8.0],
                     [-6.0, 5.0], [-5.0, -3.0]])
    inside = kernels.point_in_ring(np.array([lat]), np.array([lon]), ring)[0]
    in_bbox = (-6.0 <= lon <= 7.0) and (-6.0 <= lat <= 8.0)
    if inside:
        assert in_bbox
    # clear-outside agreement
    if not in_bbox:
        assert not inside


@settings(max_examples=100, deadline=None)
@given(lat=lat_st, lon=lon_st)
def test_cell_ring_contains_own_cell_and_parent_consistent(lat, lon):
    x, y = kernels.mercator_xy(np.array([lat]), np.array([lon]), 12)
    cid = int(kernels.cell_id(12, x, y)[0])
    ring = kernels.k_ring(cid, 1)
    assert cid in ring and len(ring) in (6, 9)  # clamped at poles
    z, cx, cy = kernels.cell_unpack(cid)
    px, py = kernels.mercator_xy(np.array([lat]), np.array([lon]), 11)
    assert (cx >> 1, cy >> 1) == (int(px[0]), int(py[0]))


# --- GeoJSON walk totality fuzz ---------------------------------------------

import json as _json

from hypothesis import strategies as _st

from elevation_service_spark.operators.geojson import (validated_positions,
                                                       walk_positions)

_json_scalars = _st.one_of(_st.none(), _st.booleans(),
                           _st.integers(-1e6, 1e6),
                           _st.floats(allow_nan=False, allow_infinity=False),
                           _st.text(max_size=8))
_json_values = _st.recursive(
    _json_scalars,
    lambda kids: _st.one_of(_st.lists(kids, max_size=4),
                            _st.dictionaries(_st.text(max_size=6), kids,
                                             max_size=4)),
    max_leaves=12)


@settings(max_examples=300, deadline=None)
@given(obj=_json_values)
def test_geojson_walk_is_total_on_arbitrary_json(obj):
    """The walk + position validation must either return positions or raise
    ValueError/TypeError/KeyError — never crash with anything else and
    never loop forever (op-14 totality: arbitrary web JSON reaches this
    code).  Whatever validated_positions accepts must be fully numeric."""
    try:
        positions = validated_positions(obj)
    except (ValueError, TypeError, KeyError):
        return
    for pos in positions:
        assert isinstance(pos, list) and len(pos) >= 2
        float(pos[0]); float(pos[1])


@settings(max_examples=300, deadline=None)
@given(obj=_json_values)
def test_geojson_walk_raw_never_hard_crashes(obj):
    try:
        list(walk_positions(obj))
    except (ValueError, TypeError, KeyError):
        pass


def test_url_normalize_property_vs_python_reference(spark):
    """r5: url_normalize vs an independent Python re implementation of the
    same rule sequence, over randomized URL shapes (schemes, www, ports,
    utm runs, fragments, trailing slashes, authority lookalikes inside
    queries).  Catches a Spark-regex vs rule-intent divergence the fixed
    gate corpus cannot."""
    import random
    import re

    from pyspark.sql import functions as F

    from elevation_service_spark.operators.web import url_normalize

    def py_norm(url):
        m = re.match(r"^([^/]*//[^/]*)", url)
        pre = m.group(1).lower() if m else ""
        if pre.startswith("http://"):
            pre = re.sub(r":80$", "", pre)
        pre = re.sub(r"^http://www\.", "http://", pre)
        pre = re.sub(r"^https://www\.", "https://", pre)
        rest = re.sub(r"^[^/]*//[^/]*", "", url)
        rest = re.sub(r"#.*$", "", rest)
        rest = re.sub(r"&utm_[^&]*", "", rest)
        rest = re.sub(r"\?utm_[^&]*&", "?", rest)
        rest = re.sub(r"\?utm_[^&]*$", "", rest)
        rest = re.sub(r"/$", "", rest)
        return pre + rest

    rng = random.Random(5)
    urls = []
    for _ in range(300):
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS"])
        www = rng.choice(["", "www.", "WWW."])
        host = rng.choice(["Ex1.com", "a.b.Ex2.org", "ex3.net"])
        port = rng.choice(["", ":80", ":8080"])
        path = rng.choice(["", "/", "/P/x", "/P/x/", "/r?u=http://www.q.com:80/z"])
        params = rng.choice(["", "?utm_a=1", "?utm_a=1&utm_b=2",
                             "?utm_a=1&x=2", "?x=1&utm_b=2", "?x=1",
                             "?utm_a=1&utm_b=2&x=3"])
        frag = rng.choice(["", "#f", "#a/b?c"])
        if path.startswith("/r?") and params:
            params = ""  # one query string per URL
        urls.append(f"{scheme}://{www}{host}{port}{path}{params}{frag}")
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               ["i", "url"])
    got = {r["i"]: r["n"] for r in
           df.select("i", url_normalize(F.col("url")).alias("n")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == py_norm(u), (u, got[i], py_norm(u))

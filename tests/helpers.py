"""Independent scalar reference implementations (math module, row-at-a-time —
mirrors the JS code shape from elevation-service/hgt.js). Used as the golden
oracle by both kernel and Spark tests."""

import math


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
    avg = lambda v1, v2, f: v1 + (v2 - v1) * f
    v1 = avg(float(grid[row_low, col_low]), float(grid[row_low, col_hi]), cf)
    v2 = avg(float(grid[row_hi, col_low]), float(grid[row_hi, col_hi]), cf)
    return avg(v1, v2, rf)


def ref_nearest(grid, lat, lon, sw_lat, sw_lon):
    size = grid.shape[0]
    n = size - 1
    row = (lat - sw_lat) * n
    col = (lon - sw_lon) * n
    r = min(math.floor(row + 0.5), n)
    c = min(math.floor(col + 0.5), n)
    return float(grid[r, c])


def ref_dem(sw_lat, sw_lon, size, r, c):
    gi = (sw_lat + 90) * (size - 1) + r
    gj = (sw_lon + 180) * (size - 1) + c
    return ((gi * 31 + gj * 17) % 2000) - 1000

"""Tile/cell key encoders as pure Column expressions (JVM-side, inside
whole-stage codegen — never a Python UDF; SURVEY.md §2 op-5).

skadi_key_col mirrors elevation-service/tileset.js § getFilePath:
floor first, hemisphere letter from the FLOORED value, abs, zero-pad 2/3
(so lat=-0.0001 -> "S01...", matching the reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def skadi_key_col(lat: Column, lon: Column) -> Column:
    flat = F.floor(lat).cast("int")
    flon = F.floor(lon).cast("int")
    return F.concat(
        F.when(flat < 0, F.lit("S")).otherwise(F.lit("N")),
        F.lpad(F.abs(flat).cast("string"), 2, "0"),
        F.when(flon < 0, F.lit("W")).otherwise(F.lit("E")),
        F.lpad(F.abs(flon).cast("string"), 3, "0"),
    )


def mercator_x_col(lon: Column, z: int) -> Column:
    n = 1 << z
    x = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), x))


def mercator_y_col(lat: Column, z: int) -> Column:
    n = 1 << z
    y = F.floor(
        (F.lit(1.0) - F.asinh(F.tan(F.radians(lat))) / F.lit(float(__import__("math").pi)))
        / F.lit(2.0) * F.lit(float(n))
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), y))


def cell_id_col(lat: Column, lon: Column, z: int) -> Column:
    """Hierarchical int64 cell id (z<<58)|(x<<29)|y — H3/S2 stand-in, see
    kernels.cell_id.  Parent cell = cell_id at z-1 (x>>1, y>>1)."""
    x = mercator_x_col(lon, z)
    y = mercator_y_col(lat, z)
    return (
        F.shiftleft(F.lit(z).cast("long"), 58)
        .bitwiseOR(F.shiftleft(x, 29))
        .bitwiseOR(y)
    )


def valid_coord_predicate(lat: Column, lon: Column) -> Column:
    return (
        lat.isNotNull() & lon.isNotNull()
        & (lat >= -90.0) & (lat <= 90.0)
        & (lon >= -180.0) & (lon <= 180.0)
    )

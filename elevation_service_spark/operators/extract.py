"""Coordinate extraction from web-page text (SURVEY.md §2.B scalar fns).

Entirely JVM-side Catalyst expressions — regexp_extract_all + higher-order
array functions (transform/filter) + posexplode.  No Python UDF, no window,
no shuffle: the whole extraction is one codegen'd projection, which is what
survives a 100 TB scan.

The four pinned mention formats (FIXTURES.md §1 — these regexes ARE the
byte-identical extraction spec):

    57.7000, 11.9000
    lat=57.7000;lon=11.9000
    geo:57.7000,11.9000
    {"type":"Point","coordinates":[11.9000,57.7000]}

Alternation order matters: the specific forms come first so the bare-pair
alternative cannot re-match digits inside them (leftmost scan consumes the
full specific match).  Out-of-range pairs are matched then dropped by the
range filter (still inside the array, so point_idx stays dense without a
window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM = r"-?\d{1,3}\.\d{3,7}"
_P_GEOJSON = r'\{"type":"Point","coordinates":\[' + _NUM + "," + _NUM + r"\]\}"
_P_GEOURI = "geo:" + _NUM + "," + _NUM
_P_LATLON = "lat=" + _NUM + ";lon=" + _NUM
_P_BARE = r"(?<![\d.])-?\d{1,2}\.\d{3,7}, -?\d{1,3}\.\d{3,7}(?![\d.])"

COMBINED_PATTERN = "|".join([_P_GEOJSON, _P_GEOURI, _P_LATLON, _P_BARE])

_G_NUM = r"(-?[\d.]+)"
_RE_GEOJSON = r'\{"type":"Point","coordinates":\[' + _G_NUM + "," + _G_NUM + r"\]\}"
_RE_GEOURI = "geo:" + _G_NUM + "," + _G_NUM
_RE_LATLON = "lat=" + _G_NUM + ";lon=" + _G_NUM
_RE_BARE = _G_NUM + ", " + _G_NUM


def _parse_match(m: Column) -> Column:
    def pair(pat: str, lat_group: int, lon_group: int) -> Column:
        return F.struct(
            F.regexp_extract(m, pat, lat_group).cast("double").alias("lat"),
            F.regexp_extract(m, pat, lon_group).cast("double").alias("lon"),
            m.alias("matched"),
        )

    return (
        F.when(m.startswith("geo:"), pair(_RE_GEOURI, 1, 2))
        .when(m.startswith("lat="), pair(_RE_LATLON, 1, 2))
        .when(m.startswith("{"), pair(_RE_GEOJSON, 2, 1))  # GeoJSON is [lon,lat]
        .otherwise(pair(_RE_BARE, 1, 2))
    )


def extract_coords(pages: DataFrame, text_col: str = "text",
                   keep_cols: tuple[str, ...] = ("url",)) -> DataFrame:
    """pages -> one row per extracted coordinate:
    (keep_cols..., point_idx:int, lat:double, lon:double, matched:string).

    point_idx is the dense 0-based appearance order of VALID coordinates
    within the document (the reference visits positions in document order;
    geojson-elevation/index.js § addElevation).
    """
    from .spread import spread_few_splits
    # the regex scan is CPU-bound and per-row; spread a few-split input
    # across the cores (no-op at scale — see operators/spread.py; r8:
    # the 600k-row bench extraction ran serially in the 1-split scan)
    pages = spread_few_splits(pages)
    matches = F.regexp_extract_all(F.col(text_col), F.lit(COMBINED_PATTERN), 0)
    parsed = F.transform(matches, _parse_match)
    valid = F.filter(
        parsed,
        lambda s: (s["lat"] >= -90.0) & (s["lat"] <= 90.0)
        & (s["lon"] >= -180.0) & (s["lon"] <= 180.0),
    )
    return (
        pages.select(*keep_cols, F.posexplode(valid).alias("point_idx", "_c"))
        .select(*keep_cols, "point_idx",
                F.col("_c.lat").alias("lat"),
                F.col("_c.lon").alias("lon"),
                F.col("_c.matched").alias("matched"))
    )
